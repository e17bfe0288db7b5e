"""Golden-output regression net for the TRAINING step.

tests/fixtures/golden_train.npz pins the per-step losses and parameter-leaf
digests of 3 optimizer steps of the full WSDAN-CAL train step (3-view loss,
feature-center EMA, torch-SGD-semantics optax chain) from a fixed seed.
Params are derived from the seed at test time (flax init is deterministic on
the pinned CPU platform), so the fixture stays tiny.  Any refactor that
silently changes training numerics fails here — the FGVC-half counterpart of
tests/test_golden_generation.py.

To accept an INTENTIONAL numeric change: `python -m tools.make_golden_train`
and commit the new fixture alongside the change.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "golden_train.npz"
NUM_CLASSES = 8
IMG = 64
STEPS = 3


def golden_train_run():
    """3 single-device train steps from fixed seeds.
    Returns (losses (STEPS,) float64, {leaf_name: digest float64})."""
    from saspa_tpu.fgvc.train import create_train_state, make_train_step
    from saspa_tpu.models.cal import WSDAN_CAL
    from saspa_tpu.utils.config import get_train_config

    cfg = get_train_config("planes").replace(
        image_size=(IMG, IMG), net="resnet50", batch_size=8,
        compute_dtype="float32", donate_state=False, num_attentions=4,
    )
    model = WSDAN_CAL(num_classes=NUM_CLASSES, M=4, net="resnet50")
    state = create_train_state(
        model, cfg, NUM_CLASSES, 10, jax.random.PRNGKey(1234),
        sample_input=np.zeros((1, IMG, IMG, 3), np.float32),
    )
    step_fn = make_train_step(model, cfg, 10)

    rng = np.random.RandomState(7)
    losses = []
    for i in range(STEPS):
        y = rng.randint(0, NUM_CLASSES, size=8).astype(np.int32)
        X = rng.rand(8, IMG, IMG, 3).astype(np.float32)
        state, metrics = step_fn(state, X, y, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))

    leaves = jax.tree_util.tree_leaves_with_path(state.params)
    digests = {}
    for path, leaf in leaves[:4] + leaves[-4:]:
        name = "digest_" + "".join(str(p) for p in path).replace("'", "").replace("[", "_").replace("]", "")
        digests[name] = np.float64(np.asarray(leaf, np.float64).sum())
    return np.asarray(losses, np.float64), digests


@pytest.mark.slow
def test_golden_train_bitstable():
    if not FIXTURE.exists():
        pytest.skip("fixture not generated (python -m tools.make_golden_train)")
    want = np.load(FIXTURE)
    losses, digests = golden_train_run()
    np.testing.assert_array_equal(losses, want["losses"], err_msg="train losses drifted")
    for k, v in digests.items():
        np.testing.assert_array_equal(np.float64(v), want[k], err_msg=f"param digest {k} drifted")
