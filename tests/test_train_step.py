import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.fgvc.train import (
    Trainer,
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_train_step,
)
from saspa_tpu.models.cal import WSDAN_CAL
from saspa_tpu.parallel import make_mesh, shard_batch
from saspa_tpu.utils.config import get_train_config

NUM_CLASSES = 8
IMG = 64


@pytest.fixture(scope="module")
def cfg():
    return get_train_config("planes").replace(
        image_size=(IMG, IMG), net="resnet50", batch_size=8, compute_dtype="float32", donate_state=False
    )


@pytest.fixture(scope="module")
def setup(cfg):
    model = WSDAN_CAL(num_classes=NUM_CLASSES, M=4, net=cfg.net)
    state = create_train_state(model, cfg.replace(num_attentions=4), NUM_CLASSES, 10, jax.random.PRNGKey(0),
                               sample_input=np.zeros((1, IMG, IMG, 3), np.float32))
    return model, state


def _batch(seed=0, n=8):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, NUM_CLASSES, size=n).astype(np.int32)
    # class-dependent signal so the model can learn
    X = rng.rand(n, IMG, IMG, 3).astype(np.float32) * 0.1
    for i, lbl in enumerate(y):
        X[i, :, :, lbl % 3] += (lbl + 1) / NUM_CLASSES
    return X, y


def test_lr_schedule_matches_reference_formula(cfg):
    sched = make_lr_schedule(cfg, num_batches_per_epoch=100)
    # epoch 3, iter 50/100 -> lr = base * 0.9 ** ((3 + 0.5) / 2)
    step = 3 * 100 + 50
    expected = cfg.learning_rate * 0.9 ** (3.5 / 2.0)
    assert np.isclose(float(sched(step)), expected, rtol=1e-6)


def test_train_step_runs_and_updates(setup, cfg):
    model, state = setup
    step_fn = make_train_step(model, cfg.replace(num_attentions=4), 10)
    X, y = _batch()
    new_state, metrics = step_fn(state, jnp.asarray(X), jnp.asarray(y), jax.random.PRNGKey(1))
    assert int(new_state.step) == int(state.step) + 1
    assert np.isfinite(float(metrics["loss"]))
    # params changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # feature center moved for the labels in the batch
    fc = np.asarray(new_state.feature_center)
    assert np.abs(fc[np.unique(y)]).sum() > 0


def test_loss_decreases_on_fixed_batch(setup, cfg):
    model, state = setup
    step_fn = make_train_step(model, cfg.replace(num_attentions=4, learning_rate=1e-3), 10)
    X, y = _batch(3)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    losses = []
    for i in range(10):
        state, m = step_fn(state, Xj, yj, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert min(losses[-3:]) < losses[0], f"loss did not decrease: {losses}"


def test_eval_step_tta(setup):
    model, state = setup
    eval_fn = make_eval_step(model, NUM_CLASSES)
    X, y = _batch(5)
    m = eval_fn(state, jnp.asarray(X), jnp.asarray(y), jax.random.PRNGKey(0))
    assert m["correct"].shape == (2,)
    assert int(m["class_counts"].sum()) == len(y)


@pytest.mark.slow
def test_train_step_sharded_over_8_devices(cfg):
    assert jax.device_count() == 8, "conftest should give 8 virtual devices"
    mesh = make_mesh()
    model = WSDAN_CAL(num_classes=NUM_CLASSES, M=4, net="resnet50")
    c = cfg.replace(num_attentions=4)
    state = create_train_state(model, c, NUM_CLASSES, 10, jax.random.PRNGKey(0),
                               sample_input=np.zeros((1, IMG, IMG, 3), np.float32))
    from saspa_tpu.parallel import replicated

    state = jax.device_put(state, replicated(mesh))
    step_fn = make_train_step(model, c, 10)
    X, y = _batch(7, n=16)
    sharded = shard_batch(mesh, {"X": X, "y": y})
    new_state, metrics = step_fn(state, sharded["X"], sharded["y"], jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # result replicated params remain replicated
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_trainer_end_to_end_tiny(cfg):
    c = cfg.replace(num_attentions=4, epochs=1)
    trainer = Trainer(c, num_classes=NUM_CLASSES, num_batches_per_epoch=2)

    def batches():
        for s in range(2):
            yield _batch(s, n=8)

    out = trainer.run_epoch(0, batches())
    assert out["steps"] == 2
    ev = trainer.evaluate([_batch(9, n=8)], epoch=0)
    assert "val_topk_accuracy" in ev
