"""Filter-stage throughput: batched CLIP RN50 + WSDAN-CAL scoring on TPU.

The reference scores each generated image with separate single-image forwards
(all_utils/utils.py:357-409).  This measures our batched sweep: CLIP image
features (224²) + CAL resnet101 logits (224²) per image — the two scorers the
shipped config enables (semantic + model-confidence filtering).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    batch = int(os.environ.get("FB_BATCH", "64"))
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))

    # CLIP RN50 image tower
    from saspa_tpu.models.clip import CLIPModel

    clip_model = CLIPModel(vision_kind="rn50", dtype=jnp.bfloat16)
    cvars = clip_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32))
    clip_fn = jax.jit(lambda x: clip_model.apply(cvars, x, method=CLIPModel.encode_image))

    # CAL resnet101 baseline
    from saspa_tpu.models.cal import WSDAN_CAL

    cal = WSDAN_CAL(num_classes=100, M=32, net="resnet101", dtype=jnp.bfloat16)
    calvars = cal.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 224, 224, 3)), train=False)
    cal_fn = jax.jit(lambda x: cal.apply(calvars, x, train=False)[0])

    def score(x):
        return clip_fn(x), cal_fn(x)

    # warm + measure with full materialization (axon sync caveat)
    a, b = score(X)
    _ = np.asarray(a), np.asarray(b)
    iters = int(os.environ.get("FB_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        a, b = score(X)
        _ = np.asarray(a), np.asarray(b)
    dt = time.perf_counter() - t0
    per_sec = batch * iters / dt
    print(f"filter scoring: {per_sec:.1f} img/s/chip (batch {batch}, CLIP-RN50 + CAL-r101)")


if __name__ == "__main__":
    main()
