"""Training-stage throughput: WSDAN-CAL jitted train step on TPU.

Reference trains FGVC-Aircraft at bs4/224²/resnet101 with a 3-view step
(fgvc/train.py); this measures our fused step (2 forwards over 3 views +
feature-center EMA + SGD) at the same config, plus a larger-batch variant.
Timing via K chained steps on a fixed batch (axon sync caveat).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def bench(batch_size: int, net: str, image: int = 224, iters: int = 8):
    from saspa_tpu.fgvc.train import create_train_state, make_train_step
    from saspa_tpu.models.cal import WSDAN_CAL
    from saspa_tpu.utils.config import get_train_config

    cfg = get_train_config("planes").replace(
        image_size=(image, image), net=net, batch_size=batch_size,
        compute_dtype="bfloat16", donate_state=False,
    )
    num_classes = 100
    model = WSDAN_CAL(num_classes=num_classes, M=cfg.num_attentions, net=net, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, num_classes, 100, jax.random.PRNGKey(0),
                               sample_input=np.zeros((1, image, image, 3), np.float32))
    step = make_train_step(model, cfg, 100)

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(batch_size, image, image, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, num_classes, batch_size).astype(np.int32))

    state, m = step(state, X, y, jax.random.PRNGKey(1))
    _ = float(m["loss"])  # materialize (sync)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, X, y, jax.random.PRNGKey(i))
    _ = float(m["loss"])  # loss depends on the full chain -> true sync
    dt = (time.perf_counter() - t0) / iters
    print(f"train step {net} bs{batch_size} @{image}²: {dt * 1000:.1f} ms/step = {batch_size / dt:.1f} img/s/chip")


if __name__ == "__main__":
    bench(int(os.environ.get("TB_BS", "16")), os.environ.get("TB_NET", "resnet101"))
