"""Block-size sweep for the fused LN+GEGLU kernel on the SD transformer shapes.

The r4 trace puts the kernel at ~16% of the fused program's exclusive compute
(~59% MXU utilization per block at the shipped block_q=512) — worth a sweep.
Chain-in-one-jit methodology (see tools/microbench.py): under the axon relay
only a K-step lax.scan with one final materialization times the device.

python tools/geglu_sweep.py            # sweep all UNet shapes x block_q
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from saspa_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

K = int(os.environ.get("MB_CHAIN", "20"))

# (B_postfork, L, C) per UNet level at 512^2 batch 8 + CFG
SHAPES = [(16, 4096, 320), (16, 1024, 640), (16, 256, 1280), (16, 64, 1280)]


def bench_shape(b, l, c, block_q):
    os.environ["SASPA_GEGLU_BLOCK_Q"] = str(block_q)
    from saspa_tpu.ops.geglu import _pick_block_q, fused_ln_geglu, ln_geglu_eligible

    if not ln_geglu_eligible(l, c, 4, jnp.bfloat16):
        return None
    eff_bq = _pick_block_q(l)
    f = 4 * c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, l, c).astype(np.float32) * 0.1, jnp.bfloat16)
    lns = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 2 * f).astype(np.float32) * 0.02)
    b1 = jnp.zeros((2 * f,), jnp.float32)
    w2 = jnp.asarray(rng.randn(f, c).astype(np.float32) * 0.02)
    b2 = jnp.zeros((c,), jnp.float32)

    @jax.jit
    def chained(x0):
        def body(lat, _):
            return fused_ln_geglu(lat, lns, lnb, w1, b1, w2, b2), None

        out, _ = jax.lax.scan(body, x0, None, length=K)
        # scalar fetch: materializing the (B, L, C) output through the axon
        # relay costs seconds and would swamp the kernel time
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(chained(x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        best = min(best, (time.perf_counter() - t0) / K)
    flops = 2 * b * l * (c * 2 * f + f * c)  # two proj_in halves + proj_out
    return {"eff_block_q": eff_bq, "us": round(best * 1e6, 1),
            "tflops": round(flops / best / 1e12, 1)}


def main():
    out = {}
    for b, l, c in SHAPES:
        for bq in (128, 256, 512, 1024, 2048):
            if bq > l:
                continue
            r = bench_shape(b, l, c, bq)
            if r is None:
                continue
            key = f"B{b}_L{l}_C{c}_bq{bq}"
            # skip duplicates where the effective block collapsed to the same
            if any(v["eff_block_q"] == r["eff_block_q"] and k.startswith(f"B{b}_L{l}_C{c}") for k, v in out.items()):
                continue
            out[key] = r
            print(key, r, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
