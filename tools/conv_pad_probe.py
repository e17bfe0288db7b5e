"""Probe: is an explicit 384-channel conv faster than the 320-channel one?

The r2 roadmap priced "level-0 conv channel padding 320->384" at +2.4% e2e on
the theory that C=320 (2.5 x 128 lanes) wastes tile capacity.  If XLA already
pads lanes internally, the explicit pad just relabels the wasted work as real
FLOPs and the lever is dead.  Decide with data before building the (invasive)
masked-GN/LN + interleaved-converter machinery.

Methodology (hard-won): fetching a multi-MB result through the axon tunnel
costs ~0.5-0.8 s with huge variance, so timed programs must (a) REDUCE TO A
SCALAR on device — never materialize the activation — and (b) run seconds of
device compute per dispatch (scan length ~1024).  Early versions of this
probe violated both and produced t384/t320 = 0.48, 2.2, 0.29 across runs
with a 190-TFLOP control matmul reading 5-41 TFLOPS.  All variants are
timed INTERLEAVED round-robin in one process and per-variant MEDIANS over
many rounds are reported — the same discipline as tools/ab_interleave.py.
The 4096^3 matmul control must read near peak (~190 TFLOPS) in the median
for the conv numbers to be trusted.

Times y = conv3x3(x) for level-0-shaped NHWC inputs at C in {256,320,384,640}
and prints median ms/conv + effective TFLOPS (relative to each C's own
nominal FLOPs) and the REAL-work ratio t(384)/t(320): < 1.0 means the
padding lever wins.
"""

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = int(os.environ.get("PROBE_CHAIN", "1024"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "7"))


def main():
    b, h, w = 16, 64, 64  # CFG batch 8 level-0 shape
    variants = {}  # name -> (callable, args, flops_per_op)

    m = jax.random.normal(jax.random.PRNGKey(2), (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_chain(m):
        def body(x, _):
            y = jnp.dot(x, m, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return y * (1.0 / 64.0), None
        y, _ = jax.lax.scan(body, m, None, length=CHAIN)
        return jnp.sum(y.astype(jnp.float32))  # scalar fetch: 4 bytes, not 33 MB

    variants["control-mm4096"] = (mm_chain, (m,), 2 * 4096**3)

    def make_conv_chain(c):
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)
        # variance-preserving weights so 1024 chained convs stay finite
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16) * (1.0 / (9 * c) ** 0.5)

        @jax.jit
        def chain(x, k):
            def body(x, _):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                return y, None
            y, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return jnp.sum(y.astype(jnp.float32))  # scalar fetch

        return chain, (x, k), 2 * b * h * w * c * c * 9

    for c in (256, 320, 384, 640):
        variants[f"C={c}"] = make_conv_chain(c)

    for name, (f, args, _) in variants.items():
        np.asarray(f(*args))  # compile + warm
        print(f"{name}: compiled", flush=True)

    times = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name, (f, args, _) in variants.items():
            t0 = time.perf_counter()
            np.asarray(f(*args))
            times[name].append((time.perf_counter() - t0) / CHAIN)

    meds = {}
    for name, (_, _, fl) in variants.items():
        med = statistics.median(times[name])
        meds[name] = med
        spread = (max(times[name]) - min(times[name])) / med
        print(f"{name:>14}: {med*1e3:7.3f} ms  {fl/med/1e12:6.1f} TFLOPS  (spread {spread:.0%})")

    ratio = meds["C=384"] / meds["C=320"]
    print(f"t(384)/t(320) = {ratio:.3f}  (<1.0 => padding lever wins)")


if __name__ == "__main__":
    main()
