"""Interleaved batch-size A/B for the fused generation program.

Same drift-cancelling discipline as tools/ab_interleave.py (both arms in one
process, alternating rounds, per-arm medians) but the variant is the BATCH
size, which is a program-shape argument rather than an env knob.  Compares
images/sec (not seconds/batch) since the arms do different amounts of work.

python -m tools.ab_batch 8 12 --rounds 5
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch_a", type=int)
    ap.add_argument("batch_b", type=int)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from saspa_tpu.diffusion.pipelines import DiffusionPipeline

    pipe = DiffusionPipeline(
        base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.bfloat16
    )
    fused = pipe.make_fused_generate(args.res, args.res, args.steps, 7.5, 0.75, 120.0, 200.0)

    rng = np.random.RandomState(0)
    fns = {}
    for arm, batch in (("A", args.batch_a), ("B", args.batch_b)):
        prompts = ["a photo of a Boeing 737-700 airplane, a painting of monet"] * batch
        src = jnp.asarray(rng.rand(batch, args.res, args.res, 3).astype(np.float32) * 255.0)
        ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
        neg = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))

        def run(i, batch=batch, src=src, ids=ids, neg=neg):
            lat = jax.random.normal(
                jax.random.PRNGKey(i), (batch, args.res // 8, args.res // 8, 4), jnp.float32
            )
            return np.asarray(fused(pipe.params, ids, neg, src, lat))

        run(0)  # compile
        fns[arm] = run
        print(f"arm {arm}: batch={batch} compiled", flush=True)

    times = {"A": [], "B": []}
    for r in range(args.rounds):
        for arm in ("A", "B"):
            t0 = time.perf_counter()
            fns[arm](r + 1)
            times[arm].append(time.perf_counter() - t0)
        print(f"round {r}: A={times['A'][-1]:.3f}s B={times['B'][-1]:.3f}s", flush=True)

    out = {}
    for arm, batch in (("A", args.batch_a), ("B", args.batch_b)):
        med = statistics.median(times[arm])
        out[arm] = {
            "batch": batch,
            "median_s": round(med, 4),
            "img_per_s": round(batch / med, 4),
            "all_s": [round(t, 4) for t in times[arm]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
