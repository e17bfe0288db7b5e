"""Interleaved A/B for fused-program variants controlled by a SASPA_* env knob.

Run-to-run throughput on the axon-relayed chip drifts by several percent,
which can swamp a 1-3% kernel effect when A and B run in separate sessions.
This tool traces BOTH variants in one process (the knob is read at trace
time), then alternates A,B,A,B,... so drift hits both arms equally, and
reports per-arm medians.

python -m tools.ab_interleave SASPA_DISABLE_PALLAS_LN "" 1 --rounds 5
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
    ap.add_argument("knob")
    ap.add_argument("value_a")
    ap.add_argument("value_b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from saspa_tpu.diffusion.pipelines import DiffusionPipeline

    prompts = ["a photo of a Boeing 737-700 airplane, a painting of monet"] * args.batch
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(args.batch, args.res, args.res, 3).astype(np.float32) * 255.0)

    fns = {}
    pipes = {}
    for arm, val in (("A", args.value_a), ("B", args.value_b)):
        if val == "":
            os.environ.pop(args.knob, None)
        else:
            os.environ[args.knob] = val
        pipe = DiffusionPipeline(
            base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.bfloat16
        )
        fused = pipe.make_fused_generate(args.res, args.res, args.steps, 7.5, 0.75, 120.0, 200.0)
        ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
        neg = jnp.asarray(pipe.tokenizer([""] * args.batch, pad="eot"))

        def run(i, fused=fused, pipe=pipe, ids=ids, neg=neg):
            lat = jax.random.normal(
                jax.random.PRNGKey(i), (args.batch, args.res // 8, args.res // 8, 4), jnp.float32
            )
            return np.asarray(fused(pipe.params, ids, neg, src, lat))

        run(0)  # compile (cache-warm in A/B campaigns)
        fns[arm] = run
        pipes[arm] = pipe
        print(f"arm {arm}: {args.knob}={val!r} compiled", flush=True)

    times = {"A": [], "B": []}
    for r in range(args.rounds):
        for arm in ("A", "B"):
            t0 = time.perf_counter()
            fns[arm](r + 1)
            times[arm].append(time.perf_counter() - t0)
        print(f"round {r}: A={times['A'][-1]:.3f}s B={times['B'][-1]:.3f}s", flush=True)

    out = {}
    for arm, val in (("A", args.value_a), ("B", args.value_b)):
        med = statistics.median(times[arm])
        out[arm] = {
            "value": val,
            "median_s": round(med, 4),
            "img_per_s": round(args.batch / med, 4),
            "all_s": [round(t, 4) for t in times[arm]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
