"""Interleaved batch-size A/B for the fused generation program.

Same drift-cancelling discipline as tools/ab_interleave.py (both arms in one
process, alternating rounds, per-arm medians) but the variant is the BATCH
size, which is a program-shape argument rather than an env knob.  Compares
images/sec (not seconds/batch) since the arms do different amounts of work.
One pipeline is shared by both arms (params are batch-independent), so the
experiment isolates the program shape exactly.

The turbo program is short (~0.5 s at batch 4), so fixed per-dispatch relay
overhead is a visible fraction of its wall clock — `--iters` times several
programs per sample, and a larger batch is the candidate amortization lever
(see docs/perf_roadmap.md "SDXL-Turbo perf").

python -m tools.ab_batch 8 12 --rounds 5
python -m tools.ab_batch 4 8 --backbone sdxl-turbo --iters 6
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
    ap.add_argument("--backbone", default="sd_v1.5", choices=["sd_v1.5", "sdxl-turbo"])
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=0, help="0 = backbone default")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=1,
                    help="programs per timing sample (use >1 for sub-second programs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from saspa_tpu.diffusion.pipelines import DiffusionPipeline

    if args.backbone == "sd_v1.5":
        steps = args.steps or 30
        pipe = DiffusionPipeline(
            base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.bfloat16
        )
        fused = pipe.make_fused_generate(args.res, args.res, steps, 7.5, 0.75, 120.0, 200.0)
        prompt = "a photo of a Boeing 737-700 airplane, a painting of monet"
    else:
        steps = args.steps or 2
        # fp32 random masters for the XL tree don't fit HBM (see backbone_bench)
        if not os.environ.get("SASPA_WEIGHTS"):
            os.environ["SASPA_INIT_BF16"] = "1"
        pipe = DiffusionPipeline(
            base_model="sd_xl-turbo", controlnet=None, sampler="ddim",
            dtype=jnp.bfloat16, weights_dir=os.environ.get("SASPA_WEIGHTS"),
        )
        fused = pipe.make_fused_generate(args.res, args.res, steps, 0.0)
        prompt = "a photo of a painted bunting bird"

    rng = np.random.RandomState(0)
    fns = {}
    for arm, batch in (("A", args.batch_a), ("B", args.batch_b)):
        prompts = [prompt] * batch
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
            for k in range(args.iters):
                fns[arm](r * args.iters + k + 1)
            times[arm].append(time.perf_counter() - t0)
        print(f"round {r}: A={times['A'][-1]:.3f}s B={times['B'][-1]:.3f}s", flush=True)

    out = {"backbone": args.backbone, "steps": steps, "iters": args.iters}
    for arm, batch in (("A", args.batch_a), ("B", args.batch_b)):
        med = statistics.median(times[arm])
        out[arm] = {
            "batch": batch,
            "median_s": round(med, 4),
            "img_per_s": round(batch * args.iters / med, 4),
            "all_s": [round(t, 4) for t in times[arm]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
