"""Time one fused-program variant (for parallel A/B compile campaigns).

python -m tools.bench_variant --batch 4 --steps 30 --gs 7.5 --controlnet canny
Env knobs (SASPA_*) are read by the model code as usual.
Prints one JSON line with ms/batch and img/s/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--gs", type=float, default=7.5)
    ap.add_argument("--controlnet", default="canny")
    ap.add_argument("--sampler", default="ddim")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from saspa_tpu.diffusion.pipelines import DiffusionPipeline

    cn = None if args.controlnet in ("", "none", "None") else args.controlnet
    pipe = DiffusionPipeline(
        base_model="sd_v1.5", controlnet=cn, sampler=args.sampler,
        dtype=jnp.bfloat16, weights_dir=os.environ.get("SASPA_WEIGHTS"),
    )
    fused = pipe.make_fused_generate(args.res, args.res, args.steps, args.gs, 0.75, 120.0, 200.0)
    prompts = ["a photo of a Boeing 737-700 airplane, a painting of monet"] * args.batch
    ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
    neg_ids = jnp.asarray(pipe.tokenizer([""] * args.batch, pad="eot"))
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(args.batch, args.res, args.res, 3).astype(np.float32) * 255.0)

    def run(i):
        lat = jax.random.normal(jax.random.PRNGKey(i), (args.batch, args.res // 8, args.res // 8, 4), jnp.float32)
        return fused(pipe.params, ids, neg_ids, src, lat)

    t_c0 = time.perf_counter()
    np.asarray(run(0))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(args.iters):
        np.asarray(run(i + 1))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "tag": args.tag, "batch": args.batch, "steps": args.steps, "gs": args.gs,
        "controlnet": args.controlnet, "ms_per_batch": round(dt * 1000, 1),
        "img_per_s": round(args.batch / dt, 4), "compile_s": round(compile_s, 1),
        "env": {k: v for k, v in os.environ.items() if k.startswith("SASPA_") or k == "LIBTPU_INIT_ARGS" or k == "XLA_FLAGS"},
    }))


if __name__ == "__main__":
    main()
