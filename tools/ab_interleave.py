"""Interleaved A/B for fused-program variants controlled by a SASPA_* env knob.

Run-to-run throughput on the axon-relayed chip drifts by several percent,
which can swamp a 1-3% kernel effect when A and B run in separate sessions.
This tool traces BOTH variants in one process (the knob is read at trace
time), then alternates A,B,A,B,... so drift hits both arms equally, and
reports per-arm medians.

Backbones follow the paper recipes (run_aug/run_aug.py:520-571):
  sd_v1.5        canny-ControlNet, 30-step CFG (planes/cars)     [default]
  sdxl-turbo     2-step gs=0, no controlnet (cub)
  blip_diffusion (+canny) 30-step CFG (compcars/cars/dtd)
One pipeline per run (the XL param tree is ~5.4 GB — two copies would not
fit HBM); only the traced fused program differs per arm, which is also the
cleaner experiment (identical weights, identical inputs).

python -m tools.ab_interleave SASPA_PALLAS_GEGLU 1 0 --rounds 6
python -m tools.ab_interleave SASPA_PALLAS_GEGLU 1 0 --backbone sdxl-turbo --iters 8
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

import numpy as np


def _build_runner(args):
    """Returns (make_run, batch): make_run() traces the CURRENT env knobs into
    a fresh fused program and returns run(i) -> host array."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    res = args.res

    if args.backbone == "sd_v1.5":
        from saspa_tpu.diffusion.pipelines import DiffusionPipeline

        batch = args.batch or 8
        steps = args.steps or 30
        pipe = DiffusionPipeline(
            base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.bfloat16
        )
        prompts = ["a photo of a Boeing 737-700 airplane, a painting of monet"] * batch
        ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
        neg = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
        src = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)

        def make_run():
            pipe._fused_cache.clear()  # the cache key ignores env knobs
            fused = pipe.make_fused_generate(res, res, steps, 7.5, 0.75, 120.0, 200.0)

            def run(i):
                lat = jax.random.normal(
                    jax.random.PRNGKey(i), (batch, res // 8, res // 8, 4), jnp.float32
                )
                return np.asarray(fused(pipe.params, ids, neg, src, lat))

            return run

    elif args.backbone == "sdxl-turbo":
        from saspa_tpu.diffusion.pipelines import DiffusionPipeline

        batch = args.batch or 4
        steps = args.steps or 2
        # fp32 random masters for the XL tree don't fit HBM (see backbone_bench)
        if not os.environ.get("SASPA_WEIGHTS"):
            os.environ["SASPA_INIT_BF16"] = "1"
        pipe = DiffusionPipeline(
            base_model="sd_xl-turbo", controlnet=None, sampler="ddim",
            dtype=jnp.bfloat16, weights_dir=os.environ.get("SASPA_WEIGHTS"),
        )
        prompts = ["a photo of a painted bunting bird"] * batch
        ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
        neg = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
        src = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)

        def make_run():
            pipe._fused_cache.clear()
            fused = pipe.make_fused_generate(res, res, steps, 0.0)

            def run(i):
                lat = jax.random.normal(
                    jax.random.PRNGKey(i), (batch, res // 8, res // 8, 4), jnp.float32
                )
                return np.asarray(fused(pipe.params, ids, neg, src, lat))

            return run

    elif args.backbone.startswith("blip_diffusion"):
        from saspa_tpu.models.blip_diffusion import BlipDiffusionPipeline

        batch = args.batch or 8
        steps = args.steps or 30
        controlnet = "canny" if args.backbone.endswith("controlnet") else None
        pipe = BlipDiffusionPipeline(controlnet=controlnet, sampler="ddim", dtype=jnp.bfloat16)
        meta = "car"
        ids = pipe.build_subject_prompt_ids(["parked on a mountain road"] * batch, meta)
        neg = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
        cat_ids, cat_mask = pipe.bert_category_ids(meta, batch)
        cat_ids, cat_mask = jnp.asarray(cat_ids), jnp.asarray(cat_mask)
        refs = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))
        src = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)

        def make_run():
            pipe._fused_cache.clear()
            fused = pipe.make_fused_generate(res, res, steps, 7.5, 0.75, 120.0, 200.0)

            def run(i):
                lat = jax.random.normal(
                    jax.random.PRNGKey(i), (batch, res // 8, res // 8, 4), jnp.float32
                )
                return np.asarray(fused(pipe.params, ids, neg, cat_ids, cat_mask, refs, src, lat))

            return run

    else:
        raise SystemExit(f"unknown backbone {args.backbone}")

    return make_run, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("knob")
    ap.add_argument("value_a")
    ap.add_argument("value_b")
    ap.add_argument("--backbone", default="sd_v1.5",
                    choices=["sd_v1.5", "sdxl-turbo", "blip_diffusion", "blip_diffusion-controlnet"])
    ap.add_argument("--batch", type=int, default=0, help="0 = backbone default")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=0, help="0 = backbone default")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=1,
                    help="programs per timing sample (use >1 for sub-second programs)")
    args = ap.parse_args()

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    make_run, batch = _build_runner(args)

    fns = {}
    for arm, val in (("A", args.value_a), ("B", args.value_b)):
        if val == "":
            os.environ.pop(args.knob, None)
        else:
            os.environ[args.knob] = val
        run = make_run()
        run(0)  # compile (cache-warm in A/B campaigns)
        fns[arm] = run
        print(f"arm {arm}: {args.knob}={val!r} compiled", flush=True)

    times = {"A": [], "B": []}
    for r in range(args.rounds):
        for arm in ("A", "B"):
            t0 = time.perf_counter()
            for k in range(args.iters):
                fns[arm](r * args.iters + k + 1)
            times[arm].append(time.perf_counter() - t0)
        print(f"round {r}: A={times['A'][-1]:.3f}s B={times['B'][-1]:.3f}s", flush=True)

    out = {"backbone": args.backbone, "knob": args.knob, "iters": args.iters}
    for arm, val in (("A", args.value_a), ("B", args.value_b)):
        med = statistics.median(times[arm])
        out[arm] = {
            "value": val,
            "median_s": round(med, 4),
            "img_per_s": round(batch * args.iters / med, 4),
            "all_s": [round(t, 4) for t in times[arm]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
