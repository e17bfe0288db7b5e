"""Per-backbone generation throughput on one chip (STATUS stage table).

The paper's recipes use three backbones (README.md:115, run_aug/run_aug.py:
520-571): sd_v1.5+canny for planes/cars (bench.py's headline number),
sdxl-turbo 2-step gs=0 for CUB, and blip_diffusion(+canny) for
CompCars/Cars/DTD.  bench.py measures the first; this tool measures the
other two through the SAME fused single-program path the driver uses.

Usage: python tools/backbone_bench.py sdxl-turbo|blip_diffusion|blip_diffusion-controlnet
Prints one JSON line {"backbone", "img_per_sec_per_chip", "batch", "steps"}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    backbone = sys.argv[1] if len(sys.argv) > 1 else "blip_diffusion"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(str(Path(__file__).resolve().parent.parent / ".jax_cache"))

    res = int(os.environ.get("BENCH_RES", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    rng = np.random.RandomState(0)

    if backbone == "sdxl-turbo":
        # CUB recipe: sdxl-turbo, 2 steps, guidance 0, no controlnet
        # (run_aug/run_aug.py:564-571)
        from saspa_tpu.diffusion.pipelines import DiffusionPipeline

        # batch 8 matches the driver default AND wins the interleaved batch
        # A/B (+34.6% img/s over batch 4 — the 2-step program is too short
        # to amortize dispatch at batch 4; docs/perf_roadmap.md "SDXL-Turbo
        # batch amortization")
        batch = int(os.environ.get("BENCH_BATCH", "8"))
        steps = int(os.environ.get("BENCH_STEPS", "2"))
        # random fp32 masters for the 2.57B-param XL UNet + bigG tower would
        # be ~14 GB — over the v5e's HBM before a single activation; the
        # bench materializes the init tree directly in bf16 (5.4 GB), which
        # is the production layout anyway (fp16 weights).
        if not os.environ.get("SASPA_WEIGHTS"):
            os.environ["SASPA_INIT_BF16"] = "1"
        pipe = DiffusionPipeline(
            base_model="sd_xl-turbo", controlnet=None, sampler="ddim",
            dtype=jnp.bfloat16, weights_dir=os.environ.get("SASPA_WEIGHTS"),
        )
        fused = pipe.make_fused_generate(res, res, steps, 0.0)
        prompts = ["a photo of a painted bunting bird"] * batch
        ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
        nids = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
        src = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)

        def run(key):
            latents = jax.random.normal(key, (batch, res // 8, res // 8, 4), jnp.float32)
            return fused(pipe.params, ids, nids, src, latents)

    elif backbone.startswith("blip_diffusion"):
        # CompCars/Cars/DTD recipe: blip_diffusion(+canny), 30-step CFG
        # (run_aug/run_aug.py:171-181; README.md:115)
        from saspa_tpu.models.blip_diffusion import BlipDiffusionPipeline

        batch = int(os.environ.get("BENCH_BATCH", "8"))
        steps = int(os.environ.get("BENCH_STEPS", "30"))
        controlnet = "canny" if backbone.endswith("controlnet") else None
        pipe = BlipDiffusionPipeline(
            controlnet=controlnet, sampler="ddim", dtype=jnp.bfloat16,
            weights_dir=os.environ.get("SASPA_WEIGHTS"),
        )
        fused = pipe.make_fused_generate(res, res, steps, 7.5, 0.75, 120.0, 200.0)
        meta = "car"
        prompts = ["parked on a mountain road"] * batch
        # the fused program takes the AMPLIFIED subject prompt tokenized to
        # 77-16=61 positions for the ctx splice (same call the driver makes,
        # gen/driver.py) — full-77 ids would splice to 93 and crash
        ids = pipe.build_subject_prompt_ids(prompts, meta)
        nids = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
        cat_ids, cat_mask = pipe.bert_category_ids(meta, batch)
        cat_ids, cat_mask = jnp.asarray(cat_ids), jnp.asarray(cat_mask)
        refs = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))
        src = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)

        def run(key):
            latents = jax.random.normal(key, (batch, res // 8, res // 8, 4), jnp.float32)
            return fused(pipe.params, ids, nids, cat_ids, cat_mask, refs, src, latents)

    else:
        raise SystemExit(f"unknown backbone {backbone}")

    out = np.asarray(run(jax.random.PRNGKey(0)))  # compile+warmup
    t0 = time.perf_counter()
    pending = run(jax.random.PRNGKey(1))
    for i in range(1, iters):
        nxt = run(jax.random.PRNGKey(i + 1))
        np.asarray(pending)
        pending = nxt
    out = np.asarray(pending)
    dt = time.perf_counter() - t0
    assert out.dtype == np.uint8 and out.shape == (batch, res, res, 3)

    from saspa_tpu.utils import bench_conditions

    rate = batch * iters / dt / jax.local_device_count()
    print(json.dumps({
        "backbone": backbone,
        "img_per_sec_per_chip": round(rate, 4),
        "batch": batch, "steps": steps, "res": res,
        "conditions": bench_conditions(pipe),
    }))


if __name__ == "__main__":
    main()
