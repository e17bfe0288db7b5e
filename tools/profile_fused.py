"""Profile the fused generation program (canny-ControlNet SD1.5 @512).

Three modes (combinable):
  --ab      component A/B time budget: full program vs controlnet-off vs
            cfg-off vs step-count sweep vs VAE-only — isolates where the
            wall-clock goes without needing a device trace.
  --trace   jax.profiler device trace -> parse the .xplane.pb and print the
            top HLO ops / op-category aggregation (works iff the axon relay
            exposes the TPU trace plane).
  --flops   XLA cost_analysis of the compiled program -> achieved TFLOPS.

Usage: python tools/profile_fused.py --ab --flops [--trace] [--batch 4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(batch, steps, res, controlnet="canny", sampler="ddim", gs=7.5,
          base_model="sd_v1.5"):
    import jax.numpy as jnp

    from saspa_tpu.diffusion.pipelines import DiffusionPipeline

    if base_model == "sd_xl-turbo" and not os.environ.get("SASPA_WEIGHTS"):
        # fp32 random masters for the XL tree don't fit HBM (see backbone_bench)
        os.environ["SASPA_INIT_BF16"] = "1"
    pipe = DiffusionPipeline(
        base_model=base_model, controlnet=controlnet, sampler=sampler,
        dtype=jnp.bfloat16, weights_dir=os.environ.get("SASPA_WEIGHTS"),
    )
    fused = pipe.make_fused_generate(res, res, steps, gs, 0.75, 120.0, 200.0)
    prompts = ["a photo of a Boeing 737-700 airplane, a painting of monet"] * batch
    ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
    neg_ids = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
    return pipe, fused, ids, neg_ids


def timed(fn, iters=3):
    import jax

    np.asarray(fn(0))  # warmup/compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = np.asarray(fn(i + 1))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab", action="store_true")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--flops", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backbone", default="sd_v1.5",
                    choices=["sd_v1.5", "sd_xl-turbo", "blip_diffusion",
                             "blip_diffusion-controlnet"],
                    help="sd_xl-turbo profiles the CUB recipe shape "
                         "(2-step gs=0 no-controlnet; pass --steps 2); "
                         "blip_diffusion(-controlnet) the CompCars/Cars/DTD "
                         "recipe (README.md:115)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    batch, res, steps = args.batch, args.res, args.steps
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)

    def runner(pipe, fused, ids, neg_ids):
        def run(i):
            lat = jax.random.normal(jax.random.PRNGKey(i), (batch, res // 8, res // 8, 4), jnp.float32)
            return fused(pipe.params, ids, neg_ids, src, lat)
        return run

    results = {}

    if args.backbone.startswith("blip_diffusion"):
        # the Q-Former + ctx-splice program (same construction as
        # tools/backbone_bench.py / gen/driver.py)
        from saspa_tpu.models.blip_diffusion import BlipDiffusionPipeline

        pipe = BlipDiffusionPipeline(
            controlnet="canny" if args.backbone.endswith("controlnet") else None,
            sampler="ddim", dtype=jnp.bfloat16,
            weights_dir=os.environ.get("SASPA_WEIGHTS"),
        )
        fused = pipe.make_fused_generate(res, res, steps, 7.5, 0.75, 120.0, 200.0)
        ids = pipe.build_subject_prompt_ids(["parked on a mountain road"] * batch, "car")
        neg_ids = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))
        cat_ids, cat_mask = pipe.bert_category_ids("car", batch)
        cat_ids, cat_mask = jnp.asarray(cat_ids), jnp.asarray(cat_mask)
        refs = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))

        def run_full(i):
            lat = jax.random.normal(jax.random.PRNGKey(i), (batch, res // 8, res // 8, 4), jnp.float32)
            return fused(pipe.params, ids, neg_ids, cat_ids, cat_mask, refs, src, lat)

        fused_args = lambda lat: (pipe.params, ids, neg_ids, cat_ids, cat_mask, refs, src, lat)  # noqa: E731
    else:
        is_xl = args.backbone == "sd_xl-turbo"
        pipe, fused, ids, neg_ids = build(
            batch, steps, res,
            controlnet=None if is_xl else "canny",
            gs=0.0 if is_xl else 7.5,
            base_model=args.backbone,
        )
        run_full = runner(pipe, fused, ids, neg_ids)
        fused_args = lambda lat: (pipe.params, ids, neg_ids, src, lat)  # noqa: E731

    if args.ab and args.backbone.startswith("blip_diffusion"):
        # component A/Bs below are SD-specific; for BLIP-D report the
        # program-level number (the trace is the per-bucket treatment)
        results["full_program"] = timed(run_full)
        for k, v in results.items():
            print(f"{k:45s} {v*1000:9.1f} ms")
        print(f"\nimg/s/chip: {batch / results['full_program']:.3f}")
    elif args.ab:
        results["full_30step_cfg_cn"] = timed(run_full)
        # step-count sweep -> per-step marginal cost + fixed overhead
        _, f10, *_ = (lambda p: (p, p.make_fused_generate(res, res, 10, 7.5, 0.75, 120.0, 200.0)))(pipe)
        run10 = runner(pipe, f10, ids, neg_ids)
        results["full_10step_cfg_cn"] = timed(run10)
        per_step = (results["full_30step_cfg_cn"] - results["full_10step_cfg_cn"]) / 20.0
        results["per_step_marginal"] = per_step
        results["fixed_overhead(text+canny+vae+dispatch)"] = results["full_30step_cfg_cn"] - 30 * per_step

        # no controlnet -> isolates ControlNet cost
        pipe_nc, fused_nc, ids2, neg2 = build(batch, steps, res, controlnet=None)
        results["nocn_30step_cfg"] = timed(runner(pipe_nc, fused_nc, ids2, neg2))

        # gs=0 -> no CFG (halves the model batch)
        pipe_g0, fused_g0, ids3, neg3 = build(batch, steps, res, controlnet="canny", gs=0.0)
        results["cn_30step_nocfg"] = timed(runner(pipe_g0, fused_g0, ids3, neg3))

        # VAE decode alone
        z = jax.random.normal(jax.random.PRNGKey(0), (batch, res // 8, res // 8, 4), jnp.float32)
        vdec = jax.jit(lambda p, z: pipe.vae.apply({"params": p}, z, method=type(pipe.vae).decode))
        results["vae_decode"] = timed(lambda i: vdec(pipe.params["vae"], z))

        # text encode alone (cond+uncond)
        te = pipe.text_encoders[0]
        tenc = jax.jit(lambda p, a, b: (te.apply({"params": p}, a), te.apply({"params": p}, b)))
        results["text_encode_x2"] = timed(lambda i: jax.tree_util.tree_leaves(tenc(pipe.params["text"][0], ids, neg_ids))[0])

        # canny alone
        from saspa_tpu.ops.canny import canny_control_image
        cj = jax.jit(lambda s: canny_control_image(s, 120.0, 200.0))
        results["canny"] = timed(lambda i: cj(src))

        for k, v in results.items():
            print(f"{k:45s} {v*1000:9.1f} ms")
        ips = batch / results["full_30step_cfg_cn"]
        print(f"\nimg/s/chip: {ips:.3f}")

    if args.flops:
        lat = jax.random.normal(jax.random.PRNGKey(0), (batch, res // 8, res // 8, 4), jnp.float32)
        # cost-analyze the fused fn itself
        compiled = fused.lower(*fused_args(lat)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = ca.get("flops", float("nan"))
        print(f"\nXLA cost_analysis flops: {fl:.3e} ({fl/1e12:.2f} TFLOP/program, {fl/1e12/batch:.2f} TFLOP/img)")
        if args.ab and "full_30step_cfg_cn" in results:
            t = results["full_30step_cfg_cn"]
            print(f"achieved: {fl/t/1e12:.1f} TFLOPS ({fl/t/1e12/197*100:.0f}% of v5e bf16 peak 197)")

    if args.trace:
        trace_dir = "/tmp/saspa_trace"
        os.system(f"rm -rf {trace_dir}")
        np.asarray(run_full(98))  # compile + warm OUTSIDE the trace window
        with jax.profiler.trace(trace_dir):
            np.asarray(run_full(99))
        planes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
        print("xplane files:", planes)
        if planes:
            summarize_xplane(planes[0])


def summarize_xplane(path):
    """Aggregate device-plane event durations by HLO op category."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    print("planes:", [p.name for p in xspace.planes])
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        stats_meta = plane.stat_metadata
        print(f"\nplane {plane.name} lines:", [(l.name, len(l.events)) for l in plane.lines])
        agg = {}
        total = 0
        for line in plane.lines:
            # only the leaf per-op timeline: scope lines (XLA Modules, the
            # jit_fused region, %while bodies) and async DMA start/done spans
            # overlap compute and double-count if aggregated together
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                dur = ev.duration_ps / 1e12
                # category from stats if present
                cat = None
                for st in ev.stats:
                    sm = stats_meta.get(st.metadata_id)
                    if sm and sm.name in ("category", "hlo_category"):
                        cat = st.str_value or None
                key = cat or name.split(".")[0].split("(")[0]
                agg[key] = agg.get(key, 0.0) + dur
                total += dur
        if not agg:
            continue
        print(f"\n== plane {plane.name} (total {total*1000:.1f} ms of op time)")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {k:50s} {v*1000:9.2f} ms  {v/max(total,1e-12)*100:5.1f}%")
        # top INDIVIDUAL op instances (full names carry shapes) — the grouped
        # view above hides which concrete copies/fusions dominate
        solo = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                # parents (%while spans its whole body) and async DMA spans
                # (slice/copy-start overlap compute) hide the real budget
                if name.startswith(("%while", "%slice-start", "%copy-start", "%slice-done", "%copy-done", "%all-reduce-start")):
                    continue
                solo[name] = solo.get(name, 0.0) + ev.duration_ps / 1e12
        print("  -- top individual ops (excl. parents/async spans) --")
        for k, v in sorted(solo.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {v*1000:9.2f} ms  {k[:140]}")


if __name__ == "__main__":
    main()
