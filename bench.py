"""Benchmark: canny-ControlNet SD v1.5 @512 generation throughput per chip.

Measures the full per-image generation work of the SaSPA pipeline's headline
config (run_aug defaults for FGVC-Aircraft: SD1.5 + canny ControlNet, 512²,
30 DDIM steps, CFG 7.5, controlnet scale 0.75 — run_aug/run_aug.py:520-545):
on-device Canny -> text encode -> 30-step CFG denoise loop (UNet+ControlNet
x2 batch) -> VAE decode, batched.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star (2 augs/image for FGVC-Aircraft's 6667
train images in <10 min on v5e-8) = 2.78 images/sec/chip.

PROCESS STRUCTURE: the parent never initializes a TPU backend.  The
program-level measurement runs in a child process (BENCH_CHILD=1) and the
sustained soak spawns its own `cli gen` child — strictly one chip client at
a time.  Holding a live client in the parent while a child grabs the chip
wedges the axon relay for the lease duration (observed 2026-08-21).
"""

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_PER_SEC_PER_CHIP = 13334 / 600.0 / 8.0  # 2.78


def program_level():
    """Child mode: measure the fused program rate and print one JSON line."""
    import jax

    # the axon sitecustomize force-sets jax_platforms at interpreter start,
    # which silently overrides the JAX_PLATFORMS env var — honor it here so
    # CPU smoke runs actually stay off the chip
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from saspa_tpu.diffusion.pipelines import DiffusionPipeline

    batch = int(os.environ.get("BENCH_BATCH", "8"))  # A/B: 8 beat 4 by 1.2%
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    res = int(os.environ.get("BENCH_RES", "512"))

    pipe = DiffusionPipeline(
        base_model="sd_v1.5", controlnet="canny", sampler="ddim",
        dtype=jnp.bfloat16, weights_dir=os.environ.get("SASPA_WEIGHTS"),
    )

    rng = np.random.RandomState(0)
    if os.environ.get("BENCH_SMOOTH") == "1":
        # photo-like smooth gradient: canny hysteresis converges quickly
        g = np.linspace(0, 255, res, dtype=np.float32)
        src = np.stack([np.tile(g, (res, 1))] * 3, -1)[None].repeat(batch, 0)
        src_images = jnp.asarray(src)
    else:
        src_images = jnp.asarray(rng.rand(batch, res, res, 3).astype(np.float32) * 255.0)
    prompts = ["a photo of a Boeing 737-700 airplane, a painting of monet"] * batch

    # one fused program per batch: canny + text encode + 30-step scan + decode
    fused = pipe.make_fused_generate(res, res, steps, 7.5, 0.75, 120.0, 200.0)
    ids = jnp.asarray(pipe.tokenizer(prompts, pad="eot"))
    neg_ids = jnp.asarray(pipe.tokenizer([""] * batch, pad="eot"))

    def run(key):
        latents = jax.random.normal(key, (batch, res // 8, res // 8, 4), jnp.float32)
        return fused(pipe.params, ids, neg_ids, src_images, latents)

    # warmup / compile; NOTE: under the axon relay block_until_ready() does not
    # reliably synchronize — materialize with np.asarray, which also matches
    # production behavior (the driver pulls images to host to save PNGs)
    out = np.asarray(run(jax.random.PRNGKey(0)))

    # pipelined like the production driver (gen/driver.py): dispatch batch
    # i+1 BEFORE materializing batch i, so the host fetch/PNG side overlaps
    # device compute instead of serializing with it
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    pending = run(jax.random.PRNGKey(1))
    for i in range(1, iters):
        nxt = run(jax.random.PRNGKey(i + 1))
        out = np.asarray(pending)
        pending = nxt
    out = np.asarray(pending)
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    images_per_sec_per_chip = (batch * iters) / dt / n_chips
    assert out.dtype == np.uint8 and out.shape == (batch, res, res, 3), (out.dtype, out.shape)
    from saspa_tpu.utils import bench_conditions

    result = {
        "metric": "images/sec/chip, canny-ControlNet SD1.5 @512, 30-step DDIM CFG",
        "value": round(images_per_sec_per_chip, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(images_per_sec_per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        # numbers are only comparable across rounds with the config surface
        # recorded alongside them (r3 compared across a kernel-default flip)
        "conditions": bench_conditions(pipe),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


def main():
    if os.environ.get("BENCH_CHILD") == "1":
        program_level()
        return

    # ---- parent: no jax backend; serialize the two chip-using children ----
    env = dict(os.environ, BENCH_CHILD="1")
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True)
    result = None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            result = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if result is None:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise SystemExit(f"program-level bench child failed (rc={r.returncode})")
    backend = result.pop("backend", "")

    # sustained: the REAL `cli gen` loop (worklist, JPEG decode, dispatch
    # pipeline, relay fetch, PNG encode) held at steady state — the number a
    # production job actually sees (tools/soak.py; BENCH_SOAK=0 skips,
    # BENCH_SOAK_IMAGES sizes it; `python -m tools.soak` runs the full
    # >=1,000-aug version).  Failure is reported, never fatal to the line.
    if os.environ.get("BENCH_SOAK", "1") == "1" and backend != "cpu":
        try:
            from tools.soak import run_soak

            n_soak = int(os.environ.get("BENCH_SOAK_IMAGES", "128"))
            tele = run_soak(n_soak, num_per_image=2,
                            batch_size=int(os.environ.get("BENCH_BATCH", "8")))
            result["sustained"] = {
                "img_per_s_per_chip": tele.get("steady_img_per_s"),
                "augs": tele.get("total"),
                "vs_program_level": (
                    round(tele["steady_img_per_s"] / result["value"], 4)
                    if tele.get("steady_img_per_s") else None),
                "host_overhead_s": {k: tele.get(k) for k in
                                    ("worklist_s", "decode_s", "dispatch_s",
                                     "fetch_s", "png_s")},
            }
        except BaseException as e:  # noqa: BLE001 - the headline line must survive
            result["sustained"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
