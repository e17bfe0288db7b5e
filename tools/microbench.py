"""Component-level TPU micro-benchmark for the generation pipeline.

Times each stage of the canny-ControlNet SD1.5 @512 path in isolation:
UNet denoise step, ControlNet step, VAE decode (fp32 vs bf16), Canny, text
encode, and Pallas-vs-XLA attention — to direct kernel optimization work.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(os.environ.get("MB_BATCH", "4"))
    res = int(os.environ.get("MB_RES", "512"))
    lat = res // 8
    results = {}

    # --- UNet + ControlNet single step (bf16) ---
    from saspa_tpu.models.controlnet import ControlNet
    from saspa_tpu.models.unet import SD15_UNET, UNet2DCondition

    for use_pallas in (True, False):
        os.environ["SASPA_DISABLE_PALLAS"] = "" if use_pallas else "1"
        import saspa_tpu.ops.attention as A

        A._DISABLE = not use_pallas  # runtime switch (see attention.py)

        unet = UNet2DCondition(cfg=SD15_UNET, dtype=jnp.bfloat16)
        x = jnp.zeros((batch * 2, lat, lat, 4), jnp.float32)
        t = jnp.zeros((batch * 2,), jnp.int32)
        ctx = jnp.zeros((batch * 2, 77, 768), jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), x[:1], t[:1], ctx[:1])["params"]
        step = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
        dt = timeit(step, params, x, t, ctx)
        results[f"unet_step_bf16_pallas={use_pallas}"] = dt
        del params

    A._DISABLE = False

    cn = ControlNet(cfg=SD15_UNET, dtype=jnp.bfloat16)
    cond = jnp.zeros((batch * 2, res, res, 3), jnp.float32)
    x = jnp.zeros((batch * 2, lat, lat, 4), jnp.float32)
    t = jnp.zeros((batch * 2,), jnp.int32)
    ctx = jnp.zeros((batch * 2, 77, 768), jnp.float32)
    cnp = cn.init(jax.random.PRNGKey(1), x[:1], t[:1], ctx[:1], cond[:1])["params"]
    cstep = jax.jit(lambda p, x, t, c, ci: cn.apply({"params": p}, x, t, c, ci, 0.75))
    results["controlnet_step_bf16"] = timeit(cstep, cnp, x, t, ctx, cond)
    del cnp

    # --- VAE decode fp32 vs bf16 ---
    from saspa_tpu.models.vae import AutoencoderKL, SD_VAE

    z = jnp.zeros((batch, lat, lat, 4), jnp.float32)
    for dt_name, dt_ in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        vae = AutoencoderKL(cfg=SD_VAE, dtype=dt_)
        vp = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))["params"]
        dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=AutoencoderKL.decode))
        results[f"vae_decode_{dt_name}"] = timeit(dec, vp, z)
        del vp

    # --- canny (noise = worst case; photo-like = typical) ---
    from saspa_tpu.ops.canny import canny_batch

    noise = jnp.asarray(np.random.RandomState(0).rand(batch, res, res, 3) * 255, jnp.float32)
    smooth = jnp.asarray(
        np.tile(np.linspace(0, 255, res, dtype=np.float32)[None, :, None], (res, 1, 3))[None], jnp.float32
    ).repeat(batch, 0)
    results["canny_noise"] = timeit(lambda x: canny_batch(x, 120.0, 200.0), noise)
    results["canny_smooth"] = timeit(lambda x: canny_batch(x, 120.0, 200.0), smooth)

    # --- text encode ---
    from saspa_tpu.models.text_encoder import CLIPTextEncoder, SD15_TEXT

    te = CLIPTextEncoder(cfg=SD15_TEXT, dtype=jnp.bfloat16)
    ids = jnp.zeros((batch * 2, 77), jnp.int32)
    tp = te.init(jax.random.PRNGKey(3), ids[:1])["params"]
    tstep = jax.jit(lambda p, i: te.apply({"params": p}, i)["hidden"])
    results["text_encode"] = timeit(tstep, tp, ids)

    print(f"\n=== microbench batch={batch} res={res} (seconds/call) ===")
    for k, v in results.items():
        print(f"{k:40s} {v * 1000:9.2f} ms")
    steps = 30
    unet = results.get("unet_step_bf16_pallas=True", 0)
    total = steps * (unet + results["controlnet_step_bf16"]) + results["vae_decode_fp32"] + results["canny_noise"] + results["text_encode"]
    print(f"\nestimated pipeline: {total:.2f}s/batch -> {batch / total:.3f} img/s/chip")


if __name__ == "__main__":
    main()
