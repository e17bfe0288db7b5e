"""Component-level TPU micro-benchmark for the generation pipeline.

Measurement methodology: under the axon relay, `block_until_ready()` does NOT
reliably synchronize, so naive per-call timing measures dispatch only.  Each
component is therefore timed as a K-step `lax.scan` chain inside ONE jit with
a single host materialization at the end — per-step time = total / K, with
dispatch+fetch amortized away.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.utils import enable_compilation_cache

enable_compilation_cache()

K = int(os.environ.get("MB_CHAIN", "10"))


def chain_time(step_fn, x0, iters=2):
    """step_fn: x -> x (same shape). Returns seconds per step."""

    def chained(x):
        def body(lat, _):
            return step_fn(lat), None

        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    cj = jax.jit(chained)
    _ = np.asarray(cj(x0))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(cj(x0))
    return (time.perf_counter() - t0) / (iters * K)


def once_time(fn, *args, iters=3):
    """Time a fn whose output shape differs from input (no chaining):
    measures execute+fetch; subtract nothing — treat as upper bound."""
    _ = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(os.environ.get("MB_BATCH", "4"))
    res = int(os.environ.get("MB_RES", "512"))
    lat = res // 8
    results = {}

    from saspa_tpu.models.controlnet import ControlNet
    from saspa_tpu.models.unet import SD15_UNET, UNet2DCondition

    ctx = jnp.zeros((batch * 2, 77, 768), jnp.float32)
    t = jnp.zeros((batch * 2,), jnp.int32)

    for use_pallas in (True, False):
        # flip the trace-time escape hatch (attention._disabled reads env)
        if use_pallas:
            os.environ.pop("SASPA_DISABLE_PALLAS", None)
        else:
            os.environ["SASPA_DISABLE_PALLAS"] = "1"
        unet = UNet2DCondition(cfg=SD15_UNET, dtype=jnp.bfloat16)
        x = jnp.zeros((batch * 2, lat, lat, 4), jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), x[:1], t[:1], ctx[:1])["params"]
        results[f"unet_step_pallas={use_pallas}"] = chain_time(
            lambda lat_: unet.apply({"params": params}, lat_, t, ctx), x
        )
        del params
    os.environ.pop("SASPA_DISABLE_PALLAS", None)

    cn = ControlNet(cfg=SD15_UNET, dtype=jnp.bfloat16)
    cond = jnp.zeros((batch * 2, res, res, 3), jnp.float32)
    x = jnp.zeros((batch * 2, lat, lat, 4), jnp.float32)
    cnp = cn.init(jax.random.PRNGKey(1), x[:1], t[:1], ctx[:1], cond[:1])["params"]

    # controlnet output shape differs; keep the chain shape-stable by folding
    # a reduced residual back into the latent
    def cn_chain(lat_):
        down, mid = cn.apply({"params": cnp}, lat_, t, ctx, cond, 0.75)
        # fold a reduction of the residuals back into the latent to keep shape
        delta = jnp.mean(mid, axis=-1, keepdims=True)
        delta = jax.image.resize(delta, (lat_.shape[0], lat_.shape[1], lat_.shape[2], 1), "nearest")
        return lat_ + delta

    results["controlnet_step"] = chain_time(cn_chain, x)
    del cnp

    from saspa_tpu.models.vae import AutoencoderKL, SD_VAE

    for dt_name, dt_ in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        vae = AutoencoderKL(cfg=SD_VAE, dtype=dt_)
        vp = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))["params"]
        results[f"vae_decode_{dt_name}"] = once_time(
            jax.jit(lambda z: vae.apply({"params": vp}, z, method=AutoencoderKL.decode)),
            jnp.zeros((batch, lat, lat, 4), jnp.float32),
        )
        del vp

    from saspa_tpu.ops.canny import canny_batch

    noise = jnp.asarray(np.random.RandomState(0).rand(batch, res, res, 3) * 255, jnp.float32)
    results["canny_noise_once"] = once_time(lambda x_: canny_batch(x_, 120.0, 200.0), noise)

    from saspa_tpu.models.text_encoder import CLIPTextEncoder, SD15_TEXT

    te = CLIPTextEncoder(cfg=SD15_TEXT, dtype=jnp.bfloat16)
    ids = jnp.zeros((batch * 2, 77), jnp.int32)
    tp = te.init(jax.random.PRNGKey(3), ids[:1])["params"]
    results["text_encode_once"] = once_time(jax.jit(lambda i: te.apply({"params": tp}, i)["hidden"]), ids)

    print(f"\n=== microbench batch={batch} res={res} chain={K} (per step/call) ===")
    for k, v in results.items():
        print(f"{k:32s} {v * 1000:9.2f} ms")
    steps = 30
    total = steps * (results["unet_step_pallas=True"] + results["controlnet_step"]) + results["vae_decode_fp32"] + results["canny_noise_once"] + results["text_encode_once"]
    print(f"\nestimated denoise pipeline: {total:.2f}s/batch -> {batch / total:.3f} img/s/chip")


if __name__ == "__main__":
    main()
