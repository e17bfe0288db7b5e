"""Standalone microbenches for the two hot kernels the trace indicts:
level-0 self-attention (bh=64, L=4096, d_pad=64 — 33% of wall) and
GroupNorm statistics (22% of wall at ~4% of HBM bandwidth).

Compiles are seconds here (vs ~10 min for the fused program), so kernel
iteration happens in this harness; the fused-program A/B runs once at the end.

python -m tools.kernel_bench [attn|gn|all]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, trials=3, r_small=4, r_big=260):
    """Differential per-op timing: run `fn` chained r_small and r_big times
    inside one jitted program and divide the time DELTA by (r_big-r_small).
    The axon relay adds a large, noisy per-call overhead (RTTs + slow
    tunnel); the delta cancels it. min-of-trials suppresses relay jitter."""

    def make(r):
        def chained(*a):
            def body(i, x):
                return fn(x, *a[1:])
            return jax.lax.fori_loop(0, r, body, a[0])
        return jax.jit(chained)

    def run(cf):
        best = float("inf")
        out = cf(*args)
        _sync(out)
        for _ in range(trials):
            t0 = time.perf_counter()
            _sync(cf(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_big = run(make(r_small)), run(make(r_big))
    return max(t_big - t_small, 1e-9) / (r_big - r_small)


def _sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jnp.sum(x))  # 1-element fetch forces completion


# --------------------------------------------------------------- attention
def bench_attention():
    from saspa_tpu.ops import attention as A

    shapes = [  # (bh, l, d_pad, label)
        (64, 4096, 64, "level0 d40->64"),
        (64, 1024, 128, "level1 d80->128"),
        (64, 256, 192, "level2 d160->192"),
    ]
    for bh, l, d, label in shapes:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (bh, l, d), jnp.bfloat16)
        k = jax.random.normal(kq, (bh, l, d), jnp.bfloat16)
        v = jax.random.normal(kq, (bh, l, d), jnp.bfloat16)
        flops = 4.0 * bh * l * l * d  # qk + av

        # ours, block sweep
        for bq in (256, 512, 1024):
            for bkv in (512, 1024, 2048):
                if bq > l or bkv > l or l % bq or l % bkv:
                    continue
                f = jax.jit(functools.partial(A._flash_attention_padded, block_q=bq, block_kv=bkv))
                try:
                    dt = timeit(f, q, k, v)
                    print(f"{label:20s} ours bq={bq:4d} bkv={bkv:4d}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOPS")
                except Exception as e:
                    print(f"{label:20s} ours bq={bq:4d} bkv={bkv:4d}: FAIL {type(e).__name__} {str(e)[:80]}")

        # packed-heads kernel (production path), block_q sweep
        try:
            from saspa_tpu.ops.attention import flash_attention_packed

            b_, h_ = 8, bh // 8
            qp = q.reshape(b_, h_, l, d).transpose(0, 2, 1, 3).reshape(b_, l, h_ * d)
            kp = k.reshape(b_, h_, l, d).transpose(0, 2, 1, 3).reshape(b_, l, h_ * d)
            vp = v.reshape(b_, h_, l, d).transpose(0, 2, 1, 3).reshape(b_, l, h_ * d)
            for bq in (128, 256, 512):
                if bq > l or l % bq:
                    continue
                f = jax.jit(functools.partial(flash_attention_packed, heads=h_, block_q=bq))
                try:
                    dt = timeit(f, qp, kp, vp)
                    print(f"{label:20s} packed bq={bq:4d}       : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOPS")
                except Exception as e:
                    print(f"{label:20s} packed bq={bq:4d}: FAIL {type(e).__name__} {str(e)[:80]}")
        except ImportError:
            pass

        # jax builtin pallas flash attention (wants (b, h, l, d))
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention as jfa,
            )

            qb = q.reshape(8, 8, l, d)
            kb = k.reshape(8, 8, l, d)
            vb = v.reshape(8, 8, l, d)
            f = jax.jit(functools.partial(jfa, causal=False, sm_scale=1.0))
            dt = timeit(f, qb, kb, vb)
            print(f"{label:20s} jax-builtin default    : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOPS")
        except Exception as e:
            print(f"{label:20s} jax-builtin: FAIL {type(e).__name__} {str(e)[:100]}")

        # XLA reference
        def xla(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            return jnp.einsum("bqk,bkd->bqd", p, v)

        dt = timeit(jax.jit(xla), q, k, v)
        print(f"{label:20s} xla                    : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOPS")
        print()


# --------------------------------------------------------------- groupnorm
def bench_gn():
    import flax.linen as nn

    shapes = [  # (b, h, w, c) CFG batch 8
        (8, 64, 64, 320),
        (8, 32, 32, 640),
        (8, 16, 16, 1280),
        (8, 64, 64, 640),
    ]
    for b, h, w, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        bytes_rw = 2 * x.size * 2  # bf16 in + out

        mod32 = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
        modbf = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
        p32 = mod32.init(jax.random.PRNGKey(1), x.astype(jnp.float32))
        pbf = modbf.init(jax.random.PRNGKey(1), x)

        def gn_fp32(x, gamma, beta):
            # exactly models.unet.GroupNorm32: cast up, flax GN fp32, cast back
            return mod32.apply(p32, x.astype(jnp.float32)).astype(x.dtype)

        def gn_silu_fp32(x, gamma, beta):
            o = gn_fp32(x, gamma, beta)
            return nn.silu(o)

        def gn_bf16(x, gamma, beta):
            return modbf.apply(pbf, x)

        dt = timeit(jax.jit(gn_fp32), x, gamma, beta)
        print(f"GN {b}x{h}x{w}x{c:5d} flax-fp32    : {dt*1e3:7.3f} ms  {bytes_rw/dt/1e9:6.0f} GB/s")
        dt = timeit(jax.jit(gn_silu_fp32), x, gamma, beta)
        print(f"GN {b}x{h}x{w}x{c:5d} flax-fp32+si : {dt*1e3:7.3f} ms  {bytes_rw/dt/1e9:6.0f} GB/s")
        dt = timeit(jax.jit(gn_bf16), x, gamma, beta)
        print(f"GN {b}x{h}x{w}x{c:5d} flax-bf16    : {dt*1e3:7.3f} ms  {bytes_rw/dt/1e9:6.0f} GB/s")

        try:
            from saspa_tpu.ops.groupnorm import group_norm as pgn

            f = jax.jit(functools.partial(pgn, num_groups=32, eps=1e-5, activation=None))
            dt = timeit(f, x, gamma, beta)
            print(f"GN {b}x{h}x{w}x{c:5d} pallas       : {dt*1e3:7.3f} ms  {bytes_rw/dt/1e9:6.0f} GB/s")
            f = jax.jit(functools.partial(pgn, num_groups=32, eps=1e-5, activation="silu"))
            dt = timeit(f, x, gamma, beta)
            print(f"GN {b}x{h}x{w}x{c:5d} pallas+silu  : {dt*1e3:7.3f} ms  {bytes_rw/dt/1e9:6.0f} GB/s")
        except ImportError:
            print("  (no pallas GN yet)")
        print()


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("attn", "all"):
        bench_attention()
    if what in ("gn", "all"):
        bench_gn()
