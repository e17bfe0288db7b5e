import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.diffusion.schedulers import (
    DDIMScheduler,
    SchedulerConfig,
    UniPCScheduler,
    make_timesteps,
    sdedit_start_step,
)


def test_leading_timesteps_match_diffusers_formula():
    cfg = SchedulerConfig()
    ts = make_timesteps(cfg, 30)
    # diffusers DDIM leading: (arange(30) * 33)[::-1] + 1
    expected = (np.arange(30) * (1000 // 30))[::-1] + 1
    assert np.array_equal(ts, expected)
    assert ts[0] == 958 and ts[-1] == 1


def test_trailing_timesteps_turbo():
    cfg = SchedulerConfig(timestep_spacing="trailing")
    ts = make_timesteps(cfg, 2)
    assert np.array_equal(ts, [999, 499])


def _run_sampler(scheduler, num_steps, x0_true, key_seed=0):
    """Oracle model: returns the exact eps for the current sample given x0_true.
    Any correct epsilon-scheduler must then converge to x0_true."""
    rng = np.random.RandomState(key_seed)
    x = jnp.asarray(rng.randn(*x0_true.shape).astype(np.float32))  # pure noise
    ts = np.asarray(scheduler.timesteps(num_steps))
    state = scheduler.init_state(num_steps, x0_true.shape)
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else -1
        a_t = scheduler.alphas_cumprod[t]
        eps = (x - jnp.sqrt(a_t) * x0_true) / jnp.sqrt(1 - a_t)
        state, x = scheduler.step(state, eps, jnp.asarray(t), jnp.asarray(prev_t), x)
    return np.asarray(x)


def test_ddim_oracle_recovers_x0():
    # with set_alpha_to_one=False the chain ends at t=1 scale, so a residual
    # ~sqrt(1 - abar_0) ~= 0.03 * eps remains — assert convergence to that floor
    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32))
    out = _run_sampler(DDIMScheduler(), 30, x0)
    err = np.abs(out - np.asarray(x0)).mean()
    assert err < 0.05, err


def test_ddim_single_step_trailing_recovers_x0():
    # single-step denoising from pure noise requires trailing spacing (t=999),
    # exactly why sdxl-turbo uses it (run_aug/run_aug.py:226-228)
    cfg = SchedulerConfig(timestep_spacing="trailing")
    x0 = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 4).astype(np.float32))
    out = _run_sampler(DDIMScheduler(cfg), 1, x0)
    err = np.abs(out - np.asarray(x0)).mean()
    assert err < 0.05, err


def test_unipc_oracle_recovers_x0():
    x0 = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 4).astype(np.float32))
    out = _run_sampler(UniPCScheduler(), 30, x0)
    err = np.abs(out - np.asarray(x0)).mean()
    assert err < 0.08, err


def test_add_noise_roundtrip():
    sch = DDIMScheduler()
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.zeros((1, 4, 4, 4))
    noisy = sch.add_noise(x0, noise, jnp.asarray(0))
    assert float(np.asarray(noisy).mean()) == pytest.approx(
        float(jnp.sqrt(sch.alphas_cumprod[0])), abs=1e-6
    )


def test_sdedit_start_step():
    # strength 0.15 of 30 steps -> start at step 26 (skip 26, run 4)
    assert sdedit_start_step(30, 0.15) == 26
    assert sdedit_start_step(30, 1.0) == 0
    assert sdedit_start_step(50, 0.5) == 25
