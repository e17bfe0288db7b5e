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


def test_unipc_oracle_few_step():
    # predict-then-correct must converge at 10 steps where the old
    # predictor-only variant left ~0.05+ error (VERDICT round-1 item 3)
    x0 = jnp.asarray(np.random.RandomState(5).randn(2, 8, 8, 4).astype(np.float32))
    out = _run_sampler(UniPCScheduler(), 10, x0)
    err = np.abs(out - np.asarray(x0)).mean()
    assert err < 0.03, err


class _NumpyUniPC:
    """Independent stateful transcription of diffusers UniPCMultistepScheduler
    (predict_x0, bh2, lower_order_final, epsilon prediction) with Python lists
    and general-order linear solves — a structurally different implementation
    used purely as a cross-check oracle for the scan-state version."""

    def __init__(self, alphas_cumprod, solver_order=2):
        self.ac = np.asarray(alphas_cumprod, np.float64)
        self.order = solver_order
        self.model_outputs = []
        self.timestep_list = []
        self.last_sample = None
        self.lower_order_nums = 0
        self.this_order = None

    def _abl(self, t):
        a = self.ac[max(int(t), 0)] if t >= 0 else None
        if t < 0:
            return 1.0, 0.0, 20.0  # boundary convention shared with the jnp impl
        alpha = np.sqrt(a)
        sigma = np.sqrt(1 - a)
        return alpha, sigma, np.log(alpha) - np.log(sigma)

    def _x0(self, sample, eps, t):
        a = self.ac[int(t)]
        return (sample - np.sqrt(1 - a) * eps) / np.sqrt(a)

    def _coeffs(self, h, order, rks):
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh)  # bh2
        h_phi_k = h_phi_1 / hh - 1
        factorial_i = 1
        R, b = [], []
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        return np.array(R), np.array(b), h_phi_1, B_h

    def uni_c(self, this_x0, last_sample, this_sample, t, order):
        s0 = self.timestep_list[-1]
        _, sigma_s0, lam_s0 = self._abl(s0)
        alpha_t, sigma_t, lam_t = self._abl(t)
        m0 = self.model_outputs[-1]
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.timestep_list[-(i + 1)]
            mi = self.model_outputs[-(i + 1)]
            _, _, lam_si = self._abl(si)
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._coeffs(h, order, np.array(rks))
        rhos_c = np.array([0.5]) if order == 1 else np.linalg.solve(R, b)
        x_t_ = (sigma_t / sigma_s0) * last_sample - alpha_t * h_phi_1 * m0
        corr = sum(r * d for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0.0
        D1_t = this_x0 - m0
        return x_t_ - alpha_t * B_h * (corr + rhos_c[-1] * D1_t)

    def uni_p(self, sample, t_prev, order):
        s0 = self.timestep_list[-1]
        _, sigma_s0, lam_s0 = self._abl(s0)
        alpha_t, sigma_t, lam_t = self._abl(t_prev)
        m0 = self.model_outputs[-1]
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.timestep_list[-(i + 1)]
            mi = self.model_outputs[-(i + 1)]
            _, _, lam_si = self._abl(si)
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._coeffs(h, order, np.array(rks))
        if D1s:
            rhos_p = np.array([0.5]) if order == 2 else np.linalg.solve(R[:-1, :-1], b[:-1])
            pred = sum(r * d for r, d in zip(rhos_p, D1s))
        else:
            pred = 0.0
        x_t_ = (sigma_t / sigma_s0) * sample - alpha_t * h_phi_1 * m0
        return x_t_ - alpha_t * B_h * pred

    def step(self, eps, t, t_prev, sample, step_index, n_steps):
        x0 = self._x0(sample, eps, t)
        if step_index > 0 and self.last_sample is not None:
            sample = self.uni_c(x0, self.last_sample, sample, t, self.this_order)
        self.model_outputs.append(x0)
        self.timestep_list.append(t)
        self.model_outputs = self.model_outputs[-self.order:]
        self.timestep_list = self.timestep_list[-self.order:]
        this_order = min(self.order, n_steps - step_index)
        self.this_order = min(this_order, self.lower_order_nums + 1)
        self.last_sample = sample
        out = self.uni_p(sample, t_prev, self.this_order)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        return out


@pytest.mark.parametrize("n_steps", [3, 10, 30])
def test_unipc_matches_stateful_reference_impl(n_steps):
    sch = UniPCScheduler()
    ref = _NumpyUniPC(np.asarray(sch.alphas_cumprod))
    shape = (1, 4, 4, 4)
    rng = np.random.RandomState(7)
    x0_true = rng.randn(*shape).astype(np.float32)
    x_j = jnp.asarray(rng.randn(*shape).astype(np.float32))
    x_n = np.asarray(x_j, np.float64)
    ts = np.asarray(sch.timesteps(n_steps))
    state = sch.init_state(n_steps, shape)
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else -1
        a_t = float(sch.alphas_cumprod[t])
        eps_j = (x_j - np.sqrt(a_t) * x0_true) / np.sqrt(1 - a_t)
        eps_n = (x_n - np.sqrt(a_t) * x0_true) / np.sqrt(1 - a_t)
        state, x_j = sch.step(state, eps_j, jnp.asarray(t), jnp.asarray(prev_t), x_j)
        x_n = ref.step(eps_n, int(t), int(prev_t), x_n, i, n_steps)
        np.testing.assert_allclose(np.asarray(x_j), x_n, rtol=2e-3, atol=2e-4,
                                   err_msg=f"diverged at step {i}/{n_steps}")


def test_timestep_grids_match_diffusers():
    """DDIM 'leading' divides by n (DDIMScheduler.set_timesteps T//n); the
    multistep solvers divide by n+1 over n+1 points and drop the final 0
    (UniPCMultistepScheduler.set_timesteps) — different grids for the same n."""
    d = np.asarray(DDIMScheduler().timesteps(50))
    u = np.asarray(UniPCScheduler().timesteps(50))
    assert d[0] == 981 and d[-1] == 1 and len(d) == 50  # 1000//50=20 spacing
    assert u[0] == 951 and u[-1] == 20 and len(u) == 50  # 1000//51=19 spacing
    assert np.all(np.diff(d) == -20) and np.all(np.diff(u) == -19)


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
