"""Diffusion noise schedulers: DDIM and UniPC, stateless pure-jnp.

The reference swaps diffusers schedulers into its pipelines
(run_aug/run_aug.py:217-228: DDIMScheduler / UniPCMultistepScheduler from the
pipeline's config).  Here scheduler state is an explicit pytree threaded
through `lax.scan`, so the whole denoise loop compiles to one XLA program —
no per-step host dispatch.

Config defaults are the SD v1.5 family (scaled-linear betas 0.00085 -> 0.012,
1000 train steps, prediction_type='epsilon', steps_offset=1, leading timestep
spacing).  SDXL-Turbo uses trailing spacing (run_aug/run_aug.py:226-228).
DDIM here is eta=0 (deterministic), matching the reference usage.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear"
    prediction_type: str = "epsilon"  # or "v_prediction" (SD2.1-768 only)
    steps_offset: int = 1
    timestep_spacing: str = "leading"  # or "trailing"
    set_alpha_to_one: bool = False


def _alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    return np.cumprod(1.0 - betas)


def make_timesteps(cfg: SchedulerConfig, num_inference_steps: int, multistep: bool = False) -> np.ndarray:
    """Descending inference timesteps (int32).

    `multistep=True` reproduces the DPM-Solver-family grid (diffusers
    UniPCMultistepScheduler.set_timesteps): 'leading' spacing there divides by
    n+1 over n+1 points and drops the final t=0 entry, unlike DDIM's T // n —
    the two schedulers genuinely run on different grids for the same n."""
    T = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        if multistep:
            step_ratio = T // (num_inference_steps + 1)
            ts = (np.arange(num_inference_steps + 1) * step_ratio).round().astype(np.int64)
            ts = ts[::-1][:-1] + cfg.steps_offset
        else:
            step_ratio = T // num_inference_steps
            ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)
            ts = ts[::-1] + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(cfg.timestep_spacing)
    return ts.astype(np.int32)


def _pred_x0_eps(cfg: SchedulerConfig, sample, model_output, alpha_t):
    """(x0, eps) from a model output under the configured prediction type."""
    sqrt_a = jnp.sqrt(alpha_t)
    sqrt_1ma = jnp.sqrt(1.0 - alpha_t)
    if cfg.prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_1ma * eps) / sqrt_a
    elif cfg.prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    else:
        raise ValueError(cfg.prediction_type)
    return x0, eps


class DDIMScheduler:
    """Deterministic DDIM (eta=0)."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.alphas_cumprod = jnp.asarray(_alphas_cumprod(cfg), jnp.float32)
        self.final_alpha_cumprod = (
            jnp.asarray(1.0, jnp.float32) if cfg.set_alpha_to_one else self.alphas_cumprod[0]
        )

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        return jnp.asarray(make_timesteps(self.cfg, num_inference_steps))

    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, t):
        return sample

    def init_state(self, num_inference_steps: int, sample_shape: Tuple[int, ...]):
        return ()  # DDIM is memoryless

    def step(self, state, model_output, t, prev_t, sample):
        """One reverse step t -> prev_t. prev_t < 0 means final step."""
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], self.final_alpha_cumprod)
        x0, eps = _pred_x0_eps(self.cfg, sample, model_output, a_t)
        prev_sample = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return state, prev_sample

    def add_noise(self, original, noise, t):
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise


class UniPCScheduler:
    """UniPC multistep, data-prediction mode, bh2 solver, order <= 2.

    Faithful predict-THEN-correct: each step first refines the previous
    predictor's output using the CURRENT model evaluation (the uni_c update —
    a free accuracy boost since the UNet was already run on it), then takes
    the uni_p predictor step toward prev_t.  Matches diffusers'
    UniPCMultistepScheduler defaults (predict_x0=True, solver_type='bh2',
    solver_order=2, lower_order_final=True); the reference swaps that class in
    at run_aug/run_aug.py:217-228.  All history (two x0 predictions, the last
    corrected sample, a step counter) rides in the scan state, keeping the
    denoise loop a single compiled XLA program.
    """

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(), solver_order: int = 2):
        assert solver_order in (1, 2)
        self.cfg = cfg
        self.solver_order = solver_order
        ac = _alphas_cumprod(cfg)
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        return jnp.asarray(make_timesteps(self.cfg, num_inference_steps, multistep=True))

    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, t):
        return sample

    def _abl(self, t):
        """alpha_bar-derived (alpha, sigma, lambda) at a train timestep (>=0 clamp)."""
        a = self.alphas_cumprod[jnp.maximum(t, 0)]
        alpha = jnp.sqrt(a)
        sigma = jnp.sqrt(1 - a)
        lam = jnp.log(alpha) - jnp.log(sigma)
        return alpha, sigma, lam

    def init_state(self, num_inference_steps: int, sample_shape: Tuple[int, ...]):
        zeros = jnp.zeros(sample_shape, jnp.float32)
        return {
            "m_prev": zeros,  # x0 prediction at t_{i-1}
            "t_prev": jnp.asarray(-1, jnp.int32),
            "m_prev2": zeros,  # x0 prediction at t_{i-2}
            "t_prev2": jnp.asarray(-1, jnp.int32),
            "last_sample": zeros,  # corrected sample at t_{i-1}
            "step": jnp.asarray(0, jnp.int32),
            "n_steps": jnp.asarray(num_inference_steps, jnp.int32),
        }

    def _order_at(self, i, n_steps):
        """Predictor order at step i (diffusers warm-up + lower_order_final)."""
        warm = jnp.minimum(i, self.solver_order) + 1
        return jnp.minimum(jnp.minimum(self.solver_order, n_steps - i), warm)

    def step(self, state, model_output, t, prev_t, sample):
        """uni_c corrector (refine `sample` with the current model output),
        then uni_p predictor toward prev_t. prev_t < 0 means final step."""
        cfg = self.cfg
        i = state["step"]
        n = state["n_steps"]
        a_t = self.alphas_cumprod[t]
        # x0 from the UNCORRECTED sample — this is what enters the history,
        # exactly diffusers' convert_model_output-before-corrector ordering
        x0_t, _ = _pred_x0_eps(cfg, sample, model_output, a_t)

        alpha_c, sigma_c, lam_c = self._abl(t)  # current timestep t_i
        alpha_p, sigma_p, lam_p = self._abl(state["t_prev"])  # t_{i-1}

        # ---- uni_c corrector: refine sample at t_i using x0_t -------------
        hc = lam_c - lam_p
        hhc = -hc
        phi1_c = jnp.expm1(hhc)
        Bh_c = phi1_c  # bh2: B(h) = expm1(hh)
        m0c = state["m_prev"]
        d1t = x0_t - m0c
        x_corr_base = (sigma_c / sigma_p) * state["last_sample"] - alpha_c * phi1_c * m0c
        # order-1 corrector: rhos_c = [0.5]
        xc1 = x_corr_base - alpha_c * Bh_c * 0.5 * d1t
        # order-2 corrector: solve [[1,1],[r0,1]] rho = [b1,b2]
        _, _, lam_p2 = self._abl(state["t_prev2"])
        r0c = (lam_p2 - lam_p) / hc
        d10c = (state["m_prev2"] - m0c) / jnp.where(r0c == 0, 1.0, r0c)
        b1c = (phi1_c / hhc - 1.0) / Bh_c
        b2c = ((phi1_c / hhc - 1.0) / hhc - 0.5) * 2.0 / Bh_c
        rho0 = (b1c - b2c) / jnp.where(r0c == 1.0, 1.0, 1.0 - r0c)
        rho1 = b1c - rho0
        xc2 = x_corr_base - alpha_c * Bh_c * (rho0 * d10c + rho1 * d1t)
        # corrector order = previous step's predictor order (diffusers
        # this_order is set at the END of step i-1 and reused by the corrector)
        corr_order = self._order_at(jnp.maximum(i - 1, 0), n)
        corrected = jnp.where(corr_order >= 2, xc2, xc1)
        sample_c = jnp.where(i > 0, corrected, sample)

        # ---- uni_p predictor: t_i -> prev_t -------------------------------
        alpha_n, sigma_n, lam_n = self._abl(prev_t)  # target
        is_final = prev_t < 0
        alpha_n = jnp.where(is_final, 1.0, alpha_n)
        sigma_n = jnp.where(is_final, 0.0, sigma_n)
        lam_n = jnp.where(is_final, 20.0, lam_n)  # lambda -> +inf at sigma 0

        h = lam_n - lam_c
        hh = -h
        phi1 = jnp.expm1(hh)
        Bh = phi1  # bh2
        x_base = (sigma_n / sigma_c) * sample_c - alpha_n * phi1 * x0_t
        # order-2 predictor: rhos_p = [0.5] (diffusers hardcodes it)
        r0 = (lam_p - lam_c) / h
        d10 = (m0c - x0_t) / jnp.where(r0 == 0, 1.0, r0)
        xp2 = x_base - alpha_n * Bh * 0.5 * d10
        p_order = self._order_at(i, n)
        prev_sample = jnp.where((p_order >= 2) & (~is_final), xp2, x_base)

        new_state = {
            "m_prev": x0_t,
            "t_prev": t.astype(jnp.int32) if hasattr(t, "astype") else jnp.asarray(t, jnp.int32),
            "m_prev2": m0c,
            "t_prev2": state["t_prev"],
            "last_sample": sample_c,
            "step": i + 1,
            "n_steps": n,
        }
        return new_state, prev_sample

    def add_noise(self, original, noise, t):
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise


SCHEDULERS = {"ddim": DDIMScheduler, "unipcmultistep": UniPCScheduler}


def get_scheduler(name: str, cfg: Optional[SchedulerConfig] = None):
    cfg = cfg or SchedulerConfig()
    return SCHEDULERS[name](cfg)


def sdedit_start_step(num_inference_steps: int, strength: float) -> int:
    """img2img: skip the first (1-strength) fraction of steps
    (diffusers get_timesteps semantics; reference SDEdit path)."""
    init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
    return max(num_inference_steps - init_timestep, 0)
