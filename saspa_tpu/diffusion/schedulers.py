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


def make_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps (int32)."""
    T = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
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
    """UniPC multistep (B(h) = h variant, data-prediction mode), order <= 2.

    Faithful to UniPCMultistepScheduler's default predict-then-correct update
    with the bh2 solver; history (previous model x0 prediction) rides in the
    scan state, keeping the loop fully compiled.
    """

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(), solver_order: int = 2):
        assert solver_order in (1, 2)
        self.cfg = cfg
        self.solver_order = solver_order
        ac = _alphas_cumprod(cfg)
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
        # sigma/lambda parametrization (DPM-Solver family)
        self.sigmas_all = jnp.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        return jnp.asarray(make_timesteps(self.cfg, num_inference_steps))

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
        return {
            "prev_x0": jnp.zeros(sample_shape, jnp.float32),
            "prev_t": jnp.asarray(-1, jnp.int32),
            "have_prev": jnp.asarray(False),
            "this_x0": jnp.zeros(sample_shape, jnp.float32),  # x0 at current t (for corrector)
            "last_sample": jnp.zeros(sample_shape, jnp.float32),
        }

    def step(self, state, model_output, t, prev_t, sample):
        """Predictor step with 2nd-order correction from history (UniPC-p2)."""
        cfg = self.cfg
        a_t = self.alphas_cumprod[t]
        x0_t, _ = _pred_x0_eps(cfg, sample, model_output, a_t)

        alpha_s, sigma_s, lam_s = self._abl(t)  # current
        alpha_t, sigma_t, lam_t = self._abl(prev_t)  # target (note: "t" = target in UniPC paper)
        is_final = prev_t < 0
        alpha_t = jnp.where(is_final, 1.0, alpha_t)
        sigma_t = jnp.where(is_final, 0.0, sigma_t)
        lam_t = jnp.where(is_final, 20.0, lam_t)  # lambda -> +inf at sigma 0; h large

        h = lam_t - lam_s
        hh = -h  # data-prediction sign convention
        h_phi_1 = jnp.expm1(hh)

        # first-order (DPM-Solver++(1)) base update
        x_base = (sigma_t / sigma_s) * sample - alpha_t * h_phi_1 * x0_t

        # second-order correction using previous x0 (bh2: B(h) = h)
        def corrected():
            _, _, lam_p = self._abl(state["prev_t"])
            r = (lam_p - lam_s) / h
            d1 = (state["prev_x0"] - x0_t) / r
            b = h_phi_1 / hh - 1.0  # phi_2-ish factor under bh2
            return x_base - alpha_t * b * d1

        use2 = state["have_prev"] & (self.solver_order >= 2) & (~is_final)
        prev_sample = jnp.where(use2, corrected(), x_base)

        new_state = {
            "prev_x0": x0_t,
            "prev_t": t,
            "have_prev": jnp.asarray(True),
            "this_x0": x0_t,
            "last_sample": sample,
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
