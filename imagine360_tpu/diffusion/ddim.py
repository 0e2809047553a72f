"""DDIM sampler as pure functions over a precomputed schedule.

Replicates the subset of diffusers' DDIMScheduler the reference exercises
(reference diffusers/schedulers/scheduling_ddim.py; config from
configs/prompt-dual.yaml:48-56): linear betas 0.00085->0.012, 1000 train
steps, v-prediction, zero-terminal-SNR rescale, steps_offset=1,
clip_sample=False, eta=0.

TPU-first design: the schedule is a small frozen pytree of arrays; per-step
coefficients are gathered by timestep index inside `jax.lax.scan`, so the
whole denoise loop compiles to a single XLA while-loop with no host sync.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale, https://arxiv.org/abs/2305.08891 alg. 1
    (reference scheduling_ddim.py:77-110)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    abar_sqrt = np.sqrt(alphas_cumprod)

    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()

    abar_sqrt = abar_sqrt - abar_sqrt_T
    abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)

    abar = abar_sqrt ** 2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed inference schedule (host numpy; small)."""
    timesteps: np.ndarray          # [S] int32, descending
    alphas_cumprod: np.ndarray     # [T] float32
    final_alpha_cumprod: float
    num_train_timesteps: int
    num_inference_steps: int
    prediction_type: str
    clip_sample: bool

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def step_coeffs(self) -> dict:
        """Per-inference-step coefficient arrays [S], ready to be scanned."""
        t = self.timesteps
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        a_t = self.alphas_cumprod[t]
        a_prev = np.where(prev_t >= 0,
                          self.alphas_cumprod[np.clip(prev_t, 0, None)],
                          self.final_alpha_cumprod).astype(np.float32)
        return {
            "timestep": t.astype(np.int32),
            "alpha_prod_t": a_t.astype(np.float32),
            "alpha_prod_t_prev": a_prev,
        }


def make_ddim_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "linear",
    steps_offset: int = 1,
    prediction_type: str = "v_prediction",
    rescale_betas_zero_snr: bool = True,
    set_alpha_to_one: bool = True,
    clip_sample: bool = False,
) -> DDIMSchedule:
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    else:
        raise ValueError(f"unsupported beta_schedule {beta_schedule!r}")

    if rescale_betas_zero_snr:
        betas = _rescale_zero_terminal_snr(betas)

    alphas_cumprod = np.cumprod(1.0 - betas)
    final_alpha_cumprod = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])

    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()
    timesteps = timesteps[::-1].astype(np.int64) + steps_offset

    return DDIMSchedule(
        timesteps=timesteps.astype(np.int32),
        alphas_cumprod=alphas_cumprod.astype(np.float32),
        final_alpha_cumprod=final_alpha_cumprod,
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
        prediction_type=prediction_type,
        clip_sample=clip_sample,
    )


def ddim_step(model_output: jnp.ndarray,
              sample: jnp.ndarray,
              alpha_prod_t: jnp.ndarray,
              alpha_prod_t_prev: jnp.ndarray,
              prediction_type: str = "v_prediction",
              clip_sample: bool = False) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM update x_t -> x_{t-1}.

    Matches reference scheduling_ddim.py step() formulas (12)/(16). The
    alpha coefficients are scalars gathered from DDIMSchedule.step_coeffs()
    (so this is scannable with traced step indices).
    """
    dtype = sample.dtype
    a_t = jnp.asarray(alpha_prod_t, dtype=jnp.float32)
    a_prev = jnp.asarray(alpha_prod_t_prev, dtype=jnp.float32)
    b_t = 1.0 - a_t
    x = sample.astype(jnp.float32)
    out = model_output.astype(jnp.float32)

    if prediction_type == "epsilon":
        pred_x0 = (x - jnp.sqrt(b_t) * out) / jnp.sqrt(a_t)
        pred_eps = out
    elif prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(a_t) * x - jnp.sqrt(b_t) * out
        pred_eps = jnp.sqrt(a_t) * out + jnp.sqrt(b_t) * x
    elif prediction_type == "sample":
        pred_x0 = out
        pred_eps = (x - jnp.sqrt(a_t) * pred_x0) / jnp.sqrt(b_t)
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")

    if clip_sample:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

    prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * pred_eps
    return prev.astype(dtype)


def ddim_inverse_step(model_output: jnp.ndarray,
                      sample: jnp.ndarray,
                      alpha_prod_t: jnp.ndarray,
                      alpha_prod_t_next: jnp.ndarray,
                      prediction_type: str = "v_prediction") -> jnp.ndarray:
    """Deterministic DDIM inversion x_t -> x_{t+1} (the reference ships
    unused inversion helpers at animatediff/utils/util.py:166-222; provided
    here as a first-class editing/debug tool)."""
    return ddim_step(model_output, sample, alpha_prod_t, alpha_prod_t_next,
                     prediction_type=prediction_type)


def add_noise(sample: jnp.ndarray, noise: jnp.ndarray,
              alphas_cumprod: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Forward-process noising (for training / masked-latent conditioning)."""
    a = alphas_cumprod[timesteps].astype(jnp.float32)
    while a.ndim < sample.ndim:
        a = a[..., None]
    return (jnp.sqrt(a) * sample.astype(jnp.float32)
            + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)).astype(sample.dtype)


def get_velocity(sample: jnp.ndarray, noise: jnp.ndarray,
                 alphas_cumprod: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """v-prediction target: v = sqrt(a)*eps - sqrt(1-a)*x0."""
    a = alphas_cumprod[timesteps].astype(jnp.float32)
    while a.ndim < sample.ndim:
        a = a[..., None]
    return (jnp.sqrt(a) * noise.astype(jnp.float32)
            - jnp.sqrt(1.0 - a) * sample.astype(jnp.float32)).astype(sample.dtype)
