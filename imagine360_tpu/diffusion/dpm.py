"""DPM-Solver++ (2M, deterministic and SDE) as pure scanned functions.

The reference's super-resolution stage samples with dpmpp_2m_sde over 15
steps (reference sr/video_to_video_model.py:138-152). This implements the
standard multistep DPM-Solver++ update in data-prediction form over the same
(alpha, sigma) schedule family used by the DDIM module.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import make_ddim_schedule


@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    timesteps: np.ndarray       # [S]
    alpha: np.ndarray           # [S+1] sqrt(alpha_bar), appended final
    sigma: np.ndarray           # [S+1] sqrt(1-alpha_bar)
    prediction_type: str

    def step_coeffs(self):
        lam = np.log(np.clip(self.alpha, 1e-20, None)) - \
            np.log(np.clip(self.sigma, 1e-20, None))
        return {
            "timestep": self.timesteps.astype(np.int32),
            "alpha": self.alpha.astype(np.float32),
            "sigma": self.sigma.astype(np.float32),
            "lam": lam.astype(np.float32),
        }


def make_dpm_schedule(num_inference_steps: int,
                      prediction_type: str = "v_prediction",
                      **ddim_kwargs) -> DPMSchedule:
    base = make_ddim_schedule(num_inference_steps=num_inference_steps,
                              prediction_type=prediction_type, **ddim_kwargs)
    acp = base.alphas_cumprod[base.timesteps]
    # final step targets alpha_bar = 1 (clean sample)
    acp = np.concatenate([acp, [1.0 - 1e-12]])
    return DPMSchedule(
        timesteps=base.timesteps,
        alpha=np.sqrt(acp),
        sigma=np.sqrt(1.0 - acp),
        prediction_type=prediction_type,
    )


def _to_x0(x, model_out, alpha, sigma, prediction_type):
    if prediction_type == "epsilon":
        return (x - sigma * model_out) / alpha
    if prediction_type == "v_prediction":
        return alpha * x - sigma * model_out
    if prediction_type == "sample":
        return model_out
    raise ValueError(prediction_type)


def dpmpp_2m_step(x, model_out, i, coeffs, x0_prev, prediction_type,
                  sde_noise=None):
    """One DPM++ 2M update. i is the (traced) step index into coeffs arrays
    of length S (+1 for the target values). Returns (x_next, x0)."""
    a_t = coeffs["alpha"][i]
    s_t = coeffs["sigma"][i]
    a_s = coeffs["alpha"][i + 1]
    s_s = coeffs["sigma"][i + 1]
    lam_t = coeffs["lam"][i]
    lam_s = coeffs["lam"][i + 1]
    h = lam_s - lam_t

    x0 = _to_x0(x.astype(jnp.float32), model_out.astype(jnp.float32),
                a_t, s_t, prediction_type)

    # second-order correction using the previous x0 (falls back to first
    # order on step 0 where x0_prev is x0)
    lam_prev = coeffs["lam"][jnp.maximum(i - 1, 0)]
    h_prev = jnp.where(i > 0, lam_t - lam_prev, h)
    r = h_prev / jnp.where(h == 0, 1.0, h)
    d = jnp.where(i > 0,
                  (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev,
                  x0)

    if sde_noise is None:
        x_next = (s_s / s_t) * x + a_s * (1 - jnp.exp(-h)) * d
    else:
        # SDE variant (eta=1): extra noise with matched marginals
        e2h = jnp.exp(-2.0 * h)
        x_next = ((s_s / s_t) * e2h ** 0.5 * x
                  + a_s * (1 - jnp.exp(-h)) * d  # mean part approx (2M-SDE)
                  + s_s * jnp.sqrt(1 - e2h) * sde_noise)
    return x_next.astype(x.dtype), x0
