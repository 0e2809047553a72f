"""360 close-loop video super-resolution orchestration.

Equivalent of the reference's patched VEnhancer driver
(reference sr/enhance_a_video.py:17-126 + sr/video_to_video_model.py:77-177):
bilinear x-up_scale, noise augmentation, diffusion refinement with the width
axis circularly padded (so the pano seam is refined continuously), DPM++ 2M
(optionally SDE) sampling, 360 tiled decode, wavelet color fix.

The refiner denoiser is pluggable: the reference uses the external VEnhancer
UNet; any (latents, t, ctx) -> v/eps callable works — including our pano
UNet branch running pano-padded.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddim import add_noise
from ..diffusion.dpm import make_dpm_schedule, dpmpp_2m_step
from .tiled_decode import tiled_chunked_decode
from .wavelet_fix import wavelet_color_fix


@dataclasses.dataclass(frozen=True)
class EnhancerConfig:
    up_scale: int = 2
    num_steps: int = 15
    noise_aug: int = 250          # noise augmentation level (reference 0-300)
    solver_mode: str = "sde"      # "sde" | "ode" (dpmpp_2m[_sde])
    pano_pad_px: int = 32         # circular pad before refinement (:107)
    chunk_frames: int = 5
    tile_hw: tuple = (72, 128)
    color_fix: bool = True
    prediction_type: str = "v_prediction"


class Video360Enhancer:
    def __init__(self, denoise_fn: Callable, vae, vae_params,
                 cfg: EnhancerConfig = EnhancerConfig()):
        """denoise_fn(latents [F,h,w,4], t [1], rng) -> model prediction.

        A refiner object exposing .prepare(clean_latents) -> fn (e.g.
        sr/refiner.py PanoRefiner) may be passed instead of a bare fn: the
        clean latents of the upsampled source clip are handed to prepare()
        before noise augmentation, so the refiner can condition on them."""
        self.denoise_fn = denoise_fn
        self.vae = vae
        self.vae_params = vae_params
        self.cfg = cfg
        self.schedule = make_dpm_schedule(cfg.num_steps,
                                          cfg.prediction_type)

    def _vae_encode(self, frames, rng):
        z = self.vae.apply(self.vae_params, frames, rng,
                           method=self.vae.sample)
        return z * self.vae.cfg.scaling_factor

    def _vae_decode_tile(self, z):
        return self.vae.apply(self.vae_params,
                              z / self.vae.cfg.scaling_factor,
                              method=self.vae.decode)

    def __call__(self, frames: np.ndarray, rng) -> np.ndarray:
        """frames [F, H, W, 3] in [0, 1] -> [F, H*s, W*s, 3] in [0, 1]."""
        cfg = self.cfg
        F, H, W, _ = frames.shape
        import cv2
        up = np.stack([cv2.resize(f, (W * cfg.up_scale, H * cfg.up_scale),
                                  interpolation=cv2.INTER_LINEAR)
                       for f in frames])
        x = jnp.asarray(up * 2.0 - 1.0)

        # circular pad width so the refinement sees the wrap seam
        p = cfg.pano_pad_px
        x = jnp.concatenate([x[:, :, -p:], x, x[:, :, :p]], axis=2)

        rng, k_enc, k_aug = jax.random.split(rng, 3)
        z = self._vae_encode(x, k_enc)

        # conditioned refiners receive the clean latents before noise-aug
        denoise_fn = self.denoise_fn
        if hasattr(denoise_fn, "prepare"):
            denoise_fn = denoise_fn.prepare(z)

        # noise augmentation to t = noise_aug
        from ..diffusion.ddim import make_ddim_schedule
        base = make_ddim_schedule(num_inference_steps=cfg.num_steps)
        acp = jnp.asarray(base.alphas_cumprod)
        t_aug = jnp.full((1,), cfg.noise_aug, jnp.int32)
        z = add_noise(z, jax.random.normal(k_aug, z.shape), acp,
                      t_aug[:, None, None, None])

        coeffs = {k: jnp.asarray(v) for k, v in
                  self.schedule.step_coeffs().items()}
        # only refine from noise_aug downward
        start = int(np.searchsorted(-self.schedule.timesteps,
                                    -cfg.noise_aug))
        x0_prev = jnp.zeros_like(z)
        for i in range(start, cfg.num_steps):
            rng, k_m, k_n = jax.random.split(rng, 3)
            pred = denoise_fn(z, coeffs["timestep"][i][None], k_m)
            noise = (jax.random.normal(k_n, z.shape)
                     if cfg.solver_mode == "sde" else None)
            z, x0_prev = dpmpp_2m_step(z, pred, i, coeffs, x0_prev,
                                       cfg.prediction_type, sde_noise=noise)

        # the latents already carry the circular pad, so the tiled decode
        # doesn't need to wrap again; crop the pad in pixel space after
        dec = tiled_chunked_decode(
            self._vae_decode_tile, z, tile_hw=cfg.tile_hw,
            chunk=cfg.chunk_frames, pano_wrap=False)
        if p:
            dec = dec[:, :, p:-p]
        out = np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1), np.float32)

        if cfg.color_fix:
            out = np.asarray(wavelet_color_fix(jnp.asarray(out),
                                               jnp.asarray(up)), np.float32)
        return out
