"""Default SR refiner engine: the panorama UNet branch as the denoiser.

The reference refines with the external VEnhancer UNet
(reference sr/video_to_video_model.py:61-152) — a 1.4B video diffusion
model whose weights are a separate external download. Here the framework's
own pano UNet branch is wired as the default refiner engine instead:

recipe
  - conditioning: the pano branch's 9-channel outpaint interface
    (conv_in = [latent 4 | mask 1 | masked-latent 4], reference
    unet.py:134-137) is reused for full-frame refinement conditioning:
    mask = 0 everywhere (nothing to outpaint) and the masked-latent slots
    carry the CLEAN latents of the bilinear-upsampled source clip — the
    same role VEnhancer's concat-conditioning plays
    (video_to_video_model.py:119-137).
  - noise aug: handled by Video360Enhancer (forward-noise to t=noise_aug,
    refine downward), matching the reference's noise_aug 0-300 band.
  - CFG over text: [negative; positive] pair, scale
    guidance_scale (the reference SR uses guide_scale 7.5,
    video_to_video_model.py:145).
  - 360 continuity: the pano branch runs pano_pad=True (circular pad
    around every conv), on latents that additionally carry the enhancer's
    pixel-space circular pad.

Any other denoiser (e.g. a ported VEnhancer UNet) still plugs into
Video360Enhancer via the same `prepare` protocol.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PanoRefinerConfig:
    guidance_scale: float = 7.5   # reference sr guide_scale
    fps: float = 8.0
    pano_pad: bool = True


class PanoRefiner:
    """Builds a Video360Enhancer-compatible denoiser from a pano-branch
    UNet3DConditionModel + params."""

    def __init__(self, unet, params, text_pos=None, text_neg=None,
                 cfg: PanoRefinerConfig = PanoRefinerConfig()):
        """text_pos/text_neg: [L, D] prompt embeddings (zeros when no text
        encoder is loaded — CFG then degenerates gracefully)."""
        self.unet = unet
        self.params = params
        self.cfg = cfg
        D = unet.cfg.cross_attention_dim
        if text_pos is None:
            text_pos = jnp.zeros((77, D), jnp.float32)
        if text_neg is None:
            text_neg = jnp.zeros_like(text_pos)
        self.text2 = jnp.stack([text_neg, text_pos])   # CFG [2, L, D]

        g = cfg.guidance_scale
        use_fps = unet.cfg.use_fps_condition
        # CFG is a no-op when g==1 or both prompts are identical (the
        # default SR CLI wires no text encoder, so text_neg == text_pos ==
        # zeros and u == c — the doubled UNet pass would cost 2x for
        # nothing); run a single conditional pass instead
        cfg_active = (g != 1.0
                      and not bool(jnp.all(text_pos == text_neg)))

        def step(params, z, z_cond, t, text2):
            # z, z_cond: [F, h, w, 4]; CFG pair on the batch axis
            zin = jnp.concatenate(
                [z, jnp.zeros_like(z[..., :1]), z_cond], axis=-1)
            n = 2 if cfg_active else 1
            x = jnp.stack([zin] * n)                    # [n, F, h, w, 9]
            tv = jnp.full((n,), t, jnp.float32)
            fps = (jnp.full((n,), cfg.fps, jnp.float32)
                   if use_fps else None)
            # single pass uses the POSITIVE prompt (g==1 reduces CFG to the
            # conditional pass; identical prompts make the choice moot)
            pred = self.unet.apply(params, x, tv,
                                   text2 if cfg_active else text2[1:],
                                   fps=fps, pad=cfg.pano_pad)
            if not cfg_active:
                return pred[0].astype(z.dtype)
            u, c = pred[0], pred[1]
            return (u + g * (c - u)).astype(z.dtype)

        self._step = jax.jit(step)

    def prepare(self, z_clean):
        """Video360Enhancer hook: receives the CLEAN latents of the
        (padded, upsampled) source clip before noise augmentation; returns
        the per-step denoise fn."""
        z_cond = z_clean

        def denoise_fn(z, t, rng):
            return self._step(self.params, z, z_cond, t[0], self.text2)

        return denoise_fn

    # allow PanoRefiner to be passed where a bare fn is expected: without
    # prepare() having run, condition on zeros (pure generation mode)
    def __call__(self, z, t, rng):
        return self._step(self.params, z, jnp.zeros_like(z), t[0],
                          self.text2)
