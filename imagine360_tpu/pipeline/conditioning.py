"""Latent-space conditioning preparation for the dual-branch sampler.

Covers the reference pipeline's init_noise / prepare_masked_latents_pano /
prepare_masked_latents_pers
(reference animatediff/pipelines/pipeline_animation_inference_dual.py:361-473)
as batched device ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.projection import e2p_grids, remap_nearest


def init_shared_noise(rng, batch, frames, equi_hw, pers_hw, cameras,
                      dtype=jnp.float32):
    """One pano noise field per frame; perspective noise is its
    nearest-neighbor ERP->view projection so both branches start from
    *shared randomness* (reference pipeline init_noise :361-387, which uses
    e2p mode='nearest').

    Returns (pano_noise [B, F, eh, ew, 4], pers_noise [B, M, F, h, w, 4]).
    """
    eh, ew = equi_hw
    ph, pw = pers_hw
    pano = jax.random.normal(rng, (batch, frames, eh, ew, 4), jnp.float32)
    gx, gy = e2p_grids(cameras, (eh, ew), (ph, pw))  # [m, ph, pw]
    gx = jnp.asarray(gx)
    gy = jnp.asarray(gy)

    # [B, F, eh, ew, 4] -> channels-leading for the gather: [B, F, 4, eh, ew]
    src = pano.transpose(0, 1, 4, 2, 3)
    # vmap over views: sample every (B, F, 4) map at the view's grid
    pers = jax.vmap(lambda x, y: remap_nearest(src, x, y),
                    in_axes=(0, 0), out_axes=2)(gx, gy)
    # pers: [B, F, M, 4, ph, pw] -> [B, M, F, ph, pw, 4]
    pers = pers.transpose(0, 2, 1, 4, 5, 3)
    return pano.astype(dtype), pers.astype(dtype)


def downsample_mask_nearest(mask, factor: int = 8):
    """Nearest-neighbor mask downsample (torch F.interpolate 'nearest' with
    integer factor == strided subsample; reference pipeline :443-444,467-468).
    mask [..., H, W, C] -> [..., H/f, W/f, C]."""
    return mask[..., ::factor, ::factor, :]


def prepare_masked_latents(vae, vae_params, pixels, rng,
                           scaling: float = 0.18215, chunk: int | None = None,
                           deterministic: bool = False):
    """VAE-encode masked pixel frames to conditioning latents
    (reference pipeline :427-473; the reference loops 8-frame chunks on GPU,
    on TPU we batch everything unless `chunk` forces scan-chunking).

    pixels: [N, H, W, 3] in [-1, 1] -> [N, H/8, W/8, 4] * scaling.
    deterministic=True takes the posterior mean instead of sampling (used by
    parity tests to remove RNG divergence vs the torch reference).
    """
    def encode(frames, key):
        if deterministic:
            mean, _ = vae.apply(vae_params, frames, method=vae.encode)
            return mean * scaling
        return vae.apply(vae_params, frames, key, method=vae.sample) * scaling

    n = pixels.shape[0]
    if chunk is None or chunk >= n:
        return encode(pixels, rng)
    assert n % chunk == 0
    keys = jax.random.split(rng, n // chunk)
    chunks = pixels.reshape(n // chunk, chunk, *pixels.shape[1:])
    out = jax.lax.map(lambda args: encode(*args), (chunks, keys))
    return out.reshape(n, *out.shape[2:])
