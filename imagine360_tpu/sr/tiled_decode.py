"""360 close-loop tiled + temporally-chunked VAE decode with gaussian
blending (reference sr/video_to_video_model.py:179-245 tiled_chunked_decode,
including the circular latent pre-pad :156-159 for seam-free panoramas)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_weights_1d(n: int, var: float = 0.01) -> np.ndarray:
    """The reference's gaussian tile-blend profile
    (pipeline _gaussian_weights :538-548 / sr model :«same»)."""
    mid = (n - 1) / 2
    x = np.arange(n)
    return (np.exp(-(x - mid) ** 2 / (n * n) / (2 * var))
            / math.sqrt(2 * math.pi * var)).astype(np.float32)


def gaussian_weights_2d(h: int, w: int, var: float = 0.01) -> np.ndarray:
    return np.outer(gaussian_weights_1d(h, var), gaussian_weights_1d(w, var))


def tiled_chunked_decode(decode_fn, latents, tile_hw=(72, 128),
                         overlap: float = 0.25, chunk: int = 5,
                         scale: int = 8, pano_wrap: bool = True):
    """latents [F, h, w, 4] -> frames [F, h*scale, w*scale, 3].

    decode_fn: callable [N, th, tw, 4] -> [N, th*scale, tw*scale, 3].
    Tiles overlap by `overlap` and blend with gaussian weights; frames decode
    in `chunk`-sized temporal groups; the width axis is circularly pre-padded
    so the pano seam decodes continuously when pano_wrap is set.
    """
    F, h, w, c = latents.shape
    pad = 0
    if pano_wrap:
        pad = max(2, tile_hw[1] // 8)
        latents = jnp.concatenate([latents[:, :, -pad:], latents,
                                   latents[:, :, :pad]], axis=2)
        w = w + 2 * pad

    th, tw = min(tile_hw[0], h), min(tile_hw[1], w)
    stride_h = max(1, int(th * (1 - overlap)))
    stride_w = max(1, int(tw * (1 - overlap)))
    ys = list(range(0, max(h - th, 0) + 1, stride_h))
    xs = list(range(0, max(w - tw, 0) + 1, stride_w))
    if ys[-1] + th < h:
        ys.append(h - th)
    if xs[-1] + tw < w:
        xs.append(w - tw)

    weights = jnp.asarray(gaussian_weights_2d(th * scale, tw * scale))
    out = jnp.zeros((F, h * scale, w * scale, 3), jnp.float32)
    den = jnp.zeros((1, h * scale, w * scale, 1), jnp.float32)

    for y in ys:
        for x in xs:
            tile = latents[:, y:y + th, x:x + tw]
            decs = []
            for f0 in range(0, F, chunk):
                decs.append(decode_fn(tile[f0:f0 + chunk]))
            dec = jnp.concatenate(decs, axis=0).astype(jnp.float32)
            wy, wx = y * scale, x * scale
            out = out.at[:, wy:wy + th * scale, wx:wx + tw * scale].add(
                dec * weights[None, :, :, None])
            den = den.at[:, wy:wy + th * scale, wx:wx + tw * scale].add(
                weights[None, :, :, None])
    out = out / jnp.maximum(den, 1e-8)
    if pano_wrap:
        out = out[:, :, pad * scale:-pad * scale]
    return out
