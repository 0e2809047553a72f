"""Wavelet color transfer: keep the upscaled frame's high frequencies but the
source frame's color distribution (reference sr/inference_utils.py:46-94)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _blur_dilated(x, radius: int):
    """3x3 dilated gaussian used by the wavelet pyramid (kernel
    [[1,2,1],[2,4,2],[1,2,1]]/16 with dilation=radius, replicate padding —
    reference inference_utils.py wavelet_blur uses F.pad mode='replicate')."""
    k1 = jnp.asarray([1.0, 2.0, 1.0]) / 4.0

    def conv1d(v, axis):
        pad = [(0, 0)] * v.ndim
        pad[axis] = (radius, radius)
        vp = jnp.pad(v, pad, mode="edge")
        n = v.shape[axis]
        sl = lambda o: jax.lax.slice_in_dim(vp, o, o + n, axis=axis)
        return k1[0] * sl(0) + k1[1] * sl(radius) + k1[2] * sl(2 * radius)

    x = conv1d(x, 1)
    x = conv1d(x, 2)
    return x


def wavelet_decompose(x, levels: int = 5):
    """x [F, H, W, C] -> (high_freq, low_freq)."""
    high = jnp.zeros_like(x)
    low = x
    for i in range(levels):
        radius = 2 ** i
        smoothed = _blur_dilated(low, radius)
        high = high + (low - smoothed)
        low = smoothed
    return high, low


def wavelet_color_fix(target, source, levels: int = 5):
    """target's detail + source's color (both [F, H, W, C] in [0,1])."""
    t_high, _ = wavelet_decompose(target, levels)
    _, s_low = wavelet_decompose(source, levels)
    return jnp.clip(t_high + s_low, 0.0, 1.0)
