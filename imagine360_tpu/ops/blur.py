"""Small depthwise gaussian blur (device-side; the reference used kornia
gaussian_blur2d — src/utils/utils.py:26-28 — for mask softening)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gauss_kernel(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_5x5(x: jnp.ndarray, sigma: float = 1.0,
                      wrap_w: bool = False) -> jnp.ndarray:
    """Separable 5x5 blur over the last two axes of [..., H, W].
    Border: replicate vertically; replicate or circular horizontally."""
    k = jnp.asarray(_gauss_kernel(5, sigma))
    # vertical
    xp = jnp.concatenate([x[..., :1, :]] * 2 + [x] + [x[..., -1:, :]] * 2,
                         axis=-2)
    x = sum(k[i] * xp[..., i:i + x.shape[-2], :] for i in range(5))
    # horizontal
    if wrap_w:
        xp = jnp.concatenate([x[..., -2:], x, x[..., :2]], axis=-1)
    else:
        xp = jnp.concatenate([x[..., :1]] * 2 + [x] + [x[..., -1:]] * 2,
                             axis=-1)
    x = sum(k[i] * xp[..., i:i + x.shape[-1]] for i in range(5))
    return x
