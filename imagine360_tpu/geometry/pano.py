"""360° horizontal continuity helpers: circular (wrap) padding of ERP width.

The reference wraps every panorama conv in pad_pano/unpad_pano
(reference src/utils/pano.py:75-101, used throughout src/models/MVGenModel.py).
On TPU this is a jnp.pad(mode='wrap') on the last axis; inside the models we
instead bake wrap padding directly into the conv (see models/layers.py), which
XLA handles as a fused pad+conv — these functions remain for pipeline-level
uses (pre-VAE-decode padding, mask blurring).
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_pano(pano: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Circularly pad the last (width) axis by `padding` on both sides."""
    if padding <= 0:
        return pano
    pad_width = [(0, 0)] * (pano.ndim - 1) + [(padding, padding)]
    return jnp.pad(pano, pad_width, mode="wrap")


def unpad_pano(pano: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Crop `padding` columns from both sides of the last axis."""
    if padding <= 0:
        return pano
    return pano[..., padding:-padding]
