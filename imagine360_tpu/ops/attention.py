"""Fused multi-head attention for TPU.

Single entry point `dot_product_attention(q, k, v, bias=None)` used by every
attention site in the framework (replaces the reference's
xformers.ops.memory_efficient_attention calls, e.g.
reference src/modules/transformer.py:72 and
diffusers/models/attention_processor.py:636).

Dispatch:
- On TPU, moderately long sequences route to a Pallas flash-attention kernel
  (ops/pallas_attention.py) that never materializes the [Sq, Sk] matrix in
  HBM and supports an additive bias (the WarpAttn correspondence masks).
- Elsewhere (CPU tests, tiny sequences) an einsum reference path is used;
  XLA fuses it well for short sequences and it is numerically identical.

Layout: q [B, Sq, H, D], k/v [B, Sk, H, D], bias broadcastable to
[B, H, Sq, Sk]. Softmax is computed in float32 regardless of input dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _reference_attention(q, k, v, bias=None, scale=None):
    B, Sq, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray | None = None,
                          scale: float | None = None) -> jnp.ndarray:
    """Multi-head attention; returns [B, Sq, H, D] in q.dtype."""
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4, (q.shape, k.shape)
    use_pallas = _on_tpu() and q.shape[1] >= 256 and k.shape[1] >= 256
    if use_pallas:
        try:
            from .pallas_attention import flash_attention
            return flash_attention(q, k, v, bias=bias, scale=scale)
        except Exception:
            pass  # fall back to the XLA path (e.g. odd shapes)
    return _reference_attention(q, k, v, bias=bias, scale=scale)
