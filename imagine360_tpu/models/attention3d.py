"""Per-frame spatial transformer with text + image-prompt cross attention
(reference animatediff/models/attention.py: Transformer3DModel /
BasicTransformerBlock / IPCrossAttention)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import Attention, IPCrossAttention, FeedForward, GroupNorm, Dtype, LayerNorm


class SpatialTransformerBlock(nn.Module):
    """norm1 -> self-attn -> norm2 -> (IP)cross-attn -> norm3 -> GEGLU FF,
    each with a residual (reference attention.py:323-508)."""
    dim: int
    heads: int
    dim_head: int
    use_ip: bool = True
    ip_scale: float = 1.0
    num_ip_tokens: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x: [B', S, C]; context: [B', L(+num_ip_tokens), C]
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = Attention(self.dim, self.heads, self.dim_head, dtype=self.dtype,
                      name="attn1")(h) + x
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.use_ip:
            text_ctx = context[:, :-self.num_ip_tokens]
            ip_ctx = context[:, -self.num_ip_tokens:]
            x = IPCrossAttention(self.dim, self.heads, self.dim_head,
                                 scale=self.ip_scale, dtype=self.dtype,
                                 name="attn2")(h, text_ctx, ip_ctx) + x
        else:
            x = Attention(self.dim, self.heads, self.dim_head,
                          dtype=self.dtype, name="attn2")(h, context) + x
        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(h) + x
        return x


class Transformer3DModel(nn.Module):
    """GroupNorm -> linear proj_in -> N blocks -> linear proj_out + residual,
    flattened per frame (reference attention.py:170-301,
    use_linear_projection=True as in configs/prompt-dual.yaml:34)."""
    heads: int
    dim_head: int
    num_layers: int = 1
    use_ip: bool = True
    ip_scale: float = 1.0
    num_ip_tokens: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x: [B, F, H, W, C]; context: [B, L, C] (broadcast over frames)
        B, F, H, W, C = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = GroupNorm(32, 1e-6, inflated=True, dtype=self.dtype,
                      name="norm")(x)
        h = h.reshape(B * F, H * W, C)
        from .layers import MMDense, flat2d_proj
        h = flat2d_proj(MMDense(inner, dtype=self.dtype, name="proj_in"), h)
        ctx = jnp.repeat(context, F, axis=0)  # [B*F, L, C]
        for i in range(self.num_layers):
            h = SpatialTransformerBlock(
                inner, self.heads, self.dim_head, use_ip=self.use_ip,
                ip_scale=self.ip_scale, num_ip_tokens=self.num_ip_tokens,
                dtype=self.dtype, name=f"transformer_blocks_{i}")(h, ctx)
        h = flat2d_proj(MMDense(C, dtype=self.dtype, name="proj_out"), h)
        return h.reshape(B, F, H, W, C) + residual
