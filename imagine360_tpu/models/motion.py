"""AnimateDiff temporal motion module: attention over the frame axis at every
spatial location (reference animatediff/models/motion_module.py)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import (Attention, FeedForward, GroupNorm,
                     sinusoidal_position_table, Dtype, LayerNorm)


class TemporalAttention(nn.Module):
    """VersatileAttention(Temporal_Self): tokens are frames; sinusoidal
    positional encoding added pre-attention
    (reference motion_module.py:304-429)."""
    dim: int
    heads: int
    max_len: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B*, F, C]
        F = x.shape[1]
        pe = sinusoidal_position_table(self.max_len, self.dim)[:F]
        x = x + pe.astype(x.dtype)[None]
        return Attention(self.dim, self.heads, self.dim // self.heads,
                         dtype=self.dtype, name="attn")(x)


class TemporalTransformerBlock(nn.Module):
    """Two Temporal_Self attentions + GEGLU FF, each pre-norm + residual
    (reference motion_module.py:188-259)."""
    dim: int
    heads: int
    max_len: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            h = LayerNorm(dtype=self.dtype, name=f"norms_{i}")(x)
            x = TemporalAttention(self.dim, self.heads, self.max_len,
                                  dtype=self.dtype,
                                  name=f"attention_blocks_{i}")(h) + x
        h = LayerNorm(dtype=self.dtype, name="ff_norm")(x)
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(h) + x
        return x


class MotionModule(nn.Module):
    """VanillaTemporalModule / TemporalTransformer3DModel: GroupNorm ->
    proj_in -> temporal blocks over the frame axis -> zero-init proj_out +
    residual (reference motion_module.py:52-185; config
    prompt-dual.yaml:23-30: 8 heads, 1 block, PE max_len 64)."""
    heads: int = 8
    num_layers: int = 1
    max_len: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, F, H, W, C]
        B, F, H, W, C = x.shape
        residual = x
        h = GroupNorm(32, 1e-6, inflated=True, dtype=self.dtype,
                      name="norm")(x)
        h = h.reshape(B, F, H * W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        # frames become the sequence axis: [B * HW, F, C]
        h = h.transpose(0, 2, 1, 3).reshape(B * H * W, F, C)
        for i in range(self.num_layers):
            h = TemporalTransformerBlock(C, self.heads, self.max_len,
                                         dtype=self.dtype,
                                         name=f"transformer_blocks_{i}")(h)
        h = h.reshape(B, H * W, F, C).transpose(0, 2, 1, 3)
        h = nn.Dense(C, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="proj_out")(h)
        return h.reshape(B, F, H, W, C) + residual
