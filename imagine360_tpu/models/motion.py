"""AnimateDiff temporal motion module: attention over the frame axis at every
spatial location (reference animatediff/models/motion_module.py).

TPU design note: the whole module runs in the natural [B, F, HW, C] video
layout — the reference's `(b f) d c -> (b d) f c` einops fold
(motion_module.py:346-352) becomes a layout-free kernel concern
(ops/attention.temporal_attention). Profiling showed the explicit fold
forced XLA into lane-major activation layouts that ran every adjacent
matmul (ff, proj_out) at ~25% MXU efficiency.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import (FeedForward, GroupNorm, flat2d,
                     sinusoidal_position_table, Dtype, LayerNorm)
from ..ops.attention import temporal_attention


class _NaturalFrameAttention(nn.Module):
    """Multi-head self-attention over the frame axis of [B, F, HW, C]
    activations; parameter names/tree match layers.Attention (to_q/to_k/
    to_v/to_out_0) so converters and checkpoints are unchanged."""
    query_dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.heads * (self.query_dim // self.heads)
        # NOTE: deliberately NOT flat2d-wrapped. These denses feed the
        # temporal pallas kernel's natural 4D layout directly and compile
        # clean; wrapping them makes XLA fuse the dot with the kernel's
        # [B,F,T,G,C] reshape into a rotated-layout batch-window conv
        # (r4 HLO A/B: clean unwrapped, 6 poisoned convs/site wrapped).
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        out = temporal_attention(q, k, v, self.heads)
        return nn.Dense(self.query_dim, dtype=self.dtype,
                        name="to_out_0")(out)


class TemporalAttention(nn.Module):
    """VersatileAttention(Temporal_Self): tokens are frames; sinusoidal
    positional encoding added pre-attention
    (reference motion_module.py:304-429). Input [B, F, HW, C]."""
    dim: int
    heads: int
    max_len: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, F, HW, C]
        F = x.shape[1]
        pe = sinusoidal_position_table(self.max_len, self.dim)[:F]
        x = x + pe.astype(x.dtype)[None, :, None, :]
        return _NaturalFrameAttention(self.dim, self.heads,
                                      dtype=self.dtype, name="attn")(x)


class TemporalTransformerBlock(nn.Module):
    """Two Temporal_Self attentions + GEGLU FF, each pre-norm + residual
    (reference motion_module.py:188-259). Operates on [B, F, HW, C]."""
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
        # x: [B, F, H, W, C] — stays in natural layout throughout
        B, F, H, W, C = x.shape
        residual = x
        h = GroupNorm(32, 1e-6, inflated=True, dtype=self.dtype,
                      name="norm")(x)
        h = h.reshape(B, F, H * W, C)
        from .layers import MMDense, flat2d_proj
        h = flat2d_proj(MMDense(C, dtype=self.dtype, name="proj_in"), h)
        for i in range(self.num_layers):
            h = TemporalTransformerBlock(C, self.heads, self.max_len,
                                         dtype=self.dtype,
                                         name=f"transformer_blocks_{i}")(h)
        h = flat2d_proj(MMDense(C, kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="proj_out"), h)
        return h.reshape(B, F, H, W, C) + residual
