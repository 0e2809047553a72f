"""Inflated ResNet blocks and spatial up/down sampling
(reference animatediff/models/resnet.py)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import InflatedConv, GroupNorm, Dtype


class ResnetBlock3D(nn.Module):
    """norm1 -> silu -> conv1 -> (+temb) -> norm2 -> silu -> conv2 (+shortcut)
    (reference resnet.py:143-254). Operates on [B, F, H, W, C]."""
    out_channels: int
    use_inflated_groupnorm: bool = True
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, self.use_inflated_groupnorm,
                      self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = InflatedConv(self.out_channels, 3, 1, 1, dtype=self.dtype,
                         name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, None, :]
        h = GroupNorm(self.groups, self.eps, self.use_inflated_groupnorm,
                      self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = InflatedConv(self.out_channels, 3, 1, 1, dtype=self.dtype,
                         name="conv2")(h)
        if in_channels != self.out_channels:
            x = InflatedConv(self.out_channels, 1, 1, 0, dtype=self.dtype,
                             name="conv_shortcut")(x)
        return x + h


class Downsample3D(nn.Module):
    """Stride-2 3x3 conv, torch padding=1 (reference resnet.py:117-140)."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return InflatedConv(self.out_channels, 3, 2, 1, dtype=self.dtype,
                            name="conv")(x)


class Upsample3D(nn.Module):
    """Nearest x2 spatial upsample + 3x3 conv (reference resnet.py:71-114).
    (The reference's bf16->f32 cast for interpolate is a CUDA kernel
    limitation; XLA handles nearest-neighbor natively in any dtype.)"""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return InflatedConv(self.out_channels, 3, 1, 1, dtype=self.dtype,
                            name="conv")(x)


class TemporalConvBlock(nn.Module):
    """Temporal (frame-axis) conv residual block: 4x [GroupNorm -> silu ->
    (3,1,1) conv over frames], zero-init last conv, identity residual
    (reference animatediff/models/resnet.py TemporalConvBlock — constructed
    by some AnimateDiff variants but unused by the Imagine360 inference
    path; provided for architecture-config parity). [B, F, H, W, C]."""
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        out_c = self.out_channels or C
        h = x
        for i in range(4):
            ch = out_c
            h = GroupNorm(32, 1e-6, inflated=False, dtype=self.dtype,
                          name=f"norm_{i}")(h)
            h = nn.silu(h)
            # conv over the frame axis only: kernel (3,1,1) on [F, H, W]
            hp = h.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, ch
                                                    if i else C)
            kernel = self.param(f"conv_{i}_kernel",
                                nn.initializers.zeros if i == 3
                                else nn.initializers.lecun_normal(),
                                (3, hp.shape[-1], ch), jnp.float32)
            bias = self.param(f"conv_{i}_bias", nn.initializers.zeros,
                              (ch,), jnp.float32)
            import jax
            y = jax.lax.conv_general_dilated(
                hp.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            y = y + bias.astype(self.dtype)
            h = y.reshape(B, H, W, F, ch).transpose(0, 3, 1, 2, 4)
        return x + h
