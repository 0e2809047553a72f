"""SD2.1 AutoencoderKL (f8, 4-channel latents, scale 0.18215) in Flax.

Re-implements the subset of diffusers' AutoencoderKL the reference pipeline
exercises (reference diffusers/models/vae.py:501-638: encode with diagonal
gaussian sampling, decode; config: block_out_channels (128, 256, 512, 512),
layers_per_block 2, latent_channels 4).

TPU notes: channels-last NHWC convs; frame batches fold into N so the VAE
runs as one large conv stack per chunk instead of the reference's per-frame
python loop (reference pipeline_animation_inference_dual.py:306-308). The
360° circular-pad decode variant wraps the width axis
(pipeline...:813-815).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import Dtype, _FastGN


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = _FastGN(self.groups, 1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = _FastGN(self.groups, 1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if cin != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (diffusers VAE
    mid-block Attention)."""
    channels: int
    dtype: Dtype = jnp.float32
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _FastGN(self.groups, 1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        o = dot_product_attention(q[:, :, None, :], k[:, :, None, :],
                                  v[:, :, None, :])[:, :, 0, :]
        o = nn.Dense(C, dtype=self.dtype, name="to_out_0")(o)
        return x + o.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        from ..parallel.mesh import shard_views
        c = self.cfg
        # multi-chip: every VAE op is frame-independent, so sharding the
        # leading (frame) axis divides the whole encode over the mesh; the
        # constraint is a no-op without an active mesh
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    dtype=c.jdtype, name="conv_in")(shard_views(x))
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = VAEResnetBlock(ch, c.jdtype, c.norm_num_groups,
                                   name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                # diffusers Downsample2D: asymmetric (0,1) pad + stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=c.jdtype,
                            name=f"down_blocks_{i}_downsamplers_0_conv")(h)
        ch = c.block_out_channels[-1]
        h = VAEResnetBlock(ch, c.jdtype, c.norm_num_groups,
                           name="mid_block_resnets_0")(h)
        h = VAEAttention(ch, c.jdtype, c.norm_num_groups,
                         name="mid_block_attentions_0")(h)
        h = VAEResnetBlock(ch, c.jdtype, c.norm_num_groups,
                           name="mid_block_resnets_1")(h)
        h = _FastGN(c.norm_num_groups, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                       dtype=c.jdtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        from ..parallel.mesh import shard_views
        c = self.cfg
        ch = c.block_out_channels[-1]
        # multi-chip: decode shards its frame axis like the encoder (also
        # bounds per-device activation memory at full resolution)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=c.jdtype,
                    name="conv_in")(shard_views(z))
        h = VAEResnetBlock(ch, c.jdtype, c.norm_num_groups,
                           name="mid_block_resnets_0")(h)
        h = VAEAttention(ch, c.jdtype, c.norm_num_groups,
                         name="mid_block_attentions_0")(h)
        h = VAEResnetBlock(ch, c.jdtype, c.norm_num_groups,
                           name="mid_block_resnets_1")(h)
        rev = list(reversed(c.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                h = VAEResnetBlock(ch, c.jdtype, c.norm_num_groups,
                                   name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch, (3, 3), padding=1, dtype=c.jdtype,
                            name=f"up_blocks_{i}_upsamplers_0_conv")(h)
        h = _FastGN(c.norm_num_groups, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=c.jdtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode(x) -> (mean, logvar); decode(z) -> image. NHWC."""
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.cfg.jdtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.cfg.jdtype)

    def encode(self, x):
        """x [N, H, W, 3] -> (mean, logvar) each [N, H/8, W/8, 4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample(self, x, rng):
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        """z [N, h, w, 4] -> [N, 8h, 8w, 3]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        z = self.sample(x, rng)
        return self.decode(z)
