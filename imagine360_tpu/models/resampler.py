"""Perceiver resampler + temporal projection for image-prompt (IP-plus)
conditioning from SAM video features
(reference animatediff/models/resampler.py)."""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import Attention, Dtype, LayerNorm


class ResamplerFeedForward(nn.Module):
    """LayerNorm -> Linear -> GELU -> Linear (no biases)
    (reference resampler.py:15-22)."""
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = LayerNorm(dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="net_1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="net_3")(x)
        return x


class PerceiverAttention(nn.Module):
    """Latents attend to concat(x, latents)
    (reference resampler.py:36-80)."""
    dim: int
    heads: int = 12
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.heads * self.dim_head
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        latents = LayerNorm(dtype=self.dtype, name="norm2")(latents)
        B, L, _ = latents.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        S = k.shape[1]
        out = dot_product_attention(
            q.reshape(B, L, self.heads, self.dim_head),
            k.reshape(B, S, self.heads, self.dim_head),
            v.reshape(B, S, self.heads, self.dim_head),
        ).reshape(B, L, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class Resampler(nn.Module):
    """Learned latent queries -> 4 perceiver layers -> ip tokens
    (reference resampler.py:83-160; config: dim 1024, depth 4, heads 12,
    dim_head 64, num_queries 64, output_dim 1024)."""
    dim: int = 1024
    depth: int = 4
    heads: int = 12
    dim_head: int = 64
    num_queries: int = 64
    embedding_dim: int = 1024
    output_dim: int = 1024
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, S, embedding_dim] -> [B, num_queries, output_dim]
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / self.dim ** 0.5,
            (1, self.num_queries, self.dim))
        latents = jnp.broadcast_to(latents, (x.shape[0],) + latents.shape[1:])
        latents = latents.astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.heads, self.dim_head, dtype=self.dtype,
                name=f"layers_{i}_0")(x, latents) + latents
            latents = ResamplerFeedForward(
                self.dim, self.ff_mult, dtype=self.dtype,
                name=f"layers_{i}_1")(latents) + latents
        latents = nn.Dense(self.output_dim, dtype=self.dtype,
                           name="proj_out")(latents)
        return LayerNorm(dtype=self.dtype, name="norm_out")(latents)


class TemporalProjection(nn.Module):
    """SAM per-frame features -> spatially patch-compressed, temporally
    self-attended and average-pooled video tokens
    (reference resampler.py:194-266; SAM: dim=256 -> spatial 4x4 patch embed
    to 1024, two attention+pool(4) stages)."""
    dim: int = 256
    heads: int = 8
    dim_head: int = 64
    kernel_size: int = 4
    compress_video_features: bool = True
    dtype: Dtype = jnp.float32

    @property
    def spatial_compress(self) -> bool:
        return self.dim < 1024  # SAM features (reference resampler.py:199)

    @nn.compact
    def __call__(self, x):
        # x: [B, F, D, C] (D spatial tokens per frame)
        B, F, D, C = x.shape
        if self.spatial_compress:
            hw = int(math.isqrt(D))
            h = x.reshape(B * F, hw, hw, C)
            k = self.kernel_size
            kernel = self.param("patch_embed_kernel",
                                nn.initializers.lecun_normal(),
                                (k, k, C, self.dim * 4), jnp.float32)
            bias = self.param("patch_embed_bias", nn.initializers.zeros,
                              (self.dim * 4,), jnp.float32)
            h = jax.lax.conv_general_dilated(
                h.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(k, k), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(self.dtype)
            D = (hw // k) ** 2
            C = self.dim * 4
            x = h.reshape(B, F, D, C)

        def temporal_attn(x, attn_name, norm_name):
            # [B, F, D, C] -> attention over F at each spatial token
            h = x.transpose(0, 2, 1, 3).reshape(B * D, x.shape[1], C)
            hn = LayerNorm(dtype=self.dtype, name=norm_name)(h)
            h = Attention(C, self.heads, self.dim_head, dtype=self.dtype,
                          name=attn_name)(hn) + h
            return h.reshape(B, D, x.shape[1], C).transpose(0, 2, 1, 3)

        def pool_frames(x):
            # non-overlapping mean over groups of kernel_size frames
            Bq, Fq, Dq, Cq = x.shape
            g = Fq // self.kernel_size
            return x[:, :g * self.kernel_size].reshape(
                Bq, g, self.kernel_size, Dq, Cq).mean(axis=2)

        x = temporal_attn(x, "attn_temp", "norm_temp")
        x = ResamplerFeedForward(C, dtype=self.dtype, name="ff")(
            LayerNorm(dtype=self.dtype, name="norm1")(x)) + x

        if self.compress_video_features:
            x = pool_frames(x)
            x = temporal_attn(x, "attn_temp_2", "norm_temp_2")
            x = ResamplerFeedForward(C, dtype=self.dtype, name="ff_2")(
                LayerNorm(dtype=self.dtype, name="norm2")(x)) + x
            x = pool_frames(x)
        return x
