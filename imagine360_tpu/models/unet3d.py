"""AnimateDiff-style inflated 3D UNet (SD2.1 backbone + motion modules +
IP-plus image conditioning + outpaint channels), as composable Flax blocks.

Mirrors reference animatediff/models/unet.py + unet_blocks.py with the
hyperparameters of configs/prompt-dual.yaml: block_out_channels
(320, 640, 1280, 1280), 2 layers/block, heads (5, 10, 20, 20) x dim_head 64,
cross_attention_dim 1024, v-prediction 9-channel conv_in (4 latent + 1 mask +
4 masked latent), fps conditioning, relative-position 'WithAdapter', IP-plus
video conditioning via SAM features, inflated group norms.

TPU-first differences from the reference:
- channels-last [B, F, H, W, C] layout; frames fold into the batch for all
  spatial ops so convs/matmuls stay large and MXU-friendly
- panorama 360° continuity is a `pad` argument on each block that wrap-pads
  the width axis around convs (replacing the pad_pano/unpad_pano calls
  sprinkled through reference src/models/MVGenModel.py:135-479) — numerics
  are identical, including GroupNorm statistics over the padded columns
- blocks are standalone callables so the dual-branch coupler can walk both
  UNets in lockstep without re-implementing the layer loop
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (InflatedConv, GroupNorm, TimestepEmbedding,
                     timestep_embedding, Dtype)
from .resnet import ResnetBlock3D, Downsample3D, Upsample3D
from .attention3d import Transformer3DModel
from .motion import MotionModule
from .resampler import Resampler, TemporalProjection


def wpad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Circular pad of the width axis of [B, F, H, W, C]."""
    if p <= 0:
        return x
    return jnp.concatenate([x[..., -p:, :], x, x[..., :p, :]], axis=-2)


def wunpad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p <= 0:
        return x
    return x[..., p:-p, :]


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 9            # use_outpaint: 4 + 1 + 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_eps: float = 1e-5
    use_motion_module: bool = True
    motion_module_mid_block: bool = True
    motion_heads: int = 8
    motion_max_len: int = 64
    use_ip: bool = True
    ip_scale: float = 1.0
    num_ip_tokens: int = 64
    image_hidden_size: int = 256     # SAM
    image_cross_attention_dim: int = 1024
    use_fps_condition: bool = True
    use_relative_positions: bool = True   # 'WithAdapter'
    use_inflated_groupnorm: bool = True
    # rematerialize block activations in the backward pass (the TPU
    # equivalent of the reference's fairscale checkpoint_wrapper / torch
    # checkpoint on up blocks, MVGenModel.py:44-54,409-456)
    remat: bool = False
    # Resampler (reference unet.py:186-196: adapter_cross_attention_dim 1024,
    # depth 4, heads 12, dim_head 64)
    resampler_dim: int = 1024
    resampler_depth: int = 4
    resampler_heads: int = 12
    resampler_dim_head: int = 64
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


class DownBlock3D(nn.Module):
    """CrossAttnDownBlock3D / DownBlock3D (reference unet_blocks.py:345-599).
    `heads=None` means no spatial attention (the last down block)."""
    cfg: UNet3DConfig
    out_channels: int
    heads: Optional[int]
    add_downsample: bool = True

    def setup(self):
        c = self.cfg
        n = c.layers_per_block
        self.resnets = [ResnetBlock3D(self.out_channels,
                                      c.use_inflated_groupnorm,
                                      eps=c.norm_eps, dtype=c.jdtype,
                                      name=f"resnets_{j}") for j in range(n)]
        if self.heads is not None:
            self.attentions = [Transformer3DModel(
                self.heads, self.out_channels // self.heads,
                use_ip=c.use_ip, ip_scale=c.ip_scale,
                num_ip_tokens=c.num_ip_tokens, dtype=c.jdtype,
                name=f"attentions_{j}") for j in range(n)]
        if c.use_motion_module:
            self.motion_modules = [MotionModule(
                c.motion_heads, 1, c.motion_max_len, dtype=c.jdtype,
                name=f"motion_modules_{j}") for j in range(n)]
        if self.add_downsample:
            self.downsampler = Downsample3D(self.out_channels, dtype=c.jdtype,
                                            name="downsamplers_0")

    def __call__(self, h, temb, context, pad: bool = False,
                 apply_motion: bool = True):
        skips = []
        for j in range(self.cfg.layers_per_block):
            if pad:
                h = wunpad(self.resnets[j](wpad(h, 2), temb), 2)
            else:
                h = self.resnets[j](h, temb)
            if self.heads is not None:
                h = self.attentions[j](h, context)
            if self.cfg.use_motion_module and apply_motion:
                h = self.motion_modules[j](h)
            skips.append(h)
        if self.add_downsample:
            if pad:
                h = wunpad(self.downsampler(wpad(h, 2)), 1)
            else:
                h = self.downsampler(h)
            skips.append(h)
        return h, skips


class MidBlock3D(nn.Module):
    """UNetMidBlock3DCrossAttn (reference unet_blocks.py:201-345)."""
    cfg: UNet3DConfig
    channels: int
    heads: int

    def setup(self):
        c = self.cfg
        self.resnets = [ResnetBlock3D(self.channels, c.use_inflated_groupnorm,
                                      eps=c.norm_eps, dtype=c.jdtype,
                                      name=f"resnets_{j}") for j in range(2)]
        self.attentions = [Transformer3DModel(
            self.heads, self.channels // self.heads, use_ip=c.use_ip,
            ip_scale=c.ip_scale, num_ip_tokens=c.num_ip_tokens,
            dtype=c.jdtype, name="attentions_0")]
        if c.use_motion_module and c.motion_module_mid_block:
            self.motion_modules = [MotionModule(
                c.motion_heads, 1, c.motion_max_len, dtype=c.jdtype,
                name="motion_modules_0")]

    def __call__(self, h, temb, context, pad: bool = False):
        c = self.cfg
        if pad:
            h = wunpad(self.resnets[0](wpad(h, 2), temb), 2)
        else:
            h = self.resnets[0](h, temb)
        h = self.attentions[0](h, context)
        if c.use_motion_module and c.motion_module_mid_block:
            h = self.motion_modules[0](h)
        if pad:
            h = wunpad(self.resnets[1](wpad(h, 2), temb), 2)
        else:
            h = self.resnets[1](h, temb)
        return h


class UpBlock3D(nn.Module):
    """CrossAttnUpBlock3D / UpBlock3D (reference unet_blocks.py:600-849)."""
    cfg: UNet3DConfig
    out_channels: int
    heads: Optional[int]
    add_upsample: bool = True

    def setup(self):
        c = self.cfg
        n = c.layers_per_block + 1
        self.resnets = [ResnetBlock3D(self.out_channels,
                                      c.use_inflated_groupnorm,
                                      eps=c.norm_eps, dtype=c.jdtype,
                                      name=f"resnets_{j}") for j in range(n)]
        if self.heads is not None:
            self.attentions = [Transformer3DModel(
                self.heads, self.out_channels // self.heads,
                use_ip=c.use_ip, ip_scale=c.ip_scale,
                num_ip_tokens=c.num_ip_tokens, dtype=c.jdtype,
                name=f"attentions_{j}") for j in range(n)]
        if c.use_motion_module:
            self.motion_modules = [MotionModule(
                c.motion_heads, 1, c.motion_max_len, dtype=c.jdtype,
                name=f"motion_modules_{j}") for j in range(n)]
        if self.add_upsample:
            self.upsampler = Upsample3D(self.out_channels, dtype=c.jdtype,
                                        name="upsamplers_0")

    def __call__(self, h, skips, temb, context, pad: bool = False,
                 apply_motion: bool = True):
        """`skips` is a tuple of len(resnets) skip tensors, consumed from the
        end (reference CrossAttnUpBlock3D pops res_hidden_states_tuple)."""
        c = self.cfg
        n = c.layers_per_block + 1
        assert len(skips) == n, (len(skips), n)
        for j in range(n):
            skip = skips[n - 1 - j]
            h = jnp.concatenate([h, skip], axis=-1)
            if pad:
                h = wunpad(self.resnets[j](wpad(h, 2), temb), 2)
            else:
                h = self.resnets[j](h, temb)
            if self.heads is not None:
                h = self.attentions[j](h, context)
            if c.use_motion_module and apply_motion:
                h = self.motion_modules[j](h)
        return h

    def upsample(self, h, pad: bool = False):
        if self.add_upsample:
            if pad:
                h = wunpad(self.upsampler(wpad(h, 1)), 2)
            else:
                h = self.upsampler(h)
        return h


class UNet3DConditionModel(nn.Module):
    """One denoiser branch. Exposes granular stage methods so the dual
    coupler can interleave WarpAttn between stages (replacing the manual
    block walk of reference src/models/MVGenModel.py:59-481)."""
    cfg: UNet3DConfig

    def setup(self):
        c = self.cfg
        boc = c.block_out_channels
        self.conv_in = InflatedConv(boc[0], 3, 1, 1, dtype=c.jdtype)
        self.time_embedding = TimestepEmbedding(c.time_embed_dim,
                                                dtype=c.jdtype)
        if c.use_fps_condition:
            self.fps_embedding = FpsEmbedding(c.time_embed_dim, dtype=c.jdtype)
        if c.use_relative_positions:
            self.add_cond_embedding = TimestepEmbedding(
                c.image_cross_attention_dim, dtype=c.jdtype)
            self.cond_rp_proj = nn.Dense(
                c.image_cross_attention_dim // 4 * 3, use_bias=False,
                dtype=c.jdtype)
            self.add_cond_embedding2 = TimestepEmbedding(
                c.image_cross_attention_dim // 4, dtype=c.jdtype)
        if c.use_ip:
            self.temporal_proj = TemporalProjection(
                dim=c.image_hidden_size, dtype=c.jdtype)
            self.image_proj_model = Resampler(
                dim=c.resampler_dim, depth=c.resampler_depth,
                heads=c.resampler_heads, dim_head=c.resampler_dim_head,
                embedding_dim=(c.image_hidden_size * 4
                               if c.image_hidden_size < 1024
                               else c.image_hidden_size),
                output_dim=c.image_cross_attention_dim,
                num_queries=c.num_ip_tokens, dtype=c.jdtype)

        DownCls, MidCls, UpCls = DownBlock3D, MidBlock3D, UpBlock3D
        if c.remat:
            # static_argnums count `self` as arg 0 in flax lifted remat
            DownCls = nn.remat(DownBlock3D, static_argnums=(4, 5))
            MidCls = nn.remat(MidBlock3D, static_argnums=(4,))
            UpCls = nn.remat(UpBlock3D, static_argnums=(5, 6))

        downs = []
        for i in range(len(boc)):
            is_final = i == len(boc) - 1
            heads = None if is_final else c.attention_heads[i]
            downs.append(DownCls(c, boc[i], heads,
                                 add_downsample=not is_final,
                                 name=f"down_blocks_{i}"))
        self.down_blocks = downs

        self.mid_block = MidCls(c, boc[-1], c.attention_heads[-1],
                                name="mid_block")

        ups = []
        rev = list(reversed(boc))
        rev_heads = list(reversed(c.attention_heads))
        for i in range(len(boc)):
            is_final = i == len(boc) - 1
            heads = None if i == 0 else rev_heads[i]
            ups.append(UpCls(c, rev[i], heads,
                             add_upsample=not is_final,
                             name=f"up_blocks_{i}"))
        self.up_blocks = ups

        self.conv_norm_out = GroupNorm(32, c.norm_eps,
                                       c.use_inflated_groupnorm, c.jdtype)
        self.conv_out = InflatedConv(c.out_channels, 3, 1, 1, dtype=c.jdtype)

    # ---- conditioning -----------------------------------------------------

    def time_embed(self, timesteps, fps=None):
        """timesteps [B] (+ fps [B]) -> temb [B, 1280]
        (reference unet.py:718-738 / MVGenModel.py:103-133)."""
        c = self.cfg
        t_emb = timestep_embedding(timesteps, c.block_out_channels[0])
        emb = self.time_embedding(t_emb.astype(c.jdtype))
        if fps is not None and c.use_fps_condition:
            fps_emb = timestep_embedding(fps, c.block_out_channels[0])
            emb = emb + self.fps_embedding(fps_emb.astype(c.jdtype))
        return emb

    def ip_tokens(self, ref_feats, rel_pos=None, pitch=None):
        """SAM video features [B, F, D, Csam] -> ip tokens [B, 64, 1024],
        with the pano branch's relative-position/pitch adapter fused in
        (reference MVGenModel.py:155-222)."""
        c = self.cfg
        x = self.temporal_proj(ref_feats)
        B, f, d, ch = x.shape
        tokens = self.image_proj_model(x.reshape(B, f * d, ch))
        if rel_pos is not None and c.use_relative_positions:
            # rel_pos [B, n, 6] int-like; pitch [B, n]
            B_, n, six = rel_pos.shape
            rp = timestep_embedding(rel_pos.reshape(-1),
                                    c.block_out_channels[0])
            rp = rp.reshape(B_ * n, six * c.block_out_channels[0])
            rp = self.add_cond_embedding(rp.astype(c.jdtype))
            rp = self.cond_rp_proj(rp)                     # [B*n, 768]
            pt = timestep_embedding(pitch.reshape(-1),
                                    c.block_out_channels[0])
            pt = self.add_cond_embedding2(pt.astype(c.jdtype))  # [B*n, 256]
            cond = jnp.concatenate([rp, pt], axis=-1).reshape(B_, n, -1)
            # pad to num_ip_tokens by repeating the last frame's embedding
            # (reference MVGenModel.py:218-221); truncate when n > tokens
            if n >= c.num_ip_tokens:
                tokens = tokens + cond[:, :c.num_ip_tokens]
            else:
                pad = jnp.repeat(cond[:, -1:], c.num_ip_tokens - n, axis=1)
                tokens = tokens + jnp.concatenate([cond, pad], axis=1)
        return tokens

    def build_context(self, text_embeds, ip_tokens):
        """concat [text(77) | ip(64)] (reference MVGenModel.py:245-246)."""
        if ip_tokens is None:
            return text_embeds
        return jnp.concatenate([text_embeds, ip_tokens.astype(text_embeds.dtype)],
                               axis=1)

    # ---- stages -----------------------------------------------------------

    def stem(self, sample, pad: bool = False):
        if pad:
            return wunpad(self.conv_in(wpad(sample, 1)), 1)
        return self.conv_in(sample)

    def head(self, h, pad: bool = False):
        h = self.conv_norm_out(h)
        h = nn.silu(h)
        if pad:
            return wunpad(self.conv_out(wpad(h, 1)), 1)
        return self.conv_out(h)

    # ---- full single-branch forward (reference unet.py:632-856) -----------

    def __call__(self, sample, timesteps, text_embeds, fps=None,
                 ref_feats=None, rel_pos=None, pitch=None,
                 pad: bool = False):
        """sample [B, F, H, W, 9] -> noise/v prediction [B, F, H, W, 4]."""
        c = self.cfg
        temb = self.time_embed(timesteps, fps)
        ip = self.ip_tokens(ref_feats, rel_pos, pitch) if (
            c.use_ip and ref_feats is not None) else None
        context = self.build_context(text_embeds, ip)

        h = self.stem(sample.astype(c.jdtype), pad)
        skips = [h]
        for blk in self.down_blocks:
            h, s = blk(h, temb, context, pad, True)
            skips.extend(s)
        h = self.mid_block(h, temb, context, pad)
        n = c.layers_per_block + 1
        for blk in self.up_blocks:
            sk = tuple(skips[-n:])
            del skips[-n:]
            h = blk(h, sk, temb, context, pad, True)
            h = blk.upsample(h, pad)
        return self.head(h, pad)


class FpsEmbedding(nn.Module):
    """TimestepEmbedding with zero-initialized linear_2
    (reference unet.py:166-169)."""
    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="linear_2")(x)
        return x
