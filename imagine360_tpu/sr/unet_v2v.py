"""Structural port of the VEnhancer video-to-video UNet (ControlledV2VUNet).

The reference SR stage builds `unet_v2v.ControlledV2VUNet()` and samples it
with concat/ControlNet conditioning (reference sr/video_to_video_model.py:
41-52 construction, :120-152 sampling with model_kwargs {y, hint, mask_cond,
s_cond, t_hint}). The module itself lives in the external VEnhancer
repository (a ControlNet'd variant of the ModelScope/i2vgen-xl
Vid2VidSDUNet, ~1.4B params) and is NOT part of the reference snapshot; its
weights are an external download there too. This file is the architecture
implemented from the public VEnhancer / ModelScope design, TPU-first
(channels-last [B, F, H, W, C], fused GN, our attention dispatch).
NUMERIC GOLDEN: tests/test_golden_v2v.py implements the ModelScope block
semantics in plain torch with the public state_dict naming, runs
convert_v2v over its state_dict (zero missing/unexpected keys), and
asserts full-model forward parity at tiny config — the converter's name
map is validated end-to-end, not best-effort. sr/refiner.py's PanoRefiner
remains the default no-weights engine.

Architecture contract (public VEnhancer defaults):
  dim 320, dim_mult (1,2,4,4), 2 res blocks/level, spatial+temporal
  transformers at scales (1, 1/2, 1/4), context_dim 1024 (OpenCLIP ViT-H
  text), head_dim 64, embed_dim = 4*dim. Every ResBlock is followed by a
  4-layer (3,1,1) temporal conv stack (zero-init last) — the ModelScope
  "explicit motion" block. The ControlNet branch (VideoControlNet) is an
  encoder+middle copy whose conv_in takes [x ‖ hint] (2*in_dim channels),
  emits one zero-conv residual per encoder block plus a middle residual,
  and folds three extra conditions into the (per-frame) time embedding:
  - t_hint: the hint's noise-aug level, through the shared time MLP then a
    zero linear, added ONLY on key frames (mask_cond marks which frames
    carry real hint content — reference :122-131 builds hint from the
    low-fps clip and mask_cond/s_cond from the CLI);
  - s_cond: the upscale factor, same route through its own zero linear.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import (Attention, FeedForward, GroupNorm, InflatedConv,
                             LayerNorm, timestep_embedding)

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class V2VConfig:
    in_dim: int = 4
    dim: int = 320
    context_dim: int = 1024        # OpenCLIP ViT-H text width
    out_dim: int = 4
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    head_dim: int = 64
    attn_scales: Tuple[float, ...] = (1.0, 0.5, 0.25)
    temporal_attention: bool = True
    norm_groups: int = 32
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def embed_dim(self):
        return self.dim * 4


def tiny_v2v_config(dtype: str = "float32") -> V2VConfig:
    """CPU-testable miniature (same code paths)."""
    return V2VConfig(dim=16, context_dim=24, dim_mult=(1, 2), head_dim=8,
                     num_res_blocks=1, attn_scales=(1.0, 0.5),
                     norm_groups=4, dtype=dtype)


def _zero_dense(features, dtype, name):
    return nn.Dense(features, kernel_init=nn.initializers.zeros,
                    dtype=dtype, name=name)


class TemporalConvBlock(nn.Module):
    """ModelScope TemporalConvBlock_v2: four GN->SiLU->(3,1,1)-Conv3d
    stacks over the frame axis, residual, last conv zero-init."""
    out_dim: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x [B, F, H, W, C]; (3,1,1) convs touch only the frame axis
        identity = x

        def conv3(h, features, zero, name):
            init = (nn.initializers.zeros if zero
                    else nn.initializers.lecun_normal())
            return nn.Conv(features, (3, 1, 1),
                           padding=((1, 1), (0, 0), (0, 0)),
                           kernel_init=init, dtype=self.dtype, name=name)(h)

        h = GroupNorm(self.groups, inflated=False, dtype=self.dtype,
                      name="norm1")(x)
        h = conv3(nn.silu(h), self.out_dim, False, "conv1")
        h = GroupNorm(self.groups, inflated=False, dtype=self.dtype,
                      name="norm2")(h)
        h = conv3(nn.silu(h), self.out_dim, False, "conv2")
        h = GroupNorm(self.groups, inflated=False, dtype=self.dtype,
                      name="norm3")(h)
        h = conv3(nn.silu(h), self.out_dim, False, "conv3")
        h = GroupNorm(self.groups, inflated=False, dtype=self.dtype,
                      name="norm4")(h)
        h = conv3(nn.silu(h), self.out_dim, True, "conv4")
        return identity + h


class V2VResBlock(nn.Module):
    """guided-diffusion ResBlock + trailing temporal conv stack.

    emb is PER-FRAME [B, F, E] (the ControlNet adds hint/scale embeddings
    only on key frames, so the frame axis cannot be folded out of it)."""
    out_channels: int
    groups: int = 32
    use_temporal_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm(self.groups, dtype=self.dtype, name="in_norm")(x)
        h = InflatedConv(self.out_channels, dtype=self.dtype,
                         name="in_conv")(nn.silu(h))
        e = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="emb_proj")(nn.silu(emb))
        h = h + e[:, :, None, None, :]
        h = GroupNorm(self.groups, dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        # zero-init out conv (guided-diffusion zero_module)
        h = InflatedConv(self.out_channels, kernel_init_zero=True,
                         dtype=self.dtype, name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = InflatedConv(self.out_channels, kernel=1, padding=0,
                             dtype=self.dtype, name="skip")(x)
        h = x + h
        if self.use_temporal_conv:
            h = TemporalConvBlock(self.out_channels, self.groups,
                                  self.dtype, name="temporal_conv")(h)
        return h


class V2VTransformerBlock(nn.Module):
    """ldm BasicTransformerBlock: self-attn, cross-attn(context), GEGLU ff."""
    dim: int
    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.head_dim,
                          dtype=self.dtype, name="attn1")(h)
        if context is not None:
            h = LayerNorm(dtype=self.dtype, name="norm2")(x)
            x = x + Attention(self.dim, self.heads, self.head_dim,
                              dtype=self.dtype, name="attn2")(h, context)
        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class SpatialTransformer(nn.Module):
    """Per-frame spatial transformer, use_linear projections, depth 1."""
    channels: int
    head_dim: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x [B, F, H, W, C]; context [B, L, D] broadcast over frames
        B, F, H, W, C = x.shape
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                      name="norm")(x)
        h = h.reshape(B * F, H * W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        ctx = jnp.repeat(context, F, axis=0)
        h = V2VTransformerBlock(C, C // self.head_dim, self.head_dim,
                                self.dtype, name="block_0")(h, ctx)
        h = _zero_dense(C, self.dtype, "proj_out")(h)
        return x + h.reshape(B, F, H, W, C)


class TemporalTransformer(nn.Module):
    """Self-attention over the frame axis per spatial location
    (only_self_att=True in the public config)."""
    channels: int
    head_dim: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        h = GroupNorm(self.groups, inflated=False, epsilon=1e-6,
                      dtype=self.dtype, name="norm")(x)
        h = h.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        h = V2VTransformerBlock(C, C // self.head_dim, self.head_dim,
                                self.dtype, name="block_0")(h)
        h = _zero_dense(C, self.dtype, "proj_out")(h)
        h = h.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return InflatedConv(self.channels, stride=2, dtype=self.dtype,
                            name="op")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return InflatedConv(self.channels, dtype=self.dtype, name="conv")(x)


def _plan(cfg: V2VConfig):
    """Channel plan shared by the UNet and the ControlNet encoder copy.
    Returns (enc_specs, shortcut_dims, mid_ch). Each enc spec is a dict
    {kind: 'init'|'res'|'down', ch, attn: bool}."""
    enc = [dict(kind="init", ch=cfg.dim, attn=False)]
    shortcuts = [cfg.dim]
    dims = [cfg.dim * m for m in (1,) + tuple(cfg.dim_mult)]
    scale = 1.0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        for j in range(cfg.num_res_blocks):
            enc.append(dict(kind="res", ch=cout,
                            attn=scale in cfg.attn_scales))
            shortcuts.append(cout)
        if i != len(cfg.dim_mult) - 1:
            enc.append(dict(kind="down", ch=cout, attn=False))
            shortcuts.append(cout)
            scale /= 2
    return enc, shortcuts, dims[-1], scale


class _Encoder(nn.Module):
    """input_blocks + middle_block walk, shared by Vid2VidSDUNet and
    VideoControlNet (which consumes the per-block features as residuals)."""
    cfg: V2VConfig
    in_channels: int               # in_dim (UNet) or 2*in_dim (ControlNet)

    @nn.compact
    def __call__(self, x, emb, context):
        c = self.cfg
        enc, _, mid_ch, _ = _plan(c)
        feats = []
        h = x
        for bi, spec in enumerate(enc):
            nm = f"input_{bi}"
            if spec["kind"] == "init":
                h = InflatedConv(c.dim, dtype=c.jdtype,
                                 name=f"{nm}_conv")(h)
                if c.temporal_attention:
                    h = TemporalTransformer(c.dim, c.head_dim, c.norm_groups,
                                            c.jdtype,
                                            name=f"{nm}_tempattn")(h)
            elif spec["kind"] == "down":
                h = Downsample(spec["ch"], c.jdtype, name=f"{nm}_down")(h)
            else:
                h = V2VResBlock(spec["ch"], c.norm_groups, dtype=c.jdtype,
                                name=f"{nm}_res")(h, emb)
                if spec["attn"]:
                    h = SpatialTransformer(spec["ch"], c.head_dim,
                                           c.norm_groups, c.jdtype,
                                           name=f"{nm}_attn")(h, context)
                    if c.temporal_attention:
                        h = TemporalTransformer(spec["ch"], c.head_dim,
                                                c.norm_groups, c.jdtype,
                                                name=f"{nm}_tempattn")(h)
            feats.append(h)
        # middle: res / spatial / temporal / res
        h = V2VResBlock(mid_ch, c.norm_groups, dtype=c.jdtype,
                        name="middle_res0")(h, emb)
        h = SpatialTransformer(mid_ch, c.head_dim, c.norm_groups, c.jdtype,
                               name="middle_attn")(h, context)
        if c.temporal_attention:
            h = TemporalTransformer(mid_ch, c.head_dim, c.norm_groups,
                                    c.jdtype, name="middle_tempattn")(h)
        h = V2VResBlock(mid_ch, c.norm_groups, dtype=c.jdtype,
                        name="middle_res1")(h, emb)
        return h, feats


class Vid2VidSDUNet(nn.Module):
    """The base (uncontrolled) v2v UNet."""
    cfg: V2VConfig = V2VConfig()

    @nn.compact
    def __call__(self, x, t, context, control=None):
        """x [B, F, h, w, in_dim]; t [B] (or [B, F] per-frame); context
        [B, L, context_dim]; control: optional list of encoder residuals +
        [middle residual] (from VideoControlNet), consumed back-to-front."""
        c = self.cfg
        B, F = x.shape[0], x.shape[1]
        if t.ndim == 1:
            t = jnp.repeat(t[:, None], F, axis=1)
        temb = timestep_embedding(t.reshape(-1), c.dim).reshape(B, F, c.dim)
        emb = nn.Dense(c.embed_dim, dtype=c.jdtype, name="time_embed_0")(
            temb.astype(c.jdtype))
        emb = nn.Dense(c.embed_dim, dtype=c.jdtype,
                       name="time_embed_2")(nn.silu(emb))

        h, feats = _Encoder(c, c.in_dim, name="enc")(x, emb, context)
        if control is not None:
            control = list(control)
            h = h + control.pop()

        enc, shortcuts, mid_ch, min_scale = _plan(c)
        # decoder: num_res_blocks+1 blocks per level, skip-concat each
        dims = [c.dim * m for m in (1,) + tuple(c.dim_mult)]
        rev = list(reversed(dims[1:]))          # encoder output dims, deep->
        scale = min_scale
        bi = 0
        for i, cout in enumerate(rev):
            for j in range(c.num_res_blocks + 1):
                skip = feats.pop()
                if control is not None:
                    skip = skip + control.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                nm = f"output_{bi}"
                h = V2VResBlock(cout, c.norm_groups, dtype=c.jdtype,
                                name=f"{nm}_res")(h, emb)
                if scale in c.attn_scales:
                    h = SpatialTransformer(cout, c.head_dim, c.norm_groups,
                                           c.jdtype,
                                           name=f"{nm}_attn")(h, context)
                    if c.temporal_attention:
                        h = TemporalTransformer(cout, c.head_dim,
                                                c.norm_groups, c.jdtype,
                                                name=f"{nm}_tempattn")(h)
                if i != len(rev) - 1 and j == c.num_res_blocks:
                    h = Upsample(cout, c.jdtype, name=f"{nm}_upsample")(h)
                    scale *= 2
                bi += 1
        h = GroupNorm(c.norm_groups, dtype=c.jdtype, name="out_norm")(h)
        h = nn.silu(h)
        return InflatedConv(c.out_dim, dtype=c.jdtype,
                            kernel_init_zero=True, name="out_conv")(h)


class VideoControlNet(nn.Module):
    """Encoder+middle copy emitting zero-conv residuals; conditions on the
    hint latents (channel-concat), hint noise level t_hint (key frames
    only, via mask_cond) and the upscale factor s_cond."""
    cfg: V2VConfig = V2VConfig()

    @nn.compact
    def __call__(self, x, t, context, hint, t_hint=None, mask_cond=None,
                 s_cond=None):
        """x [B, F, h, w, in_dim]; hint [B, F, h, w, in_dim] (zeros on
        non-key frames); mask_cond [B, F] 1.0 on key frames; t_hint [B];
        s_cond [B]."""
        c = self.cfg
        B, F = x.shape[0], x.shape[1]
        temb = timestep_embedding(jnp.repeat(t[:, None], F, 1).reshape(-1),
                                  c.dim).reshape(B, F, c.dim)
        time0 = nn.Dense(c.embed_dim, dtype=c.jdtype, name="time_embed_0")
        time2 = nn.Dense(c.embed_dim, dtype=c.jdtype, name="time_embed_2")

        def embed(e):
            return time2(nn.silu(time0(e.astype(c.jdtype))))

        emb = embed(temb)
        if t_hint is not None:
            he = embed(timestep_embedding(t_hint, c.dim))[:, None, :]
            he = _zero_dense(c.embed_dim, c.jdtype,
                             "hint_time_zero_linear")(he)
            if mask_cond is not None:
                he = he * mask_cond[..., None].astype(he.dtype)
            emb = emb + he
        if s_cond is not None:
            se = embed(timestep_embedding(s_cond, c.dim))[:, None, :]
            emb = emb + _zero_dense(c.embed_dim, c.jdtype,
                                    "scale_cond_zero_linear")(se)

        xin = jnp.concatenate([x, hint], axis=-1)
        h, feats = _Encoder(c, 2 * c.in_dim, name="enc")(xin, emb, context)
        outs = []
        for bi, f in enumerate(feats):
            outs.append(InflatedConv(f.shape[-1], kernel=1, padding=0,
                                     kernel_init_zero=True, dtype=c.jdtype,
                                     name=f"zero_conv_{bi}")(f))
        outs.append(InflatedConv(h.shape[-1], kernel=1, padding=0,
                                 kernel_init_zero=True, dtype=c.jdtype,
                                 name="middle_block_out")(h))
        return outs


class ControlledV2VUNet(nn.Module):
    """The reference's generator (video_to_video_model.py:41): base UNet +
    VideoControlNet residuals."""
    cfg: V2VConfig = V2VConfig()

    def setup(self):
        self.unet = Vid2VidSDUNet(self.cfg)
        self.controlnet = VideoControlNet(self.cfg)

    def __call__(self, x, t, context, hint, t_hint=None, mask_cond=None,
                 s_cond=None):
        control = self.controlnet(x, t, context, hint, t_hint=t_hint,
                                  mask_cond=mask_cond, s_cond=s_cond)
        return self.unet(x, t, context, control=control)


def scatter_hint(hint_lowfps: jnp.ndarray, frames: int,
                 interp_f_num: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Place low-fps hint latents [B, K, h, w, 4] at key-frame positions of
    a length-`frames` clip (reference video_to_video_model.py:123 takes
    every (interp_f_num+1)-th frame as a key frame). Returns
    (hint [B, F, h, w, 4] zeros off key frames, mask_cond [B, F])."""
    B, K = hint_lowfps.shape[:2]
    idx = np.arange(0, frames, interp_f_num + 1)[:K]
    hint = jnp.zeros((B, frames) + hint_lowfps.shape[2:],
                     hint_lowfps.dtype)
    hint = hint.at[:, idx].set(hint_lowfps[:, :len(idx)])
    mask = np.zeros((B, frames), np.float32)
    mask[:, idx] = 1.0
    return hint, jnp.asarray(mask)


class V2VRefiner:
    """Video360Enhancer engine driving ControlledV2VUNet (the structural
    VEnhancer port). Mirrors the reference conditioning recipe
    (video_to_video_model.py:120-152): the clean latents of the upsampled
    source clip, noise-augmented to t_hint, are the ControlNet hint; CFG
    over text with guide_scale."""

    def __init__(self, model: ControlledV2VUNet, params, text_pos=None,
                 text_neg=None, guidance_scale: float = 7.5,
                 t_hint: int = 199, interp_f_num: int = 0,
                 s_cond: float = 2.0):
        self.model = model
        self.params = params
        D = model.cfg.context_dim
        if text_pos is None:
            text_pos = jnp.zeros((77, D), jnp.float32)
        if text_neg is None:
            text_neg = jnp.zeros_like(text_pos)
        self.text2 = jnp.stack([text_neg, text_pos])
        self.g = guidance_scale
        self.t_hint = t_hint
        self.interp_f_num = interp_f_num
        self.s_cond = s_cond
        cfg_active = (guidance_scale != 1.0
                      and not bool(jnp.all(text_pos == text_neg)))

        def step(params, z, hint, mask_cond, t, text2):
            n = 2 if cfg_active else 1
            x = jnp.stack([z] * n)
            hb = jnp.stack([hint] * n)
            mb = jnp.stack([mask_cond] * n)
            tv = jnp.full((n,), t, jnp.float32)
            th = jnp.full((n,), float(self.t_hint), jnp.float32)
            sc = jnp.full((n,), float(self.s_cond), jnp.float32)
            ctx = text2 if cfg_active else text2[1:]
            pred = self.model.apply(params, x, tv, ctx, hb, t_hint=th,
                                    mask_cond=mb, s_cond=sc)
            if not cfg_active:
                return pred[0].astype(z.dtype)
            u, c = pred[0], pred[1]
            return (u + self.g * (c - u)).astype(z.dtype)

        self._step = jax.jit(step)
        self._hint = None
        self._mask = None

    def prepare(self, z_clean):
        """Enhancer hook: noise-augment the clean latents to t_hint and use
        them (at low fps when interp_f_num > 0) as the ControlNet hint
        (reference video_to_video_model.py:122-124)."""
        from ..diffusion.ddim import add_noise, make_ddim_schedule
        F = z_clean.shape[0]
        key = jax.random.PRNGKey(0)
        low = z_clean[None, ::self.interp_f_num + 1]
        hint, mask = scatter_hint(low, F, self.interp_f_num)
        noise = jax.random.normal(key, hint.shape, hint.dtype)
        acp = jnp.asarray(
            make_ddim_schedule(num_inference_steps=15).alphas_cumprod)
        t = jnp.full((1,), int(self.t_hint), jnp.int32)
        self._hint = add_noise(hint, noise, acp,
                               t[:, None, None, None, None])
        self._mask = mask

        def denoise_fn(z, t, rng):
            return self._step(self.params, z, self._hint[0], self._mask[0],
                              t[0], self.text2)

        return denoise_fn


# ---------------------------------------------------------------------------
# torch checkpoint conversion (structural; name map is best-effort against
# the public VEnhancer state_dict layout — verify against real weights)
# ---------------------------------------------------------------------------

def convert_v2v(state_dict, cfg: V2VConfig = V2VConfig()) -> dict:
    """VEnhancer ControlledV2VUNet torch state_dict -> flat flax param dict
    (paths joined with '.').

    The public layout (ModelScope lineage) enumerates encoder blocks as
    `input_blocks.{i}.{j}.*` where j indexes [ResBlock, SpatialTransformer,
    TemporalTransformer] (j=1 conv / temporal attn for block 0),
    `middle_block.{0..3}.*`, `output_blocks.{i}.{j}.*` and the ControlNet
    copy under `VideoControlNet.*` with `zero_convs.{i}.0.*` +
    `middle_block_out.0.*`. This converter maps those to the flax module
    names above; unknown keys are returned under '_unmapped' for
    inspection instead of being silently dropped."""
    from ..utils.convert import _to_numpy

    enc, _, _, _ = _plan(cfg)
    out, unmapped = {}, []

    def put(path, arr, kind):
        if kind == "conv":                       # torch OIHW -> HWIO
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif kind == "conv3d":                   # OIDHW -> DHWIO
            arr = np.transpose(arr, (2, 3, 4, 1, 0))
        elif kind == "dense":
            arr = arr.T
        out[path] = arr

    res_sub = {
        "in_layers.0": ("in_norm.norm", "gn"),
        "in_layers.2": ("in_conv", "conv"),
        "emb_layers.1": ("emb_proj", "dense"),
        "out_layers.0": ("out_norm.norm", "gn"),
        "out_layers.3": ("out_conv", "conv"),
        "skip_connection": ("skip", "conv"),
        # ModelScope spells it "temopral_conv"; tolerate both
        "temopral_conv": ("temporal_conv", None),
        "temporal_conv": ("temporal_conv", None),
    }

    def map_res(rest, base):
        for tname, (fname, kind) in res_sub.items():
            if rest.startswith(tname + "."):
                tail = rest[len(tname) + 1:]
                if fname == "temporal_conv":
                    return _map_tconv(tail, f"{base}.temporal_conv")
                leaf = _leaf(tail, kind)
                if leaf:
                    return f"{base}.{fname}.{leaf[0]}", leaf[1]
        return None

    def _leaf(tail, kind):
        if kind == "gn":
            return {"weight": ("scale", "raw"),
                    "bias": ("bias", "raw")}.get(tail)
        if kind in ("conv", "dense"):
            return {"weight": ("kernel", kind),
                    "bias": ("bias", "raw")}.get(tail)
        return None

    def _map_tconv(tail, base):
        # torch: conv{n}.0 GroupNorm, conv{n}.2/.3 Conv3d (after SiLU[/drop])
        import re
        m = re.match(r"conv(\d)\.(\d)\.(weight|bias)$", tail)
        if not m:
            return None
        n, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        if j == 0:
            nm = {"weight": "scale", "bias": "bias"}[leaf]
            return f"{base}.norm{n}.norm.{nm}", "raw"
        return (f"{base}.conv{n}.{'kernel' if leaf == 'weight' else 'bias'}",
                "conv3d" if leaf == "weight" else "raw")

    def map_transformer(rest, base, temporal):
        import re
        if rest.startswith("norm."):
            nm = {"weight": "scale", "bias": "bias"}[rest.split(".")[-1]]
            return f"{base}.norm.norm.{nm}", "raw"
        for proj in ("proj_in", "proj_out"):
            if rest.startswith(proj + "."):
                leaf = rest.split(".")[-1]
                return (f"{base}.{proj}."
                        f"{'kernel' if leaf == 'weight' else 'bias'}",
                        "dense" if leaf == "weight" else "raw")
        m = re.match(r"transformer_blocks\.0\.(.*)$", rest)
        if m:
            r = m.group(1)
            for a in ("attn1", "attn2"):
                for p in ("to_q", "to_k", "to_v"):
                    if r == f"{a}.{p}.weight":
                        return f"{base}.block_0.{a}.{p}.kernel", "dense"
                if r.startswith(f"{a}.to_out.0."):
                    leaf = r.split(".")[-1]
                    return (f"{base}.block_0.{a}.to_out_0."
                            f"{'kernel' if leaf == 'weight' else 'bias'}",
                            "dense" if leaf == "weight" else "raw")
            m2 = re.match(r"ff\.net\.0\.proj\.(weight|bias)$", r)
            if m2:
                leaf = m2.group(1)
                return (f"{base}.block_0.ff.net_0_proj."
                        f"{'kernel' if leaf == 'weight' else 'bias'}",
                        "dense" if leaf == "weight" else "raw")
            m2 = re.match(r"ff\.net\.2\.(weight|bias)$", r)
            if m2:
                leaf = m2.group(1)
                return (f"{base}.block_0.ff.net_2."
                        f"{'kernel' if leaf == 'weight' else 'bias'}",
                        "dense" if leaf == "weight" else "raw")
            m2 = re.match(r"norm(\d)\.(weight|bias)$", r)
            if m2:
                n, leaf = m2.group(1), m2.group(2)
                return (f"{base}.block_0.norm{n}."
                        f"{'scale' if leaf == 'weight' else 'bias'}", "raw")
        return None

    def enc_block_name(i, j, prefix):
        spec = enc[i] if i < len(enc) else None
        if spec is None:
            return None
        nm = f"{prefix}.input_{i}"
        if spec["kind"] == "init":
            return (f"{nm}_conv", "conv") if j == 0 \
                else (f"{nm}_tempattn", "temporal")
        if spec["kind"] == "down":
            return (f"{nm}_down.op", "conv")
        return [(f"{nm}_res", "res"), (f"{nm}_attn", "spatial"),
                (f"{nm}_tempattn", "temporal")][j]

    import re
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        k = key
        prefix = "unet"
        if k.startswith("VideoControlNet."):
            k = k[len("VideoControlNet."):]
            prefix = "controlnet"
        mapped = None
        m = re.match(r"time_embed\.(\d)\.(weight|bias)$", k)
        if m:
            leaf = m.group(2)
            mapped = (f"{prefix}.time_embed_{m.group(1)}."
                      f"{'kernel' if leaf == 'weight' else 'bias'}",
                      "dense" if leaf == "weight" else "raw")
        if not mapped:
            m = re.match(r"(hint_time_zero_linear|scale_cond_zero_linear)"
                         r"\.(weight|bias)$", k)
            if m:
                leaf = m.group(2)
                mapped = (f"{prefix}.{m.group(1)}."
                          f"{'kernel' if leaf == 'weight' else 'bias'}",
                          "dense" if leaf == "weight" else "raw")
        if not mapped:
            m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)$", k)
            if m:
                i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
                nm = enc_block_name(i, j, f"{prefix}.enc")
                if nm:
                    base, kind = nm
                    if kind == "conv":
                        # init conv keys are bare weight/bias; Downsample
                        # wraps its conv as `op.` (ModelScope Downsample:
                        # self.op = Conv2d) — strip it, reject other tails
                        leaf = rest[3:] if rest.startswith("op.") else rest
                        if leaf in ("weight", "bias"):
                            mapped = (
                                f"{base}."
                                f"{'kernel' if leaf == 'weight' else 'bias'}",
                                "conv" if leaf == "weight" else "raw")
                    elif kind == "res":
                        mapped = map_res(rest, base)
                    else:
                        mapped = map_transformer(rest, base,
                                                 kind == "temporal")
        if not mapped:
            m = re.match(r"middle_block\.(\d)\.(.*)$", k)
            if m:
                j, rest = int(m.group(1)), m.group(2)
                base = [f"{prefix}.enc.middle_res0",
                        f"{prefix}.enc.middle_attn",
                        f"{prefix}.enc.middle_tempattn",
                        f"{prefix}.enc.middle_res1"][j]
                mapped = (map_res(rest, base) if j in (0, 3)
                          else map_transformer(rest, base, j == 2))
        if not mapped:
            m = re.match(r"zero_convs\.(\d+)\.0\.(weight|bias)$", k)
            if m:
                leaf = m.group(2)
                mapped = (f"{prefix}.zero_conv_{m.group(1)}."
                          f"{'kernel' if leaf == 'weight' else 'bias'}",
                          "conv" if leaf == "weight" else "raw")
        if not mapped:
            m = re.match(r"middle_block_out\.0\.(weight|bias)$", k)
            if m:
                leaf = m.group(1)
                mapped = (f"{prefix}.middle_block_out."
                          f"{'kernel' if leaf == 'weight' else 'bias'}",
                          "conv" if leaf == "weight" else "raw")
        if not mapped:
            m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)$", k)
            if m:
                bi, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
                base = f"{prefix}.output_{bi}"
                if rest.startswith("conv."):         # Upsample conv
                    leaf = rest.split(".")[-1]
                    mapped = (f"{base}_upsample.conv."
                              f"{'kernel' if leaf == 'weight' else 'bias'}",
                              "conv" if leaf == "weight" else "raw")
                elif j == 0:
                    mapped = map_res(rest, f"{base}_res")
                else:
                    # j enumerates [attn, tempattn(, upsample)]
                    kind = "spatial" if j == 1 else "temporal"
                    nm = f"{base}_attn" if j == 1 else f"{base}_tempattn"
                    mapped = map_transformer(rest, nm, kind == "temporal")
        if not mapped:
            m = re.match(r"out\.(\d)\.(weight|bias)$", k)
            if m:
                j, leaf = int(m.group(1)), m.group(2)
                if j == 0:
                    mapped = (f"{prefix}.out_norm.norm."
                              f"{'scale' if leaf == 'weight' else 'bias'}",
                              "raw")
                else:
                    mapped = (f"{prefix}.out_conv."
                              f"{'kernel' if leaf == 'weight' else 'bias'}",
                              "conv" if leaf == "weight" else "raw")
        if mapped:
            path, kind = mapped
            put(path, arr, kind if kind in ("conv", "conv3d", "dense")
                else "raw")
        else:
            unmapped.append(key)
    if unmapped:
        out["_unmapped"] = unmapped
    return out
