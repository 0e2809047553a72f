"""Numeric golden for the VEnhancer ControlledV2VUNet port (VERDICT r3
item 5) — the test_golden_sam technique: the ModelScope/VEnhancer block
semantics (guided-diffusion ResBlock + TemporalConvBlock_v2, ldm
spatial/temporal transformers, ControlNet residuals with hint/scale time
embeddings — reference sr/video_to_video_model.py:41-52,120-152 drives the
external module) are implemented in plain torch INSIDE this test with the
PUBLIC VEnhancer state_dict naming (input_blocks.{i}.{j}.*,
middle_block.{j}.*, output_blocks.{i}.{j}.*, time_embed.{0,2},
zero_convs.{i}.0, middle_block_out.0, temopral_conv [sic], and the
VideoControlNet.* prefix). The real convert_v2v converter maps that
state_dict into our flax tree with ZERO missing/unexpected keys, and the
two models must agree numerically at tiny config.

All zero-initialized leaves (proj_out, out convs, zero convs, hint/scale
zero linears) are randomized so every path carries signal.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagine360_tpu.sr.unet_v2v import (ControlledV2VUNet, convert_v2v,
                                        tiny_v2v_config, _plan)  # noqa: E402
from imagine360_tpu.utils.convert import apply_converted  # noqa: E402

CFG = tiny_v2v_config()
B, F, H, W = 1, 4, 8, 16
L = 7  # text tokens


# --------------------------------------------------------------------------
# torch reference modules (public VEnhancer/ModelScope layout + semantics)
# --------------------------------------------------------------------------

def temb_t(t, dim):
    """flax timestep_embedding (flip_sin_to_cos=True, shift 0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], -1)
    return torch.cat([emb[:, half:], emb[:, :half]], -1)


class TTemporalConv(tnn.Module):
    """TemporalConvBlock_v2: 4x GN->SiLU->(3,1,1) Conv3d, residual."""

    def __init__(self, c, groups):
        super().__init__()
        def stack(first):
            layers = [tnn.GroupNorm(groups, c), tnn.SiLU()]
            if not first:
                layers.append(tnn.Dropout(0.0))
            layers.append(tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0)))
            return tnn.Sequential(*layers)
        self.conv1 = stack(True)
        self.conv2 = stack(False)
        self.conv3 = stack(False)
        self.conv4 = stack(False)

    def forward(self, x):       # x [B, C, F, H, W]
        return x + self.conv4(self.conv3(self.conv2(self.conv1(x))))


class TResBlock(tnn.Module):
    def __init__(self, cin, cout, edim, groups):
        super().__init__()
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(groups, cin), tnn.SiLU(),
            tnn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(edim, cout))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(groups, cout), tnn.SiLU(), tnn.Dropout(0.0),
            tnn.Conv2d(cout, cout, 3, padding=1))
        self.skip_connection = (tnn.Conv2d(cin, cout, 1) if cin != cout
                                else tnn.Identity())
        self.temopral_conv = TTemporalConv(cout, groups)  # ModelScope typo

    def forward(self, x, emb):  # x [B, F, C, H, W]; emb [B, F, E]
        b, f = x.shape[:2]
        xf = x.reshape(b * f, *x.shape[2:])
        h = self.in_layers(xf)
        e = self.emb_layers(emb.reshape(b * f, -1))
        h = h + e[:, :, None, None]
        h = self.out_layers(h)
        h = self.skip_connection(xf) + h
        h = h.reshape(b, f, *h.shape[1:])
        # temporal conv runs on [B, C, F, H, W]
        h5 = h.permute(0, 2, 1, 3, 4)
        return self.temopral_conv(h5).permute(0, 2, 1, 3, 4)


class TAttention(tnn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim=None):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim or dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim or dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim), tnn.Dropout(0.0))

    def forward(self, x, context=None):
        c = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(c), self.to_v(c)
        b, sq, _ = q.shape
        sk = k.shape[1]
        hd = self.head_dim
        q = q.reshape(b, sq, self.heads, hd).transpose(1, 2)
        k = k.reshape(b, sk, self.heads, hd).transpose(1, 2)
        v = v.reshape(b, sk, self.heads, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.to_out(out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * tF.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = tnn.ModuleList(
            [TGEGLU(dim, inner), tnn.Dropout(0.0), tnn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class TBasicBlock(tnn.Module):
    """ldm BasicTransformerBlock; cross=False drops attn2/norm2 (the
    temporal transformer's only_self_att configuration)."""

    def __init__(self, dim, heads, head_dim, ctx_dim=None, cross=True):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, head_dim)
        if cross:
            self.norm2 = tnn.LayerNorm(dim)
            self.attn2 = TAttention(dim, heads, head_dim, ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)
        self.cross = cross

    def forward(self, x, context=None):
        x = x + self.attn1(self.norm1(x))
        if self.cross:
            x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TSpatialTransformer(tnn.Module):
    def __init__(self, c, heads, head_dim, ctx_dim, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(c, heads, head_dim, ctx_dim)])
        self.proj_out = tnn.Linear(c, c)

    def forward(self, x, ctx):  # x [B, F, C, H, W]; ctx [B, L, D]
        b, f, c, h, w = x.shape
        res = x
        hh = self.norm(x.reshape(b * f, c, h, w))
        hh = hh.reshape(b * f, c, h * w).transpose(1, 2)   # [BF, HW, C]
        hh = self.proj_in(hh)
        ctx_f = ctx.repeat_interleave(f, dim=0)
        hh = self.transformer_blocks[0](hh, ctx_f)
        hh = self.proj_out(hh)
        hh = hh.transpose(1, 2).reshape(b, f, c, h, w)
        return res + hh


class TTemporalTransformer(tnn.Module):
    def __init__(self, c, heads, head_dim, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(c, heads, head_dim, cross=False)])
        self.proj_out = tnn.Linear(c, c)

    def forward(self, x):       # x [B, F, C, H, W]
        b, f, c, h, w = x.shape
        res = x
        # inflated=False GroupNorm: stats span frames -> [B, C, F, H, W]
        hh = self.norm(x.permute(0, 2, 1, 3, 4))
        hh = hh.permute(0, 3, 4, 2, 1).reshape(b * h * w, f, c)
        hh = self.proj_in(hh)
        hh = self.transformer_blocks[0](hh)
        hh = self.proj_out(hh)
        hh = hh.reshape(b, h, w, f, c).permute(0, 3, 4, 1, 2)
        return res + hh


class TDownsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.op = tnn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):       # [B, F, C, H, W]
        b, f = x.shape[:2]
        y = self.op(x.reshape(b * f, *x.shape[2:]))
        return y.reshape(b, f, *y.shape[1:])


class TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        b, f = x.shape[:2]
        xf = x.reshape(b * f, *x.shape[2:])
        y = self.conv(tF.interpolate(xf, scale_factor=2, mode="nearest"))
        return y.reshape(b, f, *y.shape[1:])


def _enc_blocks(cfg, in_channels):
    """torch input_blocks mirroring unet_v2v._plan."""
    enc, _, mid_ch, _ = _plan(cfg)
    heads = {c: c // cfg.head_dim for c in
             [cfg.dim * m for m in (1,) + tuple(cfg.dim_mult)]}
    blocks = tnn.ModuleList()
    prev = in_channels
    for spec in enc:
        mods = tnn.ModuleList()
        ch = spec["ch"]
        if spec["kind"] == "init":
            mods.append(tnn.Conv2d(prev, cfg.dim, 3, padding=1))
            mods.append(TTemporalTransformer(cfg.dim, heads[cfg.dim],
                                             cfg.head_dim, cfg.norm_groups))
            prev = cfg.dim
        elif spec["kind"] == "down":
            mods.append(TDownsample(ch))
        else:
            mods.append(TResBlock(prev, ch, cfg.embed_dim, cfg.norm_groups))
            if spec["attn"]:
                mods.append(TSpatialTransformer(
                    ch, heads[ch], cfg.head_dim, cfg.context_dim,
                    cfg.norm_groups))
                mods.append(TTemporalTransformer(ch, heads[ch], cfg.head_dim,
                                                 cfg.norm_groups))
            prev = ch
        blocks.append(mods)
    return blocks, mid_ch, heads


class TMid(tnn.Module):
    def __init__(self, cfg, mid_ch, heads):
        super().__init__()
        self.mods = tnn.ModuleList([
            TResBlock(mid_ch, mid_ch, cfg.embed_dim, cfg.norm_groups),
            TSpatialTransformer(mid_ch, heads[mid_ch], cfg.head_dim,
                                cfg.context_dim, cfg.norm_groups),
            TTemporalTransformer(mid_ch, heads[mid_ch], cfg.head_dim,
                                 cfg.norm_groups),
            TResBlock(mid_ch, mid_ch, cfg.embed_dim, cfg.norm_groups)])


def _run_blocklist(mods, h, emb, ctx):
    for m in mods:
        if isinstance(m, TResBlock):
            h = m(h, emb)
        elif isinstance(m, TSpatialTransformer):
            h = m(h, ctx)
        elif isinstance(m, tnn.Conv2d):
            b, f = h.shape[:2]
            y = m(h.reshape(b * f, *h.shape[2:]))
            h = y.reshape(b, f, *y.shape[1:])
        else:                   # temporal transformer / down / upsample
            h = m(h)
    return h


class TUNet(tnn.Module):
    """Vid2VidSDUNet with the public state_dict naming."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.time_embed = tnn.Sequential(
            tnn.Linear(cfg.dim, cfg.embed_dim), tnn.SiLU(),
            tnn.Linear(cfg.embed_dim, cfg.embed_dim))
        self.input_blocks, mid_ch, heads = _enc_blocks(cfg, cfg.in_dim)
        self.middle_block = TMid(cfg, mid_ch, heads).mods
        dims = [cfg.dim * m for m in (1,) + tuple(cfg.dim_mult)]
        enc, shortcuts, _, min_scale = _plan(cfg)
        rev = list(reversed(dims[1:]))
        self.output_blocks = tnn.ModuleList()
        sc = list(shortcuts)
        scale = min_scale
        prev = mid_ch          # h channels entering the next block
        for i, cout in enumerate(rev):
            for j in range(cfg.num_res_blocks + 1):
                skip_ch = sc.pop()
                mods = tnn.ModuleList(
                    [TResBlock(prev + skip_ch, cout, cfg.embed_dim,
                               cfg.norm_groups)])
                if scale in cfg.attn_scales:
                    mods.append(TSpatialTransformer(
                        cout, heads[cout], cfg.head_dim, cfg.context_dim,
                        cfg.norm_groups))
                    mods.append(TTemporalTransformer(
                        cout, heads[cout], cfg.head_dim, cfg.norm_groups))
                if i != len(rev) - 1 and j == cfg.num_res_blocks:
                    mods.append(TUpsample(cout))
                    scale *= 2
                self.output_blocks.append(mods)
                prev = cout
        self.out = tnn.Sequential(
            tnn.GroupNorm(cfg.norm_groups, cfg.dim), tnn.SiLU(),
            tnn.Conv2d(cfg.dim, cfg.out_dim, 3, padding=1))

    def forward(self, x, t, ctx, control=None):
        cfg = self.cfg
        b, f = x.shape[:2]
        temb = temb_t(t[:, None].repeat(1, f).reshape(-1), cfg.dim)
        emb = self.time_embed(temb).reshape(b, f, -1)
        h = x
        feats = []
        for mods in self.input_blocks:
            h = _run_blocklist(mods, h, emb, ctx)
            feats.append(h)
        h = _run_blocklist(self.middle_block, h, emb, ctx)
        if control is not None:
            control = list(control)
            h = h + control.pop()
        for mods in self.output_blocks:
            skip = feats.pop()
            if control is not None:
                skip = skip + control.pop()
            h = torch.cat([h, skip], dim=2)
            h = _run_blocklist(mods, h, emb, ctx)
        b, f = h.shape[:2]
        y = self.out(h.reshape(b * f, *h.shape[2:]))
        return y.reshape(b, f, *y.shape[1:])


class TControlNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.time_embed = tnn.Sequential(
            tnn.Linear(cfg.dim, cfg.embed_dim), tnn.SiLU(),
            tnn.Linear(cfg.embed_dim, cfg.embed_dim))
        self.hint_time_zero_linear = tnn.Linear(cfg.embed_dim, cfg.embed_dim)
        self.scale_cond_zero_linear = tnn.Linear(cfg.embed_dim,
                                                 cfg.embed_dim)
        self.input_blocks, mid_ch, heads = _enc_blocks(cfg, 2 * cfg.in_dim)
        self.middle_block = TMid(cfg, mid_ch, heads).mods
        enc, _, _, _ = _plan(cfg)
        self.zero_convs = tnn.ModuleList(
            [tnn.ModuleList([tnn.Conv2d(spec["ch"], spec["ch"], 1)])
             for spec in enc])
        self.middle_block_out = tnn.ModuleList(
            [tnn.Conv2d(mid_ch, mid_ch, 1)])

    def forward(self, x, t, ctx, hint, t_hint, mask_cond, s_cond):
        cfg = self.cfg
        b, f = x.shape[:2]
        temb = temb_t(t[:, None].repeat(1, f).reshape(-1), cfg.dim)
        emb = self.time_embed(temb).reshape(b, f, -1)
        he = self.time_embed(temb_t(t_hint, cfg.dim))[:, None, :]
        he = self.hint_time_zero_linear(he) * mask_cond[..., None]
        emb = emb + he
        se = self.time_embed(temb_t(s_cond, cfg.dim))[:, None, :]
        emb = emb + self.scale_cond_zero_linear(se)
        h = torch.cat([x, hint], dim=2)
        outs = []
        for mods, zc in zip(self.input_blocks, self.zero_convs):
            h = _run_blocklist(mods, h, emb, ctx)
            bf = h.shape[0] * h.shape[1]
            y = zc[0](h.reshape(bf, *h.shape[2:]))
            outs.append(y.reshape(*h.shape[:2], *y.shape[1:]))
        h = _run_blocklist(self.middle_block, h, emb, ctx)
        bf = h.shape[0] * h.shape[1]
        y = self.middle_block_out[0](h.reshape(bf, *h.shape[2:]))
        outs.append(y.reshape(*h.shape[:2], *y.shape[1:]))
        return outs


# --------------------------------------------------------------------------
# the golden
# --------------------------------------------------------------------------

def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


@pytest.mark.slow
def test_golden_controlled_v2v():
    torch.manual_seed(0)
    tunet = TUNet(CFG).eval()
    tcn = TControlNet(CFG).eval()
    _randomize(tunet, 1)
    _randomize(tcn, 2)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, F, CFG.in_dim, H, W)).astype(np.float32)
    hint = rng.normal(size=x.shape).astype(np.float32)
    ctx = rng.normal(size=(B, L, CFG.context_dim)).astype(np.float32)
    t = np.full((B,), 500.0, np.float32)
    t_hint = np.full((B,), 199.0, np.float32)
    s_cond = np.full((B,), 2.0, np.float32)
    mask = rng.uniform(size=(B, F)).round().astype(np.float32)

    with torch.no_grad():
        control = tcn(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(ctx), torch.from_numpy(hint),
                      torch.from_numpy(t_hint), torch.from_numpy(mask),
                      torch.from_numpy(s_cond))
        ref = tunet(torch.from_numpy(x), torch.from_numpy(t),
                    torch.from_numpy(ctx), control=control)
    ref = ref.numpy()

    # combined public state_dict -> our converter -> flax params
    sd = dict(tunet.state_dict())
    sd.update({f"VideoControlNet.{k}": v for k, v in
               tcn.state_dict().items()})
    conv = convert_v2v(sd, CFG)
    assert "_unmapped" not in conv, conv.get("_unmapped")

    model = ControlledV2VUNet(CFG)
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    hj = jnp.asarray(np.transpose(hint, (0, 1, 3, 4, 2)))
    params = model.init(jax.random.PRNGKey(0), xj, jnp.asarray(t),
                        jnp.asarray(ctx), hj, t_hint=jnp.asarray(t_hint),
                        mask_cond=jnp.asarray(mask),
                        s_cond=jnp.asarray(s_cond))
    params, missing, unexpected = apply_converted(params, conv)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    out = model.apply(params, xj, jnp.asarray(t), jnp.asarray(ctx), hj,
                      t_hint=jnp.asarray(t_hint), mask_cond=jnp.asarray(mask),
                      s_cond=jnp.asarray(s_cond))
    out = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))

    assert out.shape == ref.shape
    err = np.abs(out - ref)
    scale = np.abs(ref).mean() + 1e-6
    assert err.max() / scale < 2e-2, (err.max(), scale)
    assert err.mean() / scale < 2e-3, (err.mean(), scale)
