"""Panorama-aware cross-branch attention (WarpAttn).

Bidirectional masked cross-attention between the panorama feature map and the
m perspective feature maps, with spherical positional encodings
(reference src/modules/attn_perspano.py + src/modules/transformer.py).

TPU design: the correspondence bias masks and spherical PEs are precomputed
constants (geometry/corr_masks.warp_geometry) instead of per-call numpy warps;
the stochastic antipodal-mask choice is a traced boolean selecting between the
two precomputed bias variants. Attention runs through the shared fused
attention op (additive-bias flash attention on TPU).

Note: the reference also constructs `self.mv_attn` (attn_perspano.py:15) but
never calls it — dead weights. The converter accepts and drops them.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Attention, FeedForward, Dtype, LayerNorm


class WarpTransformerBlock(nn.Module):
    """Pre-norm cross-attention block with zero-initialized output
    projections and optional query PE
    (reference src/modules/transformer.py:130-167; quirk preserved: the SAME
    norm1 parameters normalize both query and context)."""
    dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = LayerNorm(dtype=self.dtype)
        self.norm2 = LayerNorm(dtype=self.dtype)
        self.attn1 = Attention(self.dim, heads=self.dim // 32, dim_head=32,
                               out_zero_init=True, dtype=self.dtype)
        self.ff = FeedForward(self.dim, out_zero_init=True, dtype=self.dtype)

    def __call__(self, x, context, bias=None, query_pe=None, bias_t=None):
        q = x if query_pe is None else x + query_pe
        q = self.norm1(q)
        c = self.norm1(context)
        x = self.attn1(q, context=c, bias=bias, bias_t=bias_t) + x
        x = self.ff(self.norm2(x)) + x
        return x


class WarpAttn(nn.Module):
    """Bidirectional pano <-> perspective coupling at one feature resolution
    (reference src/modules/attn_perspano.py:10-99). One transformer block is
    shared by both directions (reference :80,:92)."""
    dim: int
    num_views: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.transformer = WarpTransformerBlock(self.dim, dtype=self.dtype)

    def __call__(self, pers_x, equi_x, geom, use_opp):
        """pers_x: [B*M, F, h, w, C]; equi_x: [B, F, eh, ew, C];
        geom: dict from warp_geometry(); use_opp: traced bool scalar
        selecting the antipodal mask variant."""
        m = self.num_views
        bm, F, h, w, C = pers_x.shape
        b, _, eh, ew, _ = equi_x.shape

        pers_bias = jnp.where(use_opp, geom["pers_bias_opp"], geom["pers_bias"])
        equi_bias = jnp.where(use_opp, geom["equi_bias_opp"], geom["equi_bias"])
        # precomputed transposes for the [T, D, S]-layout shared-bias kernel
        pers_bias_t = equi_bias_t = None
        if "pers_bias_T" in geom:
            pers_bias_t = jnp.where(use_opp, geom["pers_bias_opp_T"],
                                    geom["pers_bias_T"])
            equi_bias_t = jnp.where(use_opp, geom["equi_bias_opp_T"],
                                    geom["equi_bias_T"])
        pers_pe = jnp.asarray(geom["pers_pe"], self.dtype)  # [m, h, w, C]
        equi_pe = jnp.asarray(geom["equi_pe"], self.dtype)  # [eh, ew, C]

        # ---- direction 1: ERP queries attend to perspective keys ----
        q = equi_x.reshape(b * F, eh * ew, C)
        pers_5 = pers_x.reshape(b, m, F, h, w, C)
        kv = (pers_5 + pers_pe[None, :, None]).transpose(0, 2, 1, 3, 4, 5)
        kv = kv.reshape(b * F, m * h * w, C)
        equi_pe_flat = jnp.broadcast_to(
            equi_pe.reshape(1, eh * ew, C), (b * F, eh * ew, C))
        equi_out = self.transformer(
            q, kv, bias=pers_bias.astype(jnp.float32)[None, None],
            query_pe=equi_pe_flat,
            bias_t=None if pers_bias_t is None
            else pers_bias_t.astype(jnp.float32))
        equi_out = equi_out.reshape(b, F, eh, ew, C)

        # ---- direction 2: perspective queries attend to ERP keys ----
        q = pers_5.transpose(0, 2, 1, 3, 4, 5).reshape(b * F, m * h * w, C)
        kv = (equi_x + equi_pe[None, None]).reshape(b * F, eh * ew, C)
        pers_pe_flat = jnp.broadcast_to(
            pers_pe.reshape(1, m * h * w, C), (b * F, m * h * w, C))
        pers_out = self.transformer(
            q, kv, bias=equi_bias.astype(jnp.float32)[None, None],
            query_pe=pers_pe_flat,
            bias_t=None if equi_bias_t is None
            else equi_bias_t.astype(jnp.float32))
        pers_out = pers_out.reshape(b, F, m, h, w, C)
        pers_out = pers_out.transpose(0, 2, 1, 3, 4, 5).reshape(bm, F, h, w, C)

        return pers_out, equi_out
