"""Experimental motion-attention kernels: eliminate the HBM layout
transposes around the packed tiny-sequence kernel by consuming the natural
[B, F, HW, C] activation layout and packing G spatial locations into a
512-token sequence inside VMEM.

Variants measured by scripts/motion_fused_micro.py; the winner graduates
into ops/pallas_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H, D, G, F,
                  exp_bf16=False):
    """Blocks arrive as [1, F, G, C] (natural layout slice). In-kernel:
    swap (F, G) -> (G, F) on sublanes, flatten to the packed [G*F, C]
    sequence, run block-diagonal attention, write back in natural layout."""
    bias = b_ref[0].astype(jnp.float32)                    # [G*F, G*F]
    qp = jnp.swapaxes(q_ref[0], 0, 1).reshape(G * F, H * D)
    kp = jnp.swapaxes(k_ref[0], 0, 1).reshape(G * F, H * D)
    vp = jnp.swapaxes(v_ref[0], 0, 1).reshape(G * F, H * D)
    outs = []
    for h in range(H):
        q = qp[:, h * D:(h + 1) * D]
        k = kp[:, h * D:(h + 1) * D]
        v = vp[:, h * D:(h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        if exp_bf16:
            p = jnp.exp((s - m).astype(jnp.bfloat16)).astype(v.dtype)
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            pf = jnp.exp(s - m)
            denom = jnp.sum(pf, axis=-1, keepdims=True)
            p = (pf / denom).astype(v.dtype)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if exp_bf16:
            o = o / denom
        outs.append(o.astype(o_ref.dtype))
    out = jnp.concatenate(outs, axis=1)
    o_ref[0] = jnp.swapaxes(out.reshape(G, F, H * D), 0, 1)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "G",
                                             "exp_bf16", "interpret"))
def fused_motion_attention(q, k, v, bias, scale, heads, G=32,
                           exp_bf16=False, interpret=False):
    """q/k/v: [B, F, HW, C] natural layout. bias: [1, G*F, G*F] block-diag.
    Returns [B, F, HW, C]."""
    B, F, HW, C = q.shape
    D = C // heads
    assert HW % G == 0
    kernel = functools.partial(_fused_kernel, scale=scale, H=heads, D=D,
                               G=G, F=F, exp_bf16=exp_bf16)
    grid = (B, HW // G)
    spec = pl.BlockSpec((1, F, G, C), lambda b, t: (b, 0, t, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, G * F, G * F), lambda b, t: (0, 0, 0))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, F, HW, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, bias)


def _diag_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, H, D, G, F):
    """Like _fused_kernel but avoids the G x logits waste: computes the full
    packed [G*F, G*F] score matmul on the MXU (cheap), then extracts only
    the G diagonal [F, F] blocks into a compact [G*F, F] tensor for the
    softmax (G x fewer exp/max/sum), scatters probabilities back into a
    zeroed [G*F, G*F] for the PV matmul."""
    qp = jnp.swapaxes(q_ref[0], 0, 1).reshape(G * F, H * D)
    kp = jnp.swapaxes(k_ref[0], 0, 1).reshape(G * F, H * D)
    vp = jnp.swapaxes(v_ref[0], 0, 1).reshape(G * F, H * D)
    outs = []
    for h in range(H):
        q = qp[:, h * D:(h + 1) * D]
        k = kp[:, h * D:(h + 1) * D]
        v = vp[:, h * D:(h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale                                       # [GF, GF]
        # compact diagonal blocks: [G*F, F]
        sc = jnp.concatenate(
            [s[g * F:(g + 1) * F, g * F:(g + 1) * F] for g in range(G)], 0)
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        # per-location PV via (G*F, F) x per-block v rows: assemble the
        # block-diagonal probabilities by concatenating padded row blocks
        rows = []
        for g in range(G):
            blk = p[g * F:(g + 1) * F]                       # [F, F]
            pads = []
            if g:
                pads.append(jnp.zeros((F, g * F), blk.dtype))
            pads.append(blk)
            if g < G - 1:
                pads.append(jnp.zeros((F, (G - 1 - g) * F), blk.dtype))
            rows.append(jnp.concatenate(pads, 1))
        pfull = jnp.concatenate(rows, 0)
        o = jax.lax.dot_general(pfull, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    out = jnp.concatenate(outs, axis=1)
    o_ref[0] = jnp.swapaxes(out.reshape(G, F, H * D), 0, 1)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "G",
                                             "interpret"))
def diag_motion_attention(q, k, v, scale, heads, G=32, interpret=False):
    B, F, HW, C = q.shape
    D = C // heads
    kernel = functools.partial(_diag_kernel, scale=scale, H=heads, D=D,
                               G=G, F=F)
    grid = (B, HW // G)
    spec = pl.BlockSpec((1, F, G, C), lambda b, t: (b, 0, t, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, F, HW, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
