"""Pallas TPU flash attention with *broadcast* additive bias.

Why not jax's bundled pallas flash attention: its `ab` bias operand must be
materialized at [B, H, Sq, Sk]. The WarpAttn correspondence masks are shared
across batch(frames) and heads — at the stage-1 resolution a materialized
bias would be ~13 GB, while the shared mask is 42 MB. This kernel indexes a
[1|B, 1|H, Sq, Sk] bias with broadcast semantics, so the mask is read once
per (q-block, k-block) regardless of batch/head count.

Algorithm: standard streaming-softmax flash attention (online max/sum
rescaling), accumulating across k-blocks in VMEM scratch with the k-block as
the innermost (sequential) grid dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_v2() -> bool:
    """Force the transposed-layout kernel everywhere it applies (including
    biased sites). The transposed kernel is the default for long no-bias
    D<128 sites; biased broadcast sites use the shared-bias kernel.
    (KernelConfig.attn_v2 — I360_KERNELS=+attn_v2.)"""
    from .dispatch import kernel_config
    return kernel_config().attn_v2


def _attn_v1() -> bool:
    """Escape hatch: force the [S, D]-block v1 kernel for all flash sites
    (KernelConfig.attn_v1)."""
    from .dispatch import kernel_config
    return kernel_config().attn_v1


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, *, scale, nk, bk,
                  bias_resident=False):
    ik = pl.program_id(3)  # k-block: innermost grid dim

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)           # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)           # [bk, d]
    s = jax.lax.dot_general(q * scale, k,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bk]
    if bias_ref is not None:
        if bias_resident:
            # the q-block's full [bq, Sk] bias row is resident in VMEM and
            # the SAME block is revisited across the (batch, head, k) grid
            # dims, so Mosaic fetches it once per q-block instead of once
            # per (batch, head, k-block)
            off = pl.multiple_of(ik * bk, bk)
            s = s + bias_ref[0, 0, :, pl.ds(off, bk)].astype(jnp.float32)
        else:
            s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:, :1]                          # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)     # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                # [bq, 1]
    p = jnp.exp(s - m_new)                         # [bq, bk]

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _done():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0] = m_scr[:, :1] + jnp.log(denom)


def _flash_kernel_t(q_ref, k_ref, v_ref, bias_ref, o_ref,
                    m_scr, l_scr, acc_scr, *, scale, nk, bk,
                    bias_resident=False):
    """Transposed-layout kernel: q/k/v blocks are [D, bq]/[D, bk] so the
    sequence axis sits on TPU lanes — for head dims < 128 this avoids the
    lane padding (up to 4x at D=32) that would otherwise inflate the k/v
    HBM streaming traffic."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)           # [d, bq]
    k = k_ref[0, 0].astype(jnp.float32)           # [d, bk]
    s = jax.lax.dot_general(q * scale, k,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bk]
    if bias_ref is not None:
        if bias_resident:
            off = pl.multiple_of(ik * bk, bk)
            s = s + bias_ref[0, 0, :, pl.ds(off, bk)].astype(jnp.float32)
        else:
            s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)           # [d, bk]
    pv = jax.lax.dot_general(p, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq, d]
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _done():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_bhds(q, k, v, bias, scale, block_q=512, block_k=512,
                interpret=False):
    """Transposed layout: q [B, H, D, Sq]; k/v [B, H, D, Sk];
    bias [1|B, 1|H, Sq, Sk] or None. Returns [B, H, Sq, D]."""
    B, H, D, Sq = q.shape
    Sk = k.shape[3]
    bq = min(block_q, max(128, 1 << (Sq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (Sk - 1).bit_length()))

    qp = _pad_to(q, 3, bq)
    kp = _pad_to(k, 3, bk)
    vp = _pad_to(v, 3, bk)
    Sqp, Skp = qp.shape[3], vp.shape[3]
    nq, nk = Sqp // bq, Skp // bk

    if bias is None and Skp != Sk:
        bias = jnp.zeros((1, 1, Sq, Sk), jnp.float32)
    if bias is not None:
        bias = _pad_to(_pad_to(bias, 3, bk, NEG_INF), 2, bq)
        bb, hb = bias.shape[0], bias.shape[1]

    grid = (nq, B, H, nk)
    in_specs = [
        pl.BlockSpec((1, 1, D, bq), lambda iq, b, h, ik: (b, h, 0, iq)),
        pl.BlockSpec((1, 1, D, bk), lambda iq, b, h, ik: (b, h, 0, ik)),
        pl.BlockSpec((1, 1, D, bk), lambda iq, b, h, ik: (b, h, 0, ik)),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        broadcast_bias = bb == 1 and hb == 1
        bias_resident = broadcast_bias and bq * Skp * bias.dtype.itemsize \
            <= 4 * 1024 * 1024
        if bias_resident:
            in_specs.append(pl.BlockSpec(
                (1, 1, bq, Skp), lambda iq, b, h, ik: (0, 0, iq, 0)))
        else:
            def bias_index(iq, b, h, ik):
                return (b if bb > 1 else 0, h if hb > 1 else 0, iq, ik)
            in_specs.append(pl.BlockSpec((1, 1, bq, bk), bias_index))
        args.append(bias)
        kernel = functools.partial(_flash_kernel_t, scale=scale, nk=nk,
                                   bk=bk, bias_resident=bias_resident)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, m, l, a, **kw:
            _flash_kernel_t(qr, kr, vr, None, o, m, l, a, **kw),
            scale=scale, nk=nk, bk=bk)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda iq, b, h, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sqp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[:, :, :Sq]


def _pad_to(x, axis, mult, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _mk_flash_kernel(has_bias, with_lse, **kw):
    """Adapt pallas ref arity (optional bias input, optional lse output) to
    the _flash_kernel signature."""
    def kernel(*refs):
        i = 3
        bias = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        o = refs[i]
        i += 1
        lse = refs[i] if with_lse else None
        i += 1 if with_lse else 0
        m, l, acc = refs[i:i + 3]
        _flash_kernel(refs[0], refs[1], refs[2], bias, o, lse, m, l, acc,
                      **kw)
    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "with_lse"))
def _flash_bhsd(q, k, v, bias, scale, block_q=512, block_k=512,
                interpret=False, with_lse=False):
    """q [B, H, Sq, D]; k/v [B, H, Sk, D]; bias [1|B, 1|H, Sq, Sk] or None.
    With with_lse=True additionally returns the per-row logsumexp
    [B, H, Sqp, 1] f32 (padded rows included) for the flash backward."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    bq = min(block_q, max(128, 1 << (Sq - 1).bit_length()))
    bq = min(bq, block_q)
    bk = min(block_k, max(128, 1 << (Sk - 1).bit_length()))
    bk = min(bk, block_k)

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    Sqp, Skp = qp.shape[2], vp.shape[2]
    nq, nk = Sqp // bq, Skp // bk

    need_kmask = Skp != Sk
    if bias is None and need_kmask:
        bias = jnp.zeros((1, 1, Sq, Sk), jnp.float32)
    if bias is not None:
        bias = _pad_to(_pad_to(bias.astype(jnp.float32), 3, bk, NEG_INF),
                       2, bq)
        bb, hb = bias.shape[0], bias.shape[1]

    use_resident = _attn_v2()
    if use_resident:
        # v2 grid order: q-blocks outermost so a broadcast bias row stays
        # VMEM-resident across the (b, h, ik) inner dims (Mosaic revisiting)
        grid = (nq, B, H, nk)
        in_specs = [
            pl.BlockSpec((1, 1, bq, D), lambda iq, b, h, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda iq, b, h, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda iq, b, h, ik: (b, h, ik, 0)),
        ]
        out_spec = pl.BlockSpec((1, 1, bq, D),
                                lambda iq, b, h, ik: (b, h, iq, 0))
    else:
        grid = (B, H, nq, nk)
        in_specs = [
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0)),
        ]
        out_spec = pl.BlockSpec((1, 1, bq, D),
                                lambda b, h, iq, ik: (b, h, iq, 0))
    args = [qp, kp, vp]
    if bias is not None:
        broadcast_bias = bb == 1 and hb == 1
        bias_resident = (use_resident and broadcast_bias
                         and bq * Skp * bias.dtype.itemsize
                         <= 4 * 1024 * 1024)
        if bias_resident:
            in_specs.append(pl.BlockSpec(
                (1, 1, bq, Skp), lambda iq, b, h, ik: (0, 0, iq, 0)))
        elif use_resident:
            def bias_index(iq, b, h, ik):
                return (b if bb > 1 else 0, h if hb > 1 else 0, iq, ik)
            in_specs.append(pl.BlockSpec((1, 1, bq, bk), bias_index))
        else:
            def bias_index(b, h, iq, ik):
                return (b if bb > 1 else 0, h if hb > 1 else 0, iq, ik)
            in_specs.append(pl.BlockSpec((1, 1, bq, bk), bias_index))
        args.append(bias)
        bias_kw = dict(bias_resident=bias_resident)
    else:
        bias_kw = {}
    kernel = _mk_flash_kernel(bias is not None, with_lse, scale=scale,
                              nk=nk, bk=bk, **bias_kw)

    out_shapes = [jax.ShapeDtypeStruct((B, H, Sqp, D), q.dtype)]
    out_specs = [out_spec]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Sqp, 1), jnp.float32))
        if use_resident:
            out_specs.append(pl.BlockSpec(
                (1, 1, bq, 1), lambda iq, b, h, ik: (b, h, iq, 0)))
        else:
            out_specs.append(pl.BlockSpec(
                (1, 1, bq, 1), lambda b, h, iq, ik: (b, h, iq, 0)))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if with_lse:
        out, lse = out
        return out[:, :, :Sq], lse
    return out[:, :, :Sq]


def _tiny_packed_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H, D,
                        T):
    """Whole-sequence attention for packed tiny-sequence sites. Blocks
    arrive in the natural [T, S, H*D] layout (no host-side transposes);
    heads are static lane slices. The [Sq, Sk] logits live only in VMEM."""
    bias = b_ref[0].astype(jnp.float32)                    # [Sq, Sk]
    for t in range(T):
        for h in range(H):
            # dots run in the input dtype (bf16 on the hot path — the f32
            # variant is ~8x slower on the MXU) with f32 accumulation;
            # probs are cast to v.dtype before PV exactly like the einsum
            # reference path
            q = q_ref[t, :, h * D:(h + 1) * D]
            k = k_ref[t, :, h * D:(h + 1) * D]
            v = v_ref[t, :, h * D:(h + 1) * D]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[t, :, h * D:(h + 1) * D] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "interpret",
                                             "t_rows"))
def tiny_packed_attention(q, k, v, bias, scale, heads, interpret=False,
                          t_rows=None):
    """q [B, Sq, H*D]; k/v [B, Sk, H*D]; bias [1, Sq, Sk] f32 (shared by
    every batch element and head — e.g. the block-diagonal packing mask).
    Returns [B, Sq, H*D] in q.dtype. Requires Sq/Sk small enough that the
    full [Sq, Sk] logits fit VMEM (packed motion-module sequences: <=512)."""
    B, Sq, C = q.shape
    Sk = k.shape[1]
    D = C // heads
    # several packed rows per grid step to amortize per-step overhead
    T = t_rows if t_rows else max(1, 2048 // max(Sq, Sk))
    while T > 1 and B % T:
        T //= 2
    kernel = functools.partial(_tiny_packed_kernel, scale=scale, H=heads,
                               D=D, T=T)
    return pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, Sq, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, Sk, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, Sk, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Sq, Sk), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, Sq, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sq, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, bias)


def _striped_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H, D, G,
                    F):
    """Temporal (frame-axis) attention consumed in the NATURAL video
    activation layout: blocks are [1, F, G, C] column slices of the 4D
    [B, F, HW, C] activations — no host-side reshape exists at all (the
    former 5D [B,F,T,G,C] host reshape gave XLA's algebraic simplifier a
    seam to re-fuse the producing qkv dots into rotated-layout
    batch-window convolutions, r4 HLO). Flattening (F, G) -> F*G in-kernel
    is a free row-major reshape, giving a packed sequence whose row f*G+g
    interleaves G spatial locations; under the striped bias (0 iff
    i==j mod G) softmax over the packed axis equals G independent
    per-location softmaxes over frames."""
    bias = b_ref[0].astype(jnp.float32)                    # [F*G, F*G]
    S = F * G
    qp = q_ref[0].reshape(S, H * D)
    kp = k_ref[0].reshape(S, H * D)
    vp = v_ref[0].reshape(S, H * D)
    for h in range(H):
        q = qp[:, h * D:(h + 1) * D]
        k = kp[:, h * D:(h + 1) * D]
        v = vp[:, h * D:(h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, :, h * D:(h + 1) * D] = o.astype(o_ref.dtype).reshape(
            F, G, D)


@functools.lru_cache(maxsize=16)
def _striped_bias(G: int, F: int):
    """[1, F*G, F*G] additive f32 bias: 0 where i == j (mod G) — the
    interleaved-packing analogue of the block-diagonal mask."""
    import numpy as np
    idx = np.arange(F * G)
    m = np.where((idx[:, None] - idx[None, :]) % G == 0, 0.0,
                 -1e9).astype(np.float32)
    return m[None]


@functools.partial(jax.jit, static_argnames=("scale", "heads", "G",
                                             "interpret"))
def temporal_packed_attention(q, k, v, scale, heads, G, interpret=False):
    """Frame-axis attention in the natural layout. q/k/v: [B, F, HW, C]
    with HW % G == 0; returns [B, F, HW, C] in q.dtype. Each grid step
    packs G spatial locations into one F*G-token sequence (free reshape)
    under the striped bias."""
    B, F, HW, C = q.shape
    D = C // heads
    assert HW % G == 0, (HW, G)
    T = HW // G
    bias = jnp.asarray(_striped_bias(G, F))
    kernel = functools.partial(_striped_kernel, scale=scale, H=heads, D=D,
                               G=G, F=F)
    # block directly over the HW axis of the 4D activations (no host-side
    # 5D reshape — see _striped_kernel docstring)
    spec = pl.BlockSpec((1, F, G, C), lambda b, t: (b, 0, t, 0))
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, F * G, F * G), lambda b, t: (0, 0, 0))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, F, HW, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, bias)
    return out


def _mh_flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                     scale, nk, bk, H, D, Sk):
    """Natural-layout multi-head flash kernel: blocks arrive as
    [1, bq|bk, H*D] slices of the [B, S, H*D] activations — the exact
    layout the QKV projections produce — and heads are static lane slices
    inside the kernel. No host-side [B,S,H,D]->[B,H,S,D] transposes exist
    around this kernel, which matters more than the kernel body: those
    transposes are pure dim-permutations that XLA layout assignment folds
    into BITCASTS, rotating the physical layout of the whole surrounding
    stage (sequence minor-most) and turning every adjacent matmul into a
    ~48 TF/s batch-in-sublanes convolution (per-HLO profile, r4). Dots run
    in the input dtype (bf16 hot path) with f32 accumulation; streaming
    softmax state is per-head in lane-sliced scratch."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kmask = Sk % bk != 0
    for h in range(H):
        q = q_ref[0, :, h * D:(h + 1) * D]            # [bq, D]
        k = k_ref[0, :, h * D:(h + 1) * D]            # [bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale                                  # [bq, bk] f32
        if kmask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * bk
            s = jnp.where(col < Sk, s, NEG_INF)

        m_prev = m_scr[h, :, :1]                       # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_scr[h, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, :, h * D:(h + 1) * D]            # [bk, D]
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        cols = slice(h * D, (h + 1) * D)
        acc_scr[:, cols] = acc_scr[:, cols] * alpha + pv
        m_scr[h] = jnp.broadcast_to(m_new, m_scr.shape[1:])
        l_scr[h] = jnp.broadcast_to(l_new, l_scr.shape[1:])

        @pl.when(ik == nk - 1)
        def _done():
            denom = l_scr[h, :, :1]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[0, :, cols] = (acc_scr[:, cols] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block_q",
                                             "block_k", "interpret"))
def mh_flash_attention(q, k, v, scale, heads, block_q=None, block_k=None,
                       interpret=False):
    """Flash attention in the NATURAL activation layout. q [B, Sq, H*D],
    k/v [B, Sk, H*D]; returns [B, Sq, H*D] in q.dtype. The replacement for
    the transposed `_flash_bhsd` route on no-bias sites: the [B,S,H,D]
    reshapes at the call sites are free (row-major), so the whole
    attention op neither forces nor propagates a rotated layout."""
    B, Sq, C = q.shape
    Sk = k.shape[1]
    D = C // heads
    assert C == heads * D, (C, heads)
    if block_q is None:
        block_q = 1024 if min(Sq, Sk) >= 2048 else 512
    if block_k is None:
        block_k = 1024 if min(Sq, Sk) >= 2048 else 512
    bq = min(block_q, max(128, 1 << (Sq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (Sk - 1).bit_length()))

    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    Sqp, Skp = qp.shape[1], vp.shape[1]
    nq, nk = Sqp // bq, Skp // bk

    kernel = functools.partial(_mh_flash_kernel, scale=scale, nk=nk, bk=bk,
                               H=heads, D=D, Sk=Sk)
    out = pl.pallas_call(
        kernel,
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, C), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, C), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sqp, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((heads, bq, 128), jnp.float32),
            pltpu.VMEM((heads, bq, 128), jnp.float32),
            pltpu.VMEM((bq, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Sq]


def _shared_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref,
                        ml_scr, acc_scr, *, scale, nk, T):
    """Flash kernel over T folded (batch*head) rows per grid step with ONE
    shared [bq, bk] bias block — the bias is streamed once per row-chunk
    instead of once per (batch, head) pair (the WarpAttn masks are shared
    by every frame and head; at the biggest warp site the v1 layout moved
    ~13 GB of bias per call, ~0.8 GB with T=16). The running max and sum
    share one scratch buffer (m in lanes :64, l in lanes 64:) to halve the
    row-state VMEM."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        ml_scr[:] = jnp.concatenate(
            [jnp.full((ml_scr.shape[0], 64), NEG_INF, jnp.float32),
             jnp.zeros((ml_scr.shape[0], 64), jnp.float32)], axis=1)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bias = b_ref[:].astype(jnp.float32)                   # [bq, bk]
    bq = bias.shape[0]
    for t in range(T):
        q = q_ref[t].astype(jnp.float32)                  # [bq, d]
        k = k_ref[t].astype(jnp.float32)                  # [bk, d]
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias
        rows = slice(t * bq, (t + 1) * bq)
        m_prev = ml_scr[rows, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = (ml_scr[rows, 64:65] * alpha
                 + jnp.sum(p, axis=-1, keepdims=True))
        v = v_ref[t].astype(jnp.float32)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[rows] = acc_scr[rows] * alpha + pv
        ml_scr[rows] = jnp.concatenate(
            [jnp.broadcast_to(m_new, (bq, 64)),
             jnp.broadcast_to(l_new, (bq, 64))], axis=1)

        @pl.when(ik == nk - 1)
        def _done():
            denom = ml_scr[rows, 64:65]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[t] = (acc_scr[rows] / denom).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[t] = ml_scr[rows, :1] + jnp.log(denom)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "t_rows", "interpret",
                                             "with_lse"))
def _flash_shared_bias(q, k, v, bias, scale, block_q=512, block_k=512,
                       t_rows=None, interpret=False, with_lse=False):
    """Flash attention for a [1, 1, Sq, Sk]-broadcast bias, (batch, head)
    folded: q [BH, Sq, D], k/v [BH, Sk, D], bias [Sq, Sk] (any float
    dtype). Returns [BH, Sq, D] in q.dtype (+ lse [BH, Sqp, 1] f32 when
    with_lse)."""
    BH, Sq, D = q.shape
    Sk = k.shape[1]
    bq = min(block_q, max(128, 1 << (Sq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (Sk - 1).bit_length()))
    T = t_rows or 16
    while T > 1 and BH % T:
        T //= 2

    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    Sqp, Skp = qp.shape[1], vp.shape[1]
    nq, nk = Sqp // bq, Skp // bk
    bias = _pad_to(_pad_to(bias, 1, bk, NEG_INF), 0, bq)

    base = functools.partial(_shared_bias_kernel, scale=scale, nk=nk, T=T)
    if with_lse:
        kernel = base
    else:
        def kernel(q_r, k_r, v_r, b_r, o_r, ml, acc):
            base(q_r, k_r, v_r, b_r, o_r, None, ml, acc)
    out_shapes = [jax.ShapeDtypeStruct((BH, Sqp, D), q.dtype)]
    out_specs = [pl.BlockSpec((T, bq, D), lambda ib, iq, ik: (ib, iq, 0))]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((BH, Sqp, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((T, bq, 1),
                                      lambda ib, iq, ik: (ib, iq, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(BH // T, nq, nk),
        in_specs=[
            pl.BlockSpec((T, bq, D), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((T, bk, D), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((T, bk, D), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((bq, bk), lambda ib, iq, ik: (iq, ik)),
        ],
        out_specs=tuple(out_specs) if with_lse else out_specs[0],
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((T * bq, 128), jnp.float32),
            pltpu.VMEM((T * bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, bias)
    if with_lse:
        return out[0][:, :Sq], out[1]
    return out[:, :Sq]


def _shared_bias_kernel_t(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref,
                          ml_scr, acc_scr, *, scale, nk, T, D):
    """Fully-transposed shared-bias flash kernel: blocks are [T, D, S]
    (head dim on SUBLANES — D=32 warp heads waste no lanes in DMA or VMEM,
    unlike the [S, D] layout which pads 32 -> 128 = 4x), the bias block is
    [bk, bq] (pre-transposed host-side), per-query running max/sum live as
    [1, bq] lane-rows in a tiny (T*8, bq) scratch (m at sublane 0, l at 1),
    and the logits matmuls contract over sublanes. Dots run in the input
    dtype (bf16) with f32 accumulation."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        sub = jax.lax.broadcasted_iota(jnp.int32, ml_scr.shape, 0) % 8
        ml_scr[:] = jnp.where(sub == 0, NEG_INF, 0.0)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bias = b_ref[:].astype(jnp.float32)                   # [bk, bq]
    for t in range(T):
        q = q_ref[t]                                      # [D, bq]
        k = k_ref[t]                                      # [D, bk]
        s = jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias                              # [bk, bq]
        m_prev = ml_scr[8 * t:8 * t + 1, :]               # [1, bq]
        l_prev = ml_scr[8 * t + 1:8 * t + 2, :]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                            # [bk, bq]
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        v = v_ref[t]                                      # [D, bk]
        pv = jax.lax.dot_general(v, p.astype(v_ref.dtype),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rows = slice(t * D, (t + 1) * D)
        acc_scr[rows] = acc_scr[rows] * alpha + pv        # [D, bq]
        ml_scr[8 * t:8 * t + 1, :] = m_new
        ml_scr[8 * t + 1:8 * t + 2, :] = l_new

        @pl.when(ik == nk - 1)
        def _done():
            denom = ml_scr[8 * t + 1:8 * t + 2, :]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[t] = (acc_scr[rows] / denom).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[t] = ml_scr[8 * t:8 * t + 1, :] + jnp.log(denom)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "t_rows", "interpret",
                                             "with_lse"))
def _flash_shared_bias_t(q, k, v, bias_t, scale, block_q=1024,
                         block_k=1024, t_rows=32, interpret=False,
                         with_lse=False):
    """Transposed-layout shared-bias flash: q [BH, D, Sq], k/v [BH, D, Sk],
    bias_t [Sk, Sq] (TRANSPOSED bias). Returns [BH, D, Sq] (+ lse
    [BH, 1, Sqp] f32 when with_lse)."""
    BH, D, Sq = q.shape
    Sk = k.shape[2]
    bq = min(block_q, max(128, 1 << (Sq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (Sk - 1).bit_length()))
    T = t_rows
    while T > 1 and BH % T:
        T //= 2

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    Sqp, Skp = qp.shape[2], vp.shape[2]
    nq, nk = Sqp // bq, Skp // bk
    bias_t = _pad_to(_pad_to(bias_t, 0, bk, NEG_INF), 1, bq)

    base = functools.partial(_shared_bias_kernel_t, scale=scale, nk=nk,
                             T=T, D=D)
    if with_lse:
        kernel = base
    else:
        def kernel(q_r, k_r, v_r, b_r, o_r, ml, acc):
            base(q_r, k_r, v_r, b_r, o_r, None, ml, acc)
    out_shapes = [jax.ShapeDtypeStruct((BH, D, Sqp), q.dtype)]
    out_specs = [pl.BlockSpec((T, D, bq), lambda ib, iq, ik: (ib, 0, iq))]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((BH, 1, Sqp), jnp.float32))
        out_specs.append(pl.BlockSpec((T, 1, bq),
                                      lambda ib, iq, ik: (ib, 0, iq)))
    out = pl.pallas_call(
        kernel,
        grid=(BH // T, nq, nk),
        in_specs=[
            pl.BlockSpec((T, D, bq), lambda ib, iq, ik: (ib, 0, iq)),
            pl.BlockSpec((T, D, bk), lambda ib, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((T, D, bk), lambda ib, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((bk, bq), lambda ib, iq, ik: (ik, iq)),
        ],
        out_specs=tuple(out_specs) if with_lse else out_specs[0],
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((T * 8, bq), jnp.float32),
            pltpu.VMEM((T * D, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, bias_t)
    if with_lse:
        return out[0][:, :, :Sq], out[1]
    return out[:, :, :Sq]


# ---------------------------------------------------------------------------
# Flash backward: streaming dq / dk / dv kernels (no [Sq, Sk] in HBM).
# Standard two-kernel split: dq accumulates over k-blocks (innermost),
# dk/dv accumulate over q-blocks (innermost). p is recomputed from the
# forward's logsumexp; delta = rowsum(dO * O) is a cheap fused XLA op
# computed outside. Bias (the WarpAttn correspondence masks) is treated as
# a constant — no dbias is produced here (see ops/attention.py).
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, acc, *, scale, nk):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0])                       # [bq, bk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0])
    acc[:] = acc[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _done():
        dq_ref[0, 0] = (acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                          scale, nq):
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0])                       # [bq, bk]
    # dv += p^T @ dO
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0])
    # dk += ds^T @ q
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _done():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _mk_bwd_kernel(fn, has_bias, **kw):
    def kernel(*refs):
        if has_bias:
            fn(*refs, **kw)
        else:
            fn(refs[0], refs[1], refs[2], None, *refs[3:], **kw)
    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_bhsd_bwd(q, k, v, bias, do, lse, delta, scale,
                    block_q=512, block_k=512, interpret=False):
    """Backward for _flash_bhsd. q/do [B, H, Sq, D]; k/v [B, H, Sk, D];
    lse/delta [B, H, Sqp, 1] f32 (padded rows); bias [1|B, 1|H, Sq, Sk] or
    None. Returns (dq, dk, dv) in the input dtypes."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    bq = min(block_q, max(128, 1 << (Sq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (Sk - 1).bit_length()))

    qp = _pad_to(q, 2, bq)
    dop = _pad_to(do, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    Sqp, Skp = qp.shape[2], vp.shape[2]
    nq, nk = Sqp // bq, Skp // bk
    assert lse.shape == (B, H, Sqp, 1), (lse.shape, (B, H, Sqp, 1))

    if bias is None and Skp != Sk:
        bias = jnp.zeros((1, 1, Sq, Sk), jnp.float32)
    if bias is not None:
        bias = _pad_to(_pad_to(bias.astype(jnp.float32), 3, bk, NEG_INF),
                       2, bq)
        bb, hb = bias.shape[0], bias.shape[1]

    def qspec(order):
        return pl.BlockSpec((1, 1, bq, D),
                            (lambda b, h, iq, ik: (b, h, iq, 0)) if order
                            else (lambda b, h, ik, iq: (b, h, iq, 0)))

    def kspec(order):
        return pl.BlockSpec((1, 1, bk, D),
                            (lambda b, h, iq, ik: (b, h, ik, 0)) if order
                            else (lambda b, h, ik, iq: (b, h, ik, 0)))

    def rspec(order):  # lse / delta rows
        return pl.BlockSpec((1, 1, bq, 1),
                            (lambda b, h, iq, ik: (b, h, iq, 0)) if order
                            else (lambda b, h, ik, iq: (b, h, iq, 0)))

    def bspec(order):
        def imap_qk(b, h, iq, ik):
            return (b if bb > 1 else 0, h if hb > 1 else 0, iq, ik)

        def imap_kq(b, h, ik, iq):
            return (b if bb > 1 else 0, h if hb > 1 else 0, iq, ik)
        return pl.BlockSpec((1, 1, bq, bk), imap_qk if order else imap_kq)

    # dq: grid (B, H, nq, nk), k innermost
    in_specs = [qspec(1), kspec(1), kspec(1)]
    args = [qp, kp, vp]
    if bias is not None:
        in_specs.append(bspec(1))
        args.append(bias)
    in_specs += [qspec(1), rspec(1), rspec(1)]
    args += [dop, lse, delta]
    dq = pl.pallas_call(
        _mk_bwd_kernel(_flash_bwd_dq_kernel, bias is not None,
                       scale=scale, nk=nk),
        grid=(B, H, nq, nk),
        in_specs=in_specs,
        out_specs=qspec(1),
        out_shape=jax.ShapeDtypeStruct((B, H, Sqp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    # dk/dv: grid (B, H, nk, nq), q innermost
    in_specs = [qspec(0), kspec(0), kspec(0)]
    args = [qp, kp, vp]
    if bias is not None:
        in_specs.append(bspec(0))
        args.append(bias)
    in_specs += [qspec(0), rspec(0), rspec(0)]
    args += [dop, lse, delta]
    dk, dv = pl.pallas_call(
        _mk_bwd_kernel(_flash_bwd_dkv_kernel, bias is not None,
                       scale=scale, nq=nq),
        grid=(B, H, nk, nq),
        in_specs=in_specs,
        out_specs=(kspec(0), kspec(0)),
        out_shape=(jax.ShapeDtypeStruct((B, H, Skp, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Skp, D), v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dq[:, :, :Sq], dk[:, :, :Sk], dv[:, :, :Sk]


def flash_attention_fwd_res(q, k, v, bias=None, scale=None, interpret=False):
    """Forward returning (out [B, Sq, H, D], residual lse [B, H, Sqp, 1])
    for the streaming backward."""
    B, Sq, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    blocks = {}
    if min(Sq, k.shape[1]) >= 2048:
        blocks = dict(block_q=1024, block_k=1024)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out, lse = _flash_bhsd(qt, kt, vt, bias, float(scale),
                           interpret=interpret, with_lse=True, **blocks)
    return out.transpose(0, 2, 1, 3), lse


def flash_attention_bwd(q, k, v, bias, out, lse, g, scale=None,
                        interpret=False):
    """Streaming flash backward. q/k/v/out/g in [B, S, H, D] layout; lse
    [B, H, Sqp, 1] from flash_attention_fwd_res. Returns (dq, dk, dv)."""
    B, Sq, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    blocks = {}
    if min(Sq, k.shape[1]) >= 2048:
        blocks = dict(block_q=1024, block_k=1024)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = out.transpose(0, 2, 1, 3).astype(jnp.float32)
    gt = g.transpose(0, 2, 1, 3).astype(jnp.float32)
    delta = jnp.sum(gt * dot, axis=-1, keepdims=True)     # [B, H, Sq, 1]
    # normalize lse to THIS backward's q padding (the forward kernel may
    # have used different block sizes; padded rows carry dO=0 so any value
    # is inert — use zeros)
    bq = min(blocks.get("block_q", 512), max(128, 1 << (Sq - 1).bit_length()))
    Sqp = -(-Sq // bq) * bq
    lse = lse[:, :, :Sq]
    if Sqp != Sq:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Sqp - Sq), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Sqp - Sq), (0, 0)))
    dq, dk, dv = _flash_bhsd_bwd(qt, kt, vt, bias,
                                 gt.astype(q.dtype), lse, delta,
                                 float(scale), interpret=interpret, **blocks)
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3))


def flash_attention(q, k, v, bias=None, scale=None, interpret=False):
    """q [B, Sq, H, D], k/v [B, Sk, H, D], bias broadcastable to
    [B, H, Sq, Sk] (kept unbroadcast in memory). Returns [B, Sq, H, D]."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    # long sequences (pano spatial 8192, SAM/VAE 4096+, WarpAttn stage-1
    # 2048<->5120): 1024-wide blocks quadruple the per-grid-step work —
    # measured 1.7x on the pano r1 site and 1.13x on the WarpAttn r2 site
    # (scripts/pano_attn_micro.py, warp_attn_micro.py) vs the 512 default
    blocks = {}
    if min(Sq, Sk) >= 2048:
        blocks = dict(block_q=1024, block_k=1024)
    # transposed no-bias layout is kernel-faster standalone (41 -> 36.7 ms
    # on the pano spatial site, scripts/spatial_lab.py) but the boundary
    # transposes ([B,S,H*D] -> [B,H,D,S] moves the lane dim) eat the win
    # in-model (bench: 2.835 vs 2.917 s/step) — so it stays opt-in
    use_t = D < 128 and _attn_v2()
    if use_t:
        if bias is None and min(Sq, Sk) >= 2048:
            blocks = dict(block_q=1024, block_k=2048)
        qt = q.transpose(0, 2, 3, 1)
        kt = k.transpose(0, 2, 3, 1)
        vt = v.transpose(0, 2, 3, 1)
        out = _flash_bhds(qt, kt, vt, bias, float(scale),
                          interpret=interpret, **blocks)
    else:
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = _flash_bhsd(qt, kt, vt, bias, float(scale),
                          interpret=interpret, **blocks)
    return out.transpose(0, 2, 1, 3)
