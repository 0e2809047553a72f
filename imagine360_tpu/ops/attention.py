"""Fused multi-head attention for TPU.

Single entry point `dot_product_attention(q, k, v, bias=None)` used by every
attention site in the framework (replaces the reference's
xformers.ops.memory_efficient_attention calls, e.g.
reference src/modules/transformer.py:72 and
diffusers/models/attention_processor.py:636).

Dispatch:
- On TPU, moderately long sequences route to a Pallas flash-attention kernel
  (ops/pallas_attention.py) that never materializes the [Sq, Sk] matrix in
  HBM and supports an additive bias (the WarpAttn correspondence masks).
- Elsewhere (CPU tests, tiny sequences) an einsum reference path is used;
  XLA fuses it well for short sequences and it is numerically identical.

Layout: q [B, Sq, H, D], k/v [B, Sk, H, D], bias broadcastable to
[B, H, Sq, Sk]. Softmax is computed in float32 regardless of input dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _reference_attention(q, k, v, bias=None, scale=None):
    B, Sq, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _on_tpu() -> bool:
    from .dispatch import kernel_config
    cfg = kernel_config()
    if not cfg.pallas:
        return False
    if cfg.interpret:
        return True  # CPU tests drive the kernel paths in interpret mode
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _chunked_reference_attention(q, k, v, bias=None, scale=None,
                                 chunk=2048):
    """Sequentially chunk the batch axis so the [B, H, Sq, Sk] logits never
    materialize at once — for huge-batch/short-sequence sites (the motion
    module folds 40 views x 1024 pixels into the batch)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    n = -(-B // chunk)
    pad = n * chunk - B

    def prep(x):
        # flatten (H, D) so the scanned buffers have a wide trailing dim
        # (avoids massive tile-padding of tiny [.., H, D] trailing dims)
        x = x.reshape(x.shape[0], x.shape[1], H * D)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return x.reshape(n, chunk, x.shape[1], H * D)

    qs, ks, vs = prep(q), prep(k), prep(v)

    def body(args):
        qc, kc, vc = (a.reshape(chunk, -1, H, D) for a in args[:3])
        b = args[3] if len(args) > 3 else bias
        return _reference_attention(qc, kc, vc, bias=b, scale=scale
                                    ).reshape(chunk, Sq, H * D)

    if bias is not None and bias.shape[0] == B:
        bs = bias
        if pad:
            bs = jnp.pad(bs, ((0, pad),) + ((0, 0),) * (bias.ndim - 1))
        bs = bs.reshape(n, chunk, *bias.shape[1:])
        out = jax.lax.map(body, (qs, ks, vs, bs))
    else:
        out = jax.lax.map(body, (qs, ks, vs))
    out = out.reshape(n * chunk, Sq, H, D)
    return out[:B]


# thresholds shared with the route selector (single source of truth:
# ops/dispatch.py). _PACK_TARGET: measured on v5e (motion-module shapes):
# G=32 (512-token packs) beats G=8 despite the extra off-diagonal-block
# softmax work — bigger MXU tiles and fewer, larger head-slice extracts.
from .dispatch import (LOGITS_BYTES_LIMIT as _LOGITS_BYTES_LIMIT,
                       PACK_TARGET as _PACK_TARGET,
                       SINGLE_BLOCK_LOGITS as _SINGLE_BLOCK_LOGITS)


@functools.lru_cache(maxsize=16)
def _block_diag_bias(G: int, Sq: int, Sk: int):
    """[1, 1, G*Sq, G*Sk] additive bias: 0 on the i==j (Sq x Sk) blocks,
    -1e9 elsewhere — softmax over the packed axis then equals G independent
    softmaxes (exp(-1e9 - m) == 0 in f32)."""
    import numpy as np
    m = np.full((G * Sq, G * Sk), -1e9, np.float32)
    for i in range(G):
        m[i * Sq:(i + 1) * Sq, i * Sk:(i + 1) * Sk] = 0.0
    return m[None, None]


def _packed_tiny_attention(q, k, v, scale=None, interpret=False):
    """Attention for huge-batch/tiny-sequence sites (the AnimateDiff motion
    modules run frame-axis attention with Sq=Sk=16 over batch ~160k): packs
    G batch elements into one 512-token sequence under a block-diagonal
    bias and runs a dedicated whole-sequence pallas kernel. Numerically
    exact. Versus the chunked einsum path the logits never touch HBM and
    the MXU sees 512-wide tiles instead of 16-wide ones; versus routing
    through the generic flash kernel there are NO layout transposes — the
    kernel consumes the natural [B', S', H*D] layout (every reshape here is
    free) and slices heads on lanes in-kernel."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    G = _PACK_TARGET // max(Sq, Sk)
    while G > 1 and B % G:
        G //= 2
    if G < 4:
        return None
    if scale is None:
        scale = D ** -0.5
    Bp = B // G
    qp = q.reshape(Bp, G * Sq, H * D)
    kp = k.reshape(Bp, G * Sk, H * D)
    vp = v.reshape(Bp, G * Sk, H * D)
    bias = jnp.asarray(_block_diag_bias(G, Sq, Sk)[0])   # [1, S'q, S'k]
    from .pallas_attention import tiny_packed_attention
    out = tiny_packed_attention(qp, kp, vp, bias, float(scale), H,
                                interpret=interpret)
    return out.reshape(B, Sq, H, D)


@functools.lru_cache(maxsize=32)
def _kpad_bias(Sq: int, Sk: int, Skp: int):
    """[1, Sq, Skp] f32: zero on real keys, -1e9 on the lane padding."""
    import numpy as np
    m = np.zeros((Sq, Skp), np.float32)
    m[:, Sk:] = -1e9
    return m[None]


def _single_block_attention(q, k, v, scale=None, interpret=False):
    """Whole-sequence attention in the natural [B, S, H*D] layout via the
    tiny-packed kernel (no packing): for sites whose [Sq, Sk] logits fit
    VMEM — spatial self-attention at <=1024 tokens and text/ip
    cross-attention (Sk 77..141, lane-padded + masked). Versus flash this
    skips the [B,S,H,D]->[B,H,S,D] transposes; versus the XLA einsum the
    logits never touch HBM."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    Skp = -(-Sk // 128) * 128
    qp = q.reshape(B, Sq, H * D)
    kp = k.reshape(B, Sk, H * D)
    vp = v.reshape(B, Sk, H * D)
    if Skp != Sk:
        kp = jnp.pad(kp, ((0, 0), (0, Skp - Sk), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, Skp - Sk), (0, 0)))
    bias = jnp.asarray(_kpad_bias(Sq, Sk, Skp))
    from .pallas_attention import tiny_packed_attention
    out = tiny_packed_attention(qp, kp, vp, bias, float(scale), H,
                                interpret=interpret)
    return out.reshape(B, Sq, H, D)


def _interpret() -> bool:
    """Interpret-mode pallas (CPU tests of kernel-dispatch paths)."""
    from .dispatch import kernel_config
    return kernel_config().interpret


def _packed_impl(q, k, v, bias, scale):
    del bias
    out = _packed_tiny_attention(q, k, v, scale=scale,
                                 interpret=_interpret())
    assert out is not None
    return out


def _single_impl(q, k, v, bias, scale):
    del bias
    return _single_block_attention(q, k, v, scale=scale,
                                   interpret=_interpret())


def _flash_impl(q, k, v, bias, scale):
    from .pallas_attention import flash_attention
    return flash_attention(q, k, v, bias=bias, scale=scale,
                           interpret=_interpret())


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _kernel_attention(impl, scale, q, k, v, bias):
    """Pallas forward with an einsum-reference backward: the kernels have
    no VJP rules, so training differentiates through the (numerically
    identical) reference formulation instead."""
    return impl(q, k, v, bias, scale)


def _kernel_attention_fwd(impl, scale, q, k, v, bias):
    return _kernel_attention(impl, scale, q, k, v, bias), (q, k, v, bias)


def _kernel_attention_bwd(impl, scale, res, g):
    q, k, v, bias = res
    if bias is None:
        _, vjp = jax.vjp(
            lambda q, k, v: _reference_attention(q, k, v, scale=scale),
            q, k, v)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda q, k, v, b: _reference_attention(q, k, v, bias=b,
                                                scale=scale),
        q, k, v, bias)
    return vjp(g)


_kernel_attention.defvjp(_kernel_attention_fwd, _kernel_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_attention_trainable(scale, q, k, v, bias):
    """Flash attention with a STREAMING pallas backward (dq/dk/dv kernels;
    the [Sq, Sk] matrix never reaches HBM in either direction). The bias is
    treated as a constant (the WarpAttn correspondence masks are
    precomputed geometry, never trained — reference src/utils/utils.py
    builds them from the camera rig alone): its returned gradient is zeros.
    KernelConfig.einsum_bwd (I360_KERNELS=+einsum_bwd) selects the
    einsum-reference backward instead (ops/dispatch.py)."""
    from .pallas_attention import flash_attention
    return flash_attention(q, k, v, bias=bias, scale=scale,
                           interpret=_interpret())


def _flash_trainable_fwd(scale, q, k, v, bias):
    from .pallas_attention import flash_attention_fwd_res
    out, lse = flash_attention_fwd_res(q, k, v, bias=bias, scale=scale,
                                       interpret=_interpret())
    return out, (q, k, v, bias, out, lse)


def _flash_trainable_bwd(scale, res, g):
    from .pallas_attention import flash_attention_bwd
    q, k, v, bias, out, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, bias, out, lse, g,
                                     scale=scale, interpret=_interpret())
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


_flash_attention_trainable.defvjp(_flash_trainable_fwd, _flash_trainable_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mh_attention_trainable(scale, heads, q, k, v):
    """No-bias long-sequence sites in the NATURAL [B, S, H*D] layout (the
    pano spatial self-attention at 8192 tokens, SAM global attention).
    The primal (inference) path runs mh_flash_attention, whose call sites
    carry only free reshapes — unlike the transposed flash route whose
    [B,S,H,D]->[B,H,S,D] dim-permutes fold into layout-rotating bitcasts
    that demote every surrounding stage-0 matmul to ~48 TF/s
    batch-in-sublanes convolutions (r4 HLO profile). The differentiated
    path reuses the streaming flash fwd/bwd kernels (lse-carrying), so
    training memory is unchanged."""
    from .pallas_attention import mh_flash_attention
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    out = mh_flash_attention(q.reshape(B, Sq, H * D),
                             k.reshape(B, Sk, H * D),
                             v.reshape(B, Sk, H * D),
                             scale, heads, interpret=_interpret())
    return out.reshape(B, Sq, H, D)


def _mh_trainable_fwd(scale, heads, q, k, v):
    from .pallas_attention import flash_attention_fwd_res
    out, lse = flash_attention_fwd_res(q, k, v, bias=None, scale=scale,
                                       interpret=_interpret())
    return out, (q, k, v, out, lse)


def _mh_trainable_bwd(scale, heads, res, g):
    from .pallas_attention import flash_attention_bwd
    q, k, v, out, lse = res
    return flash_attention_bwd(q, k, v, None, out, lse, g, scale=scale,
                               interpret=_interpret())


_mh_attention_trainable.defvjp(_mh_trainable_fwd, _mh_trainable_bwd)


# shared-bias kernel tile config (winner of scripts/warp_lab.py on v5e:
# transposed layout, T=64 folded rows, 1024-blocks — 1.9x over the v1
# [S, D]-block kernel on the biggest warp site)
_SHARED_BIAS_T = 64
_SHARED_BIAS_BLOCKS = dict(block_q=1024, block_k=1024)


def _shared_bias_call(q, k, v, bias, scale, with_lse=False, bias_t=None):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    from .pallas_attention import _flash_shared_bias_t
    qf = q.transpose(0, 2, 3, 1).reshape(B * H, D, Sq)
    kf = k.transpose(0, 2, 3, 1).reshape(B * H, D, Sk)
    vf = v.transpose(0, 2, 3, 1).reshape(B * H, D, Sk)
    bt = bias_t if bias_t is not None else bias[0, 0].T
    out = _flash_shared_bias_t(qf, kf, vf, bt, scale,
                               t_rows=_SHARED_BIAS_T, with_lse=with_lse,
                               interpret=_interpret(),
                               **_SHARED_BIAS_BLOCKS)
    if with_lse:
        out, lse = out
        return (out.reshape(B, H, D, Sq).transpose(0, 3, 1, 2),
                lse.reshape(B, H, -1)[..., None])
    return out.reshape(B, H, D, Sq).transpose(0, 3, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _shared_attention_trainable(scale, q, k, v, bias, bias_t):
    """WarpAttn-style sites: [1, 1, Sq, Sk]-broadcast bias streamed once
    per folded row-chunk instead of once per (batch, head) — measured 1.9x
    on the biggest warp site (scripts/warp_lab.py). Streaming pallas
    backward; the constant mask bias gets a zero gradient. bias_t is an
    optional precomputed transpose of bias[0, 0] (saves an in-scan 42 MB
    transpose per warp call)."""
    return _shared_bias_call(q, k, v, bias, scale, bias_t=bias_t)


def _shared_trainable_fwd(scale, q, k, v, bias, bias_t):
    out, lse = _shared_bias_call(q, k, v, bias, scale, with_lse=True,
                                 bias_t=bias_t)
    return out, (q, k, v, bias, bias_t, out, lse)


def _shared_trainable_bwd(scale, res, g):
    from .pallas_attention import flash_attention_bwd
    q, k, v, bias, bias_t, out, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, bias, out, lse, g,
                                     scale=scale, interpret=_interpret())
    return (dq, dk, dv, jnp.zeros_like(bias),
            None if bias_t is None else jnp.zeros_like(bias_t))


_shared_attention_trainable.defvjp(_shared_trainable_fwd,
                                   _shared_trainable_bwd)


def _pack_group(B: int, Sq: int, Sk: int) -> int:
    G = _PACK_TARGET // max(Sq, Sk)
    while G > 1 and B % G:
        G //= 2
    return G


def _temporal_reference(q, k, v, heads, scale):
    """Frame-axis attention reference path: fold [B, F, HW, C] to
    [B*HW, F, H, D] and reuse the einsum formulation."""
    B, F, HW, C = q.shape
    D = C // heads

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * HW, F, heads, D)

    out = _reference_attention(fold(q), fold(k), fold(v), scale=scale)
    return out.reshape(B, HW, F, C).transpose(0, 2, 1, 3)


def _temporal_group(F: int, HW: int) -> int:
    G = max(1, _PACK_TARGET // F)
    while G > 1 and HW % G:
        G //= 2
    return G


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _temporal_kernel_attention(heads, scale, G, interpret, q, k, v):
    from .pallas_attention import temporal_packed_attention
    return temporal_packed_attention(q, k, v, scale, heads, G,
                                     interpret=interpret)


def _temporal_fwd(heads, scale, G, interpret, q, k, v):
    return (_temporal_kernel_attention(heads, scale, G, interpret, q, k, v),
            (q, k, v))


def _temporal_bwd(heads, scale, G, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _temporal_reference(q, k, v, heads, scale), q, k, v)
    return vjp(g)


_temporal_kernel_attention.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       heads: int, scale: float | None = None) -> jnp.ndarray:
    """Attention over the FRAME axis of natural-layout video activations.

    q/k/v: [B, F, HW, C]; every spatial location attends over its own F
    frames (the AnimateDiff motion-module pattern, reference
    motion_module.py:346-352 `(b f) d c -> (b d) f c`). On TPU this runs a
    pallas kernel that packs G spatial locations per grid step via a FREE
    interleaved reshape — no layout transposes on either side, which keeps
    the surrounding matmuls in natural [.., C]-minor layouts.
    """
    B, F, HW, C = q.shape
    D = C // heads
    fscale = float(D ** -0.5 if scale is None else scale)
    from .dispatch import kernel_config
    G = _temporal_group(F, HW)
    if (_on_tpu() and kernel_config().packed
            and F * G >= 64 and F * G <= 1024 and C % heads == 0
            and D % 8 == 0):
        return _temporal_kernel_attention(heads, fscale, G, False, q, k, v)
    return _temporal_reference(q, k, v, heads, fscale)


def _sharded_batch_kernel(q, k, v, fscale, mesh, bias=None, bias_t=None):
    """Per-shard attention under shard_map on an active mesh: attention is
    independent per batch row, so batch-sharding q/k/v and re-entering the
    full dispatch (mesh deactivated) on each device's local rows is exact —
    every pallas path (packed / single-block / flash / shared-bias WarpAttn)
    engages on the per-shard shapes, and the custom-vjp backwards
    differentiate per shard identically.

    shard_map forces its in_specs, so sites whose batch axis is already
    view-sharded (all perspective-branch sites — the folded CFGxviews axis
    is merge-major through every reshape) run with zero resharding; the
    pano branch's H-sharded spatial sites pay one all-to-all each way in
    exchange for keeping kernel throughput. Bias sites join only when the
    bias is batch-replicated (the WarpAttn masks: [1, 1, Sq, Sk]).
    Returns None when the batch does not divide the mesh (caller falls
    back to the GSPMD-partitioned einsum paths)."""
    import numpy as np
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import VIEW_AXIS, REPLICA_AXIS, activate_mesh

    axes = tuple(a for a in (REPLICA_AXIS, VIEW_AXIS) if a in mesh.shape)
    n = int(np.prod([mesh.shape[a] for a in axes]))
    B = q.shape[0]
    if n <= 1 or B % n:
        return None
    if bias is not None and bias.shape[0] != 1:
        return None  # per-row biases would need their own batch sharding
    spec = P(axes if len(axes) > 1 else axes[0], None, None, None)
    rep = P(None, None, None, None)
    args, specs = [q, k, v], [spec, spec, spec]
    has_bias, has_bt = bias is not None, bias_t is not None
    if has_bias:
        args.append(bias)
        specs.append(rep)
    if has_bt:
        args.append(jnp.asarray(bias_t))
        specs.append(P(*([None] * np.ndim(bias_t))))

    def body(q_, k_, v_, *rest):
        b = rest[0] if has_bias else None
        bt = rest[-1] if has_bt else None
        with activate_mesh(None):   # per-shard: plain single-device dispatch
            return dot_product_attention(q_, k_, v_, bias=b, scale=fscale,
                                         bias_t=bt)

    # replication checking must be off: pallas out_shapes carry no varying
    # -mesh-axes (vma) annotation (new API: check_vma, old: check_rep)
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            fn = shard_map(body, mesh=mesh, in_specs=tuple(specs),
                           out_specs=spec, **kw)
            break
        except TypeError:
            continue
    return fn(*args)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray | None = None,
                          scale: float | None = None,
                          bias_t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Multi-head attention; returns [B, Sq, H, D] in q.dtype. bias_t is
    an optional precomputed [Sk, Sq] transpose of a broadcast bias (the
    shared-bias kernel consumes the transposed form; passing it avoids an
    in-scan transpose of the 42 MB warp masks)."""
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4, (q.shape, k.shape)
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    from .dispatch import log_route, select_attention_route
    on_tpu = _on_tpu()
    fscale = float(D ** -0.5 if scale is None else scale)
    # Under an active device mesh, pallas_call is an opaque custom call
    # GSPMD cannot partition — it would force replication of the very
    # tensors the mesh shards. Sites with a mesh-divisible batch (and a
    # batch-replicated bias, if any) keep kernel throughput via per-shard
    # dispatch under shard_map (_sharded_batch_kernel); everything else
    # routes to the XLA einsum paths, which GSPMD partitions cleanly (K/V
    # gathers are inserted where the sequence axis is sharded).
    from ..parallel.mesh import current_mesh
    mesh = current_mesh()
    if mesh is not None:
        if on_tpu:
            out = _sharded_batch_kernel(q, k, v, fscale, mesh, bias=bias,
                                        bias_t=bias_t)
            if out is not None:
                return out
        on_tpu = False
    bias_is_broadcast = (bias is not None and bias.ndim == 4
                         and bias.shape[0] == 1 and bias.shape[1] == 1)
    route = select_attention_route(B, Sq, Sk, H, D, bias is not None,
                                   bias_is_broadcast, on_tpu)
    log_route(route, B, Sq, Sk, H, D, bias is not None)
    # rationale per route (measured on v5e — STATUS.md):
    # packed: huge-batch tiny-seq motion sites, 512-token packs under a
    #   block-diagonal bias; single: whole-seq natural-layout kernel where
    #   the [Sq, Skp] logits fit VMEM; shared_bias: WarpAttn masks stream
    #   once per row-chunk instead of per (batch, head); mh_flash:
    #   natural-layout flash, no boundary transposes -> no layout poison
    #   on surrounding matmuls (Sk >= 64 so long-query/short-kv pano
    #   cross-attn sites don't fall to chunked einsum); flash: transposed
    #   flash for remaining long-kv sites.
    if route == "packed":
        return _kernel_attention(_packed_impl, fscale, q, k, v, None)
    if route == "single":
        return _kernel_attention(_single_impl, fscale, q, k, v, None)
    if route == "shared_bias":
        return _shared_attention_trainable(fscale, q, k, v, bias, bias_t)
    if route == "mh_flash":
        try:
            return _mh_attention_trainable(fscale, H, q, k, v)
        except (ValueError, TypeError, NotImplementedError) as e:
            # trace-time kernel rejection (shape assert, block-spec error):
            # visible fallback, not a silent re-route (ADVICE r4)
            import warnings
            warnings.warn(
                f"mh_flash route rejected shape B={B} Sq={Sq} Sk={Sk} "
                f"H={H} D={D} ({e}); falling back to transposed flash",
                RuntimeWarning, stacklevel=2)
            route = "flash"
    if route in ("flash", "flash_einsum_bwd") and Sq >= 256 and Sk >= 256:
        try:
            if route == "flash_einsum_bwd":
                return _kernel_attention(_flash_impl, fscale, q, k, v, bias)
            return _flash_attention_trainable(fscale, q, k, v, bias)
        except (ValueError, TypeError, NotImplementedError) as e:
            import warnings
            warnings.warn(
                f"flash route rejected shape B={B} Sq={Sq} Sk={Sk} H={H} "
                f"D={D} ({e}); falling back to the XLA path",
                RuntimeWarning, stacklevel=2)
    # XLA fallbacks (CPU, odd shapes, mh_flash rejection with short kv)
    sq_pad = -(-Sq // 8) * 8
    sk_pad = -(-Sk // 128) * 128
    if B * H * sq_pad * sk_pad * 4 > _LOGITS_BYTES_LIMIT:
        chunk = max(1, _LOGITS_BYTES_LIMIT // max(1, H * sq_pad * sk_pad * 4))
        return _chunked_reference_attention(q, k, v, bias=bias, scale=scale,
                                            chunk=chunk)
    return _reference_attention(q, k, v, bias=bias, scale=scale)
