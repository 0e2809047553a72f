"""Flash-attention kernel correctness (interpret mode on CPU; the same
kernel compiles natively on TPU — exercised by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from imagine360_tpu.ops.attention import _reference_attention
from imagine360_tpu.ops.pallas_attention import flash_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_flash_matches_reference_no_bias():
    B, Sq, Sk, H, D = 2, 256, 384, 2, 64
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    ref = _reference_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_broadcast_bias():
    B, Sq, Sk, H, D = 2, 200, 300, 2, 32  # unaligned sizes exercise padding
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    bias = _rand((1, 1, Sq, Sk), 3)  # broadcast over batch & heads
    ref = _reference_attention(q, k, v, bias=bias)
    out = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_full_bias_batch_heads():
    B, Sq, Sk, H, D = 1, 128, 128, 3, 64
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    bias = _rand((B, H, Sq, Sk), 3) * 2
    ref = _reference_attention(q, k, v, bias=bias)
    out = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_tiny_matches_reference():
    # the motion-module shape class: tiny frame-axis sequences, huge batch
    from imagine360_tpu.ops.attention import _packed_tiny_attention
    rng = np.random.RandomState(7)
    B, S, H, D = 128, 16, 2, 8   # G = 512//16 = 32 -> 4 packed rows
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    want = _reference_attention(q, k, v)
    got = _packed_tiny_attention(q, k, v, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_packed_tiny_asymmetric_and_indivisible():
    from imagine360_tpu.ops.attention import _packed_tiny_attention
    rng = np.random.RandomState(3)
    B, Sq, Sk, H, D = 96, 16, 64, 2, 8   # G=8 fits 96 -> 12 packed rows
    q = jnp.asarray(rng.randn(B, Sq, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
    want = _reference_attention(q, k, v)
    got = _packed_tiny_attention(q, k, v, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # prime batch: no usable packing factor -> caller falls back
    qp = jnp.asarray(rng.randn(97, Sq, H, D), jnp.float32)
    assert _packed_tiny_attention(qp, qp, qp, interpret=True) is None


def test_packed_tiny_many_rows_bf16():
    # many packed rows + bf16 inputs (the production motion-module dtype)
    from imagine360_tpu.ops.attention import _packed_tiny_attention
    rng = np.random.RandomState(11)
    B, S, H, D = 512, 16, 2, 8   # G=32 -> 16 packed rows
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    want = _reference_attention(q, k, v)
    got = _packed_tiny_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_single_block_matches_reference():
    # spatial-self and text-cross shapes (kv lane-padded + masked)
    from imagine360_tpu.ops.attention import _single_block_attention
    rng = np.random.RandomState(5)
    for B, Sq, Sk, H, D in ((4, 64, 64, 2, 8), (4, 64, 13, 2, 8)):
        q = jnp.asarray(rng.randn(B, Sq, H, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
        want = _reference_attention(q, k, v)
        got = _single_block_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_kernel_attention_custom_vjp():
    # the pallas dispatch wraps kernels in a custom_vjp whose backward is
    # the einsum reference — check it against direct autodiff
    from imagine360_tpu.ops.attention import _kernel_attention
    rng = np.random.RandomState(9)
    B, Sq, Sk, H, D = 2, 8, 8, 2, 4
    q = jnp.asarray(rng.randn(B, Sq, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
    bias = jnp.asarray(rng.randn(1, 1, Sq, Sk), jnp.float32)
    scale = D ** -0.5

    def ref_impl(q, k, v, b, s):
        return _reference_attention(q, k, v, bias=b, scale=s)

    def loss_vjp(q, k, v, b):
        return (_kernel_attention(ref_impl, scale, q, k, v, b) ** 2).sum()

    def loss_direct(q, k, v, b):
        return (_reference_attention(q, k, v, bias=b, scale=scale)
                ** 2).sum()

    got = jax.grad(loss_vjp, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_direct, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)
    # bias=None path
    g0 = jax.grad(lambda q: (_kernel_attention(ref_impl, scale, q, k, v,
                                               None) ** 2).sum())(q)
    w0 = jax.grad(lambda q: (_reference_attention(q, k, v, scale=scale)
                             ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(w0),
                               atol=1e-5, rtol=1e-5)


def test_temporal_striped_matches_reference():
    # natural-layout frame attention: [B, F, HW, C]
    from imagine360_tpu.ops.attention import _temporal_reference
    from imagine360_tpu.ops.pallas_attention import temporal_packed_attention
    B, F, HW, C, H = 2, 8, 64, 64, 4
    q = _rand((B, F, HW, C), 0)
    k = _rand((B, F, HW, C), 1)
    v = _rand((B, F, HW, C), 2)
    scale = (C // H) ** -0.5
    ref = _temporal_reference(q, k, v, H, scale)
    for G in (8, 16, 32):
        out = temporal_packed_attention(q, k, v, scale, H, G,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)


def test_temporal_attention_dispatch_and_vjp():
    from imagine360_tpu.ops.attention import (temporal_attention,
                                              _temporal_reference,
                                              _temporal_kernel_attention)
    B, F, HW, C, H = 1, 4, 32, 32, 2
    q = _rand((B, F, HW, C), 0)
    k = _rand((B, F, HW, C), 1)
    v = _rand((B, F, HW, C), 2)
    # CPU dispatch -> reference path
    out = temporal_attention(q, k, v, H)
    scale = (C // H) ** -0.5
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_temporal_reference(q, k, v, H, scale)),
        atol=1e-6)
    # custom_vjp wrapper backward == reference backward (interpret fwd)
    def loss_ref(q, k, v):
        return _temporal_reference(q, k, v, H, scale).sum()
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    def loss_kernel(q, k, v):
        return _temporal_kernel_attention(H, scale, 8, True, q, k, v).sum()
    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_streaming_backward():
    """Streaming pallas backward (dq/dk/dv kernels) vs reference grads,
    with and without a broadcast additive bias (bias is a constant)."""
    from imagine360_tpu.ops.pallas_attention import (flash_attention_fwd_res,
                                                     flash_attention_bwd)
    B, Sq, Sk, H, D = 2, 200, 300, 2, 32   # unaligned: exercises padding
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    g = _rand((B, Sq, H, D), 3)
    for bias in (None, _rand((1, 1, Sq, Sk), 4)):
        out, lse = flash_attention_fwd_res(q, k, v, bias=bias,
                                           interpret=True)
        ref = _reference_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)
        dq, dk, dv = flash_attention_bwd(q, k, v, bias, out, lse, g,
                                         interpret=True)
        if bias is None:
            _, vjp = jax.vjp(
                lambda q, k, v: _reference_attention(q, k, v), q, k, v)
            rq, rk, rv = vjp(g)
        else:
            _, vjp = jax.vjp(
                lambda q, k, v: _reference_attention(q, k, v, bias=bias),
                q, k, v)
            rq, rk, rv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4)


def test_shared_bias_kernel():
    """(batch*head)-folded shared-bias flash kernel vs reference, incl. the
    lse residual used by the streaming backward."""
    from imagine360_tpu.ops.pallas_attention import _flash_shared_bias
    B, H, Sq, Sk, D = 2, 2, 160, 272, 32
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    bias = _rand((Sq, Sk), 3)
    ref = _reference_attention(q, k, v, bias=bias[None, None])
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    out, lse = _flash_shared_bias(qf, kf, vf, bias, D ** -0.5,
                                  block_q=128, block_k=128, t_rows=2,
                                  interpret=True, with_lse=True)
    out = out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)
    # lse must reproduce softmax denominators: recompute one row
    s = (np.asarray(qf[0, 0]) * D ** -0.5) @ np.asarray(kf[0]).T \
        + np.asarray(bias[0])
    expect = np.log(np.exp(s - s.max()).sum()) + s.max()
    np.testing.assert_allclose(np.asarray(lse[0, 0, 0]), expect, rtol=1e-3)


def test_transposed_flash_kernel():
    """[D, S]-block transposed kernel (_flash_bhds) vs reference — the
    default for long no-bias D<128 sites (pano spatial, SAM)."""
    from imagine360_tpu.ops.pallas_attention import _flash_bhds
    B, Sq, Sk, H, D = 2, 200, 300, 2, 32
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    ref = _reference_attention(q, k, v)
    qt = q.transpose(0, 2, 3, 1)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 3, 1)
    out = _flash_bhds(qt, kt, vt, None, D ** -0.5, block_q=128,
                      block_k=128, interpret=True)
    out = out.transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_mh_flash_matches_reference():
    # the stage-0 pano spatial site class (natural layout, no bias)
    from imagine360_tpu.ops.pallas_attention import mh_flash_attention
    B, Sq, Sk, H, D = 2, 256, 384, 5, 64
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    ref = _reference_attention(q, k, v)
    out = mh_flash_attention(q.reshape(B, Sq, H * D),
                             k.reshape(B, Sk, H * D),
                             v.reshape(B, Sk, H * D),
                             float(D ** -0.5), H, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(B, Sq, H, D),
                               np.asarray(ref), atol=2e-5)


def test_mh_flash_unaligned_kv_padding():
    # Sk not a multiple of the k-block: in-kernel iota masking of padding
    from imagine360_tpu.ops.pallas_attention import mh_flash_attention
    B, Sq, Sk, H, D = 1, 200, 300, 2, 32
    q = _rand((B, Sq, H, D), 3)
    k = _rand((B, Sk, H, D), 4)
    v = _rand((B, Sk, H, D), 5)
    ref = _reference_attention(q, k, v)
    out = mh_flash_attention(q.reshape(B, Sq, H * D),
                             k.reshape(B, Sk, H * D),
                             v.reshape(B, Sk, H * D),
                             float(D ** -0.5), H, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(B, Sq, H, D),
                               np.asarray(ref), atol=3e-5)


def test_mh_flash_bf16_and_vjp():
    # bf16 forward parity at tolerance + the custom-vjp grad path (falls
    # back to the streaming flash fwd/bwd) stays finite and close to the
    # einsum-reference gradient
    from imagine360_tpu.ops.attention import _mh_attention_trainable
    B, Sq, Sk, H, D = 2, 256, 256, 2, 64
    q = _rand((B, Sq, H, D), 6).astype(jnp.bfloat16)
    k = _rand((B, Sk, H, D), 7).astype(jnp.bfloat16)
    v = _rand((B, Sk, H, D), 8).astype(jnp.bfloat16)
    scale = float(D ** -0.5)
    from imagine360_tpu.ops.dispatch import configure
    with configure(interpret=True):
        out = _mh_attention_trainable(scale, H, q, k, v)
        ref = _reference_attention(q, k, v, scale=scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2)

        def loss_kernel(q, k, v):
            return jnp.sum(_mh_attention_trainable(
                scale, H, q, k, v).astype(jnp.float32) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_reference_attention(
                q, k, v, scale=scale).astype(jnp.float32) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            assert np.all(np.isfinite(np.asarray(a, np.float32)))
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=0.15, rtol=0.1)
