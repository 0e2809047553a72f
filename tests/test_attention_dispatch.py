"""Attention dispatch: chunked path must match the direct reference path."""
import numpy as np
import jax
import jax.numpy as jnp

from imagine360_tpu.ops.attention import (_reference_attention,
                                          _chunked_reference_attention,
                                          dot_product_attention)


def test_chunked_matches_reference():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(37, 16, 2, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(37, 16, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(37, 16, 2, 8)).astype(np.float32))
    ref = _reference_attention(q, k, v)
    out = _chunked_reference_attention(q, k, v, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # per-batch bias variant
    bias = jnp.asarray(rng.normal(size=(37, 1, 16, 16)).astype(np.float32))
    ref = _reference_attention(q, k, v, bias=bias)
    out = _chunked_reference_attention(q, k, v, bias=bias, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_dispatch_entry():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 64, 2, 8)).astype(np.float32))
    out = dot_product_attention(q, q, q)
    assert out.shape == q.shape
