"""Correctness of the pallas dense kernel (ops/pallas_dense.py) and the
MMDense drop-in (models/layers.py), interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagine360_tpu.ops.pallas_dense import dense_matmul, supported


@pytest.mark.parametrize("shape", [
    (256, 320, 320),     # the profiled proj_out shape class (unaligned 320)
    (512, 2560, 1280),   # k-tiled accumulation path (nk > 1)
    (128, 320, 64),      # narrow output (< one lane tile)
    (1024, 640, 1280),
])
def test_matches_xla_dot(shape):
    n, k, m = shape
    assert supported(n, k, m)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, m), jnp.float32)
    got = dense_matmul(x, w, interpret=True)
    want = x @ w
    # k-tiled accumulation sums in a different order than XLA's dot
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-4)


def test_bf16_accumulates_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(256, 320), jnp.bfloat16)
    w = jnp.asarray(rng.randn(320, 320), jnp.bfloat16)
    got = dense_matmul(x, w, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = jnp.dot(x, w, preferred_element_type=jnp.float32
                   ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_leading_dims_flattened():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 128, 320), jnp.float32)
    w = jnp.asarray(rng.randn(320, 320), jnp.float32)
    got = dense_matmul(x, w, interpret=True)
    assert got.shape == (2, 128, 320)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.einsum("bnk,km->bnm", x, w)),
                               rtol=1e-5, atol=1e-4)


def test_unsupported_token_count():
    # token counts not tiling by 128 fall back (callers gate on supported)
    assert not supported(100, 320, 320)


def test_mmdense_is_dense_off_tpu():
    """On CPU MMDense must BE nn.Dense: same params, same outputs."""
    import flax.linen as nn
    from imagine360_tpu.models.layers import MMDense

    x = jnp.asarray(np.random.RandomState(3).randn(4, 256, 320), jnp.float32)
    m1 = MMDense(320)
    m2 = nn.Dense(320)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(m1.apply(p1, x)),
                                  np.asarray(m2.apply(p2, x)))


def test_mmdense_enabled_pallas_path():
    """ADVICE r2 (medium): with pallas_dense enabled the pallas path must
    actually trace (the un-decorated __call__ used to crash with
    'Parameters must be initialized in setup() or @compact') and match
    nn.Dense numerically, with an identical param tree."""
    import flax.linen as nn
    from imagine360_tpu.models.layers import MMDense
    from imagine360_tpu.ops.dispatch import configure

    with configure(pallas_dense=True, interpret=True):
        x = jnp.asarray(np.random.RandomState(4).randn(256, 320),
                        jnp.float32)
        m1 = MMDense(320)
        m2 = nn.Dense(320)
        p1 = m1.init(jax.random.PRNGKey(0), x)
        p2 = m2.init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(p1) == jax.tree.structure(p2)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(m1.apply(p1, x)),
                                   np.asarray(m2.apply(p2, x)),
                                   rtol=1e-4, atol=1e-4)


def test_mmdense_enabled_unsupported_falls_back():
    """Token counts the kernel does not support must fall through to the
    stock Dense path even when the switch is on."""
    import flax.linen as nn
    from imagine360_tpu.models.layers import MMDense
    from imagine360_tpu.ops.dispatch import configure

    with configure(pallas_dense=True, interpret=True):
        x = jnp.asarray(np.random.RandomState(5).randn(100, 320),
                        jnp.float32)
        m1 = MMDense(320)
        p1 = m1.init(jax.random.PRNGKey(0), x)
        ref = nn.Dense(320).apply(p1, x)
        np.testing.assert_array_equal(np.asarray(m1.apply(p1, x)),
                                      np.asarray(ref))
