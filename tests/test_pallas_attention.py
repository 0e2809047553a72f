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
