"""Per-shard pallas attention under shard_map (ops/attention.py
_sharded_batch_kernel): batch-sharding q/k/v over the mesh and re-entering
the dispatch on local rows must equal global attention exactly. Runs the
REAL pallas kernels in interpret mode (KernelConfig.interpret) on the
8-virtual-device CPU mesh from conftest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagine360_tpu.ops.attention import (_reference_attention,
                                          _sharded_batch_kernel)
from imagine360_tpu.ops.dispatch import configure
from imagine360_tpu.parallel.mesh import make_mesh


@pytest.fixture(autouse=True)
def _interpret_mode():
    with configure(interpret=True):
        yield


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape) * 0.3,
                       jnp.float32)


def _run(B, Sq, Sk, H, D, bias=None, bias_t=None):
    mesh = make_mesh(8)
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sk, H, D), 1)
    v = _rand((B, Sk, H, D), 2)
    scale = float(D ** -0.5)
    got = _sharded_batch_kernel(q, k, v, scale, mesh, bias=bias,
                                bias_t=bias_t)
    assert got is not None, "expected the per-shard path for this shape"
    want = _reference_attention(q, k, v, bias=bias, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_packed_path_sharded():
    # motion-module shape class: huge batch, tiny frame-axis sequences
    _run(B=8192, Sq=8, Sk=8, H=1, D=16)


def test_single_block_path_sharded():
    # text/ip cross-attention shape class: Sk lane-padded + masked
    _run(B=128, Sq=64, Sk=77, H=2, D=32)


def test_flash_path_sharded():
    _run(B=8, Sq=256, Sk=256, H=1, D=64)


def test_warp_bias_path_sharded():
    """WarpAttn-style site: batch-replicated [1, 1, Sq, Sk] mask bias runs
    per shard through the flash-with-bias kernel (the tuned shared-bias
    kernel is exercised single-device by test_pallas_attention; its
    per-shard composition is identical by batch independence)."""
    with configure(shared_bias=False, einsum_bwd=True):
        bias = _rand((1, 1, 256, 256), 7) * 3.0
        _run(B=16, Sq=256, Sk=256, H=1, D=32, bias=bias)


def test_shared_bias_kernel_path_sharded():
    """The tuned transposed shared-bias warp kernel itself, per shard
    (per-shard B*H = 2*4 = 8 satisfies the dispatch's %8 fold gate)."""
    bias = _rand((1, 1, 256, 256), 8) * 3.0
    _run(B=16, Sq=256, Sk=256, H=4, D=32, bias=bias,
         bias_t=np.asarray(bias[0, 0]).T)


def test_indivisible_batch_falls_back():
    mesh = make_mesh(8)
    q = _rand((6, 256, 1, 64), 0)
    out = _sharded_batch_kernel(q, q, q, 0.125, mesh)
    assert out is None


def test_per_row_bias_falls_back():
    mesh = make_mesh(8)
    q = _rand((8, 256, 1, 64), 0)
    bias = _rand((8, 1, 256, 256), 9)
    out = _sharded_batch_kernel(q, q, q, 0.125, mesh, bias=bias)
    assert out is None


def test_gradients_flow_through_shard_map():
    mesh = make_mesh(8)
    q = _rand((8, 256, 1, 64), 3)

    def loss(q):
        out = _sharded_batch_kernel(q, q, q, 0.125, mesh)
        return jnp.sum(out ** 2)

    def ref_loss(q):
        return jnp.sum(_reference_attention(q, q, q, scale=0.125) ** 2)

    g = jax.grad(loss)(q)
    g_ref = jax.grad(ref_loss)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-5)
