"""Pallas TPU dense (token matmul) kernel.

Why this exists: inside the full dual-UNet program, XLA's TPU layout
assigner sometimes gives the activations feeding the spatial/motion
transformer `proj_out` Denses a token-minor layout and then lowers the
[N, K] @ [K, M] dot as a window=B *correlation* ("convolution fusion" at
~48 TF/s with ~7x redundant work — see STATUS.md). The flat2d
flattening (models/layers.py, KernelConfig.flat_dense — default OFF,
measured slower in-model) anchors sites row-major; this pallas kernel is
the stronger hammer for experiments: its operands are REQUIRED in
default (row-major) layout, so
the layout assigner materializes the activation row-major and the matmul
runs on the MXU at full tile efficiency. Opt in via
KernelConfig.pallas_dense (I360_KERNELS=+pallas_dense) — measured no-win
in-model, see models/layers.py:MMDense.

Numerics match nn.Dense on bf16 inputs: the MXU accumulates bf16 x bf16 in
f32 (preferred_element_type) and the result is cast back to the model
dtype, exactly like XLA's own dot lowering.

Used by models/layers.py:MMDense at the profiled-bad sites (transformer
proj_in/proj_out, motion proj_in/proj_out, feed-forward matmuls).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 2 ** 23  # conservative working-set cap (half of 16 MB VMEM)


def _matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk):
    ik = pl.program_id(2)  # k innermost: sequential accumulation

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_tile(n: int, candidates) -> int | None:
    for c in candidates:
        if n % c == 0:
            return c
    return None


def _plan(N: int, K: int, M: int):
    """Returns (bn, bk, bm) or None when the kernel shouldn't run."""
    bn = _pick_tile(N, (1024, 512, 256, 128))
    if bn is None:
        return None
    # feature dims need not be 128-aligned: a block spanning the whole dim
    # is edge-masked by Mosaic (lanes pad to the next 128 internally)
    bk = _pick_tile(K, (1536, 1280, 1024, 768, 640, 512, 384, 320,
                        256)) or K
    bm = _pick_tile(M, (1536, 1280, 1024, 768, 640, 512, 384, 320,
                        256)) or M
    while bn > 128 and (bn * bk + bk * bm) * 2 + bn * bm * 6 > _VMEM_BUDGET:
        bn //= 2
    if (bn * bk + bk * bm) * 2 + bn * bm * 6 > 2 * _VMEM_BUDGET:
        return None
    return bn, bk, bm


def supported(n_tokens: int, k: int, m: int) -> bool:
    return _plan(n_tokens, k, m) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_matmul(x, w, interpret=False):
    N, K = x.shape
    M = w.shape[1]
    plan = _plan(N, K, M)
    if plan is None:  # pragma: no cover - callers gate on supported()
        return jnp.dot(x, w, preferred_element_type=jnp.float32
                       ).astype(x.dtype)
    bn, bk, bm = plan
    nk = K // bk
    grid = (N // bn, M // bm, nk)
    return pl.pallas_call(
        functools.partial(_matmul_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bm), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bn, bm), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, M), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        interpret=interpret,
    )(x, w)


def dense_matmul(x: jnp.ndarray, w: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """[..., K] @ [K, M] -> [..., M] with pallas-pinned row-major layout."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = w.shape[1]
    out = _pallas_matmul(x.reshape(-1, K), w, interpret=interpret)
    return out.reshape(*lead, M)
