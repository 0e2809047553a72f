"""Micro-bench for the fused (transpose-free) motion-attention kernels in
scripts/exp_motion_kernels.py at the r1 perspective-branch shape, checking
numerics against the einsum reference first."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0])


def timeit(name, fn, *args, iters=4):
    t0 = time.time()
    try:
        _fetch(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        _fetch(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from exp_motion_kernels import fused_motion_attention, \
        diag_motion_attention
    from imagine360_tpu.ops.attention import (_reference_attention,
                                              _block_diag_bias)

    B, F, HW, C = 40, 16, 1024, 320
    H, D = 8, 40
    scale = D ** -0.5
    jd = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, F, HW, C), jd)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, F, HW, C), jd)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, F, HW, C), jd)

    # numerics check on a small slice vs einsum reference
    Bs, HWs = 2, 64
    qs, ks, vs = (x[:Bs, :, :HWs] for x in (q, k, v))
    G = 32
    bias = jnp.asarray(_block_diag_bias(G, F, F)[0])
    got = fused_motion_attention(qs, ks, vs, bias, scale, H, G=G)
    # reference: per-location attention over frames
    qr = qs.transpose(0, 2, 1, 3).reshape(Bs * HWs, F, H, D)
    kr = ks.transpose(0, 2, 1, 3).reshape(Bs * HWs, F, H, D)
    vr = vs.transpose(0, 2, 1, 3).reshape(Bs * HWs, F, H, D)
    want = _reference_attention(qr, kr, vr, scale=scale)
    want = want.reshape(Bs, HWs, F, C).transpose(0, 2, 1, 3)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"fused numerics maxerr: {err:.3e}", flush=True)

    try:
        got2 = diag_motion_attention(qs, ks, vs, scale, H, G=G)
        err2 = float(jnp.max(jnp.abs(got2.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        print(f"diag numerics maxerr: {err2:.3e}", flush=True)
    except Exception as e:
        print(f"diag numerics FAILED: {str(e)[:160]}", flush=True)

    for G in (8, 16, 32):
        bias = jnp.asarray(_block_diag_bias(G, F, F)[0])
        fn = jax.jit(lambda q, k, v, b, G=G: fused_motion_attention(
            q, k, v, b, scale, H, G=G).sum())
        timeit(f"fused_G{G}", fn, q, k, v, bias)
    bias = jnp.asarray(_block_diag_bias(32, F, F)[0])
    fnb = jax.jit(lambda q, k, v, b: fused_motion_attention(
        q, k, v, b, scale, H, G=32, exp_bf16=True).sum())
    timeit("fused_G32_expbf16", fnb, q, k, v, bias)
    for G in (16, 32):
        fnd = jax.jit(lambda q, k, v, G=G: diag_motion_attention(
            q, k, v, scale, H, G=G).sum())
        timeit(f"diag_G{G}", fnd, q, k, v)


if __name__ == "__main__":
    main()
