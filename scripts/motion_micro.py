"""Micro-bench: the AnimateDiff motion module at the r1 perspective-branch
size (the dominant motion cost in the denoise step). Isolates (a) the full
MotionModule, (b) just the frame-axis attention (packed flash vs chunked
einsum), (c) just the layout transposes, to direct optimization work."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0])


def timeit(name, fn, *args, iters=4):
    import jax
    t0 = time.time()
    _fetch(fn(*args))
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
    from imagine360_tpu.models.motion import MotionModule
    from imagine360_tpu.ops.attention import (_packed_tiny_attention,
                                              _chunked_reference_attention)

    B, F, Hh, Ww, C = 40, 16, 32, 32, 320   # r1 pers with CFG: 40 views
    H, D = 8, 40
    jd = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    x = jax.random.normal(key, (B, F, Hh, Ww, C), jd)
    mod = MotionModule(heads=H, dtype=jd)
    params = mod.init(jax.random.PRNGKey(1), x)
    full = jax.jit(lambda p, x: mod.apply(p, x).sum())
    timeit("motion_module_full", full, params, x)

    # attention-only at the same folded shape
    Bf = B * Hh * Ww
    q = jax.random.normal(key, (Bf, F, H, D), jd)
    k = jax.random.normal(jax.random.PRNGKey(2), (Bf, F, H, D), jd)
    v = jax.random.normal(jax.random.PRNGKey(3), (Bf, F, H, D), jd)
    packed = jax.jit(lambda q, k, v: _packed_tiny_attention(q, k, v).sum())
    timeit("attn_packed_default", packed, q, k, v)
    chunked = jax.jit(lambda q, k, v: _chunked_reference_attention(
        q, k, v, chunk=2048).sum())
    timeit("attn_chunked_einsum", chunked, q, k, v)

    # direct kernel sweep: group size G x rows-per-step T x head slicing
    from imagine360_tpu.ops.attention import _block_diag_bias
    from imagine360_tpu.ops.pallas_attention import tiny_packed_attention
    scale = D ** -0.5
    for G, T in ((32, 1), (32, 2), (32, 4), (8, 4), (8, 16)):
        qp = q.reshape(Bf // G, G * F, H * D)
        kp = k.reshape(Bf // G, G * F, H * D)
        vp = v.reshape(Bf // G, G * F, H * D)
        bias = jnp.asarray(_block_diag_bias(G, F, F)[0])
        fn = jax.jit(lambda a, b, c, bi, T=T: tiny_packed_attention(
            a, b, c, bi, scale, H, t_rows=T).sum())
        timeit(f"kernel_G{G}_T{T}", fn, qp, kp, vp, bias)
    # heads=1 diagnostic: no lane slicing (math differs; perf only)
    qp = q.reshape(Bf // 32, 32 * F, H * D)
    bias = jnp.asarray(_block_diag_bias(32, F, F)[0])
    fn1 = jax.jit(lambda a, bi: tiny_packed_attention(
        a, a, a, bi, scale, 1, t_rows=1).sum())
    timeit("kernel_G32_T1_heads1", fn1, qp, bias)

    # the two layout transposes a module performs (frames <-> sequence axis)
    y = jax.random.normal(key, (B, F, Hh * Ww, C), jd)
    tr = jax.jit(lambda y: y.transpose(0, 2, 1, 3)
                 .reshape(B * Hh * Ww, F, C).sum())
    timeit("transpose_fold", tr, y)


if __name__ == "__main__":
    main()
