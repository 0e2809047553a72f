"""Micro-bench: the spatial self-attention and text cross-attention sites
at the r1 perspective-branch shape, comparing the current dispatch against
a forced flash path (short-kv flash pads Sk to one 128 block)."""
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
    from imagine360_tpu.ops.attention import dot_product_attention
    from imagine360_tpu.ops.pallas_attention import flash_attention

    jd = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # spatial self-attention, r1 pers: (2*20 views * 8 frames folded) x 1024px
    B, S, H, D = 640, 1024, 5, 64
    q = jax.random.normal(key, (B, S, H, D), jd)
    f = jax.jit(lambda q: dot_product_attention(q, q, q).sum())
    timeit("spatial_self_r1_dispatch", f, q)

    # text cross-attention, r1 pers: kv = 77 text tokens (141 with ip)
    for Sk in (77, 141):
        k = jax.random.normal(jax.random.PRNGKey(1), (B, Sk, H, D), jd)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, Sk, H, D), jd)
        g = jax.jit(lambda q, k, v: dot_product_attention(q, k, v).sum())
        timeit(f"text_cross_Sk{Sk}_dispatch", g, q, k, v)
        h = jax.jit(lambda q, k, v: flash_attention(q, k, v).sum())
        timeit(f"text_cross_Sk{Sk}_flash", h, q, k, v)


if __name__ == "__main__":
    main()
