"""Micro-bench: WarpAttn cross-branch attention (stage-1 / r2 site:
pano 2048 tokens <-> 20x16x16=5120 perspective tokens, broadcast bias)
across flash block sizes."""
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
    import ml_dtypes
    from imagine360_tpu.ops.pallas_attention import _flash_bhsd

    jd = jnp.bfloat16
    B, H, D = 32, 10, 32
    Sq, Sk = 2048, 5120     # pano -> pers direction at r2
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, Sq, D), jd)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Sk, D), jd)
    bias = (jax.random.uniform(jax.random.PRNGKey(2), (1, 1, Sq, Sk))
            .astype(ml_dtypes.bfloat16) * 2 - 1)
    scale = D ** -0.5
    for bq, bk in ((512, 512), (1024, 1024), (512, 1024), (1024, 512),
                   (2048, 512)):
        f = jax.jit(lambda q, k, b, bq=bq, bk=bk: _flash_bhsd(
            q, k, k, b, scale, block_q=bq, block_k=bk).sum())
        timeit(f"warp_q{Sq}_b{bq}x{bk}", f, q, k, bias)
    # reverse direction: pers queries, pano keys
    for bq, bk in ((512, 512), (1024, 1024)):
        f = jax.jit(lambda q, k, b, bq=bq, bk=bk: _flash_bhsd(
            k, q, q, b.transpose(0, 1, 3, 2), scale,
            block_q=bq, block_k=bk).sum())
        timeit(f"warp_q{Sk}_b{bq}x{bk}", f, q, k, bias)


if __name__ == "__main__":
    main()
