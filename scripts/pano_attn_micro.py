"""Micro-bench: pano-branch spatial self-attention (B=2*16 frames,
S=64x128=8192 tokens) through the flash kernel at different block sizes."""
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
    from imagine360_tpu.ops.pallas_attention import _flash_bhsd

    jd = jnp.bfloat16
    B, S, H, D = 32, 8192, 5, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), jd)
    scale = D ** -0.5
    for bq, bk in ((512, 512), (1024, 1024), (2048, 1024), (1024, 2048)):
        f = jax.jit(lambda q, bq=bq, bk=bk: _flash_bhsd(
            q, q, q, None, scale, block_q=bq, block_k=bk).sum())
        timeit(f"flash_b{bq}x{bk}", f, q)


if __name__ == "__main__":
    main()
