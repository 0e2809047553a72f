"""Repro driver for the attn_v2 (I360_KERNELS=+attn_v2) transposed-kernel Mosaic compile
wedge: compiles the transposed-layout flash kernel (_flash_bhds, sequence
on lanes) on each full-model flash site shape, one case per process so a
wedged compile can be timed out and identified.

Usage: python scripts/v2_wedge_repro.py <case>   (or no arg to list cases)
Driver: for c in ...; do timeout 900 python scripts/v2_wedge_repro.py $c; done
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, B, H, D, Sq, Sk, bias?)
CASES = {
    "pano_spatial_r1": (32, 5, 64, 8192, 8192, False),
    "warp_r1_fwd": (32, 10, 32, 8192, 20480, True),
    "warp_r1_rev": (32, 10, 32, 20480, 8192, True),
    "warp_r2_fwd": (32, 10, 32, 2048, 5120, True),
    "warp_r2_rev": (32, 10, 32, 5120, 2048, True),
    "warp_r3_fwd": (32, 20, 32, 512, 1280, True),
    "sam_like": (32, 8, 64, 4096, 4096, False),
}


def run(name):
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from imagine360_tpu.ops.pallas_attention import _flash_bhds

    B, H, D, Sq, Sk, with_bias = CASES[name]
    jd = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    # transposed layout [B, H, D, S]
    q = jax.random.normal(key, (B, H, D, Sq), jd)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, D, Sk), jd)
    bias = None
    if with_bias:
        bias = (jax.random.uniform(jax.random.PRNGKey(2), (1, 1, Sq, Sk))
                .astype(ml_dtypes.bfloat16) * 2 - 1)
    scale = D ** -0.5
    blocks = {}
    if min(Sq, Sk) >= 2048:
        blocks = dict(block_q=1024, block_k=1024)
    f = jax.jit(lambda q, k, b: _flash_bhds(q, k, k, b, scale,
                                            **blocks).sum())
    t0 = time.time()
    out = f(q, k, bias)
    np.asarray(out)
    print(f"{name}: COMPILED+RAN in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    np.asarray(f(q, k, bias))
    print(f"{name}: {1000*(time.time()-t0):.1f} ms/call (fetch-incl)",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(" ".join(CASES))
    else:
        run(sys.argv[1])
