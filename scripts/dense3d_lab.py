"""A/B: Dense on [B, S, C] (3D) vs flattened [B*S, C] (2D) at the shapes
whose proj_out fusions run at 48 TF/s in the step profile. The HLO shows
the 3D form lowering to a window=B pad=B-1 correlation (B-fold redundant
work); the 2D form lowers to a clean matmul."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.warp_lab import chain_time


def main():
    import jax, jax.numpy as jnp
    jd = jnp.bfloat16
    w = jax.random.normal(jax.random.PRNGKey(1), (320, 320), jd) * 0.02
    b = jnp.zeros((320,), jd)
    for B, S in ((32, 8192), (640, 1024)):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, 320), jd)

        def dense3d(x, w, b):
            return x + (jnp.einsum("bsc,cd->bsd", x, w) + b)

        def dense2d(x, w, b):
            y = x.reshape(B * S, 320)
            return (y + (y @ w + b)).reshape(B, S, 320)

        chain_time(dense3d, x, w, b, label=f"dense3d_B{B}_S{S}")
        chain_time(dense2d, x, w, b, label=f"dense2d_B{B}_S{S}")

if __name__ == "__main__":
    main()
