"""Chained timing: (a) pano spatial self-attention S=8192 D=64 — v1
[S, D]-block flash vs transposed [D, S]-block flash (halves lane-pad
traffic at D=64); (b) the proj_out Dense+residual epilogue standalone (the
full-step profile shows those fusions at only 48 TF/s / 315 GB/s —
standalone cost tells us if the slowness is intrinsic or a fusion
pathology)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.warp_lab import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.pallas_attention import _flash_bhsd, _flash_bhds

    jd = jnp.bfloat16
    B, H, S, D = 32, 5, 8192, 64
    scale = D ** -0.5
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jd)

    def t(label, fn, *args):
        try:
            chain_time(fn, *args, label=label)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)

    t("pano_v1_b1024", lambda q: _flash_bhsd(
        q, q, q, None, scale, block_q=1024, block_k=1024), q)
    qt = q.transpose(0, 1, 3, 2)  # [B, H, D, S]

    def v2(q, bq, bk):
        out = _flash_bhds(q, q, q, None, scale, block_q=bq, block_k=bk)
        return out.transpose(0, 1, 3, 2)  # back to [B, H, D, S] for chain

    for bq, bk in ((1024, 1024), (2048, 1024), (1024, 2048)):
        t(f"pano_v2_b{bq}x{bk}", lambda q, bq=bq, bk=bk: v2(q, bq, bk), qt)

    # ---- proj epilogue standalone (r1 pers + pano shapes fused batch) ----
    N = 640 * 1024 + 32 * 8192          # pers + pano r1 rows
    x = jax.random.normal(jax.random.PRNGKey(1), (N, 320), jd)
    w = jax.random.normal(jax.random.PRNGKey(2), (320, 320), jd) * 0.02
    b = jnp.zeros((320,), jd)

    def proj(x, w, b):
        return x + (x @ w + b)

    t("proj_residual_standalone", proj, x, w, b)

    # with a f32 groupnorm after (the next block's norm often fuses here)
    def proj_gn(x, w, b):
        y = x + (x @ w + b)
        yf = y.astype(jnp.float32).reshape(N, 32, 10)
        mu = yf.mean(axis=2, keepdims=True)
        var = yf.var(axis=2, keepdims=True)
        return ((yf - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(N, 320).astype(jd)

    t("proj_gn_standalone", proj_gn, x, w, b)

    # matmul-reduction GroupNorm (models/layers.fast_group_norm)
    from imagine360_tpu.models.layers import fast_group_norm
    gamma = jnp.ones((320,), jnp.float32)
    beta = jnp.zeros((320,), jnp.float32)

    def proj_fastgn(x, w, b):
        y = x + (x @ w + b)
        return fast_group_norm(y[:, None, :], 32, 1e-5, gamma, beta)[:, 0, :]

    t("proj_fastgn_rowwise", proj_fastgn, x, w, b)

    # realistic resnet prologue shape: per-(frame) spatial stats
    xs = x.reshape(640 + 32 * 8, 1024, 320)   # [N, HW, C] per-frame-ish

    def gn_only(xs):
        return fast_group_norm(xs, 32, 1e-5, gamma, beta)

    t("fastgn_only_spatial", gn_only, xs)

    def gn_flax(xs):
        import flax.linen as nn_
        yf = xs.astype(jnp.float32).reshape(xs.shape[0], -1, 32, 10)
        mu = yf.mean(axis=(1, 3), keepdims=True)
        var = yf.var(axis=(1, 3), keepdims=True)
        y = (yf - mu) * jax.lax.rsqrt(var + 1e-5)
        return y.reshape(xs.shape).astype(xs.dtype)

    t("naivegn_only_spatial", gn_flax, xs)


if __name__ == "__main__":
    main()
