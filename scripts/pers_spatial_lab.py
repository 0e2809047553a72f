"""Chained timing: perspective-branch spatial self-attention at r1
(B=640 folded views*frames, S=1024 tokens, H=5, D=64) — the single-block
kernel's t_rows sweep vs the v1 flash path, plus text/ip cross-attention
shapes (Sk=141)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.warp_lab import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.attention import _single_block_attention
    from imagine360_tpu.ops.pallas_attention import (tiny_packed_attention,
                                                     _flash_bhsd)

    jd = jnp.bfloat16
    B, S, H, D = 640, 1024, 5, 64
    scale = D ** -0.5
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jd)

    def t(label, fn, *args):
        try:
            chain_time(fn, *args, label=label)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}", flush=True)

    t("single_block_dispatch", lambda q: _single_block_attention(
        q, q, q, scale=scale), q)

    qp = q.reshape(B, S, H * D)
    bias0 = jnp.zeros((1, S, S), jnp.float32)
    for T in (1, 2, 4, 8):
        t(f"tiny_packed_T{T}", lambda qp, b, T=T: tiny_packed_attention(
            qp, qp, qp, b, scale, H, t_rows=T).reshape(B, S, H, D), qp,
          bias0)

    qf = q.transpose(0, 2, 1, 3)   # [B, H, S, D]
    for bq, bk in ((512, 512), (1024, 1024)):
        t(f"flash_v1_b{bq}x{bk}", lambda qf, bq=bq, bk=bk: _flash_bhsd(
            qf, qf, qf, None, scale, block_q=bq, block_k=bk), qf)

    # cross-attention (Sk = 141 text+ip tokens)
    Sk = 141
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Sk, H, D), jd)
    kp = k.reshape(B, Sk, H * D)

    def cross(q, k):
        from imagine360_tpu.ops.attention import dot_product_attention
        return dot_product_attention(q, k, k)

    t("cross_Sk141_dispatch", cross, q, k)


if __name__ == "__main__":
    main()
