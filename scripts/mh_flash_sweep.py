"""Block-size + scratch-layout sweep for mh_flash_attention and t_rows
sweep for the single-block kernel, on the two dominant spatial-attention
shapes (r5 profile: pano_s0 5x41 ms/step, pers_s0 via single kernel).

Run on TPU: python scripts/mh_flash_sweep.py [pano_s0|pers_s0 ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from scripts.warp_lab import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.pallas_attention import mh_flash_attention
    from imagine360_tpu.ops.attention import _single_block_attention

    jd = jnp.bfloat16
    names = sys.argv[1:] or ["pano_s0", "pers_s0"]

    if "pano_s0" in names:
        B, S, H, D = 32, 8192, 5, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H * D), jd)
        scale = float(D ** -0.5)
        for bq, bk in ((1024, 1024), (512, 1024), (1024, 512), (512, 512),
                       (2048, 1024), (1024, 2048), (2048, 2048),
                       (4096, 1024), (2048, 512)):
            chain_time(lambda q, bq=bq, bk=bk: mh_flash_attention(
                q, q, q, scale, H, block_q=bq, block_k=bk), q,
                label=f"pano_s0:mh_bq{bq}_bk{bk}")

    if "pers_s0" in names:
        B, S, H, D = 640, 1024, 5, 64
        q4 = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), jd)
        scale = float(D ** -0.5)
        from imagine360_tpu.ops.pallas_attention import tiny_packed_attention
        qp = q4.reshape(B, S, H * D)
        bias0 = jnp.zeros((1, S, S), jnp.float32)
        for T in (1, 2, 4):
            chain_time(lambda qp, b, T=T: tiny_packed_attention(
                qp, qp, qp, b, scale, H, t_rows=T), qp, bias0,
                label=f"pers_s0:single_T{T}")
        for bq, bk in ((512, 1024), (1024, 1024), (256, 1024), (512, 512)):
            chain_time(lambda qp, bq=bq, bk=bk: mh_flash_attention(
                qp, qp, qp, scale, H, block_q=bq, block_k=bk), qp,
                label=f"pers_s0:mh_bq{bq}_bk{bk}")


if __name__ == "__main__":
    main()
