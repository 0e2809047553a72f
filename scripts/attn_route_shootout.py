"""Per-route attention shootout on the production no-bias shapes.

The r5 per-HLO profile (scripts/profile_step.py) shows the spatial
attention custom-calls costing ~760 ms/step with the stage-0 sites ~10x
off roofline (41 ms vs ~4 ms ideal for [640, 1024, 5, 64]). This times
each ELIGIBLE route on each production shape so the dispatch matrix in
ops/dispatch.py is chosen per measurement, not per heuristic.

Run on TPU: python scripts/attn_route_shootout.py [site ...]
Sites: pers_s0, pers_s1, pano_s0, pano_s1, pano_s2, pers_cross, pano_cross
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from scripts.warp_lab import chain_time  # noqa: E402

SITES = {
    # label: (B, Sq, Sk, H, D)
    "pers_s0": (640, 1024, 1024, 5, 64),
    "pers_s1": (640, 256, 256, 10, 64),
    "pano_s0": (32, 8192, 8192, 5, 64),
    "pano_s1": (32, 2048, 2048, 10, 64),
    "pano_s2": (32, 512, 512, 20, 64),
    "pers_cross": (640, 1024, 141, 5, 64),
    "pano_cross": (32, 8192, 141, 5, 64),
}


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.attention import (_mh_attention_trainable,
                                              _single_block_attention,
                                              _flash_attention_trainable)
    from imagine360_tpu.ops.dispatch import (SINGLE_BLOCK_LOGITS,
                                             select_attention_route)

    names = sys.argv[1:] or list(SITES)
    for name in names:
        B, Sq, Sk, H, D = SITES[name]
        jd = jnp.bfloat16
        scale = float(D ** -0.5)
        q = jax.random.normal(jax.random.PRNGKey(0), (B, Sq, H, D), jd)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, Sk, H, D), jd)
        cur = select_attention_route(B, Sq, Sk, H, D, False, False, True)
        print(f"--- {name} B={B} Sq={Sq} Sk={Sk} H={H} D={D} "
              f"(current route: {cur}) ---", flush=True)
        skp = -(-Sk // 128) * 128
        if Sq % 8 == 0 and Sq * skp <= SINGLE_BLOCK_LOGITS:
            chain_time(lambda q, k: _single_block_attention(
                q, k, k, scale=scale), q, k, label=f"{name}:single")
        if Sq >= 256 and Sk >= 64 and D % 8 == 0:
            chain_time(lambda q, k: _mh_attention_trainable(
                scale, H, q, k, k), q, k, label=f"{name}:mh_flash")
        if Sq >= 256 and Sk >= 256:
            chain_time(lambda q, k: _flash_attention_trainable(
                scale, q, k, k, None), q, k, label=f"{name}:flash")


if __name__ == "__main__":
    main()
