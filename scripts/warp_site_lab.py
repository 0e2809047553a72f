"""Per-site WarpAttn cost attribution + path shootout.

step_breakdown.py measured the 7 WarpAttn couplings at ~0.8 s/step (24% of
the full CFG dual step) — ~6 TF/s effective on ~5 TFLOP of attention math.
This lab times each site's attention (both directions) through

  prod    - the production dot_product_attention dispatch (shared-bias
            flash kernel for Sq>=256 broadcast-bias sites; chunked einsum
            for the small deep sites)
  einsum  - the XLA reference einsum (logits in HBM, GSPMD-friendly)
  flash   - the generic flash kernel with bias
  module  - the full WarpAttn module call (attention + QKV/out/FF)

on the REAL site shapes (B = 2 CFG x 16 frames = 32 rows; heads = C/32):

  enc_0/dec_2: C=320  H=10  pano 32x64=2048  <-> pers 20*16*16=5120
  enc_1/dec_1: C=640  H=20  pano 16x32=512   <-> pers 20*8*8=1280
  enc_2/mid/dec_0: C=1280 H=40 pano 8x16=128 <-> pers 20*4*4=320

Single-call timing (block_until_ready, min over repeats): per-call costs
here are 10-250 ms, so dispatch noise (~1 ms) is irrelevant and each path
costs ONE compile instead of the two chained fori_loop executables the
first version used (those took ~7 min each to compile on this host).
Run: python scripts/warp_site_lab.py [site ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

# (tag, C, Sq, Sk) per unique (resolution, direction); n_sites multiplies
# the per-step cost (enc_0+dec_2 share shapes, etc.)
SITES = [
    ("r2_e2p", 320, 2048, 5120, 2),
    ("r2_p2e", 320, 5120, 2048, 2),
    ("r4_e2p", 640, 512, 1280, 2),
    ("r4_p2e", 640, 1280, 512, 2),
    ("r8_e2p", 1280, 128, 320, 3),
    ("r8_p2e", 1280, 320, 128, 3),
]
B = 32   # 2 CFG x 16 frames


def chain_time(fn, q, *rest, reps=6):
    import jax

    run = jax.jit(lambda q, *rest: fn(q, *rest))
    t0 = time.time()
    jax.block_until_ready(run(q, *rest))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(q, *rest))
        best = min(best, time.time() - t0)
    return best, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.attention import (dot_product_attention,
                                              _reference_attention,
                                              _chunked_reference_attention,
                                              _flash_impl,
                                              _LOGITS_BYTES_LIMIT)

    only = set(sys.argv[1:])
    jd = jnp.bfloat16
    total = {}
    for tag, C, Sq, Sk, mult in SITES:
        if only and not any(s in tag for s in only):
            continue
        H, D = C // 32, 32
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, Sq, H, D), jd)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, Sk, H, D), jd)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, Sk, H, D), jd)
        bias = (jax.random.uniform(jax.random.fold_in(key, 3),
                                   (1, 1, Sq, Sk), jnp.float32) * 2 - 1)
        bias_t = jnp.asarray(bias[0, 0].T)

        flops = 4 * B * H * Sq * Sk * D  # QK^T + PV

        def report(name, fn, *args):
            try:
                per, comp = chain_time(fn, *args)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:9s} {name:7s} FAILED {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
                return None
            print(f"{tag:9s} {name:7s} {per*1000:7.2f} ms  "
                  f"{flops/per/1e12:6.1f} TF/s  (x{mult} sites; "
                  f"compile {comp:.0f}s)", flush=True)
            total.setdefault(name, 0.0)
            total[name] += per * mult
            return per

        report("prod", lambda q, k, v: dot_product_attention(
            q, k, v, bias=bias, bias_t=bias_t), q, k, v)
        # einsum with the production chunking rule
        sq_pad, sk_pad = -(-Sq // 8) * 8, -(-Sk // 128) * 128
        if B * H * sq_pad * sk_pad * 4 > _LOGITS_BYTES_LIMIT:
            chunk = max(1, _LOGITS_BYTES_LIMIT // (H * sq_pad * sk_pad * 4))
            report("einsumC", lambda q, k, v: _chunked_reference_attention(
                q, k, v, bias=bias, chunk=chunk), q, k, v)
        if B * H * sq_pad * sk_pad * 4 <= 4 << 30:  # full logits would OOM
            report("einsum", lambda q, k, v: _reference_attention(
                q, k, v, bias=bias), q, k, v)
        report("flash", lambda q, k, v: _flash_impl(
            q, k, v, bias, None), q, k, v)

    print("\nper-step totals over all warp sites (x2 bias-variant select "
          "not included):", flush=True)
    for name, t in sorted(total.items(), key=lambda kv: kv[1]):
        print(f"  {name:7s} {t*1000:7.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
