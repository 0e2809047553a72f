"""Chained timing: WarpAttn flash variants on the real warp-site shapes.

Site (biggest warp, encoder_0/decoder_2): pano 2048 <-> pers 5120 tokens,
b*f=32, heads=10, D=32, f32 broadcast bias [Sq, Sk].
v1 streams the bias once per (batch, head) = 320 sweeps; _flash_shared_bias
folds T rows per grid step so the bias streams BH/T times.
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, q, *rest, label="", n_lo=4, n_hi=20):
    import jax

    def make(n):
        @jax.jit
        def run(q, *rest):
            out = jax.lax.fori_loop(0, n, lambda i, q: fn(q, *rest), q)
            return out.astype(jax.numpy.float32).sum()
        return run

    lo, hi = make(n_lo), make(n_hi)
    t0 = time.time()
    np.asarray(lo(q, *rest)), np.asarray(hi(q, *rest))
    compile_s = time.time() - t0
    t_lo = t_hi = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(lo(q, *rest))
        t_lo = min(t_lo, time.time() - t0)
        t0 = time.time()
        np.asarray(hi(q, *rest))
        t_hi = min(t_hi, time.time() - t0)
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{label}: {per*1000:.2f} ms/iter (compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.pallas_attention import (_flash_bhsd,
                                                     _flash_shared_bias)

    jd = jnp.bfloat16
    B, H, D = 32, 10, 32
    scale = D ** -0.5
    for (Sq, Sk, tag) in ((2048, 5120, "e2p"), (5120, 2048, "p2e")):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Sq, D), jd)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Sk, D), jd)
        bias = jax.random.uniform(jax.random.PRNGKey(2),
                                  (Sq, Sk), jnp.float32) * 2 - 1

        def t(label, fn, *args):
            try:
                chain_time(fn, *args, label=label)
            except Exception as e:
                print(f"{label}: FAILED {type(e).__name__}", flush=True)

        t(f"{tag}_v1_b1024", lambda q, k, b: _flash_bhsd(
            q, k, k, b[None, None], scale, block_q=1024, block_k=1024),
            q, k, bias)
        qf = q.reshape(B * H, Sq, D)
        kf = k.reshape(B * H, Sk, D)
        for T, bq, bk in ((16, 1024, 1024), (32, 1024, 1024),
                          (32, 512, 1024), (32, 1024, 512),
                          (64, 512, 512), (32, 2048, 1024)):
            t(f"{tag}_shared_T{T}_b{bq}x{bk}",
              lambda q, k, b, T=T, bq=bq, bk=bk: _flash_shared_bias(
                  q, k, k, b, scale, block_q=bq, block_k=bk, t_rows=T),
              qf, kf, bias)
        # bf16 bias variant (halves bias traffic; masks are smooth [-1,1])
        t(f"{tag}_shared_T32_bf16bias", lambda q, k, b: _flash_shared_bias(
            q, k, k, b, scale, block_q=1024, block_k=1024, t_rows=32),
            qf, kf, bias.astype(jd))
        # fully transposed: [T, D, S] blocks, D on sublanes (no lane pad)
        from imagine360_tpu.ops.pallas_attention import _flash_shared_bias_t
        qt = q.transpose(0, 1, 3, 2).reshape(B * H, D, Sq)
        kt = k.transpose(0, 1, 3, 2).reshape(B * H, D, Sk)
        bt = bias.T
        for T, bq, bk in ((16, 1024, 1024), (32, 1024, 1024),
                          (64, 1024, 1024), (32, 2048, 2048)):
            t(f"{tag}_tshared_T{T}_b{bq}x{bk}",
              lambda q, k, b, T=T, bq=bq, bk=bk: _flash_shared_bias_t(
                  q, k, k, b, scale, block_q=bq, block_k=bk, t_rows=T),
              qt, kt, bt)
        t(f"{tag}_tshared_T32_bf16bias",
          lambda q, k, b: _flash_shared_bias_t(
              q, k, k, b, scale, t_rows=32), qt, kt, bt.astype(jd))


if __name__ == "__main__":
    main()
