"""Kernel lab: chained-iteration timing of temporal-attention variants.

Timing: N dependent iterations inside one jit (out_i feeds q_{i+1}); the
per-iteration cost is the DIFFERENCE between a long and a short chain run
((t_40 - t_8)/32), which cancels the tunneled-fetch latency floor (~116 ms,
drifts) exactly.

Site: r1 perspective motion attention (B=40 views*CFG, F=16 frames,
HW=1024, C=320, H=8, D=40). Useful flops 13.4 GFLOP; the production
striped_G32 kernel measured 8.7 ms = MXU-bound at ~100x pad waste
(G=32 off-stripe logits x 128/40 lane pad). Candidate: small-G packs
(less off-stripe waste) with R packs per grid step (amortize step overhead).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, q, *rest, label="", n_lo=8, n_hi=40):
    """fn(q, *rest) -> out with out.shape == q.shape. Returns s/iter via
    long/short chain differencing (cancels the fetch floor)."""
    import jax

    def make(n):
        @jax.jit
        def run(q, *rest):
            out = jax.lax.fori_loop(
                0, n, lambda i, q: fn(q, *rest), q)
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
    print(f"{label}: {per*1000:.2f} ms/iter "
          f"(lo {t_lo*1000:.0f} hi {t_hi*1000:.0f}, compile {compile_s:.0f}s)",
          flush=True)
    return per


# ---------------------------------------------------------------------------
# striped v2: small-G packs, R packs per grid step (fori_loop over packs)
# ---------------------------------------------------------------------------

def _striped_v2_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H, D, G,
                       F, R, unroll):
    import jax
    import jax.numpy as jnp
    bias = b_ref[0].astype(jnp.float32)                    # [FG, FG]
    S = F * G

    def one_pack(r):
        qp = q_ref[0, :, r].reshape(S, H * D)
        kp = k_ref[0, :, r].reshape(S, H * D)
        vp = v_ref[0, :, r].reshape(S, H * D)
        for h in range(H):
            q = qp[:, h * D:(h + 1) * D]
            k = kp[:, h * D:(h + 1) * D]
            v = vp[:, h * D:(h + 1) * D]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, :, r, :, h * D:(h + 1) * D] = o.astype(
                o_ref.dtype).reshape(F, G, D)

    if unroll:
        for r in range(R):
            one_pack(r)
    else:
        jax.lax.fori_loop(0, R, lambda r, _: (one_pack(r), 0)[1], 0)


@functools.partial(
    __import__("jax").jit, static_argnames=("scale", "heads", "G", "R",
                                            "unroll"))
def striped_v2_attention(q, k, v, scale, heads, G, R, unroll=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from imagine360_tpu.ops.pallas_attention import _striped_bias

    B, F, HW, C = q.shape
    D = C // heads
    T = HW // G
    assert T % R == 0, (T, R)
    bias = jnp.asarray(_striped_bias(G, F))
    q5 = q.reshape(B, F, T, G, C)
    k5 = k.reshape(B, F, T, G, C)
    v5 = v.reshape(B, F, T, G, C)
    spec = pl.BlockSpec((1, F, R, G, C), lambda b, t: (b, 0, t, 0, 0))
    kernel = functools.partial(_striped_v2_kernel, scale=scale, H=heads,
                               D=D, G=G, F=F, R=R, unroll=unroll)
    out = pl.pallas_call(
        kernel,
        grid=(B, T // R),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, F * G, F * G), lambda b, t: (0, 0, 0))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, F, T, G, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q5, k5, v5, bias)
    return out.reshape(B, F, HW, C)


def main():
    import jax
    import jax.numpy as jnp
    from imagine360_tpu.ops.pallas_attention import temporal_packed_attention

    B, F, HW, C = 40, 16, 1024, 320
    H = 8
    D = C // H
    scale = D ** -0.5
    jd = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, F, HW, C), jd)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, F, HW, C), jd)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, F, HW, C), jd)

    # numeric check vs production
    ref = temporal_packed_attention(q, k, v, scale, H, 32)
    got = striped_v2_attention(q, k, v, scale, H, 8, 4)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"striped_v2 vs production maxerr: {err:.2e}", flush=True)

    chain_time(lambda q, k, v: temporal_packed_attention(
        q, k, v, scale, H, 32), q, k, v, label="prod_striped_G32")
    for G, R, unroll in ((16, 8, False), (8, 16, False), (8, 16, True),
                         (8, 32, False), (4, 32, False), (4, 64, False),
                         (2, 64, False)):
        try:
            chain_time(lambda q, k, v, G=G, R=R, u=unroll:
                       striped_v2_attention(q, k, v, scale, H, G, R, u),
                       q, k, v, label=f"v2_G{G}_R{R}_u{int(unroll)}")
        except Exception as e:
            print(f"v2_G{G}_R{R}_u{int(unroll)}: FAILED {type(e).__name__}",
                  flush=True)
    # repeat production for noise estimate
    chain_time(lambda q, k, v: temporal_packed_attention(
        q, k, v, scale, H, 32), q, k, v, label="prod_striped_G32_again")


if __name__ == "__main__":
    main()
