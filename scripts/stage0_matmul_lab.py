"""Stage-0 matmul fusion lab (scalar-carry methodology, see conv_lab.py).

The step profile (scripts/profile_step.py, r4) shows stage-0 matmul
fusions (motion/attention qkv, proj_out, ff) at ~48 TF/s with 4-5 GB raw
bytes per call — 3-4x below the conv fusions on the same step. This lab
times the same matmuls standalone and in context with the chained
scalar-carry scan (two lengths, slope cancels constant overhead) to find
whether the slowness is intrinsic to the shape or contextual (layout /
fusion poison from the step's producers/consumers).

Run: python scripts/stage0_matmul_lab.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

C = 320
N_SHORT, N_LONG = 4, 20


def chain(mk_body):
    """mk_body(carry_scalar, *ops) -> y (any tensor). Returns jitted
    f(s0, n, *ops) -> scalar, scanning n dependent iterations."""

    def f(s0, n, *ops):
        @jax.jit
        def g(s0, *ops):
            def body(c, _):
                y = mk_body(c, *ops)
                return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
            return jax.lax.scan(body, s0, None, length=n)[0]
        return g(s0, *ops)
    return f


def slope(fn, *ops):
    ts = {}
    for n in (N_SHORT, N_LONG):
        fn(jnp.float32(0.0), n, *ops).block_until_ready()  # compile
        best = 1e9
        for i in range(3):
            t0 = time.time()
            np.asarray(fn(jnp.float32(i + 1), n, *ops))
            best = min(best, time.time() - t0)
        ts[n] = best
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)


def report(name, t, flops, bytes_):
    print(f"{name:46s} {t*1000:8.3f} ms  {flops/t/1e12:6.1f} TF/s "
          f"{bytes_/t/1e9:6.0f} GB/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    x_tok = jax.random.normal(key, (640, 1024, C), bf)
    w = jax.random.normal(key, (C, C), bf)
    TOK = 640 * 1024
    f_pp = 2 * TOK * C * C
    b_pp = 2 * TOK * C * 2 + C * C * 2

    t = slope(chain(lambda c, x, w: (x + c.astype(x.dtype)) @ w), x_tok, w)
    report("proj [640,1024,320]@[320,320]", t, f_pp, b_pp)

    w_qkv = jax.random.normal(key, (C, 3 * C), bf)
    t = slope(chain(lambda c, x, w: (x + c.astype(x.dtype)) @ w),
              x_tok, w_qkv)
    report("qkv  [640,1024,320]@[320,960]", t, 3 * f_pp,
           2 * TOK * C * 4 + C * 3 * C * 2)

    w_g = jax.random.normal(key, (C, 8 * C), bf)
    w_d = jax.random.normal(key, (4 * C, C), bf)

    def ff(c, x, wg, wd):
        h = (x + c.astype(x.dtype)) @ wg
        a, b = jnp.split(h, 2, axis=-1)
        return (a * jax.nn.gelu(b)) @ wd

    ff_flops = 2 * TOK * C * 8 * C + 2 * TOK * 4 * C * C
    ff_bytes = 2 * TOK * (C * 2 + 8 * C + 4 * C + C)  # x, h, gated, out bf16
    t = slope(chain(ff), x_tok, w_g, w_d)
    report("GEGLU ff 320->2560->gelu->1280->320", t, ff_flops, ff_bytes)

    # motion layout: transpose (b f) hw c -> (b hw) f c around the proj
    def motion(c, x, w):
        v = (x + c.astype(x.dtype)).reshape(40, 16, 1024, C)
        v = v.transpose(0, 2, 1, 3).reshape(40 * 1024, 16, C)
        y = v @ w
        y = y.reshape(40, 1024, 16, C).transpose(0, 2, 1, 3)
        return y.reshape(640, 1024, C)

    t = slope(chain(motion), x_tok, w)
    report("transpose->proj->transpose (motion ctx)", t, f_pp,
           b_pp + 4 * TOK * C * 2)

    x_pano = jax.random.normal(key, (32, 8192, C), bf)
    t = slope(chain(lambda c, x, w: (x + c.astype(x.dtype)) @ w), x_pano, w)
    report("proj [32,8192,320]@[320,320]", t, 2 * 32 * 8192 * C * C,
           2 * 32 * 8192 * C * 2)

    # proj + residual + reshape + conv3x3 (proj_out context)
    wc = jax.random.normal(key, (3, 3, C, C), bf)

    def proj_conv(c, x, w, wc):
        y = (x + c.astype(x.dtype)) @ w + x
        img = y.reshape(640, 32, 32, C)
        return jax.lax.conv_general_dilated(
            img, wc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    conv_flops = 2 * TOK * 9 * C * C
    t = slope(chain(proj_conv), x_tok, w, wc)
    report("proj+residual+reshape+conv3x3", t, f_pp + conv_flops,
           2 * TOK * C * 2 * 2)

    x1 = jax.random.normal(key, (640, 256, 640), bf)
    w1 = jax.random.normal(key, (640, 640), bf)
    t = slope(chain(lambda c, x, w: (x + c.astype(x.dtype)) @ w), x1, w1)
    report("proj [640,256,640]@[640,640] (stage1)", t,
           2 * 640 * 256 * 640 * 640, 2 * 640 * 256 * 640 * 2)


if __name__ == "__main__":
    main()
