"""Conv roofline lab: time the dual model's actual conv shapes on TPU.

Convs are ~60% of the denoise step at 130-190 TF/s (STATUS.md). This lab
times each distinct (N, H, W, Cin, Cout, k) conv in the model standalone
with the floor-cancelling chained timer, and prints achieved TF/s next to
two bounds:
  - mxu_bound: peak * lane-tile efficiency (Cout padded to 128 lanes and
    Cin*k*k padded on the contraction dim) — what a perfect kernel with
    the same channel padding could do;
  - hbm_bound: bytes / 819 GB/s — the memory-bound floor for thin convs.
Shapes whose XLA time is far from max(bounds) are pallas-conv candidates.

Run: TF_CPP_MIN_LOG_LEVEL=3 python scripts/conv_lab.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from imagine360_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

PEAK_TFS = 197.0       # v5e bf16
HBM_GBS = 819.0

# (tag, N, H, W, Cin, Cout, k): every distinct conv in the dual denoise
# step (B=2 CFG; pano BF=2*16=32 at 64x128; pers BMF=2*20*16=640 at 32x32).
# ResnetBlock3D = 2x conv3x3 (+1x1 skip on channel change); up/downsamplers
# conv3x3; conv_in 9->320, conv_out 320->4 (outpaint interface).
SHAPES = [
    ("pano_L0_3x3", 32, 64, 128, 320, 320, 3),
    ("pano_L1_3x3", 32, 32, 64, 640, 640, 3),
    ("pano_L1_skip", 32, 32, 64, 320, 640, 1),
    ("pano_L2_3x3", 32, 16, 32, 1280, 1280, 3),
    ("pano_L3_3x3", 32, 8, 16, 1280, 1280, 3),
    ("pano_up_cat", 32, 16, 32, 2560, 1280, 3),
    ("pano_conv_in", 32, 64, 128, 9, 320, 3),
    ("pano_conv_out", 32, 64, 128, 320, 4, 3),
    ("pers_L0_3x3", 640, 32, 32, 320, 320, 3),
    ("pers_L1_3x3", 640, 16, 16, 640, 640, 3),
    ("pers_L2_3x3", 640, 8, 8, 1280, 1280, 3),
    ("pers_L3_3x3", 640, 4, 4, 1280, 1280, 3),
    ("pers_up_cat", 640, 8, 8, 2560, 1280, 3),
    ("pers_conv_in", 640, 32, 32, 9, 320, 3),
]


def pad_to(x, m):
    return -(-x // m) * m


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def mk_chain(x, w, n):
    """n dependent convs, scalar carry (4-byte fetch, DCE-proof).

    Methodology notes (the first version of this lab was wrong two ways):
    - fetching the full conv output through the dev tunnel (25-420 MB,
      seconds of jitter) swamps the ms-scale per-conv delta -> reduce to
      one f32 scalar ON DEVICE and fetch 4 bytes;
    - carrying only y[0,0,0,0] lets XLA slice the conv to a single output
      pixel (dead-code elimination of 99.9% of the FLOPs) -> jnp.sum keeps
      every output element live, and adding the carry into the input makes
      each iteration's conv distinct (no CSE).
    The scalar-broadcast add + sum cost ~ (2*in + out) bytes of HBM per
    iteration; that overhead is included in the printed 'ovh' bound.
    """
    del x, w  # passed as jit ARGUMENTS: closure capture would bake the
              # (up to 420 MB) input into the HLO as a constant, which the
              # remote compile service rejects (HTTP 413)

    @jax.jit
    def f(s0, x, w):
        def body(c, _):
            y = conv(x + c.astype(x.dtype), w)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        return jax.lax.scan(body, s0, None, length=n)[0]
    return f


def main():
    total_xla = 0.0
    total_ideal = 0.0
    s0 = jnp.float32(0)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for tag, N, H, W, Ci, Co, k in SHAPES:
        if only and not tag.startswith(only):
            continue
        x = jax.random.normal(jax.random.PRNGKey(0), (N, H, W, Ci),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, k, Ci, Co),
                              jnp.bfloat16) * 0.02
        flops = 2 * N * H * W * k * k * Ci * Co
        # MXU with lane padding on the output channels (lanes are Co)
        eff = (Co / pad_to(Co, 128))
        mxu_ms = flops / (PEAK_TFS * 1e12 * eff) * 1e3
        bytes_ = (N * H * W * (Ci + Co) + k * k * Ci * Co) * 2
        hbm_ms = bytes_ / (HBM_GBS * 1e9) * 1e3
        # harness overhead per iteration: read x, write x+c, read y for sum
        ovh_ms = (N * H * W * (2 * Ci + Co) * 2) / (HBM_GBS * 1e9) * 1e3
        ideal = max(mxu_ms, hbm_ms)
        f_s, f_l = mk_chain(x, w, 4), mk_chain(x, w, 24)
        np.asarray(f_s(s0, x, w)); np.asarray(f_l(s0, x, w))
        ts, tl = [], []
        for _ in range(3):
            t0 = time.time(); np.asarray(f_s(s0, x, w))
            ts.append(time.time() - t0)
            t0 = time.time(); np.asarray(f_l(s0, x, w))
            tl.append(time.time() - t0)
        t = (min(tl) - min(ts)) / 20
        tfs = flops / t / 1e12
        total_xla += t * 1e3
        total_ideal += ideal
        print(f"{tag:14s} {t*1e3:7.3f} ms {tfs:6.1f} TF/s  "
              f"ideal {ideal:6.3f} ms (mxu {mxu_ms:.3f} / hbm {hbm_ms:.3f} "
              f"/ ovh {ovh_ms:.3f})  gap {t*1e3/ideal:4.2f}x", flush=True)
    print(f"TOTAL xla {total_xla:.2f} ms vs ideal {total_ideal:.2f} ms "
          f"({total_xla/total_ideal:.2f}x)")


if __name__ == "__main__":
    main()
