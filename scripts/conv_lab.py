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


def chain(fn, x, w, n):
    def body(c, _):
        y = fn(c, w)
        # keep shapes closed: project back to input channel count
        return y[..., : x.shape[-1]] if y.shape != c.shape else y, None
    return jax.jit(lambda a: jax.lax.scan(body, a, None, length=n)[0])


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    total_xla = 0.0
    total_ideal = 0.0
    for tag, N, H, W, Ci, Co, k in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (N, H, W, Ci),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, k, Ci, Co),
                              jnp.bfloat16) * 0.02
        flops = 2 * N * H * W * k * k * Ci * Co
        # MXU with lane padding on both contraction (Ci*k*k -> mult of 128
        # sublane-tiles is cheap; lanes are Co) and output lanes
        eff = (Co / pad_to(Co, 128))
        mxu_ms = flops / (PEAK_TFS * 1e12 * eff) * 1e3
        bytes_ = (N * H * W * (Ci + Co) + k * k * Ci * Co) * 2
        hbm_ms = bytes_ / (HBM_GBS * 1e9) * 1e3
        ideal = max(mxu_ms, hbm_ms)
        if Ci != Co:
            # channel-changing convs can't chain output->input; carry a
            # scalar INTO the input so XLA can't CSE the repeated convs
            def mk(n):
                def body(c, _):
                    y = conv(x + c.astype(x.dtype), w)
                    return y[0, 0, 0, 0].astype(jnp.float32), None
                return jax.jit(lambda a: jax.lax.scan(
                    body, jnp.float32(0), None, length=n)[0])
            f_s, f_l = mk(4), mk(24)
        else:
            f_s, f_l = chain(conv, x, w, 4), chain(conv, x, w, 24)
        np.asarray(f_s(x)); np.asarray(f_l(x))
        ts, tl = [], []
        for _ in range(3):
            t0 = time.time(); np.asarray(f_s(x)); ts.append(time.time() - t0)
            t0 = time.time(); np.asarray(f_l(x)); tl.append(time.time() - t0)
        t = (min(tl) - min(ts)) / 20
        tfs = flops / t / 1e12
        total_xla += t * 1e3
        total_ideal += ideal
        print(f"{tag:14s} {t*1e3:7.3f} ms {tfs:6.1f} TF/s  "
              f"ideal {ideal:6.3f} ms (mxu {mxu_ms:.3f} / hbm {hbm_ms:.3f})"
              f"  gap {t*1e3/ideal:4.2f}x", flush=True)
    print(f"TOTAL xla {total_xla:.2f} ms vs ideal {total_ideal:.2f} ms "
          f"({total_xla/total_ideal:.2f}x)")


if __name__ == "__main__":
    main()
