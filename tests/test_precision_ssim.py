"""Regression gate for the production-precision SSIM trend line
(tools/precision_ssim.py) at reduced geometry.

The north-star bar is frame SSIM > 0.98 vs the reference torch pipeline
(BASELINE.md). Released weights don't exist here, so this gate pins the
term we CAN measure: divergence introduced by our bf16 precision policy +
implementation through the exact production compute path (both sides
bf16, identical random-inflated weights, pinned noise/randomness —
reference quirks per inference_dual_p2e.py:376-379, pipeline:311-312).

The production-geometry trend line (512x1024, prod channels, 16 frames,
20 views) is recorded in docs/PARITY.md ("Precision SSIM trend line");
this runs the SAME harness at tiny channels / small pano so CI catches a
precision-policy or parity regression in minutes instead of hours.
"""
import os
import sys

import numpy as np
import pytest

import refshim

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not refshim.available(),
                       reason="reference repo not mounted"),
]

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_precision_ssim_tiny():
    from precision_ssim import run

    # pano_h=256 keeps the deepest WarpAttn site at pers 2x2 / equi 4x8.
    # At pano_h=128 the deepest pers site is 1x1, where the reference's own
    # mask builder NaNs (grid_sample align_corners normalization divides by
    # W-1=0 — degenerate in real kornia too, never hit at production sizes).
    res = run(pano_h=256, pano_w=512, frames=16, views=2, steps=2,
              prod_channels=False, chunk_rows=64, log=lambda *a: None)
    # both sides bf16 with identical weights: anything below this means a
    # real divergence (wrong op order, precision policy change, geometry
    # drift), not rounding noise. The relation to the >0.98 north-star
    # bar is MEASURED, not asserted (r5, docs/PARITY.md trend line): at
    # steps=1 the production geometry scores 0.99938 and this tiny
    # geometry 0.99950 — per-step fidelity is scale-independent rounding
    # noise; this 2-step gate scores lower (0.9788 baseline) only because
    # per-step noise compounds through the denoiser, which makes it the
    # MORE sensitive regression detector. 0.97 is its measured margin.
    assert res["ssim_mean"] > 0.97, res
    assert res["psnr_mean"] > 25.0, res
