"""Elevation (pitch) estimation on REAL footage: the reference's own
example clips.

The synthetic evaluation (tools/elevation_eval.py: RMSE 0.84 deg over
pitch in [-30, 30] on rendered clips with a visible horizon) answers
accuracy-when-a-horizon-exists; this tool answers the production question
the verdict raised: what does the Canny+Hough horizon estimator
(imagine360_tpu/pipeline/elevation.py:estimate_pitch_horizon, replacing
the reference's external GeoCalib model, reference
inference_dual_p2e.py:256-307) actually produce on the reference's
shipped inputs (/root/reference/examples/*.mp4) — per-clip fitted pitch
trajectories, per-frame detection weights, and the zero-pitch fallback
rate on clips with no usable horizon (indoor/occluded).

No ground truth exists for these clips, so the recorded evidence is:
  - fitted pitch at first/last frame + slope (deg/frame)
  - mean detection weight and the fraction of frames with NO horizon
    evidence (weight 0)
  - whether the clip degraded to the all-zero fallback
  - plausibility guard: |fitted pitch| <= 45 everywhere

Usage: python tools/elevation_real.py [--frames 16] [--out file.json]
Writes one JSON line per clip + a markdown table (for docs/PARITY.md).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXAMPLES = "/root/reference/examples"


def eval_clip(path: str, num_frames: int = 16):
    from imagine360_tpu.utils.video_io import read_video
    from imagine360_tpu.pipeline.elevation import (
        estimate_pitch_horizon, robust_fit_pitch, weighted_linear_fit_pitch)

    frames = read_video(path, num_frames=num_frames)  # [F, H, W, 3] u8
    est = [estimate_pitch_horizon(f) for f in frames]
    raw = np.array([p for p, _ in est], np.float32)
    wts = np.array([w for _, w in est], np.float32)
    fit = robust_fit_pitch(raw, wts)          # the production path
    bare = weighted_linear_fit_pitch(raw, wts)
    guard = bool(np.abs(fit - bare).max() > 1e-4)
    detected = wts > 0
    return {
        "clip": os.path.splitext(os.path.basename(path))[0],
        "frames": int(len(frames)),
        "pitch_first": round(float(fit[0]), 2),
        "pitch_last": round(float(fit[-1]), 2),
        "slope_deg_per_frame": round(float(fit[-1] - fit[0])
                                     / max(1, len(fit) - 1), 3),
        "raw_pitch_mean": round(float(raw[detected].mean()), 2)
        if detected.any() else None,
        "raw_pitch_std": round(float(raw[detected].std()), 2)
        if detected.any() else None,
        "mean_weight": round(float(wts.mean()), 3),
        "no_horizon_frac": round(float((~detected).mean()), 3),
        "zero_fallback": bool(not detected.any()),
        "guard_triggered": guard,
        "bare_fit_range": [round(float(bare[0]), 2),
                           round(float(bare[-1]), 2)],
        "max_abs_fit": round(float(np.abs(fit).max()), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--examples", default=EXAMPLES)
    a = ap.parse_args()
    clips = sorted(glob.glob(os.path.join(a.examples, "*.mp4")))
    assert clips, f"no clips under {a.examples}"
    rows = []
    for c in clips:
        try:
            r = eval_clip(c, a.frames)
        except Exception as e:  # noqa: BLE001 — record per-clip failure
            r = {"clip": os.path.basename(c), "error": str(e)}
        rows.append(r)
        print(json.dumps(r), flush=True)

    ok = [r for r in rows if "error" not in r]
    summary = {
        "clips": len(rows),
        "zero_fallback_clips": [r["clip"] for r in ok if r["zero_fallback"]],
        "median_no_horizon_frac": round(float(np.median(
            [r["no_horizon_frac"] for r in ok])), 3) if ok else None,
        "all_within_45deg": all(r["max_abs_fit"] <= 45.0 for r in ok),
    }
    print(json.dumps({"summary": summary}))

    md = ["| clip | fit first→last (deg) | raw µ±σ (deg) | no-horizon frames "
          "| fallback |", "|---|---|---|---|---|"]
    for r in ok:
        mu = ("—" if r["raw_pitch_mean"] is None
              else f"{r['raw_pitch_mean']}±{r['raw_pitch_std']}")
        md.append(f"| {r['clip']} | {r['pitch_first']} → {r['pitch_last']} "
                  f"| {mu} | {r['no_horizon_frac']:.0%} "
                  f"| {'YES' if r['zero_fallback'] else 'no'} |")
    print("\n".join(md))
    if a.out:
        with open(a.out, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
