"""Per-frame camera pitch estimation + perspective->ERP warping of the input
video (host-side stage).

Equivalent of reference pers2pano_vid (inference_dual_p2e.py:256-307):
estimate pitch per frame (GeoCalib in the reference; pluggable here),
smooth with a linear fit over frame index (sklearn LinearRegression there,
closed-form least squares here), then warp each frame to ERP at its fitted
pitch, producing pano frames + outpaint masks.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from .anchor import pers_to_erp_frame


def linear_fit_pitch(pitches: Sequence[float]) -> np.ndarray:
    """Closed-form least-squares line over frame index
    (replaces sklearn LinearRegression at inference_dual_p2e.py:286-291)."""
    y = np.asarray(pitches, np.float64)
    x = np.arange(len(y), dtype=np.float64)
    xm, ym = x.mean(), y.mean()
    denom = ((x - xm) ** 2).sum()
    slope = 0.0 if denom == 0 else ((x - xm) * (y - ym)).sum() / denom
    return (ym + slope * (x - xm)).astype(np.float32)


class PitchEstimator:
    """Pluggable per-frame pitch estimation.

    mode:
      "none"      — all zeros (angle_adapt: none)
      "linear_fit"— fit a line through externally provided raw pitches
      "geocalib" / "perspectivefields" — calls a user-supplied callable
                    (both estimators are external CUDA model dependencies in
                    the reference — GeoCalib via pip, PerspectiveFields via a
                    module that is absent from the reference repo, see
                    inference_dual_p2e.py:391-398; here each is an injection
                    point: fn(frame_u8) -> pitch_degrees)
    """

    def __init__(self, mode: str = "linear_fit",
                 estimator: Optional[Callable] = None):
        self.mode = mode
        self.estimator = estimator

    def __call__(self, frames_u8: np.ndarray,
                 raw_pitches: Optional[Sequence[float]] = None) -> np.ndarray:
        n = frames_u8.shape[0]
        if self.mode == "none":
            return np.zeros((n,), np.float32)
        if self.mode in ("geocalib", "perspectivefields"):
            if self.estimator is None:
                raise ValueError(f"{self.mode} mode needs an estimator "
                                 "callable")
            raw = [float(self.estimator(f)) for f in frames_u8]
            return linear_fit_pitch(raw)
        if raw_pitches is None:
            return np.zeros((n,), np.float32)
        return linear_fit_pitch(raw_pitches)


def pers_video_to_pano(frames: np.ndarray, pitches: np.ndarray,
                       pano_hw, fov: float = 90.0, theta: float = 0.0):
    """frames [F, h, w, 3] in [-1, 1] -> (pano [F, H, W, 3], mask [F, H, W, 1])
    with mask 1 where content must be outpainted
    (reference inference_dual_p2e.py:293-301)."""
    F = frames.shape[0]
    panos, masks = [], []
    for i in range(F):
        pano, cover = pers_to_erp_frame(frames[i], fov, theta,
                                        float(pitches[i]), pano_hw)
        panos.append(pano)
        masks.append((1.0 - cover.astype(np.float32))[..., None])
    return (np.stack(panos).astype(np.float32),
            np.stack(masks).astype(np.float32))
