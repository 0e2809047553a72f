"""Training-time random outpaint mask generators
(reference animatediff/utils/video_mask.py:14-155: video_mask horizontal/
vertical/float variants, erp_mask and pers2erp_mask built from a 12-view
perspective coverage rig). PRNG-keyed instead of python random."""
from __future__ import annotations

import numpy as np

from .anchor import erp_to_pers_frame, pers_to_erp_frame, max_inscribed_rect


def video_mask(rng: np.random.Generator, hw, mode: str | None = None):
    """Random rectangular outpaint mask [h, w, 1]; 1 = region to generate
    (reference video_mask :14-77: horizontal 40% / vertical 40% /
    float 20%)."""
    h, w = hw
    mask = np.ones((h, w, 1), np.float32)
    if mode is None:
        r = rng.uniform()
        mode = ("horizontal" if r < 0.4 else
                "vertical" if r < 0.8 else "float")

    def span(n):
        size = rng.integers(n // 4, 3 * n // 4 + 1)
        start = rng.integers(0, n - size + 1)
        return start, start + size

    if mode == "horizontal":
        x0, x1 = span(w)
        mask[:, x0:x1] = 0
    elif mode == "vertical":
        y0, y1 = span(h)
        mask[y0:y1, :] = 0
    else:
        y0, y1 = span(h)
        x0, x1 = span(w)
        mask[y0:y1, x0:x1] = 0
    return mask


def erp_coverage_mask(target_hw, anchor_size: int, fov: float = 90.0):
    """ERP mask where a 12-view rig (yaw {0,90,180,270} x pitch {0,±fov})
    minus the forward view covers the sphere; the uncovered hole marks the
    anchor region (reference erp_mask/pers2erp_mask :79-155).

    Returns (mask [h, w, 1] with 1 = covered-by-other-views,
             anchor_top, anchor_left, anchor_hw)."""
    h, w = target_hw
    cover = np.zeros((h, w), np.float32)
    for theta in (0, 90, 180, 270):
        for phi in (0, -fov, fov):
            if theta == 0 and phi == 0:
                continue  # the forward anchor view is excluded
            _, m = pers_to_erp_frame(
                np.ones((anchor_size, anchor_size, 1), np.float32),
                fov, theta, phi, (h, w))
            cover = np.maximum(cover, m.astype(np.float32))
    hole = cover == 0
    ys, xs = np.where(hole)
    if len(ys) == 0:
        return cover[..., None], 0, 0, (0, 0)
    top, left = int(ys.min()), int(xs.min())
    ahw = (int(ys.max() - ys.min()), int(xs.max() - xs.min()))
    return cover[..., None], top, left, ahw
