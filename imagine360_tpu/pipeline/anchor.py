"""Anchor extraction + relative-position conditioning (host-side numpy).

Equivalent of reference animatediff/utils/video_mask.py:158-217
(get_anchor_target) and src/modules/utils.py:39-73 (get_maxrec_cord):
re-extract the perspective anchor from each warped pano frame, find the
largest un-masked inscribed rectangle, and compute the 6-tuple
{Hoff, Woff, Hanchor, Wanchor, Htarget, Wtarget} per frame.
"""
from __future__ import annotations

import numpy as np

from ..geometry.projection import (pers_pix_to_equi_grid,
                                   equi_pix_to_pers_grid)


def max_inscribed_rect(mask: np.ndarray):
    """Largest all-ones axis-aligned rectangle in a binary [h, w] mask.
    Returns (top, left, width, height) — the reference's coordinate order
    (src/modules/utils.py:66-68). Native C++ when built, python fallback."""
    from .. import native
    if native.available():
        return native.max_inscribed_rect(np.asarray(mask))
    return _max_inscribed_rect_py(mask)


def _max_inscribed_rect_py(mask: np.ndarray):
    """Histogram-stack algorithm, vectorized column heights."""
    h, w = mask.shape
    heights = np.zeros(w, dtype=np.int64)
    best_area = 0
    best = (0, 0, 0, 0)
    m = mask.astype(bool)
    for i in range(h):
        heights = np.where(m[i], heights + 1, 0)
        stack = []  # (start_index, height)
        for j in range(w + 1):
            cur = heights[j] if j < w else 0
            start = j
            while stack and stack[-1][1] > cur:
                s, hh = stack.pop()
                area = hh * (j - s)
                if area > best_area:
                    best_area = area
                    best = (i - hh + 1, s, j - s, hh)
                start = s
            if not stack or stack[-1][1] < cur:
                stack.append((start, cur))
    return best


def _resize_bilinear(img: np.ndarray, out_hw) -> np.ndarray:
    """Simple bilinear resize (align_corners=False, torch-interpolate
    compatible) for host preprocessing."""
    try:
        import cv2
        return cv2.resize(img, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        from scipy.ndimage import zoom
        zh = out_hw[0] / img.shape[0]
        zw = out_hw[1] / img.shape[1]
        return zoom(img, (zh, zw) + (1,) * (img.ndim - 2), order=1)


def _remap_np(img, gx, gy, wrap=True):
    """Host bilinear remap with horizontal wrap (cv2.BORDER_WRAP behavior)."""
    H, W = img.shape[:2]
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    if wrap:
        xs0, xs1 = x0 % W, (x0 + 1) % W
    else:
        xs0, xs1 = np.clip(x0, 0, W - 1), np.clip(x0 + 1, 0, W - 1)
    ys0 = np.clip(y0, 0, H - 1)
    ys1 = np.clip(y0 + 1, 0, H - 1)
    v = (img[ys0, xs0] * (1 - wx) * (1 - wy) + img[ys0, xs1] * wx * (1 - wy)
         + img[ys1, xs0] * (1 - wx) * wy + img[ys1, xs1] * wx * wy)
    return v


def _remap_host(img, gx, gy, wrap=True):
    """Route through the native C++ kernel when built (native/remap.cc),
    numpy otherwise."""
    from .. import native
    if native.available() and img.ndim == 3:
        return native.remap_bilinear(img, gx, gy, wrap_x=wrap)
    return _remap_np(img, gx, gy, wrap=wrap)


def erp_to_pers_frame(erp: np.ndarray, fov, theta, phi, out_hw):
    """Host-side ERP -> perspective crop (reference GetPerspective path,
    bilinear + wrap)."""
    gx, gy = pers_pix_to_equi_grid(erp.shape[0], erp.shape[1], fov, theta,
                                   phi, out_hw[0], out_hw[1])
    return _remap_host(erp, gx, gy, wrap=True)


def pers_to_erp_frame(pers: np.ndarray, fov, theta, phi, out_hw):
    """Host-side perspective -> ERP + coverage mask (reference GetEquirec)."""
    gx, gy, mask = equi_pix_to_pers_grid(pers.shape[0], pers.shape[1], fov,
                                         theta, phi, out_hw[0], out_hw[1])
    out = _remap_host(pers, gx, gy, wrap=True) * mask[..., None]
    return out, mask


def get_anchor_target(pano_frames: np.ndarray, pitches, fov: float = 90.0,
                      theta: float = 0.0, anchor_size: int = 256):
    """pano_frames [F, H, W, 3] in [-1, 1]; per-frame pitch (degrees).

    Returns dict with:
      anchor [F, 256, 256, 3]      — largest-rect crop, resized
      anchor_pers [F, H/2, H/2, 3] — fixed perspective re-extraction
      masks [F, H, W, 1]           — outpaint masks (1 = to generate)
      relative_position [F, 6], pitch [F]
    (reference get_anchor_target, video_mask.py:158-217).
    """
    F, H, W, _ = pano_frames.shape
    pers_size = H // 2
    anchors, anchors_pers, masks, rels = [], [], [], []
    for i in range(F):
        pers = erp_to_pers_frame(pano_frames[i], fov, theta,
                                 float(pitches[i]), (pers_size, pers_size))
        anchors_pers.append(pers)
        _, cover = pers_to_erp_frame(pers, fov, theta, float(pitches[i]),
                                     (H, W))
        masks.append((1.0 - cover.astype(np.float32))[..., None])
        top, left, rw, rh = max_inscribed_rect(cover)
        crop = pano_frames[i, top:top + rh, left:left + rw]
        anchors.append(_resize_bilinear(crop, (anchor_size, anchor_size)))
        rels.append([int(H / 2 - (2 * top + rh) / 2),
                     int(W / 2 - (2 * left + rw) / 2), rh, rw, H, W])
    return {
        "anchor": np.stack(anchors).astype(np.float32),
        "anchor_pers": np.stack(anchors_pers).astype(np.float32),
        "masks": np.stack(masks).astype(np.float32),
        "relative_position": np.asarray(rels, np.float32),
        "pitch": np.asarray(pitches, np.float32),
    }
