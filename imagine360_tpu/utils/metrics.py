"""Image/video quality metrics (SSIM, PSNR) for parity validation against
the reference outputs (BASELINE.md north star: SSIM > 0.98)."""
from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         win: int = 7) -> float:
    """Mean structural similarity over [..., H, W, C] arrays (uniform
    window, standard K1/K2 constants)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 4:  # video: average over frames
        return float(np.mean([ssim(x, y, data_range, win)
                              for x, y in zip(a, b)]))
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    size = (win, win, 1) if a.ndim == 3 else (win, win)

    mu_a = uniform_filter(a, size)
    mu_b = uniform_filter(b, size)
    var_a = uniform_filter(a * a, size) - mu_a ** 2
    var_b = uniform_filter(b * b, size) - mu_b ** 2
    cov = uniform_filter(a * b, size) - mu_a * mu_b

    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    # crop the window border
    h = win // 2
    s = (num / den)[h:-h, h:-h]
    return float(s.mean())
