"""Equirectangular <-> perspective projection as XLA-friendly gather ops.

Design (TPU-first): the remap *grids* depend only on (camera, resolution) and
are built host-side in numpy at trace time, cached, and baked into the jitted
program as constants. The per-pixel resampling itself is a vectorized jnp
gather (`remap_bilinear` / `remap_nearest`) that XLA fuses with surrounding
elementwise work — this replaces the reference's kornia `remap`
(F.grid_sample CUDA kernel) and cv2.remap calls
(reference src/utils/Perspective_and_Equirectangular/{e2p,p2e}.py).

Semantics notes (kept bit-compatible with the reference where it matters):
- grid values are *absolute pixel coordinates* into the source image,
  align_corners=True convention (coordinate i maps exactly onto pixel i).
- the torch/kornia path the reference uses for tensors zero-pads out-of-range
  taps; the cv2 path it uses for numpy preprocessing wraps horizontally
  (BORDER_WRAP). Both behaviors are available via ``border``.
- `equi_pix_to_pers_grid` reproduces the reference's scaling quirk of mapping
  the valid frustum to [0, pw] rather than [0, pw-1]
  (reference p2e.py:41-44) so masks/outputs match numerically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sphere import view_rotation

# ---------------------------------------------------------------------------
# Host-side grid builders (numpy, trace-time, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=512)
def _pers_to_equi_coords_cached(fov: float, theta: float, phi: float,
                                h: int, w: int):
    hfov = float(h) / w * fov
    w_len = np.tan(np.radians(fov / 2.0))
    h_len = np.tan(np.radians(hfov / 2.0))

    x_map = np.ones([h, w], np.float64)
    y_map = np.tile(np.linspace(-w_len, w_len, w), [h, 1])
    z_map = -np.tile(np.linspace(-h_len, h_len, h), [w, 1]).T

    d = np.sqrt(x_map ** 2 + y_map ** 2 + z_map ** 2)
    xyz = np.stack((x_map, y_map, z_map), axis=2) / d[:, :, None]

    R1, R2 = view_rotation(theta, phi)
    xyz = xyz.reshape([h * w, 3]).T
    xyz = (R2 @ (R1 @ xyz)).T
    lat = np.arcsin(np.clip(xyz[:, 2], -1.0, 1.0))
    lon = np.arctan2(xyz[:, 1], xyz[:, 0])

    lon = lon.reshape([h, w])
    lat = -lat.reshape([h, w])
    return lon, lat


def pers_to_equi_coords(fov, theta, phi, h, w):
    """(lon, lat) radians of each perspective pixel on the sphere.

    Matches reference e2p.py:9-36 (`map_pers_coords_to_equi`).
    """
    return _pers_to_equi_coords_cached(float(fov), float(theta), float(phi),
                                       int(h), int(w))


def pers_pix_to_equi_grid(eh, ew, fov, theta, phi, h, w):
    """Absolute ERP pixel coords (x, y) sampled by each perspective pixel.

    Matches reference e2p.py:39-51 (`map_pers_pix_to_equi`).
    """
    lon, lat = pers_to_equi_coords(fov, theta, phi, h, w)
    equ_cx = (ew - 1) / 2.0
    equ_cy = (eh - 1) / 2.0
    x = lon / np.pi * equ_cx + equ_cx
    y = lat / (np.pi / 2) * equ_cy + equ_cy
    return x.astype(np.float32), y.astype(np.float32)


@functools.lru_cache(maxsize=512)
def _equi_pix_to_pers_grid_cached(ph: int, pw: int, fov: float, theta: float,
                                  phi: float, h: int, w: int):
    hfov = float(ph) / pw * fov
    w_len = np.tan(np.radians(fov / 2.0))
    h_len = np.tan(np.radians(hfov / 2.0))

    x, y = np.meshgrid(np.linspace(-180, 180, w), np.linspace(90, -90, h))
    x_map = np.cos(np.radians(x)) * np.cos(np.radians(y))
    y_map = np.sin(np.radians(x)) * np.cos(np.radians(y))
    z_map = np.sin(np.radians(y))
    xyz = np.stack((x_map, y_map, z_map), axis=2)

    R1, R2 = view_rotation(theta, phi)
    R1i, R2i = np.linalg.inv(R1), np.linalg.inv(R2)
    xyz = xyz.reshape([h * w, 3]).T
    xyz = (R1i @ (R2i @ xyz)).T.reshape([h, w, 3])

    front = xyz[:, :, 0] > 0
    # Perspective divide (guard x==0; masked out below anyway).
    denom = np.where(np.abs(xyz[:, :, 0]) < 1e-12, 1e-12, xyz[:, :, 0])
    yy = xyz[:, :, 1] / denom
    zz = xyz[:, :, 2] / denom

    in_fov = ((-w_len < yy) & (yy < w_len) & (-h_len < zz) & (zz < h_len))
    # NOTE: reference scales to [0, pw] / [0, ph] (p2e.py:41-44), not pw-1.
    gx = np.where(in_fov, (yy + w_len) / 2 / w_len * pw, 0.0)
    gy = np.where(in_fov, (-zz + h_len) / 2 / h_len * ph, 0.0)
    mask = in_fov & front
    return gx.astype(np.float32), gy.astype(np.float32), mask


def equi_pix_to_pers_grid(ph, pw, fov, theta, phi, h, w):
    """Per-ERP-pixel sampling coords into a (ph, pw) perspective view + mask.

    Matches reference p2e.py:9-49 (`map_equi_pix_to_pers`).
    """
    return _equi_pix_to_pers_grid_cached(int(ph), int(pw), float(fov),
                                         float(theta), float(phi),
                                         int(h), int(w))


# ---------------------------------------------------------------------------
# Device-side resampling (jnp, jittable)
# ---------------------------------------------------------------------------


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img [..., H, W] gathered at integer index maps iy/ix [*grid] ->
    [..., *grid]. Indices must already be valid (clipped/wrapped)."""
    return img[..., iy, ix]


def remap_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   border: str = "zero") -> jnp.ndarray:
    """Bilinear resample of img [..., H, W] at absolute pixel coords (x, y).

    border:
      "zero" — out-of-range taps contribute 0 (kornia remap / grid_sample
               zero padding, the reference's tensor path)
      "wrap" — wrap horizontally, clamp vertically (cv2 BORDER_WRAP-ish,
               the reference's numpy preprocessing path)

    Returns [..., *x.shape].
    """
    H, W = img.shape[-2], img.shape[-1]
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)
    wy = (y - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if border == "wrap":
        xs = [jnp.mod(x0i, W), jnp.mod(x1i, W)]
        ys = [jnp.clip(y0i, 0, H - 1), jnp.clip(y1i, 0, H - 1)]
        valid = [jnp.ones_like(x, dtype=bool)] * 4
    elif border == "zero":
        def vx(i):
            return (i >= 0) & (i <= W - 1)

        def vy(i):
            return (i >= 0) & (i <= H - 1)

        valid = [vx(x0i) & vy(y0i), vx(x1i) & vy(y0i),
                 vx(x0i) & vy(y1i), vx(x1i) & vy(y1i)]
        xs = [jnp.clip(x0i, 0, W - 1), jnp.clip(x1i, 0, W - 1)]
        ys = [jnp.clip(y0i, 0, H - 1), jnp.clip(y1i, 0, H - 1)]
    else:
        raise ValueError(f"unknown border mode {border!r}")

    w00 = (1 - wx) * (1 - wy)
    w10 = wx * (1 - wy)
    w01 = (1 - wx) * wy
    w11 = wx * wy

    if border == "wrap":
        v00 = _gather_hw(img, ys[0], xs[0])
        v10 = _gather_hw(img, ys[0], xs[1])
        v01 = _gather_hw(img, ys[1], xs[0])
        v11 = _gather_hw(img, ys[1], xs[1])
    else:
        z = jnp.zeros((), dtype=img.dtype)
        v00 = jnp.where(valid[0], _gather_hw(img, ys[0], xs[0]), z)
        v10 = jnp.where(valid[1], _gather_hw(img, ys[0], xs[1]), z)
        v01 = jnp.where(valid[2], _gather_hw(img, ys[1], xs[0]), z)
        v11 = jnp.where(valid[3], _gather_hw(img, ys[1], xs[1]), z)

    out = (v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11)
    return out.astype(img.dtype)


def remap_nearest(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  border: str = "zero") -> jnp.ndarray:
    """Nearest-neighbor resample (grid_sample nearest, align_corners=True):
    rounds the absolute coordinate, zero/wrap border. Used for the shared
    noise projection (reference pipeline init_noise, mode='nearest')."""
    H, W = img.shape[-2], img.shape[-1]
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    if border == "wrap":
        xs = jnp.mod(xi, W)
        ys = jnp.clip(yi, 0, H - 1)
        return _gather_hw(img, ys, xs)
    valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
    xs = jnp.clip(xi, 0, W - 1)
    ys = jnp.clip(yi, 0, H - 1)
    out = _gather_hw(img, ys, xs)
    return jnp.where(valid, out, jnp.zeros((), dtype=img.dtype))


_REMAPS = {"bilinear": remap_bilinear, "nearest": remap_nearest}


# ---------------------------------------------------------------------------
# High-level warps over a camera rig
# ---------------------------------------------------------------------------


def _rig_fields(cameras) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Accept a CameraRig or a dict with FoV/theta/phi arrays (degrees)."""
    if hasattr(cameras, "fov"):
        return (np.asarray(cameras.fov), np.asarray(cameras.theta),
                np.asarray(cameras.phi))
    return (np.asarray(cameras["FoV"]), np.asarray(cameras["theta"]),
            np.asarray(cameras["phi"]))


def e2p_grids(cameras, equi_hw, out_hw) -> tuple[np.ndarray, np.ndarray]:
    """Stacked [m, h, w] sample grids for ERP -> each perspective view."""
    fovs, thetas, phis = _rig_fields(cameras)
    eh, ew = equi_hw
    h, w = out_hw
    xs, ys = [], []
    for fov, th, ph in zip(fovs, thetas, phis):
        x, y = pers_pix_to_equi_grid(eh, ew, fov, th, ph, h, w)
        xs.append(x)
        ys.append(y)
    return np.stack(xs), np.stack(ys)


def p2e_grids(cameras, pers_hw, out_hw):
    """Stacked [m, eh, ew] grids + masks for perspective views -> ERP."""
    fovs, thetas, phis = _rig_fields(cameras)
    ph, pw = pers_hw
    eh, ew = out_hw
    xs, ys, ms = [], [], []
    for fov, th, p in zip(fovs, thetas, phis):
        x, y, m = equi_pix_to_pers_grid(ph, pw, fov, th, p, eh, ew)
        xs.append(x)
        ys.append(y)
        ms.append(m)
    return np.stack(xs), np.stack(ys), np.stack(ms)


def e2p(e_img: jnp.ndarray, cameras, out_hw, mode: str = "bilinear",
        border: str = "zero") -> jnp.ndarray:
    """ERP image(s) -> m perspective views.

    e_img: [c, H, W] (broadcast to all views) or [m, c, H, W] (one per view).
    Returns [m, c, h, w]. Mirrors reference e2p.py:54-81 (tensor path).
    """
    gx, gy = e2p_grids(cameras, e_img.shape[-2:], out_hw)
    remap = _REMAPS[mode]
    if e_img.ndim == 3:
        return jax.vmap(lambda x, y: remap(e_img, x, y, border=border))(
            jnp.asarray(gx), jnp.asarray(gy))
    return jax.vmap(lambda img, x, y: remap(img, x, y, border=border))(
        e_img, jnp.asarray(gx), jnp.asarray(gy))


def p2e(p_img: jnp.ndarray, cameras, out_hw, mode: str = "bilinear",
        border: str = "zero"):
    """Perspective views -> ERP (masked outside each view's frustum).

    p_img: [m, c, h, w]. Returns (equi [m, c, eh, ew], mask [m, eh, ew] bool).
    Mirrors reference p2e.py:52-77. border="zero" matches the tensor
    (kornia) path; border="wrap" matches the cv2 BORDER_WRAP numpy path the
    reference preprocessing uses.
    """
    gx, gy, mask = p2e_grids(cameras, p_img.shape[-2:], out_hw)
    remap = _REMAPS[mode]
    out = jax.vmap(lambda img, x, y: remap(img, x, y, border=border))(
        p_img, jnp.asarray(gx), jnp.asarray(gy))
    m = jnp.asarray(mask)[:, None, :, :]
    return out * m.astype(out.dtype), jnp.asarray(mask)


def mp2e(p_imgs: jnp.ndarray, cameras, out_hw, mode: str = "bilinear",
         fill_value: float = 1.0) -> jnp.ndarray:
    """Multi-view blend into one ERP image with linear ramp weights.

    Mirrors reference mp2e.py:6-28: per view, a horizontal triangle-ramp
    weight image is warped to ERP and used as the blend weight; uncovered
    pixels get `fill_value`.

    p_imgs: [m, c, h, w] -> [c, eh, ew].
    """
    m, c, h, w = p_imgs.shape
    ramp = np.zeros((w,), np.float32)
    half = w // 2
    ramp[:half] = np.linspace(0, 1, half)
    ramp[half:] = np.linspace(1, 0, w - half)
    weight = jnp.asarray(np.tile(ramp[None, None, :], (1, h, 1)))  # [1, h, w]
    weight = jnp.broadcast_to(weight, (m, 1, h, w))

    img_e, _ = p2e(p_imgs, cameras, out_hw, mode=mode, border="wrap")
    wgt_e, _ = p2e(weight, cameras, out_hw, mode=mode, border="wrap")

    num = jnp.sum(img_e * wgt_e, axis=0)
    den = jnp.sum(wgt_e, axis=0)
    out = jnp.where(den[:1] == 0, fill_value, num / jnp.where(den == 0, 1.0, den))
    return out
