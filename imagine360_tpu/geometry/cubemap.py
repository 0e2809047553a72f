"""Equirectangular <-> cubemap conversions (the py360convert subset the
reference vendors: e2c / c2e / cube layout utilities,
reference src/utils/py360convert/ + the Cubemap/Equirectangular wrapper
classes in src/utils/pano.py:120-184).

Pure numpy host-side (preprocessing-only in the reference); face order is
the 'horizon' layout [F R B L U D] concatenated along width.
"""
from __future__ import annotations

import numpy as np

from .projection import remap_bilinear, remap_nearest

# face -> (forward axis direction) in the x-forward/y-right/z-up frame
_FACES = ("F", "R", "B", "L", "U", "D")


def _xyz_cube(face_w: int):
    """Unit-cube sample directions per face, each [face_w, face_w, 3]."""
    rng = (np.arange(face_w) + 0.5) / face_w * 2 - 1  # (-1, 1)
    u, v = np.meshgrid(rng, -rng)  # u right, v up
    ones = np.ones_like(u)
    faces = {
        "F": np.stack([ones, u, v], -1),
        "R": np.stack([-u, ones, v], -1),
        "B": np.stack([-ones, -u, v], -1),
        "L": np.stack([u, -ones, v], -1),
        "U": np.stack([-v, u, ones], -1),
        "D": np.stack([v, u, -ones], -1),
    }
    return faces


def e2c(e_img: np.ndarray, face_w: int = 256, mode: str = "bilinear"):
    """ERP [H, W, C] -> horizon cubemap [face_w, 6*face_w, C]."""
    import jax.numpy as jnp

    H, W = e_img.shape[:2]
    out = []
    img = jnp.asarray(np.moveaxis(e_img, -1, 0))  # [C, H, W]
    remap = remap_bilinear if mode == "bilinear" else remap_nearest
    for name in _FACES:
        xyz = _xyz_cube(face_w)[name]
        lon = np.arctan2(xyz[..., 1], xyz[..., 0])
        lat = np.arcsin(xyz[..., 2] / np.linalg.norm(xyz, axis=-1))
        x = (lon / (2 * np.pi) + 0.5) * (W - 1)
        y = (0.5 - lat / np.pi) * (H - 1)
        face = remap(img, jnp.asarray(x.astype(np.float32)),
                     jnp.asarray(y.astype(np.float32)), border="wrap")
        out.append(np.moveaxis(np.asarray(face), 0, -1))
    return np.concatenate(out, axis=1)


def c2e(cubemap: np.ndarray, h: int, w: int, mode: str = "bilinear"):
    """horizon cubemap [fw, 6*fw, C] -> ERP [h, w, C]."""
    import jax.numpy as jnp

    fw = cubemap.shape[0]
    assert cubemap.shape[1] == 6 * fw
    lon = (np.arange(w) + 0.5) / w * 2 * np.pi - np.pi
    lat = np.pi / 2 - (np.arange(h) + 0.5) / h * np.pi
    lon, lat = np.meshgrid(lon, lat)
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    xyz = np.stack([x, y, z], -1)

    ax = np.argmax(np.abs(np.stack([x, y, z], 0)), axis=0)
    face_idx = np.zeros((h, w), np.int64)
    face_idx[(ax == 0) & (x > 0)] = 0   # F
    face_idx[(ax == 1) & (y > 0)] = 1   # R
    face_idx[(ax == 0) & (x <= 0)] = 2  # B
    face_idx[(ax == 1) & (y <= 0)] = 3  # L
    face_idx[(ax == 2) & (z > 0)] = 4   # U
    face_idx[(ax == 2) & (z <= 0)] = 5  # D

    # per-face (u, v) in (-1, 1)
    uv = np.zeros((h, w, 2))
    eps = 1e-12
    for i, name in enumerate(_FACES):
        m = face_idx == i
        if name == "F":
            uv[m] = np.stack([y[m] / (x[m] + eps), z[m] / (x[m] + eps)], -1)
        elif name == "R":
            uv[m] = np.stack([-x[m] / (y[m] + eps), z[m] / (y[m] + eps)], -1)
        elif name == "B":
            uv[m] = np.stack([y[m] / (x[m] - eps), -z[m] / (x[m] - eps)], -1)
        elif name == "L":
            uv[m] = np.stack([-x[m] / (y[m] - eps), -z[m] / (y[m] - eps)], -1)
        elif name == "U":
            uv[m] = np.stack([y[m] / (z[m] + eps), -x[m] / (z[m] + eps)], -1)
        else:
            uv[m] = np.stack([-y[m] / (z[m] - eps), x[m] / (z[m] - eps)], -1)

    px = (uv[..., 0] + 1) * 0.5 * fw - 0.5
    py = (0.5 - uv[..., 1] * 0.5) * fw - 0.5
    gx = np.clip(px, 0, fw - 1) + face_idx * fw
    gy = np.clip(py, 0, fw - 1)

    img = jnp.asarray(np.moveaxis(cubemap, -1, 0))
    remap = remap_bilinear if mode == "bilinear" else remap_nearest
    out = remap(img, jnp.asarray(gx.astype(np.float32)),
                jnp.asarray(gy.astype(np.float32)), border="zero")
    return np.moveaxis(np.asarray(out), 0, -1)


def cube_h2list(cube_h: np.ndarray):
    fw = cube_h.shape[0]
    return [cube_h[:, i * fw:(i + 1) * fw] for i in range(6)]


def cube_list2h(faces):
    return np.concatenate(faces, axis=1)


def cube_h2dict(cube_h: np.ndarray):
    return dict(zip(_FACES, cube_h2list(cube_h)))


def cube_dict2h(d):
    return cube_list2h([d[k] for k in _FACES])
