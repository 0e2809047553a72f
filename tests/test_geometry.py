"""Geometry core tests.

Golden checks are against independent implementations: cv2.Rodrigues for the
rotation math, cv2.remap / torch.grid_sample for the resampling semantics the
reference relied on (kornia remap == grid_sample align_corners=True zero pad;
cv2.remap BORDER_WRAP for the numpy path).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from imagine360_tpu.geometry import (
    rodrigues, icosahedron_rig, get_K_R, CameraRig,
    pers_to_equi_coords, pers_pix_to_equi_grid, equi_pix_to_pers_grid,
    remap_bilinear, remap_nearest, e2p, p2e, mp2e, pad_pano, unpad_pano,
)


def test_rodrigues_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(20):
        rvec = rng.normal(size=3)
        ours = rodrigues(rvec)
        theirs, _ = cv2.Rodrigues(rvec.reshape(3, 1))
        np.testing.assert_allclose(ours, theirs, atol=1e-10)
    # identity for zero vector
    np.testing.assert_allclose(rodrigues(np.zeros(3)), np.eye(3), atol=1e-12)


def test_icosahedron_rig_structure():
    thetas, phis = icosahedron_rig()
    assert thetas.shape == (20,)
    # 5 up, 5 mid-up, 5 mid-down, 5 down; symmetric phis
    np.testing.assert_allclose(phis[:5], phis[0])
    np.testing.assert_allclose(phis[15:], -phis[0])
    np.testing.assert_allclose(phis[5:10], -phis[10:15])
    # exact values from the regular icosahedron geometry
    assert phis[0] == pytest.approx(np.pi / 2 - np.arccos(
        (np.sqrt(3) / 12.0 * (3 + np.sqrt(5))) / np.sin(2 * np.pi / 5.0)))


def test_get_K_R_pinhole():
    K, R = get_K_R(90.0, 0.0, 0.0, 256, 256)
    assert K[0, 0] == pytest.approx(128.0)  # f = 0.5*W/tan(45deg)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
    # rotating yaw by 360 degrees is identity
    _, R360 = get_K_R(90.0, 360.0, 0.0, 64, 64)
    np.testing.assert_allclose(R360, np.eye(3), atol=1e-9)


def test_pers_to_equi_coords_center_ray():
    # center pixel of a view at (theta, phi) lands at lon=theta, lat=-phi
    # (the reference negates lat at e2p.py:35)
    h = w = 65  # odd so there is an exact center pixel
    for theta, phi in [(0.0, 0.0), (45.0, 20.0), (-120.0, -35.0)]:
        lon, lat = pers_to_equi_coords(90.0, theta, phi, h, w)
        assert lon[h // 2, w // 2] == pytest.approx(np.radians(theta), abs=1e-6)
        assert lat[h // 2, w // 2] == pytest.approx(np.radians(-phi), abs=1e-6)


def test_equi_pers_grid_roundtrip():
    # An ERP pixel inside the frustum maps to pers coords; warping a constant
    # image must return that constant inside the mask.
    gx, gy, mask = equi_pix_to_pers_grid(64, 64, 90.0, 0.0, 0.0, 128, 256)
    assert mask.shape == (128, 256)
    assert mask.sum() > 0
    # the frustum of a 90deg forward view covers the image center
    assert mask[64, 128]
    # and not the antipode
    assert not mask[64, 0]


def test_remap_bilinear_matches_grid_sample_zero_border():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, 17, 23)).astype(np.float32)
    H, W = 17, 23
    x = rng.uniform(-2, W + 1, size=(9, 11)).astype(np.float32)
    y = rng.uniform(-2, H + 1, size=(9, 11)).astype(np.float32)

    ours = np.asarray(remap_bilinear(jnp.asarray(img), x, y, border="zero"))

    # grid_sample with align_corners=True, zeros padding
    gx = 2 * torch.from_numpy(x) / (W - 1) - 1
    gy = 2 * torch.from_numpy(y) / (H - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)[None].expand(2, -1, -1, -1)
    theirs = F.grid_sample(torch.from_numpy(img), grid, mode="bilinear",
                           padding_mode="zeros", align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_remap_nearest_matches_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 4, 12, 18)).astype(np.float32)
    H, W = 12, 18
    # avoid exact .5 boundaries where tie-break conventions differ
    x = rng.uniform(0, W - 1, size=(7, 7)).astype(np.float32)
    y = rng.uniform(0, H - 1, size=(7, 7)).astype(np.float32)
    x = np.where(np.abs(x - np.round(x)) < 0.05, x + 0.07, x)
    y = np.where(np.abs(y - np.round(y)) < 0.05, y + 0.07, y)

    ours = np.asarray(remap_nearest(jnp.asarray(img), x, y))
    gx = 2 * torch.from_numpy(x) / (W - 1) - 1
    gy = 2 * torch.from_numpy(y) / (H - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)[None]
    theirs = F.grid_sample(torch.from_numpy(img), grid, mode="nearest",
                           padding_mode="zeros", align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_remap_wrap_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    img = rng.normal(size=(15, 31)).astype(np.float32)
    H, W = img.shape
    x = rng.uniform(-W, 2 * W, size=(10, 10)).astype(np.float32)
    y = rng.uniform(1.0, H - 2.0, size=(10, 10)).astype(np.float32)
    ours = np.asarray(remap_bilinear(jnp.asarray(img), x, y, border="wrap"))
    theirs = cv2.remap(img, x, y, cv2.INTER_LINEAR, borderMode=cv2.BORDER_WRAP)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_e2p_p2e_roundtrip_coverage():
    """Project ERP -> 20 views -> ERP; covered pixels should reconstruct."""
    rig = CameraRig.icosahedron(image_size=64)
    rng = np.random.default_rng(4)
    # smooth ERP image so bilinear resampling error is small
    eh, ew = 64, 128
    yy, xx = np.meshgrid(np.linspace(0, 4, eh), np.linspace(0, 4, ew),
                         indexing="ij")
    erp = np.stack([np.sin(xx) * np.cos(yy), np.cos(xx + yy),
                    np.sin(yy)], 0).astype(np.float32)

    views = np.asarray(e2p(jnp.asarray(erp), rig, (64, 64)))
    assert views.shape == (20, 3, 64, 64)

    back, mask = p2e(jnp.asarray(views), rig, (eh, ew))
    back = np.asarray(back)
    mask = np.asarray(mask)
    # every ERP pixel is covered by at least one icosahedron view
    assert mask.any(axis=0).all()
    # average reconstruction over covering views is close to the input
    cover = mask[:, None].astype(np.float32)
    recon = (back.sum(0) / np.maximum(cover.sum(0), 1))
    # interiors only (borders of each view lose bilinear taps)
    err = np.abs(recon - erp)[:, 4:-4, :]
    assert np.median(err) < 0.05


def test_mp2e_blend_constant():
    rig = CameraRig.icosahedron(image_size=32)
    views = jnp.ones((20, 3, 32, 32), jnp.float32) * 0.5
    out = np.asarray(mp2e(views, rig, (32, 64)))
    assert out.shape == (3, 32, 64)
    # blending a constant gives the constant almost everywhere; frustum-border
    # pixels keep a small bilinear partial-tap artifact (reference mp2e.py has
    # the identical behavior), so check bulk statistics + a loose max.
    err = np.abs(out - 0.5)
    assert np.quantile(err, 0.99) < 1e-3
    assert err.max() < 0.1


def test_pad_unpad_pano():
    x = jnp.arange(2 * 3 * 4 * 6, dtype=jnp.float32).reshape(2, 3, 4, 6)
    p = pad_pano(x, 2)
    assert p.shape == (2, 3, 4, 10)
    np.testing.assert_array_equal(np.asarray(p[..., :2]), np.asarray(x[..., -2:]))
    np.testing.assert_array_equal(np.asarray(p[..., -2:]), np.asarray(x[..., :2]))
    np.testing.assert_array_equal(np.asarray(unpad_pano(p, 2)), np.asarray(x))
