"""Cubemap conversion round trips."""
import numpy as np

from imagine360_tpu.geometry.cubemap import (e2c, c2e, cube_h2dict,
                                             cube_dict2h)


def _smooth_erp(h, w):
    yy, xx = np.meshgrid(np.linspace(0, 3, h), np.linspace(0, 3, w),
                         indexing="ij")
    return np.stack([np.sin(xx), np.cos(yy), np.sin(xx + yy)],
                    -1).astype(np.float32)


def test_e2c_c2e_roundtrip():
    erp = _smooth_erp(64, 128)
    cube = e2c(erp, face_w=64)
    assert cube.shape == (64, 6 * 64, 3)
    back = c2e(cube, 64, 128)
    # interiors reconstruct well (poles/edges lose bilinear taps)
    err = np.abs(back - erp)[8:-8]
    assert np.median(err) < 0.03


def test_cube_dict_layout():
    cube = e2c(_smooth_erp(32, 64), face_w=16)
    d = cube_h2dict(cube)
    assert set(d) == {"F", "R", "B", "L", "U", "D"}
    np.testing.assert_array_equal(cube_dict2h(d), cube)
