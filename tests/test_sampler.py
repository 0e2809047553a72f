"""Sampler unit tests: shared-noise init correspondence + mask downsample."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from imagine360_tpu.geometry import CameraRig
from imagine360_tpu.pipeline.conditioning import (init_shared_noise,
                                                  downsample_mask_nearest)


def _rig(m=4, size=16):
    r = CameraRig.icosahedron(image_size=size)
    return dataclasses.replace(
        r, fov=r.fov[:m], theta=r.theta[:m], phi=r.phi[:m],
        height=r.height[:m], width=r.width[:m], K=r.K[:m], R=r.R[:m])


def test_init_shared_noise_correspondence():
    """Perspective noise must be a nearest-neighbor resample of the pano
    noise (shared randomness, reference pipeline init_noise :361-387)."""
    rig = _rig()
    pano, pers = init_shared_noise(jax.random.PRNGKey(0), 1, 2, (16, 32),
                                   (8, 8), rig)
    assert pano.shape == (1, 2, 16, 32, 4)
    assert pers.shape == (1, 4, 2, 8, 8, 4)
    # every pers value must exist somewhere in the pano noise field of the
    # same frame (nearest-neighbor sampling copies values)
    pano_f = np.asarray(pano)[0, 0].reshape(-1, 4)
    pers_f = np.asarray(pers)[0, :, 0].reshape(-1, 4)
    # check a handful of positions
    for i in range(0, pers_f.shape[0], 37):
        diff = np.abs(pano_f - pers_f[i]).sum(-1)
        assert diff.min() < 1e-6


def test_downsample_mask_nearest():
    m = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1)
    d = downsample_mask_nearest(m, 4)
    assert d.shape == (1, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(d)[0, :, :, 0],
                                  [[0, 4], [32, 36]])
