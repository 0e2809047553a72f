"""Golden parity of the batched projection warps vs the reference tensor
path (kornia remap == grid_sample, via refshim)."""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

M = 6


def _rig():
    from imagine360_tpu.geometry import CameraRig
    r = CameraRig.icosahedron(image_size=32)
    return dataclasses.replace(
        r, fov=r.fov[:M], theta=r.theta[:M], phi=r.phi[:M],
        height=r.height[:M], width=r.width[:M], K=r.K[:M], R=r.R[:M])


def test_e2p_golden():
    refshim.install()
    import torch
    from src.utils.Perspective_and_Equirectangular import e2p as ref_e2p
    from imagine360_tpu.geometry import e2p

    rig = _rig()
    rng = np.random.default_rng(0)
    erp = rng.normal(size=(3, 32, 64)).astype(np.float32)

    # reference: batched tensors, one view per batch row
    erp_t = torch.from_numpy(erp)[None].expand(M, -1, -1, -1)
    out_ref = ref_e2p(erp_t, list(rig.fov.astype(float)),
                      list(rig.theta.astype(float)),
                      list(rig.phi.astype(float)), (32, 32)).numpy()

    out = np.asarray(e2p(jnp.asarray(erp), rig, (32, 32)))
    np.testing.assert_allclose(out, out_ref, atol=2e-5)


def test_p2e_golden():
    refshim.install()
    import torch
    from src.utils.Perspective_and_Equirectangular import p2e as ref_p2e
    from imagine360_tpu.geometry import p2e

    rig = _rig()
    rng = np.random.default_rng(1)
    pers = rng.normal(size=(M, 3, 32, 32)).astype(np.float32)

    out_ref, mask_ref = ref_p2e(torch.from_numpy(pers),
                                list(rig.fov.astype(float)),
                                list(rig.theta.astype(float)),
                                list(rig.phi.astype(float)), (32, 64))
    out, mask = p2e(jnp.asarray(pers), rig, (32, 64))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(mask),
                                  mask_ref.numpy()[:, 0].astype(bool))


def test_init_noise_projection_golden():
    """The nearest-mode noise projection must match the reference's
    e2p(..., mode='nearest') exactly (off-by-half-pixel would change the
    noise field entirely — SURVEY §7 hard parts)."""
    refshim.install()
    import torch
    from src.utils.Perspective_and_Equirectangular import e2p as ref_e2p
    from imagine360_tpu.geometry import e2p

    rig = _rig()
    rng = np.random.default_rng(2)
    noise = rng.normal(size=(4, 16, 32)).astype(np.float32)
    noise_t = torch.from_numpy(noise)[None].expand(M, -1, -1, -1)
    out_ref = ref_e2p(noise_t, list(rig.fov.astype(float)),
                      list(rig.theta.astype(float)),
                      list(rig.phi.astype(float)), (8, 8),
                      mode="nearest").numpy()
    out = np.asarray(e2p(jnp.asarray(noise), rig, (8, 8), mode="nearest"))
    np.testing.assert_array_equal(out, out_ref)
