"""Golden parity for the WarpAttn path: correspondence masks, spherical PE,
and the full bidirectional cross-branch attention vs the reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

M = 4
PH = PW = 8
EH, EW = 8, 16
DIM = 32


def _torch_cameras():
    import torch
    from imagine360_tpu.geometry import CameraRig
    rig = CameraRig.icosahedron(image_size=64)
    return {
        "FoV": torch.tensor(rig.fov[:M]),
        "theta": torch.tensor(rig.theta[:M]),
        "phi": torch.tensor(rig.phi[:M]),
    }


def _jax_rig():
    from imagine360_tpu.geometry import CameraRig
    rig = CameraRig.icosahedron(image_size=64)
    import dataclasses
    return dataclasses.replace(
        rig, fov=rig.fov[:M], theta=rig.theta[:M], phi=rig.phi[:M],
        height=rig.height[:M], width=rig.width[:M], K=rig.K[:M], R=rig.R[:M])


@pytest.mark.parametrize("antipodal", [False, True])
def test_merged_masks_parity(antipodal, monkeypatch):
    refshim.install()
    import torch
    import src.utils.utils as ref_utils
    from imagine360_tpu.geometry.corr_masks import merged_masks

    monkeypatch.setattr(ref_utils.random, "random",
                        lambda: 0.0 if antipodal else 1.0)
    pers_t, equi_t = ref_utils.get_merged_masks(
        PH, PW, EH, EW, _torch_cameras(), torch.device("cpu"))

    pers_j, equi_j = merged_masks(_jax_rig(), (PH, PW), (EH, EW),
                                  antipodal=antipodal)
    np.testing.assert_allclose(
        pers_j.reshape(M, EH, EW, PH, PW), pers_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        equi_j.reshape(M, PH, PW, EH, EW), equi_t.numpy(), atol=2e-5)


def test_spherical_pe_and_coords_parity():
    refshim.install()
    import torch
    from src.utils.utils import get_coords
    from src.modules.transformer import SphericalPE
    from imagine360_tpu.geometry.corr_masks import rig_coords, spherical_pe

    pers_t, equi_t = get_coords(PH, PW, EH, EW, _torch_cameras(),
                                torch.device("cpu"))
    pers_j, equi_j = rig_coords(_jax_rig(), (PH, PW), (EH, EW))
    np.testing.assert_allclose(pers_j, pers_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(equi_j, equi_t.numpy(), atol=1e-6)

    pe = SphericalPE(DIM // 4)
    pe_t = pe(equi_t).numpy()
    pe_j = spherical_pe(equi_j, DIM // 4)
    np.testing.assert_allclose(pe_j, pe_t, atol=1e-4)


def test_warp_attn_parity(monkeypatch):
    refshim.install()
    import torch
    import src.utils.utils as ref_utils
    from src.modules.attn_perspano import WarpAttn as TorchWarpAttn
    from imagine360_tpu.models.warp import WarpAttn
    from imagine360_tpu.geometry.corr_masks import warp_geometry
    from imagine360_tpu.utils.convert import convert_state_dict, apply_converted

    monkeypatch.setattr(ref_utils.random, "random", lambda: 1.0)  # no antipode

    torch.manual_seed(0)
    tm = TorchWarpAttn(DIM)
    tm.eval()
    # randomize the zero-initialized projections so the test is non-trivial
    with torch.no_grad():
        tm.transformer.attn1.to_out.weight.normal_(0, 0.05)
        tm.transformer.ff.net[2].weight.normal_(0, 0.05)

    B, F = 1, 2
    rng = np.random.default_rng(1)
    pers = rng.normal(size=(B * M, DIM, F, PH, PW)).astype(np.float32)
    equi = rng.normal(size=(B, DIM, F, EH, EW)).astype(np.float32)

    with torch.no_grad():
        pers_t, equi_t = tm(torch.from_numpy(pers), torch.from_numpy(equi),
                            _torch_cameras())

    rig = _jax_rig()
    geom = warp_geometry(rig, (PH, PW), (EH, EW), DIM)
    model = WarpAttn(DIM, M)
    pers_j_in = jnp.asarray(np.transpose(pers, (0, 2, 3, 4, 1)))
    equi_j_in = jnp.asarray(np.transpose(equi, (0, 2, 3, 4, 1)))
    params = model.init(jax.random.PRNGKey(0), pers_j_in, equi_j_in, geom,
                        jnp.array(False))
    flat = convert_state_dict(tm.state_dict())
    params, missing, unexpected = apply_converted(params, flat)
    assert not missing, missing[:8]

    pers_j, equi_j = model.apply(params, pers_j_in, equi_j_in, geom,
                                 jnp.array(False))
    np.testing.assert_allclose(
        np.transpose(np.asarray(pers_j), (0, 4, 1, 2, 3)), pers_t.numpy(),
        atol=5e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(equi_j), (0, 4, 1, 2, 3)), equi_t.numpy(),
        atol=5e-5)
