"""Golden parity for the full dual-branch model (MVGenModel equivalent):
lockstep walk, pano circular padding, WarpAttn coupling, fps + IP-plus +
relative-position conditioning."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refshim
from test_golden_unet import TINY_TORCH_KWARGS, _tiny_jax_config, \
    enable_stub_xformers

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

M = 4
F = 2
PH = PW = 16
EH, EW = 16, 32
FSAM = 16
DSAM = 4096  # MVGenModel.py:170 hardcodes the 64x64 SAM token grid


def _jax_rig():
    from imagine360_tpu.geometry import CameraRig
    rig = CameraRig.icosahedron(image_size=64)
    return dataclasses.replace(
        rig, fov=rig.fov[:M], theta=rig.theta[:M], phi=rig.phi[:M],
        height=rig.height[:M], width=rig.width[:M], K=rig.K[:M], R=rig.R[:M])


def test_dual_model_parity(monkeypatch):
    refshim.install()
    import torch
    import src.models.MVGenModel as ref_mv
    import src.utils.utils as ref_utils
    from animatediff.models.unet import UNet3DConditionModel as TorchUNet

    # pin the stochastic pieces: no antipodal masks, no ip-token noise
    monkeypatch.setattr(ref_utils.random, "random", lambda: 1.0)
    monkeypatch.setattr(ref_mv, "add_noise_to_condition", lambda x, noise_level=0.1: x)
    monkeypatch.setattr(ref_mv, "flush", lambda: None)  # needs CUDA

    torch.manual_seed(0)
    pers_unet = TorchUNet(**TINY_TORCH_KWARGS)
    pano_unet = TorchUNet(**TINY_TORCH_KWARGS)
    tm = ref_mv.MultiViewBaseModel(pers_unet, pano_unet, pano_pad=True)
    tm.eval()
    enable_stub_xformers(tm)
    # randomize the zero-init WarpAttn outputs so coupling is non-trivial
    with torch.no_grad():
        for blk in (list(tm.cp_blocks_encoder) + [tm.cp_blocks_mid]
                    + list(tm.cp_blocks_decoder)):
            blk.transformer.attn1.to_out.weight.normal_(0, 0.05)
            blk.transformer.ff.net[2].weight.normal_(0, 0.05)

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(1, M, 9, F, PH, PW)).astype(np.float32)
    pano_latent = rng.normal(size=(1, 9, F, EH, EW)).astype(np.float32)
    pers_text = rng.normal(size=(M, 7, 32)).astype(np.float32)
    pano_text = rng.normal(size=(1, 7, 32)).astype(np.float32)
    ref_pano = rng.normal(size=(1, FSAM, DSAM, 8)).astype(np.float32)
    ref_pers = rng.normal(size=(1, M, FSAM, DSAM, 8)).astype(np.float32)
    rel_pos = rng.integers(0, 50, size=(1, F, 6)).astype(np.float32)
    pitch = rng.normal(size=(1, F)).astype(np.float32) * 10

    rig = _jax_rig()
    cams_t = {
        "FoV": torch.tensor(rig.fov)[None],
        "theta": torch.tensor(rig.theta)[None],
        "phi": torch.tensor(rig.phi)[None],
    }

    with torch.no_grad():
        pers_out_t, pano_out_t = tm(
            latents=torch.from_numpy(latents),
            pano_latent=torch.from_numpy(pano_latent),
            timestep=torch.tensor([500]),
            prompt_embd=torch.from_numpy(pers_text),
            pano_prompt_embd=torch.from_numpy(pano_text),
            cameras=cams_t,
            use_fps_condition=True,
            use_ip_plus_cross_attention=True,
            fps_tensor_pano=torch.tensor([8.0]),
            fps_tensor_pers=torch.tensor([[8.0] * M]),
            reference_images_clip_feat_pano=torch.from_numpy(ref_pano),
            reference_images_clip_feat_pers=torch.from_numpy(ref_pers),
            relative_position_tensor=torch.from_numpy(rel_pos),
            pitchs_tensor=torch.from_numpy(pitch),
        )

    # ---- ours ----
    from imagine360_tpu.models.dual import DualUNet, DualUNetConfig
    from imagine360_tpu.pipeline.sampler import build_dual_warp_geoms
    from imagine360_tpu.utils.convert import convert_state_dict, \
        apply_converted

    cfg = DualUNetConfig(pers=_tiny_jax_config(), pano=_tiny_jax_config(),
                         num_views=M, ip_noise_level=0.0)
    geoms = build_dual_warp_geoms(cfg, rig, (PH, PW), (EH, EW))
    model = DualUNet(cfg)

    pers_j = jnp.asarray(np.transpose(latents, (0, 1, 3, 4, 5, 2)))
    pano_j = jnp.asarray(np.transpose(pano_latent, (0, 2, 3, 4, 1)))
    t = jnp.array([500.0])
    fps = jnp.array([8.0])
    use_opp = jnp.zeros((7,), bool)
    ref_pers_j = jnp.asarray(ref_pers.reshape(M, FSAM, DSAM, 8))
    ref_pano_j = jnp.asarray(ref_pano)

    rngs = {"params": jax.random.PRNGKey(0),
            "ip_noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, pers_j, pano_j, t, jnp.asarray(pers_text),
                        jnp.asarray(pano_text), fps, ref_pers_j, ref_pano_j,
                        jnp.asarray(rel_pos), jnp.asarray(pitch), geoms,
                        use_opp, add_ip_noise=False)

    flat = convert_state_dict(tm.state_dict())
    params, missing, unexpected = apply_converted(params, flat)
    assert not missing, missing[:8]

    pers_out_j, pano_out_j = model.apply(
        params, pers_j, pano_j, t, jnp.asarray(pers_text),
        jnp.asarray(pano_text), fps, ref_pers_j, ref_pano_j,
        jnp.asarray(rel_pos), jnp.asarray(pitch), geoms, use_opp,
        add_ip_noise=False)

    pers_out_j = np.transpose(np.asarray(pers_out_j), (0, 1, 5, 2, 3, 4))
    pano_out_j = np.transpose(np.asarray(pano_out_j), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(pano_out_j, pano_out_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(pers_out_j, pers_out_t.numpy(), atol=5e-4)
