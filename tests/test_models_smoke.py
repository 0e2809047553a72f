"""Shape + init smoke tests for the UNet stack on tiny configs (CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagine360_tpu.models.unet3d import UNet3DConfig, UNet3DConditionModel
from imagine360_tpu.models.dual import DualUNet, DualUNetConfig, WARP_SITES
from imagine360_tpu.geometry import CameraRig
from imagine360_tpu.geometry.corr_masks import warp_geometry

TINY = UNet3DConfig(
    block_out_channels=(32, 64, 64, 64),
    attention_heads=(1, 2, 2, 2),
    cross_attention_dim=32,
    image_cross_attention_dim=32,
    image_hidden_size=8,
    num_ip_tokens=8,
    motion_heads=8,
    resampler_dim=32, resampler_depth=1, resampler_heads=2,
    resampler_dim_head=16,
)


TinyUNet = UNet3DConditionModel


def test_single_branch_unet_shapes():
    B, F, H, W = 1, 2, 16, 32
    x = jnp.zeros((B, F, H, W, 9))
    t = jnp.array([500.0])
    fps = jnp.array([8.0])
    text = jnp.zeros((B, 7, 32))
    ref = jnp.zeros((B, 16, 16, 8))  # 16 SAM frames, 4x4 tokens, dim 8
    rel = jnp.zeros((B, 4, 6))
    pitch = jnp.zeros((B, 4))

    model = TinyUNet(TINY)
    params = model.init(jax.random.PRNGKey(0), x, t, text, fps, ref, rel,
                        pitch)
    out = model.apply(params, x, t, text, fps, ref, rel, pitch)
    assert out.shape == (B, F, H, W, 4)
    # pano padded variant keeps shapes too
    out_pad = model.apply(params, x, t, text, fps, ref, rel, pitch, pad=True)
    assert out_pad.shape == (B, F, H, W, 4)
    # 360 continuity: the circularly-padded *stem conv* is exactly
    # roll-equivariant. (The full padded model is NOT: the reference pads
    # before GroupNorm — MVGenModel.py:277-281 — so duplicated columns bias
    # the norm statistics; we replicate that behavior, so only conv-level
    # equivariance is asserted here.)
    x2 = x + jnp.arange(W).reshape(1, 1, 1, W, 1) % 3
    xr = jnp.roll(x2, W // 2, axis=3)
    s1 = model.apply(params, x2, pad=True, method=model.stem)
    s2 = model.apply(params, xr, pad=True, method=model.stem)
    np.testing.assert_allclose(np.asarray(jnp.roll(s1, W // 2, axis=3)),
                               np.asarray(s2), atol=1e-5)


TinyDual = DualUNet


def test_dual_unet_shapes():
    M = 4
    rig_angles = CameraRig.icosahedron(image_size=16)
    # tiny rig: first 4 views
    import numpy as onp
    rig = dataclasses.replace(
        rig_angles,
        fov=rig_angles.fov[:M], theta=rig_angles.theta[:M],
        phi=rig_angles.phi[:M], height=rig_angles.height[:M],
        width=rig_angles.width[:M], K=rig_angles.K[:M], R=rig_angles.R[:M])

    B, F = 1, 2
    h = w = 16
    eh, ew = 16, 32
    pers = jnp.zeros((B, M, F, h, w, 9))
    pano = jnp.zeros((B, F, eh, ew, 9))
    t = jnp.array([500.0])
    fps = jnp.array([8.0])
    pers_text = jnp.zeros((B * M, 7, 32))
    pano_text = jnp.zeros((B, 7, 32))
    ref_p = jnp.zeros((B * M, 16, 16, 8))
    ref_a = jnp.zeros((B, 16, 16, 8))
    rel = jnp.zeros((B, 4, 6))
    pitch = jnp.zeros((B, 4))

    cfg = DualUNetConfig(pers=TINY, pano=TINY, num_views=M)
    geoms = {}
    for rkey, scale, dim in (("r2", 2, 32), ("r4", 4, 64), ("r8", 8, 64)):
        g = warp_geometry(rig, (h // scale, w // scale),
                          (eh // scale, ew // scale), dim)
        geoms[rkey] = {k: v for k, v in g.items() if "bias" in k}
    geoms["pe"] = {}
    site_dims = {"enc_0": 32, "enc_1": 64, "enc_2": 64, "mid": 64,
                 "dec_0": 64, "dec_1": 64, "dec_2": 64}
    for (name, rkey) in WARP_SITES:
        scale = {"r2": 2, "r4": 4, "r8": 8}[rkey]
        g = warp_geometry(rig, (h // scale, w // scale),
                          (eh // scale, ew // scale), site_dims[name])
        geoms["pe"][name] = {"pers_pe": g["pers_pe"], "equi_pe": g["equi_pe"]}

    use_opp = jnp.zeros((len(WARP_SITES),), bool)

    model = TinyDual(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "ip_noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, pers, pano, t, pers_text, pano_text, fps,
                        ref_p, ref_a, rel, pitch, geoms, use_opp)
    pers_out, pano_out = model.apply(
        params, pers, pano, t, pers_text, pano_text, fps, ref_p, ref_a,
        rel, pitch, geoms, use_opp, rngs={"ip_noise": jax.random.PRNGKey(2)})
    assert pers_out.shape == (B, M, F, h, w, 4)
    assert pano_out.shape == (B, F, eh, ew, 4)
