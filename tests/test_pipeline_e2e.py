"""End-to-end pipeline smoke test on the tiny architecture (CPU):
perspective video in -> 360 video out, exercising pitch fit, ERP warps,
anchor/maxrect, VAE encode/decode, shared-noise init and the denoise scan."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from imagine360_tpu.config import RunConfig
from imagine360_tpu.presets import tiny_dual_config
from imagine360_tpu.models.dual import DualUNet
from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
from imagine360_tpu.pipeline.generate import (Imagine360Pipeline,
                                              PipelineModules)


@pytest.mark.slow
def test_tiny_end_to_end():
    F = 16  # >= 16 so the SAM temporal pooling path works
    cfg = RunConfig(pano_H=128, pano_W=256, num_inference_steps=2,
                    video_sample_length=F, angle_adapt="none",
                    dtype="float32")
    dual_cfg = tiny_dual_config(num_views=4)

    model = DualUNet(dual_cfg)
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 32, 32)))

    # zero params via shape-only init (cheap)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _zeros_params

    ps = cfg.pano_H // 2
    M = dual_cfg.num_views
    from imagine360_tpu.pipeline.sampler import build_dual_warp_geoms
    from imagine360_tpu.geometry import CameraRig
    import dataclasses
    rig = CameraRig.icosahedron(image_size=ps)
    rig = dataclasses.replace(
        rig, fov=rig.fov[:M], theta=rig.theta[:M], phi=rig.phi[:M],
        height=rig.height[:M], width=rig.width[:M], K=rig.K[:M], R=rig.R[:M])
    geoms = build_dual_warp_geoms(dual_cfg, rig, (ps // 8, ps // 8),
                                  (cfg.pano_H // 8, cfg.pano_W // 8))
    dual_args = (
        jnp.zeros((1, M, F, ps // 8, ps // 8, 9)),
        jnp.zeros((1, F, cfg.pano_H // 8, cfg.pano_W // 8, 9)),
        jnp.zeros((1,)), jnp.zeros((M, 77, 32)), jnp.zeros((1, 77, 32)),
        jnp.zeros((1,)), jnp.zeros((M, 16, 16, 8)),
        jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, F, 6)), jnp.zeros((1, F)),
        geoms, jnp.zeros((7,), bool))
    dual_params = _zeros_params(model, dual_args, "float32")
    vae_params = _zeros_params(
        vae, (jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)), "float32",
        rngs={"params": jax.random.PRNGKey(0)})

    modules = PipelineModules(dual=model, dual_params=dual_params,
                              vae=vae, vae_params=vae_params)
    pipe = Imagine360Pipeline(modules, cfg, dual_cfg)
    # small tweak: the tiny rig has 4 views
    pipe.rig = rig
    pipe.geoms = geoms

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(F, 64, 64, 3), dtype=np.uint8)
    out = pipe(frames, prompt="a lake at sunset")
    assert out["videos"].shape == (F, cfg.pano_H, cfg.pano_W, 3)
    assert np.isfinite(out["videos"]).all()
    assert out["masks"].shape == (F, cfg.pano_H, cfg.pano_W, 1)
