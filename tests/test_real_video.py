"""Real-video CI: the full host pipeline (cv2 decode -> horizon pitch
estimation -> P2E warp -> anchor/maxrect -> E2P views -> VAE encodes ->
2-step denoise -> decode) consumes one of the reference's real example
videos (/root/reference/examples/dog.mp4), not a synthetic array.

Weights are small-random (not zero) so the numerics are non-trivial
(round-1 weak item: the zero-weight e2e smoke exercises only shapes)."""
import os

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
from imagine360_tpu.utils.video_io import read_video

REAL_VIDEO = "/root/reference/examples/dog.mp4"

pytestmark = pytest.mark.skipif(not os.path.exists(REAL_VIDEO),
                                reason="reference examples not mounted")


def _small_random_params(model, init_args, scale=0.05, rngs=None):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _zeros_params
    params = _zeros_params(model, init_args, "float32", rngs=rngs)
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(0)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32)
                          * scale) for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


@pytest.mark.slow
def test_real_video_end_to_end():
    F = 16
    cfg = RunConfig(pano_H=128, pano_W=256, num_inference_steps=2,
                    video_sample_length=F, angle_adapt="geocalib",
                    dtype="float32")
    M = 4
    dual_cfg = tiny_dual_config(num_views=M)
    model = DualUNet(dual_cfg)
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 32, 32)))

    ps = cfg.pano_H // 2
    from imagine360_tpu.pipeline.sampler import build_dual_warp_geoms
    from imagine360_tpu.geometry import CameraRig
    rig = CameraRig.icosahedron(image_size=ps).take(M)
    geoms = build_dual_warp_geoms(dual_cfg, rig, (ps // 8, ps // 8),
                                  (cfg.pano_H // 8, cfg.pano_W // 8))
    dual_args = (
        jnp.zeros((1, M, F, ps // 8, ps // 8, 9)),
        jnp.zeros((1, F, cfg.pano_H // 8, cfg.pano_W // 8, 9)),
        jnp.zeros((1,)), jnp.zeros((M, 77, 32)), jnp.zeros((1, 77, 32)),
        jnp.zeros((1,)), jnp.zeros((M, 16, 16, 8)),
        jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, F, 6)), jnp.zeros((1, F)),
        geoms, jnp.zeros((7,), bool))
    dual_params = _small_random_params(model, dual_args)
    vae_params = _small_random_params(
        vae, (jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)),
        rngs={"params": jax.random.PRNGKey(0)})

    modules = PipelineModules(dual=model, dual_params=dual_params,
                              vae=vae, vae_params=vae_params)
    pipe = Imagine360Pipeline(modules, cfg, dual_cfg)
    pipe.rig = rig
    pipe.geoms = geoms

    frames = read_video(REAL_VIDEO, num_frames=F)
    assert frames.shape[0] == F and frames.shape[-1] == 3
    assert frames.dtype == np.uint8
    # the real video must have actual content (not a decode failure)
    assert frames.std() > 10

    prompt = open(os.path.splitext(REAL_VIDEO)[0] + ".txt").read().strip()
    out = pipe(frames, prompt=prompt)
    assert out["videos"].shape == (F, cfg.pano_H, cfg.pano_W, 3)
    assert np.isfinite(out["videos"]).all()
    # with random weights the generated content must be non-degenerate
    assert out["videos"].std() > 1e-4
    # the outpaint mask marks a real warped-footprint complement:
    # neither empty nor full
    frac = out["masks"].mean()
    assert 0.05 < frac < 0.95, frac
    # the horizon pitch estimator ran on real frames
    assert out["pitches"].shape == (F,)
    assert np.isfinite(out["pitches"]).all()
