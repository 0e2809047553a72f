"""Full-pipeline seeded golden: the reference AnimationPipeline.__call__
(pipeline_animation_inference_dual.py:552-824) run end-to-end at tiny scale
vs our Imagine360Pipeline.generate_core, identical converted weights,
identical injected noise, pinned randomness.

This is the interaction test the per-module goldens can't provide: any
divergence in scheduler x CFG x noise-init x masked-latent x decode glue
fails it. Randomness pinning:
  - init noise: captured from the reference's init_noise and injected into
    generate_core (its `init_noise` argument)
  - VAE posterior: both sides take the mean (DiagonalGaussianDistribution
    .sample -> .mode; deterministic_vae=True)
  - antipodal masks: reference random.random() -> 1.0; our antipodal_prob=0
  - ip-token noise: reference add_noise_to_condition -> identity; our
    ip_noise_level=0
  - text/SAM encoders: deterministic stub embeddings fed to both sides
"""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

from test_golden_unet import TINY_TORCH_KWARGS, _tiny_jax_config, \
    enable_stub_xformers

M = 2
F = 16           # SAM chunking asserts F % 8 == 0; the temporal projection
                 # (resampler.py:264 avg_pool) needs >= 16 frames
PANO_H, PANO_W = 256, 512
PERS = 128       # = PANO_H // 2, reference inference_dual_p2e.py:528
EH, EW = PANO_H // 8, PANO_W // 8
PH = PW = PERS // 8
CSAM = 8         # tiny image_hidden_size
DSAM = 4096      # SAM token grid hardcoded in MVGenModel.py:170
STEPS = 2
GUIDANCE = 7.5
TXT_LEN = 7
TXT_DIM = 32


def _stub_segment_anything(fixed_embed_t):
    """segment_anything stub: SamPredictor returns a fixed embedding
    [8, CSAM, 64, 64] regardless of input (both sides consume the same
    values, so the SAM encoder itself is out of scope here — it has its
    own parity test)."""
    import importlib.machinery

    class _Transform:
        def apply_image(self, image):
            return image

    class SamPredictor:
        def __init__(self, encoder=None):
            self.transform = _Transform()

        def set_torch_image(self, images, shape):
            pass

        def get_image_embedding(self):
            return fixed_embed_t

    mod = types.ModuleType("segment_anything")
    mod.__spec__ = importlib.machinery.ModuleSpec("segment_anything",
                                                  loader=None)
    mod.SamPredictor = SamPredictor
    mod.sam_model_registry = {}
    sys.modules["segment_anything"] = mod


def _tiny_torch_vae():
    from diffusers.models.vae import AutoencoderKL as TorchVAE
    return TorchVAE(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(16, 16, 16, 16),
        layers_per_block=1, latent_channels=4, norm_num_groups=16,
        sample_size=64,
    )


def _tiny_jax_vae():
    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    return AutoencoderKL(VAEConfig(block_out_channels=(16, 16, 16, 16),
                                   layers_per_block=1, norm_num_groups=16))


def test_full_pipeline_golden(monkeypatch):
    refshim.install()
    import torch

    rng = np.random.default_rng(7)
    fixed_embed = rng.normal(size=(8, CSAM, 64, 64)).astype(np.float32)
    _stub_segment_anything(torch.from_numpy(fixed_embed))

    import src.models.MVGenModel as ref_mv
    import src.utils.utils as ref_utils
    from animatediff.models.unet import UNet3DConditionModel as TorchUNet
    from animatediff.pipelines.pipeline_animation_inference_dual import (
        AnimationPipeline)
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler
    from diffusers.models.vae import DiagonalGaussianDistribution

    # ---- pinned randomness on the reference side ----
    monkeypatch.setattr(ref_utils.random, "random", lambda: 1.0)
    monkeypatch.setattr(ref_mv, "add_noise_to_condition",
                        lambda x, noise_level=0.1: x)
    monkeypatch.setattr(ref_mv, "flush", lambda: None)
    monkeypatch.setattr(DiagonalGaussianDistribution, "sample",
                        lambda self, generator=None: self.mode())

    torch.manual_seed(0)
    # sample_size must be set: AnimationPipeline.__init__ compares it to 64
    # (pipeline_animation_inference_dual.py:114). num_tokens must be >= F
    # (the rel-pos adapter pads one-emb-per-frame up to the ip token count,
    # MVGenModel.py:218-221) — use the production 64.
    kwargs = dict(TINY_TORCH_KWARGS, sample_size=64, num_tokens=64)
    pers_unet = TorchUNet(**kwargs)
    pano_unet = TorchUNet(**kwargs)
    tm = ref_mv.MultiViewBaseModel(pers_unet, pano_unet, pano_pad=True)
    tm.eval()
    enable_stub_xformers(tm)
    with torch.no_grad():
        for blk in (list(tm.cp_blocks_encoder) + [tm.cp_blocks_mid]
                    + list(tm.cp_blocks_decoder)):
            blk.transformer.attn1.to_out.weight.normal_(0, 0.05)
            blk.transformer.ff.net[2].weight.normal_(0, 0.05)

    tvae = _tiny_torch_vae().eval()
    scheduler = DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="linear", steps_offset=1, clip_sample=False,
        prediction_type="v_prediction", rescale_betas_zero_snr=True)

    pipe = AnimationPipeline(
        vae=tvae, text_encoder=None, tokenizer=None,
        pers_unet=pers_unet, pano_unet=pano_unet, mv_base_model=tm,
        scheduler=scheduler, image_encoder=None, image_encoder_name="SAM")

    # deterministic prompt embeddings for both sides ([uncond; cond] order)
    neg_emb = rng.normal(size=(TXT_LEN, TXT_DIM)).astype(np.float32)
    pos_emb = rng.normal(size=(TXT_LEN, TXT_DIM)).astype(np.float32)

    def fake_encode_prompt(prompt, device, nvp, do_cfg, negative_prompt):
        n = len(prompt)
        return torch.from_numpy(
            np.concatenate([np.stack([neg_emb] * n),
                            np.stack([pos_emb] * n)]))

    pipe._encode_prompt = fake_encode_prompt

    # capture the init noise the reference draws so our side can inject it
    captured = {}
    orig_init_noise = pipe.init_noise

    def capture_init_noise(*a, **kw):
        pano_n, pers_n = orig_init_noise(*a, **kw)
        captured["pano"] = pano_n.clone()
        captured["pers"] = pers_n.clone()
        return pano_n, pers_n

    pipe.init_noise = capture_init_noise

    # ---- tiny video batch ----
    pano_px = rng.normal(size=(1, F, 3, PANO_H, PANO_W)).astype(np.float32)
    pano_px = np.clip(pano_px * 0.3, -1, 1)
    pano_mask = (rng.uniform(size=(1, F, 1, PANO_H, PANO_W)) > 0.5
                 ).astype(np.float32)
    pers_px = np.clip(rng.normal(size=(1, F, M, 3, PERS, PERS)) * 0.3,
                      -1, 1).astype(np.float32)
    pers_masks = (rng.uniform(size=(1, F, M, 1, PERS, PERS)) > 0.5
                  ).astype(np.float32)
    anchor_px = np.clip(rng.normal(size=(1, F, 3, 64, 64)), -1, 1
                        ).astype(np.float32)
    rel_pos = (np.abs(rng.normal(size=(F, 6))) * 20).astype(np.float32)
    pitches = (rng.normal(size=(F,)) * 5).astype(np.float32)

    from imagine360_tpu.geometry import CameraRig
    rig = CameraRig.icosahedron(image_size=PERS).take(M)
    cameras_t = {
        "FoV": torch.tensor(rig.fov)[None],
        "theta": torch.tensor(rig.theta)[None],
        "phi": torch.tensor(rig.phi)[None],
    }

    video_batch = {
        "videoid": "tiny",
        "fps": 8,
        "pano_pixel_values": torch.from_numpy(pano_px),
        "pano_mask": torch.from_numpy(pano_mask),
        "pers_pixel_values": torch.from_numpy(pers_px),
        "pers_masks": torch.from_numpy(pers_masks),
        "anchor_pixels_values": torch.from_numpy(anchor_px),
        "anchor_pixels_values_pers": torch.from_numpy(anchor_px),
        "relative_position": torch.from_numpy(rel_pos),
        "pitchs": torch.from_numpy(pitches),
        "cameras": cameras_t,
        "video_length": F,
        "pano_H": PANO_H,
        "pano_W": PANO_W,
        "pers_size": PERS,
    }

    with torch.no_grad():
        out = pipe(
            prompt="tiny prompt",
            negative_prompt="bad",
            num_inference_steps=STEPS,
            guidance_scale_text=GUIDANCE,
            latents_dtype=torch.float32,
            video_batch=video_batch,
            use_outpaint=True,
            use_ip_plus_cross_attention=True,
            use_fps_condition=True,
            ip_plus_condition="video",
        )
    video_t = np.asarray(out.videos)          # [1, 3, F, H, W] in [0, 1]

    # ================= our side =================
    from imagine360_tpu.config import RunConfig
    from imagine360_tpu.models.dual import DualUNet, DualUNetConfig
    from imagine360_tpu.pipeline.generate import (Imagine360Pipeline,
                                                  PipelineModules)
    from imagine360_tpu.utils.convert import (convert_state_dict,
                                              convert_vae_state_dict,
                                              apply_converted)

    run_cfg = RunConfig(pano_H=PANO_H, pano_W=PANO_W,
                        num_inference_steps=STEPS,
                        guidance_scale=GUIDANCE, antipodal_prob=0.0,
                        angle_adapt="none", use_mesh="off", fps=8,
                        dtype="float32")
    import dataclasses
    tiny_cfg = dataclasses.replace(_tiny_jax_config(), num_ip_tokens=64)
    dual_cfg = DualUNetConfig(pers=tiny_cfg, pano=tiny_cfg,
                              num_views=M, ip_noise_level=0.0)
    jvae = _tiny_jax_vae()

    # params: init tiny then overwrite with converted torch weights
    vae_params = jvae.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1))
    vae_params, missing, unexpected = apply_converted(
        vae_params, convert_vae_state_dict(tvae.state_dict()))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    model = DualUNet(dual_cfg)
    pipej = Imagine360Pipeline(
        PipelineModules(dual=model, dual_params=None, vae=jvae,
                        vae_params=vae_params), run_cfg, dual_cfg)
    # fp32 warp-mask biases for bit-level comparability (the production
    # pipeline uses bf16 biases to halve resident mask memory)
    from imagine360_tpu.pipeline.sampler import build_dual_warp_geoms
    pipej.geoms = build_dual_warp_geoms(dual_cfg, pipej.rig, (PH, PW),
                                        (EH, EW), bias_dtype=np.float32)

    # dual params need an init with correctly-shaped args; reuse the
    # pipeline's geoms/rig for faithfulness
    pers_in = jnp.zeros((2, M, F, PH, PW, 9), jnp.float32)
    pano_in = jnp.zeros((2, F, EH, EW, 9), jnp.float32)
    dual_params = model.init(
        {"params": jax.random.PRNGKey(0), "ip_noise": jax.random.PRNGKey(1)},
        pers_in, pano_in, jnp.zeros((2,)),
        jnp.zeros((2 * M, TXT_LEN, TXT_DIM)),
        jnp.zeros((2, TXT_LEN, TXT_DIM)), jnp.full((2,), 8.0),
        jnp.zeros((2 * M, F, DSAM, CSAM)), jnp.zeros((2, F, DSAM, CSAM)),
        jnp.zeros((2, F, 6)), jnp.zeros((2, F)), pipej.geoms,
        jnp.zeros((7,), bool), add_ip_noise=False)
    dual_params, missing, _ = apply_converted(
        dual_params, convert_state_dict(tm.state_dict()))
    assert not missing, missing[:8]
    pipej.m.dual_params = dual_params

    # inputs in our layouts
    pano_frames = np.transpose(pano_px[0], (0, 2, 3, 1))        # [F,H,W,3]
    pano_masks_j = np.transpose(pano_mask[0], (0, 2, 3, 1))     # [F,H,W,1]
    views_bfhwc = np.transpose(pers_px[0], (0, 1, 3, 4, 2))     # [F,M,p,p,3]
    vmasks_bfhwc = np.transpose(pers_masks[0], (0, 1, 3, 4, 2))

    pano_text = jnp.asarray(np.stack([neg_emb, pos_emb]))
    pers_text = jnp.concatenate([
        jnp.repeat(pano_text[:1], M, axis=0),
        jnp.repeat(pano_text[1:], M, axis=0)], axis=0)

    # the stub returns the same 8-frame embedding for each SAM chunk
    feats = np.transpose(fixed_embed.reshape(8, CSAM, DSAM),
                         (0, 2, 1))
    feats = np.concatenate([feats] * (F // 8))                   # [F,4096,C]
    # reference duplicates the SAME embeds for both CFG halves
    # (pipeline:696,719-720) and repeats the pers embeds over views
    ref_pano = jnp.asarray(np.stack([feats, feats]))
    ref_pers = jnp.concatenate(
        [jnp.repeat(jnp.asarray(feats)[None], M, axis=0)] * 2, axis=0)

    init_pano = jnp.asarray(
        captured["pano"].numpy().transpose(0, 2, 3, 4, 1))   # [1,F,h,w,4]
    init_pers = jnp.asarray(
        captured["pers"].numpy().transpose(0, 1, 3, 4, 5, 2))  # [1,M,F,h,w,4]

    video_j, _ = pipej.generate_core(
        pano_frames, pano_masks_j, views_bfhwc, vmasks_bfhwc,
        pano_text, pers_text, ref_pano, ref_pers,
        jnp.asarray(rel_pos), jnp.asarray(pitches),
        jax.random.PRNGKey(123),
        init_noise=(init_pano, init_pers),
        deterministic_vae=True)

    video_j_bchw = np.transpose(video_j, (3, 0, 1, 2))[None]  # [1,3,F,H,W]
    assert video_j_bchw.shape == video_t.shape, (video_j_bchw.shape,
                                                 video_t.shape)
    err = np.abs(video_j_bchw - video_t).max()
    assert err < 5e-3, f"pipeline outputs diverge: maxerr {err}"
