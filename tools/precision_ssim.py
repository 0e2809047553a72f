"""Production-precision SSIM trend line vs the PyTorch reference (no
released weights needed).

The north-star acceptance bar is frame SSIM > 0.98 vs the reference
implementation (BASELINE.md). Released Imagine360 checkpoints do not exist
in this environment, so this tool measures the one term we CAN measure now:
the divergence introduced by our precision policy + implementation through
the exact production compute path. It runs the reference torch pipeline
(pipeline_animation_inference_dual.py:552-824) and our Imagine360Pipeline
end-to-end at PRODUCTION channel widths (320/640/1280/1280, heads
5/10/20/20, cross-attn 1024 — the SD2.1 geometry from_pretrained_2d loads,
animatediff/models/unet.py:57-135) with IDENTICAL random-inflated weights,
both sides at the reference's bf16 policy (inference_dual_p2e.py:376-379:
bf16 models + latents; decode output cast fp32, pipeline:311-312), pinned
noise and pinned inference-time randomness, then reports frame SSIM/PSNR
between the two generated clips.

Run at several step counts to get the divergence-vs-steps trend:

    python tools/precision_ssim.py --steps 1 --out /tmp/s1.json
    python tools/precision_ssim.py --steps 4 --out /tmp/s4.json

frames must be >= 16 at production channels: the reference's video-IP
TemporalProjection avg-pools frames by kernel 4 TWICE
(animatediff/models/resampler.py:251,264), so F=8 reaches a length-2
sequence and torch's avg_pool1d(kernel_size=4) errors.

Defaults are the production geometry (512x1024 ERP, 256^2 views, M=20).
Wall-clock note: both sides ride this host's AMX (torch bf16 GEMM ~0.7
TF/s, XLA oneDNN convs ~3.8 TF/s); one full-geometry step costs a few
minutes per side.

tests/test_precision_ssim.py runs the same harness at reduced geometry as
a regression gate.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# CPU-only tool (the TPU chip is left free for benches); must be set before
# the first jax import. Hard-set: this machine's sitecustomize pins
# JAX_PLATFORMS=axon, so setdefault would land the run on the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon plugin registered by sitecustomize overrides the env var (it
# prepends itself at interpreter start); pin the platform at config level
# too or the "CPU" run silently rides the TPU tunnel (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# persistent compile cache: the production-geometry VAE-decode graph alone
# costs >2 h of XLA CPU compile on this 1-core host — cache it so repeat
# runs (other step counts, regression re-runs) skip straight to execution
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

# production UNet kwargs: SD2.1 geometry (from_pretrained_2d's config json)
# + configs/prompt-dual.yaml unet_additional_kwargs
PROD_TORCH_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    block_out_channels=(320, 640, 1280, 1280),
    layers_per_block=2,
    attention_head_dim=(5, 10, 20, 20),
    cross_attention_dim=1024,
    use_linear_projection=True,
    norm_num_groups=32,
    use_motion_module=True,
    motion_module_resolutions=(1, 2, 4, 8),
    motion_module_mid_block=True,
    motion_module_type="Vanilla",
    motion_module_kwargs=dict(
        num_attention_heads=8,
        num_transformer_block=1,
        attention_block_types=("Temporal_Self", "Temporal_Self"),
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=64,
        temporal_attention_dim_div=1,
        zero_initialize=True,
    ),
    unet_use_cross_frame_attention=False,
    unet_use_temporal_attention=False,
    use_fps_condition=True,
    use_relative_postions="WithAdapter",
    use_ip_plus_cross_attention=True,
    ip_plus_condition="video",
    num_tokens=64,
    use_adapter_temporal_projection=True,
    compress_video_features=True,
    image_hidden_size=256,
    image_cross_attention_dim=1024,
    adapter_cross_attention_dim=1024,
    use_outpaint=True,
    use_inflated_groupnorm=True,
    sample_size=64,
)


def _chunked_stub_attention(chunk_rows: int):
    """Replace refshim's full-matrix xformers stub with a row-chunked one
    (numerically identical: attention rows are independent) so the
    production pano spatial attention (logits [160, 8192, 8192] fp32,
    ~43 GB) never materializes at once."""
    import torch
    import xformers.ops as xops

    def memory_efficient_attention(q, k, v, attn_bias=None, p=0.0,
                                   scale=None):
        if scale is None:
            scale = q.shape[-1] ** -0.5
        outs = []
        for i in range(0, q.shape[0], chunk_rows):
            qc = q[i:i + chunk_rows].float() * scale
            logits = torch.einsum("bqd,bkd->bqk", qc,
                                  k[i:i + chunk_rows].float())
            if attn_bias is not None:
                b = attn_bias
                if b.ndim == 3 and b.shape[0] == q.shape[0]:
                    b = b[i:i + chunk_rows]
                logits = logits + b.float()
            probs = logits.softmax(dim=-1)
            outs.append(torch.einsum("bqk,bkd->bqd", probs,
                                     v[i:i + chunk_rows].float()))
        return torch.cat(outs).to(q.dtype)

    xops.memory_efficient_attention = memory_efficient_attention


def build_torch_side(kwargs, M, torch_dtype, seed=0):
    import torch
    import src.models.MVGenModel as ref_mv
    from animatediff.models.unet import UNet3DConditionModel as TorchUNet

    torch.manual_seed(seed)
    pers_unet = TorchUNet(**kwargs)
    pano_unet = TorchUNet(**kwargs)
    tm = ref_mv.MultiViewBaseModel(pers_unet, pano_unet, pano_pad=True)
    tm.eval()
    # zero-init projections would make WarpAttn/motion/fps identity maps —
    # give them signal so every coupling path is actually exercised:
    # - WarpAttn out/ff projections (transformer.py zero_module)
    # - motion-module temporal_transformer.proj_out (motion_module.py:88)
    # - fps_embedding.linear_2 (unet.py:168)
    # The WithAdapter temporal-LoRA 'up' proj (motion_module.py:293) does
    # NOT exist in this config: add_temporal_lora defaults False and the
    # production kwargs never enable it — there is no inert path there.
    with torch.no_grad():
        for blk in (list(tm.cp_blocks_encoder) + [tm.cp_blocks_mid]
                    + list(tm.cp_blocks_decoder)):
            blk.transformer.attn1.to_out.weight.normal_(0, 0.02)
            blk.transformer.ff.net[2].weight.normal_(0, 0.02)
        for unet in (pers_unet, pano_unet):
            for name, mod in unet.named_modules():
                if name.endswith("temporal_transformer"):
                    mod.proj_out.weight.normal_(0, 0.02)
                    mod.proj_out.bias.normal_(0, 0.02)
            if hasattr(unet, "fps_embedding"):
                unet.fps_embedding.linear_2.weight.normal_(0, 0.02)
                unet.fps_embedding.linear_2.bias.normal_(0, 0.02)
    for mod in tm.modules():
        if hasattr(mod, "_use_memory_efficient_attention_xformers"):
            mod._use_memory_efficient_attention_xformers = True
    tm = tm.to(torch_dtype)
    pers_unet = pers_unet.to(torch_dtype)
    pano_unet = pano_unet.to(torch_dtype)
    return tm, pers_unet, pano_unet


def torch_vae(prod: bool):
    from diffusers.models.vae import AutoencoderKL as TorchVAE
    if prod:   # SD2.1 VAE geometry
        return TorchVAE(
            in_channels=3, out_channels=3,
            down_block_types=("DownEncoderBlock2D",) * 4,
            up_block_types=("UpDecoderBlock2D",) * 4,
            block_out_channels=(128, 256, 512, 512),
            layers_per_block=2, latent_channels=4, norm_num_groups=32,
            sample_size=768)
    return TorchVAE(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(16, 16, 16, 16),
        layers_per_block=1, latent_channels=4, norm_num_groups=16,
        sample_size=64)


def jax_vae(prod: bool):
    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    if prod:
        return AutoencoderKL(VAEConfig(dtype="bfloat16"))
    return AutoencoderKL(VAEConfig(block_out_channels=(16, 16, 16, 16),
                                   layers_per_block=1, norm_num_groups=16,
                                   dtype="bfloat16"))


def run(pano_h=512, pano_w=1024, frames=16, views=20, steps=4,
        prod_channels=True, guidance=7.5, chunk_rows=8, seed=7,
        jax_dtype="bfloat16", torch_dtype_name="bfloat16", log=print):
    # reference TemporalProjection avg-pools frames /4 twice
    # (resampler.py:251,264) and the SAM-feature tiling below repeats in
    # 8-frame groups — enforce the harness's own documented constraints
    assert frames % 8 == 0, f"frames must be a multiple of 8, got {frames}"
    assert not prod_channels or frames >= 16, (
        "production channels require frames >= 16 (reference "
        "TemporalProjection double avg_pool1d(4) errors below that)")
    import refshim
    assert refshim.available(), "reference repo not mounted"
    refshim.install()
    import torch
    import xformers.ops as xops

    # global monkeypatches are restored on exit so pytest-invoked runs
    # don't leak pinned randomness into the rest of the session
    saved = [("mea", xops, "memory_efficient_attention",
              xops.memory_efficient_attention)]
    _chunked_stub_attention(chunk_rows)
    try:
        return _run_patched(
            saved, pano_h=pano_h, pano_w=pano_w, frames=frames, views=views,
            steps=steps, prod_channels=prod_channels, guidance=guidance,
            seed=seed, jax_dtype=jax_dtype,
            torch_dtype_name=torch_dtype_name, log=log)
    finally:
        for _, obj, attr, orig in saved:
            setattr(obj, attr, orig)


def _run_patched(saved, *, pano_h, pano_w, frames, views, steps,
                 prod_channels, guidance, seed, jax_dtype,
                 torch_dtype_name, log):
    import torch

    import jax
    import jax.numpy as jnp

    torch_dtype = getattr(torch, torch_dtype_name)
    pers = pano_h // 2
    EH, EW = pano_h // 8, pano_w // 8
    PH = PW = pers // 8
    F, M = frames, views
    CSAM, DSAM = (256, 4096) if prod_channels else (8, 4096)
    TXT_LEN, TXT_DIM = (77, 1024) if prod_channels else (7, 32)

    rng = np.random.default_rng(seed)
    t_start = time.time()

    # ---- shared stubs & pinned randomness on the reference side ----
    fixed_embed = rng.normal(size=(8, CSAM, 64, 64)).astype(np.float32)
    import test_golden_pipeline as tgp
    tgp._stub_segment_anything(torch.from_numpy(fixed_embed).to(torch_dtype))

    import src.models.MVGenModel as ref_mv
    import src.utils.utils as ref_utils
    from animatediff.pipelines.pipeline_animation_inference_dual import (
        AnimationPipeline)
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler
    from diffusers.models.vae import DiagonalGaussianDistribution

    saved.extend([
        ("rand", ref_utils.random, "random", ref_utils.random.random),
        ("ipn", ref_mv, "add_noise_to_condition",
         ref_mv.add_noise_to_condition),
        ("flush", ref_mv, "flush", ref_mv.flush),
        ("vae_sample", DiagonalGaussianDistribution, "sample",
         DiagonalGaussianDistribution.sample),
    ])
    ref_utils.random.random = lambda: 1.0         # no antipodal flip
    ref_mv.add_noise_to_condition = lambda x, noise_level=0.1: x
    ref_mv.flush = lambda: None
    DiagonalGaussianDistribution.sample = (
        lambda self, generator=None: self.mode())

    kwargs = PROD_TORCH_KWARGS if prod_channels else dict(
        tgp.TINY_TORCH_KWARGS, sample_size=64, num_tokens=64)
    tm, pers_unet, pano_unet = build_torch_side(kwargs, M, torch_dtype)

    tvae = torch_vae(prod_channels).eval().to(torch_dtype)
    scheduler = DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="linear", steps_offset=1, clip_sample=False,
        prediction_type="v_prediction", rescale_betas_zero_snr=True)
    pipe = AnimationPipeline(
        vae=tvae, text_encoder=None, tokenizer=None,
        pers_unet=pers_unet, pano_unet=pano_unet, mv_base_model=tm,
        scheduler=scheduler, image_encoder=None, image_encoder_name="SAM")

    neg_emb = rng.normal(size=(TXT_LEN, TXT_DIM)).astype(np.float32)
    pos_emb = rng.normal(size=(TXT_LEN, TXT_DIM)).astype(np.float32)

    def fake_encode_prompt(prompt, device, nvp, do_cfg, negative_prompt):
        n = len(prompt)
        return torch.from_numpy(
            np.concatenate([np.stack([neg_emb] * n),
                            np.stack([pos_emb] * n)])).to(torch_dtype)

    pipe._encode_prompt = fake_encode_prompt

    captured = {}
    orig_init_noise = pipe.init_noise

    def capture_init_noise(*a, **kw):
        pano_n, pers_n = orig_init_noise(*a, **kw)
        captured["pano"] = pano_n.clone()
        captured["pers"] = pers_n.clone()
        return pano_n, pers_n

    pipe.init_noise = capture_init_noise

    # ---- conditioning batch (random but shared bit-for-bit) ----
    pano_px = np.clip(rng.normal(size=(1, F, 3, pano_h, pano_w)) * 0.3,
                      -1, 1).astype(np.float32)
    pano_mask = (rng.uniform(size=(1, F, 1, pano_h, pano_w)) > 0.5
                 ).astype(np.float32)
    pers_px = np.clip(rng.normal(size=(1, F, M, 3, pers, pers)) * 0.3,
                      -1, 1).astype(np.float32)
    pers_masks = (rng.uniform(size=(1, F, M, 1, pers, pers)) > 0.5
                  ).astype(np.float32)
    anchor_px = np.clip(rng.normal(size=(1, F, 3, 64, 64)), -1, 1
                        ).astype(np.float32)
    rel_pos = (np.abs(rng.normal(size=(F, 6))) * 20).astype(np.float32)
    pitches = (rng.normal(size=(F,)) * 5).astype(np.float32)

    from imagine360_tpu.geometry import CameraRig
    rig = CameraRig.icosahedron(image_size=pers).take(M)
    cameras_t = {"FoV": torch.tensor(rig.fov)[None],
                 "theta": torch.tensor(rig.theta)[None],
                 "phi": torch.tensor(rig.phi)[None]}

    video_batch = {
        "videoid": "precision", "fps": 8,
        "pano_pixel_values": torch.from_numpy(pano_px).to(torch_dtype),
        "pano_mask": torch.from_numpy(pano_mask).to(torch_dtype),
        "pers_pixel_values": torch.from_numpy(pers_px).to(torch_dtype),
        "pers_masks": torch.from_numpy(pers_masks).to(torch_dtype),
        "anchor_pixels_values": torch.from_numpy(anchor_px).to(torch_dtype),
        "anchor_pixels_values_pers":
            torch.from_numpy(anchor_px).to(torch_dtype),
        "relative_position": torch.from_numpy(rel_pos).to(torch_dtype),
        "pitchs": torch.from_numpy(pitches).to(torch_dtype),
        "cameras": cameras_t,
        "video_length": F, "pano_H": pano_h, "pano_W": pano_w,
        "pers_size": pers,
    }

    log(f"[torch] running reference pipeline ({steps} steps)...")
    t0 = time.time()
    with torch.no_grad():
        out = pipe(prompt="a scenic mountain valley",
                   negative_prompt="noisy, ugly",
                   num_inference_steps=steps,
                   guidance_scale_text=guidance,
                   latents_dtype=torch_dtype,
                   video_batch=video_batch,
                   use_outpaint=True, use_ip_plus_cross_attention=True,
                   use_fps_condition=True, ip_plus_condition="video")
    torch_s = time.time() - t0
    video_t = np.asarray(out.videos)           # [1, 3, F, H, W] in [0,1]
    log(f"[torch] done in {torch_s:.1f}s")

    # ================= our side =================
    from imagine360_tpu.config import RunConfig
    from imagine360_tpu.models.dual import DualUNet, DualUNetConfig
    from imagine360_tpu.presets import full_dual_config
    from imagine360_tpu.pipeline.generate import (Imagine360Pipeline,
                                                  PipelineModules)
    from imagine360_tpu.utils.convert import (convert_state_dict,
                                              convert_vae_state_dict,
                                              apply_converted)
    import dataclasses

    run_cfg = RunConfig(pano_H=pano_h, pano_W=pano_w,
                        num_inference_steps=steps,
                        guidance_scale=guidance, antipodal_prob=0.0,
                        angle_adapt="none", use_mesh="off", fps=8,
                        dtype=jax_dtype)
    if prod_channels:
        dual_cfg = full_dual_config(jax_dtype)
        dual_cfg = dataclasses.replace(dual_cfg, num_views=M,
                                       ip_noise_level=0.0)
    else:
        tiny_cfg = dataclasses.replace(tgp._tiny_jax_config(),
                                       num_ip_tokens=64, dtype=jax_dtype)
        dual_cfg = DualUNetConfig(pers=tiny_cfg, pano=tiny_cfg,
                                  num_views=M, ip_noise_level=0.0)
    jvae = jax_vae(prod_channels)

    vae_params = jvae.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1))
    vae_params, missing, unexpected = apply_converted(
        vae_params, convert_vae_state_dict(tvae.state_dict()))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    model = DualUNet(dual_cfg)
    pipej = Imagine360Pipeline(
        PipelineModules(dual=model, dual_params=None, vae=jvae,
                        vae_params=vae_params), run_cfg, dual_cfg)

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
    del tm, pers_unet, pano_unet, pipe   # free the torch side's RAM

    pano_frames = np.transpose(pano_px[0], (0, 2, 3, 1))
    pano_masks_j = np.transpose(pano_mask[0], (0, 2, 3, 1))
    views_bfhwc = np.transpose(pers_px[0], (0, 1, 3, 4, 2))
    vmasks_bfhwc = np.transpose(pers_masks[0], (0, 1, 3, 4, 2))

    pano_text = jnp.asarray(np.stack([neg_emb, pos_emb]))
    pers_text = jnp.concatenate([
        jnp.repeat(pano_text[:1], M, axis=0),
        jnp.repeat(pano_text[1:], M, axis=0)], axis=0)

    feats = np.transpose(fixed_embed.reshape(8, CSAM, DSAM), (0, 2, 1))
    feats = np.concatenate([feats] * max(1, F // 8))[:F]
    ref_pano = jnp.asarray(np.stack([feats, feats]))
    ref_pers = jnp.concatenate(
        [jnp.repeat(jnp.asarray(feats)[None], M, axis=0)] * 2, axis=0)

    init_pano = jnp.asarray(
        captured["pano"].float().numpy().transpose(0, 2, 3, 4, 1))
    init_pers = jnp.asarray(
        captured["pers"].float().numpy().transpose(0, 1, 3, 4, 5, 2))

    log(f"[jax] running our pipeline ({steps} steps, {jax_dtype})...")
    t0 = time.time()
    video_j, _ = pipej.generate_core(
        pano_frames, pano_masks_j, views_bfhwc, vmasks_bfhwc,
        pano_text, pers_text, ref_pano, ref_pers,
        jnp.asarray(rel_pos), jnp.asarray(pitches),
        jax.random.PRNGKey(123),
        init_noise=(init_pano, init_pers),
        deterministic_vae=True)
    jax_s = time.time() - t0
    log(f"[jax] done in {jax_s:.1f}s")

    video_j = np.asarray(video_j, np.float32)        # [F, H, W, 3]
    video_t_fhwc = np.transpose(video_t[0], (1, 2, 3, 0))

    from imagine360_tpu.utils.metrics import ssim, psnr
    ssims = [float(ssim(video_j[i], video_t_fhwc[i])) for i in range(F)]
    psnrs = [float(psnr(video_j[i], video_t_fhwc[i])) for i in range(F)]
    return {
        "config": {"pano_h": pano_h, "pano_w": pano_w, "frames": F,
                   "views": M, "steps": steps,
                   "prod_channels": prod_channels,
                   "jax_dtype": jax_dtype, "torch_dtype": torch_dtype_name},
        "ssim_mean": float(np.mean(ssims)),
        "ssim_min": float(np.min(ssims)),
        "psnr_mean": float(np.mean(psnrs)),
        "ssim_per_frame": ssims,
        "torch_s": round(torch_s, 1), "jax_s": round(jax_s, 1),
        "total_s": round(time.time() - t_start, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pano-h", type=int, default=512)
    ap.add_argument("--pano-w", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--tiny-channels", action="store_true")
    ap.add_argument("--jax-dtype", default="bfloat16")
    ap.add_argument("--torch-dtype", default="bfloat16")
    ap.add_argument("--chunk-rows", type=int, default=8)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    res = run(pano_h=a.pano_h, pano_w=a.pano_w, frames=a.frames,
              views=a.views, steps=a.steps,
              prod_channels=not a.tiny_channels,
              chunk_rows=a.chunk_rows, jax_dtype=a.jax_dtype,
              torch_dtype_name=a.torch_dtype)
    line = json.dumps(res)
    print(line)
    if a.out:
        with open(a.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
