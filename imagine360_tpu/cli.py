"""Command-line entry point mirroring the reference driver
(`python -m imagine360_tpu.cli --config configs/prompt-dual.yaml`;
reference inference_dual_p2e.py:608-615).

Per video: read + uniform temporal subsample, sidecar-.txt prompt, pitch
estimation + ERP warp, dual-branch denoise, save mask/input/output MP4s.
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunConfig
from .presets import full_dual_config, tiny_dual_config
from .models.dual import DualUNet
from .models.vae import AutoencoderKL, VAEConfig
from .models.clip_text import CLIPTextModel, CLIPTextConfig
from .models.sam import SAMImageEncoder
from .pipeline.generate import Imagine360Pipeline, PipelineModules
from .utils import checkpoints as ckpt
from .utils.video_io import read_video, save_video
from .utils.observability import get_logger

log = get_logger("cli")


def _init_params(model, init_fn, dtype):
    shapes = jax.eval_shape(init_fn)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.dtype(dtype)),
                        shapes)


def build_modules(cfg: RunConfig, dual_cfg) -> PipelineModules:
    """Construct all models; load reference-format checkpoints when the
    configured paths exist, otherwise zero-init (dev mode)."""
    model = DualUNet(dual_cfg)
    ps = cfg.pano_H // 2
    F = cfg.video_sample_length
    M = dual_cfg.num_views

    from .pipeline.sampler import build_dual_warp_geoms
    from .geometry import CameraRig
    from .models.dual import warp_sites

    rig = CameraRig.icosahedron(image_size=ps).take(dual_cfg.num_views)
    geoms = build_dual_warp_geoms(dual_cfg, rig, (ps // 8, ps // 8),
                                  (cfg.pano_H // 8, cfg.pano_W // 8))
    n_sites = len(warp_sites(len(dual_cfg.pers.block_out_channels)))
    rngs = {"params": jax.random.PRNGKey(0),
            "ip_noise": jax.random.PRNGKey(1)}
    sam_c = dual_cfg.pano.image_hidden_size
    txt_c = dual_cfg.pano.cross_attention_dim

    def init_dual():
        return model.init(
            rngs,
            jnp.zeros((1, M, F, ps // 8, ps // 8, 9)),
            jnp.zeros((1, F, cfg.pano_H // 8, cfg.pano_W // 8, 9)),
            jnp.zeros((1,)), jnp.zeros((M, 77, txt_c)),
            jnp.zeros((1, 77, txt_c)), jnp.zeros((1,)),
            jnp.zeros((M, 16, 4096, sam_c)), jnp.zeros((1, 16, 4096, sam_c)),
            jnp.zeros((1, F, 6)), jnp.zeros((1, F)), geoms,
            jnp.zeros((n_sites,), bool))

    dual_params = _init_params(model, init_dual, dual_cfg.pers.dtype)
    cache = os.path.join(cfg.orbax_cache, "dual") if cfg.orbax_cache else None
    if cache and os.path.isdir(cache):
        log.info("restoring native orbax checkpoint from %s", cache)
        dual_params = ckpt.load_orbax(cache, target=dual_params)
    elif cfg.pers_unet_pretrained_model_path and os.path.exists(
            cfg.pers_unet_pretrained_model_path):
        log.info("loading reference checkpoints")
        dual_params, missing, unexpected = ckpt.load_dual_model(
            dual_params,
            cfg.mvmodel_pretrained_model_path,
            cfg.pers_unet_pretrained_model_path,
            cfg.pano_unet_pretrained_model_path,
            cfg.perslora_motion_module_path,
            cfg.panolora_motion_module_path,
            cfg.lora_alpha_pers, cfg.lora_alpha_pano)
        log.info("ckpt load: %d missing, %d unexpected",
                 len(missing), len(unexpected))
        if cache:
            ckpt.save_orbax(dual_params, cache)
            log.info("cached native checkpoint at %s", cache)
    else:
        log.warning("no UNet checkpoints found — zero-init dev mode")

    vae = AutoencoderKL(VAEConfig(dtype=cfg.dtype))
    vae_params = _init_params(
        vae, lambda: vae.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)),
                              jax.random.PRNGKey(1)), cfg.dtype)
    vp = cfg.pretrained_model_path
    if vp:
        for cand in ("vae/diffusion_pytorch_model.safetensors",
                     "vae/diffusion_pytorch_model.bin"):
            path = os.path.join(vp, cand)
            if os.path.exists(path):
                from .utils.convert import convert_vae_state_dict, \
                    apply_converted
                flat = convert_vae_state_dict(ckpt.load_state_dict(path))
                vae_params, _, _ = apply_converted(vae_params, flat)
                log.info("loaded VAE weights from %s", path)
                break

    text_encoder = text_params = tokenizer = None
    if vp and os.path.isdir(os.path.join(vp, "text_encoder")):
        text_encoder = CLIPTextModel(CLIPTextConfig(dtype=cfg.dtype))
        text_params = _init_params(
            text_encoder,
            lambda: text_encoder.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 77), jnp.int32)),
            cfg.dtype)
        for cand in ("text_encoder/model.safetensors",
                     "text_encoder/pytorch_model.bin"):
            path = os.path.join(vp, cand)
            if os.path.exists(path):
                from .models.clip_text import convert_hf_clip_text
                from .utils.convert import apply_converted
                flat = convert_hf_clip_text(ckpt.load_state_dict(path))
                text_params, _, _ = apply_converted(text_params, flat)
                log.info("loaded CLIP text weights from %s", path)
                break
        try:
            from transformers import CLIPTokenizer
            tok = CLIPTokenizer.from_pretrained(
                os.path.join(vp, "tokenizer"))
            tokenizer = lambda s: np.asarray(  # noqa: E731
                tok(s, padding="max_length", max_length=77,
                    truncation=True).input_ids, np.int32)
        except Exception as e:  # pragma: no cover
            log.warning("tokenizer unavailable: %s", e)

    sam = sam_params = None
    sp = cfg.image_pretrained_model_path
    if sp and os.path.exists(sp) and dual_cfg.pano.image_hidden_size == 256:
        from .models.sam import SAMConfig
        sam = SAMImageEncoder(SAMConfig(dtype=cfg.dtype))
        sam_params = _init_params(
            sam, lambda: sam.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 1024, 1024, 3))), cfg.dtype)
        from .models.sam import convert_sam_encoder
        from .utils.convert import apply_converted
        flat = convert_sam_encoder(ckpt.load_state_dict(sp))
        sam_params, _, _ = apply_converted(sam_params, flat)
        log.info("loaded SAM encoder from %s", sp)

    return PipelineModules(dual=model, dual_params=dual_params,
                           vae=vae, vae_params=vae_params,
                           text_encoder=text_encoder, text_params=text_params,
                           sam=sam, sam_params=sam_params,
                           tokenizer=tokenizer)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture (CPU smoke runs)")
    ap.add_argument("--platform", default=None,
                    choices=("cpu", "tpu", "axon"),
                    help="force a jax backend. NOTE: this image's axon "
                    "plugin overrides the JAX_PLATFORMS env var, so CPU "
                    "runs need --platform cpu (the env var alone is "
                    "silently ignored)")
    args = ap.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu" and \
                "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                       + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", args.platform)

    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    cfg = RunConfig.from_yaml(args.config)
    if args.tiny:
        # tiny mode is the weightless plumbing smoke: unconditioned is fine
        cfg.allow_unconditioned = True
    dual_cfg = (tiny_dual_config() if args.tiny
                else full_dual_config(cfg.dtype))
    videos = sorted(glob.glob(os.path.join(cfg.video_path, "*.mp4"))
                    + glob.glob(os.path.join(cfg.video_path, "*.npy")))
    if not videos:
        log.error("no videos found under %s", cfg.video_path)
        return
    # a prompt with no text encoder would silently generate unconditioned
    # video (zero text embeddings) — refuse BEFORE the expensive model
    # build (round-2 review finding)
    vp = cfg.pretrained_model_path
    has_tokenizer = bool(vp) and os.path.isdir(os.path.join(vp, "tokenizer"))
    if not has_tokenizer:
        prompted = [p for p in videos
                    if os.path.exists(os.path.splitext(p)[0] + ".txt")]
        if (cfg.prompt.strip() or prompted) and not cfg.allow_unconditioned:
            log.error(
                "prompts exist (%s) but no CLIP tokenizer/text encoder is "
                "available — generation would silently ignore them. Point "
                "pretrained_model_path at an SD2.1 tree with text_encoder/ "
                "and tokenizer/, or set allow_unconditioned: true.",
                cfg.prompt.strip()[:40] or
                f"{len(prompted)} sidecar .txt files")
            return
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.to_yaml(os.path.join(cfg.output_dir, "config.yaml"))

    modules = build_modules(cfg, dual_cfg)
    pipe = Imagine360Pipeline(modules, cfg, dual_cfg)

    rng = jax.random.PRNGKey(cfg.global_seed)
    for path in videos:
        name = os.path.splitext(os.path.basename(path))[0]
        log.info("processing %s", name)
        frames = read_video(path, num_frames=cfg.video_sample_length)
        sidecar = os.path.splitext(path)[0] + ".txt"
        prompt = cfg.prompt
        if os.path.exists(sidecar):
            prompt = open(sidecar).read().strip()
        rng, k = jax.random.split(rng)
        try:
            out = pipe(frames, prompt, rng=k)
        except Exception:
            log.exception("generation failed for %s", name)
            continue
        base = os.path.join(cfg.output_dir, name)
        save_video(out["videos"], base + "_output.mp4", cfg.fps)
        save_video(out["pano_input"], base + "_input.mp4", cfg.fps)
        save_video(np.repeat(out["masks"], 3, axis=-1), base + "_mask.mp4",
                   cfg.fps)
        log.info("saved %s_*.mp4", base)


if __name__ == "__main__":
    main()
