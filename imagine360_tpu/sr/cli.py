"""SR command line (reference sr/enhance_a_video.py:128-170):
`python -m imagine360_tpu.sr.cli --input out.mp4 --output out_2k.mp4`.

Uses the pano UNet branch as the refiner engine by default (sr/refiner.py;
the reference refines with the external VEnhancer UNet,
sr/video_to_video_model.py:61-152): circular pad -> noise-aug -> DPM++
refinement conditioned on the clean upsampled clip -> 360 tiled decode ->
wavelet color fix.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..utils.video_io import read_video, save_video
from ..utils.observability import get_logger
from .enhance import Video360Enhancer, EnhancerConfig
from .refiner import PanoRefiner, PanoRefinerConfig

log = get_logger("sr")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--up-scale", type=int, default=2)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--noise-aug", type=int, default=250)
    ap.add_argument("--solver", choices=["sde", "ode"], default="sde")
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--engine", choices=["pano", "v2v"], default="pano",
                    help="refiner engine: the repo's pano UNet branch "
                         "(default, works without external weights) or the "
                         "structural VEnhancer ControlledV2VUNet port "
                         "(sr/unet_v2v.py; needs --v2v-ckpt)")
    ap.add_argument("--pano-unet-ckpt", default=None,
                    help="reference-format pano UNet ckpt for the refiner")
    ap.add_argument("--v2v-ckpt", default=None,
                    help="VEnhancer ControlledV2VUNet torch ckpt "
                         "(converted via sr/unet_v2v.py:convert_v2v)")
    ap.add_argument("--prompt", default=None,
                    help="SR guidance prompt (reference "
                         "sr/enhance_a_video.py feeds the caption); needs "
                         "--text-ckpt + --tokenizer-dir")
    ap.add_argument("--neg-prompt", default="")
    ap.add_argument("--text-ckpt", default=None,
                    help="OpenCLIP ViT-H text tower weights (open_clip or "
                         "FrozenOpenCLIPEmbedder state_dict; reference "
                         "sr/video_to_video_model.py:36-38)")
    ap.add_argument("--tokenizer-dir", default=None,
                    help="HF CLIPTokenizer dir (same BPE as open_clip)")
    ap.add_argument("--vae-path", default=None,
                    help="SD VAE dir or safetensors file")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture (CPU smoke runs)")
    ap.add_argument("--platform", default=None,
                    choices=("cpu", "tpu", "axon"))
    args = ap.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    frames = read_video(args.input).astype(np.float32) / 255.0
    log.info("input %s frames %s", args.input, frames.shape)

    import jax.numpy as jnp
    from ..models.vae import AutoencoderKL, VAEConfig
    from ..models.unet3d import UNet3DConditionModel
    from ..presets import full_unet_config, tiny_unet_config
    from .. import cli as main_cli

    dtype = "float32" if args.tiny else "bfloat16"
    vae = AutoencoderKL(VAEConfig(dtype=dtype))
    vae_params = main_cli._init_params(
        vae, lambda: vae.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)),
                              jax.random.PRNGKey(1)), dtype)
    if args.vae_path and os.path.exists(args.vae_path):
        from ..utils.convert import convert_vae_state_dict, apply_converted
        from ..utils import checkpoints as ckpt
        path = args.vae_path
        if os.path.isdir(path):
            for cand in ("diffusion_pytorch_model.safetensors",
                         "diffusion_pytorch_model.bin"):
                p = os.path.join(path, cand)
                if os.path.exists(p):
                    path = p
                    break
        vae_params, _, _ = apply_converted(
            vae_params, convert_vae_state_dict(ckpt.load_state_dict(path)))
        log.info("loaded VAE weights from %s", path)

    text_pos, text_neg = _encode_sr_prompts(args, dtype)

    if args.engine == "v2v":
        refiner = _build_v2v_refiner(args, dtype, text_pos, text_neg)
        cfg = EnhancerConfig(up_scale=args.up_scale, num_steps=args.steps,
                             noise_aug=args.noise_aug,
                             solver_mode=args.solver)
        enhancer = Video360Enhancer(refiner, vae, vae_params, cfg)
        out = enhancer(frames, jax.random.PRNGKey(args.seed))
        save_video(out, args.output, args.fps)
        log.info("saved %s %s", args.output, out.shape)
        return

    ucfg = tiny_unet_config(dtype) if args.tiny else full_unet_config(dtype)
    unet = UNet3DConditionModel(ucfg)
    F = min(8, frames.shape[0])
    unet_params = main_cli._init_params(
        unet, lambda: unet.init(
            {"params": jax.random.PRNGKey(0),
             "ip_noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, F, 16, 32, 9)), jnp.zeros((1,)),
            jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            jnp.zeros((1,))), dtype)
    if args.pano_unet_ckpt and os.path.exists(args.pano_unet_ckpt):
        from ..utils import checkpoints as ckpt
        unet_params, missing, unexpected = ckpt.load_unet_branch(
            unet_params, args.pano_unet_ckpt)
        log.info("refiner ckpt: %d missing, %d unexpected",
                 len(missing), len(unexpected))
    else:
        log.warning("no refiner checkpoint — zero-init dev mode")

    refiner = PanoRefiner(unet, unet_params,
                          text_pos=text_pos, text_neg=text_neg,
                          cfg=PanoRefinerConfig(
                              guidance_scale=args.guidance, fps=args.fps))
    cfg = EnhancerConfig(up_scale=args.up_scale, num_steps=args.steps,
                         noise_aug=args.noise_aug, solver_mode=args.solver)
    enhancer = Video360Enhancer(refiner, vae, vae_params, cfg)
    out = enhancer(frames, jax.random.PRNGKey(args.seed))
    save_video(out, args.output, args.fps)
    log.info("saved %s %s", args.output, out.shape)


def _encode_sr_prompts(args, dtype):
    """(text_pos, text_neg) [77, 1024] prompt embeddings via the OpenCLIP
    ViT-H text tower (reference FrozenOpenCLIPEmbedder, penultimate layer —
    sr/video_to_video_model.py:36-38,74,118), or (None, None) when no
    prompt/encoder is configured (the refiners then run unconditioned, CFG
    degenerates gracefully)."""
    if not args.prompt:
        return None, None
    if not (args.text_ckpt and os.path.exists(args.text_ckpt)
            and args.tokenizer_dir and os.path.isdir(args.tokenizer_dir)):
        log.warning("--prompt given but --text-ckpt/--tokenizer-dir "
                    "missing; running unconditioned")
        return None, None
    import jax.numpy as jnp
    from transformers import CLIPTokenizer
    from ..models.clip_text import (CLIPTextConfig, CLIPTextModel,
                                    convert_openclip_text,
                                    openclip_tokenize)
    from ..utils.convert import apply_converted
    from ..utils import checkpoints as ckpt
    from .. import cli as main_cli

    enc = CLIPTextModel(CLIPTextConfig(dtype=dtype))
    params = main_cli._init_params(
        enc, lambda: enc.init(jax.random.PRNGKey(0),
                              np.zeros((1, 77), np.int32)), dtype)
    flat = convert_openclip_text(ckpt.load_state_dict(args.text_ckpt))
    params, missing, unexpected = apply_converted(params, flat)
    log.info("text tower: %d missing, %d unexpected",
             len(missing), len(unexpected))
    tok = CLIPTokenizer.from_pretrained(args.tokenizer_dir)
    ids = np.stack([openclip_tokenize(tok, args.neg_prompt),
                    openclip_tokenize(tok, args.prompt)])
    emb = jax.jit(enc.apply)(params, jnp.asarray(ids))
    return emb[1], emb[0]


def _build_v2v_refiner(args, dtype, text_pos=None, text_neg=None):
    import jax.numpy as jnp
    from .unet_v2v import (ControlledV2VUNet, V2VConfig, V2VRefiner,
                           convert_v2v, tiny_v2v_config)
    from .. import cli as main_cli

    vcfg = tiny_v2v_config(dtype) if args.tiny else V2VConfig(dtype=dtype)
    model = ControlledV2VUNet(vcfg)
    F = 4
    params = main_cli._init_params(
        model, lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, F, 8, 16, vcfg.in_dim)), jnp.zeros((1,)),
            jnp.zeros((1, 77, vcfg.context_dim)),
            jnp.zeros((1, F, 8, 16, vcfg.in_dim)),
            t_hint=jnp.zeros((1,)), mask_cond=jnp.ones((1, F)),
            s_cond=jnp.full((1,), 2.0)), dtype)
    if args.v2v_ckpt and os.path.exists(args.v2v_ckpt):
        from ..utils.convert import apply_converted
        from ..utils import checkpoints as ckpt
        flat = convert_v2v(ckpt.load_state_dict(args.v2v_ckpt), vcfg)
        unmapped = flat.pop("_unmapped", [])
        params, missing, unexpected = apply_converted(params, flat)
        log.info("v2v ckpt: %d missing, %d unexpected, %d unmapped",
                 len(missing), len(unexpected), len(unmapped))
    else:
        log.warning("no VEnhancer ckpt — zero-init dev mode")
    return V2VRefiner(model, params, text_pos=text_pos, text_neg=text_neg,
                      guidance_scale=args.guidance,
                      t_hint=max(0, args.noise_aug - 1),
                      s_cond=float(args.up_scale))


if __name__ == "__main__":
    main()
