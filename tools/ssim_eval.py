"""SSIM/PSNR acceptance harness vs the PyTorch reference.

The north-star acceptance metric (BASELINE.md) is frame SSIM > 0.98 against
the reference implementation's outputs on the reference example videos.
Released Imagine360 checkpoints are not available in this environment, so
this harness is built to produce the number THE MOMENT weights exist:

  python tools/ssim_eval.py --config cfg.yaml \
      --videos '/root/reference/examples/*.mp4' \
      --reference-outputs /path/to/torch_outputs \
      --out /tmp/ssim_results.json

- cfg.yaml is a normal RunConfig (same keys as the reference YAML): point
  the *_pretrained_model_path keys at the reference-format checkpoints —
  all three ckpt families + motion LoRA are converted by
  utils/checkpoints.load_dual_model (LoRA pre-merged host-side).
- --reference-outputs holds the torch pipeline's saved clips, named
  <video_stem>_output.mp4 (the reference driver's naming,
  inference_dual_p2e.py:599-603) or <video_stem>.mp4.
- Emits one JSON with per-clip SSIM/PSNR and aggregates.

CI runs this end-to-end in plumbing mode (tiny architecture, random
reference-format checkpoints, self-comparison) — see
tests/test_ssim_harness.py.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(cfg, dual_cfg, videos, reference_outputs=None, save_dir=None,
             pipe=None):
    """Runs the pipeline over `videos`; returns list of per-clip results.
    When a reference clip exists for a video, SSIM/PSNR are computed
    frame-wise against it (generated vs reference, both [0,1] RGB).
    `pipe` overrides pipeline construction (tests)."""
    import jax

    from imagine360_tpu.cli import build_modules
    from imagine360_tpu.pipeline.generate import Imagine360Pipeline
    from imagine360_tpu.utils.video_io import read_video, save_video, \
        resize_frames
    from imagine360_tpu.utils.metrics import ssim, psnr

    if pipe is None:
        modules = build_modules(cfg, dual_cfg)
        pipe = Imagine360Pipeline(modules, cfg, dual_cfg)
    rng = jax.random.PRNGKey(cfg.global_seed)

    results = []
    for path in videos:
        name = os.path.splitext(os.path.basename(path))[0]
        frames = read_video(path, num_frames=cfg.video_sample_length)
        sidecar = os.path.splitext(path)[0] + ".txt"
        prompt = (open(sidecar).read().strip()
                  if os.path.exists(sidecar) else cfg.prompt)
        rng, k = jax.random.split(rng)
        out = pipe(frames, prompt, rng=k)
        video = out["videos"]                      # [F, H, W, 3] in [0, 1]
        entry = {"video": name, "frames": int(video.shape[0])}

        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            save_video(video, os.path.join(save_dir, f"{name}_output.mp4"),
                       cfg.fps)

        ref_clip = None
        if reference_outputs:
            for cand in (f"{name}_output.mp4", f"{name}.mp4",
                         f"{name}_output.npy", f"{name}.npy"):
                p = os.path.join(reference_outputs, cand)
                if os.path.exists(p):
                    ref_clip = p
                    break
        if ref_clip:
            ref = read_video(ref_clip, num_frames=video.shape[0])
            ref = ref.astype(np.float32) / 255.0
            if ref.shape[1:3] != video.shape[1:3]:
                ref = resize_frames(ref, video.shape[1:3])
            n = min(len(ref), len(video))
            ssims = [ssim(video[i], ref[i]) for i in range(n)]
            psnrs = [psnr(video[i], ref[i]) for i in range(n)]
            entry.update(ssim=float(np.mean(ssims)),
                         ssim_min=float(np.min(ssims)),
                         psnr=float(np.mean(psnrs)),
                         reference=ref_clip)
        results.append(entry)
    return results


def main(argv=None):
    from imagine360_tpu.config import RunConfig
    from imagine360_tpu.presets import full_dual_config, tiny_dual_config
    from imagine360_tpu.utils.compile_cache import enable_compile_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--videos", default="/root/reference/examples/*.mp4",
                    help="glob of input perspective videos")
    ap.add_argument("--reference-outputs", default=None,
                    help="directory of reference-generated clips")
    ap.add_argument("--save-outputs", default=None,
                    help="directory to write our generated clips")
    ap.add_argument("--out", default="ssim_results.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture (plumbing test)")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                    help="force a jax backend (the axon plugin ignores the "
                    "JAX_PLATFORMS env var; use --platform cpu for CPU runs)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    enable_compile_cache()
    cfg = RunConfig.from_yaml(args.config)
    dual_cfg = (tiny_dual_config() if args.tiny
                else full_dual_config(cfg.dtype))

    videos = sorted(glob.glob(args.videos))
    if not videos:
        raise SystemExit(f"no videos match {args.videos}")

    results = evaluate(cfg, dual_cfg, videos,
                       reference_outputs=args.reference_outputs,
                       save_dir=args.save_outputs)
    scored = [r for r in results if "ssim" in r]
    summary = {
        "clips": results,
        "n_scored": len(scored),
        "mean_ssim": (float(np.mean([r["ssim"] for r in scored]))
                      if scored else None),
        "mean_psnr": (float(np.mean([r["psnr"] for r in scored]))
                      if scored else None),
        "target": "SSIM > 0.98 (BASELINE.md north star)",
        "pass": (all(r["ssim"] > 0.98 for r in scored)
                 if scored else None),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "clips"}))
    return summary


if __name__ == "__main__":
    main()
