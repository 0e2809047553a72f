"""One-shot converter: reference torch checkpoints -> native orbax tree.

Usage:
  python tools/convert_checkpoints.py --config configs/prompt-dual.yaml \
      --out /path/to/orbax_root

Converts the dual UNet (+LoRA merges), VAE, CLIP text and SAM encoder as
available; subsequent runs of the CLI with `orbax_cache` skip torch entirely.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from imagine360_tpu.config import RunConfig
    from imagine360_tpu.presets import full_dual_config, tiny_dual_config
    from imagine360_tpu import cli as i360_cli
    from imagine360_tpu.utils import checkpoints as ckpt

    cfg = RunConfig.from_yaml(args.config)
    cfg.orbax_cache = None
    dual_cfg = tiny_dual_config() if args.tiny else full_dual_config(cfg.dtype)
    modules = i360_cli.build_modules(cfg, dual_cfg)

    os.makedirs(args.out, exist_ok=True)
    ckpt.save_orbax(modules.dual_params, os.path.join(args.out, "dual"))
    ckpt.save_orbax(modules.vae_params, os.path.join(args.out, "vae"))
    if modules.text_params is not None:
        ckpt.save_orbax(modules.text_params, os.path.join(args.out, "clip"))
    if modules.sam_params is not None:
        ckpt.save_orbax(modules.sam_params, os.path.join(args.out, "sam"))
    print("saved orbax checkpoints under", args.out)


if __name__ == "__main__":
    main()
