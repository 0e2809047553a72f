"""Plumbing test for the SSIM acceptance harness (tools/ssim_eval.py).

Released reference checkpoints are unavailable (round-1 known-issue 5), so
this exercises every pipe the real evaluation will flow through, with
random-but-identical reference-format weights:
  1. three torch ckpt families + motion LoRA written in the reference's
     on-disk formats -> converted and loaded key-exactly,
  2. evaluate() generates a clip end-to-end and writes it,
  3. the scoring path reads a reference clip and emits SSIM/PSNR == 1.0
     for identical inputs.
When real weights appear, `python tools/ssim_eval.py --config ... ` is the
one command that produces the BASELINE.md metric.
"""
import os
import sys

import numpy as np
import pytest
import torch

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _write_reference_ckpts(tmp, tm):
    """Reference on-disk formats (inference_dual_p2e.py:213-231,427-439):
    per-branch {'epoch','global_step','state_dict'} with 'module.' prefix,
    an MVModel state_dict, and a diffusers-style motion LoRA."""
    sd = tm.state_dict()
    pers_sd = {"module." + k[len("unet."):]: v for k, v in sd.items()
               if k.startswith("unet.")}
    pano_sd = {"module." + k[len("pano_unet."):]: v for k, v in sd.items()
               if k.startswith("pano_unet.")}
    paths = {}
    paths["pers"] = os.path.join(tmp, "pers.ckpt")
    torch.save({"epoch": 0, "global_step": 0, "state_dict": pers_sd},
               paths["pers"])
    paths["pano"] = os.path.join(tmp, "pano.ckpt")
    torch.save({"epoch": 0, "global_step": 0, "state_dict": pano_sd},
               paths["pano"])
    paths["mv"] = os.path.join(tmp, "mv.ckpt")
    torch.save({"state_dict": {"module." + k: v for k, v in sd.items()}},
               paths["mv"])

    # motion LoRA on one attention projection of the pers branch
    base_key = None
    for k, v in pers_sd.items():
        if "motion_modules" in k and k.endswith("to_q.weight"):
            base_key = k[len("module."):]
            break
    assert base_key is not None
    d_out, d_in = pers_sd["module." + base_key].shape
    rngl = np.random.default_rng(3)
    lora = {
        base_key.replace(".weight", ".lora_up.weight"):
            torch.from_numpy(rngl.normal(size=(d_out, 4))
                             .astype(np.float32) * 0.05),
        base_key.replace(".weight", ".lora_down.weight"):
            torch.from_numpy(rngl.normal(size=(4, d_in))
                             .astype(np.float32) * 0.05),
    }
    paths["lora"] = os.path.join(tmp, "motion_lora.ckpt")
    torch.save(lora, paths["lora"])
    return paths, base_key


def test_ssim_harness_end_to_end(tmp_path, monkeypatch):
    refshim.install()
    from test_golden_unet import TINY_TORCH_KWARGS
    import src.models.MVGenModel as ref_mv
    from animatediff.models.unet import UNet3DConditionModel as TorchUNet

    torch.manual_seed(0)
    tm = ref_mv.MultiViewBaseModel(TorchUNet(**TINY_TORCH_KWARGS),
                                   TorchUNet(**TINY_TORCH_KWARGS),
                                   pano_pad=True)
    paths, lora_base_key = _write_reference_ckpts(str(tmp_path), tm)

    from imagine360_tpu.config import RunConfig
    from imagine360_tpu.models.dual import DualUNetConfig
    from test_golden_unet import _tiny_jax_config
    from ssim_eval import evaluate

    cfg = RunConfig(
        pano_H=128, pano_W=256, num_inference_steps=2,
        video_sample_length=4, angle_adapt="none", dtype="float32",
        use_mesh="off", global_seed=7,
        pers_unet_pretrained_model_path=paths["pers"],
        pano_unet_pretrained_model_path=paths["pano"],
        mvmodel_pretrained_model_path=paths["mv"],
        perslora_motion_module_path=paths["lora"],
        lora_alpha_pers=0.7,
    )
    # architecture must match TINY_TORCH_KWARGS (the ckpts' shapes)
    dual_cfg = DualUNetConfig(pers=_tiny_jax_config(),
                              pano=_tiny_jax_config(), num_views=4)

    # conversion plumbing check: the LoRA delta must land in the loaded tree
    from imagine360_tpu.cli import build_modules
    modules = build_modules(cfg, dual_cfg)
    from imagine360_tpu.utils.convert import (flatten_params,
                                              convert_state_dict)
    flat_loaded = flatten_params(modules.dual_params)
    flat_base = convert_state_dict(
        {"unet." + lora_base_key: tm.state_dict()["unet." + lora_base_key]})
    (conv_key, base_arr), = flat_base.items()
    conv_key = "params." + conv_key
    assert conv_key in flat_loaded, conv_key
    delta = np.abs(flat_loaded[conv_key] - base_arr).max()
    assert delta > 1e-6, "motion LoRA was not merged into the loaded weights"

    # end-to-end generation + save
    from imagine360_tpu.pipeline.generate import Imagine360Pipeline
    pipe = Imagine360Pipeline(modules, cfg, dual_cfg)
    video = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "synthetic.npy")
    outdir = str(tmp_path / "ours")
    results = evaluate(cfg, dual_cfg, [video], save_dir=outdir, pipe=pipe)
    assert len(results) == 1 and "ssim" not in results[0]
    saved = [f for f in os.listdir(outdir) if f.startswith("synthetic")]
    assert saved, os.listdir(outdir)
    saved_path = os.path.join(outdir, saved[0])

    # scoring plumbing: identical clip on both sides -> SSIM/PSNR perfect
    from imagine360_tpu.utils.video_io import read_video

    class FakePipe:
        def __call__(self, frames, prompt="", rng=None, **kw):
            clip = read_video(saved_path).astype(np.float32) / 255.0
            return {"videos": clip}

    results = evaluate(cfg, dual_cfg, [video],
                       reference_outputs=outdir, pipe=FakePipe())
    assert "ssim" in results[0], results
    assert results[0]["ssim"] > 0.999, results
    assert results[0]["psnr"] > 40, results
