"""CLI guardrails: a prompt with no CLIP tokenizer must refuse up-front
instead of silently generating unconditioned video (round-2 review finding;
the reference would crash on a missing tokenizer path, never silently
no-op — inference_dual_p2e.py:386-388)."""
import os

import numpy as np


def _write_cfg(tmp_path, **kw):
    import yaml
    cfg = dict(video_path=str(tmp_path / "vids"),
               output_dir=str(tmp_path / "out"),
               pano_H=64, pano_W=128, num_inference_steps=1,
               video_sample_length=4, **kw)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def _write_video(tmp_path, sidecar=None):
    d = tmp_path / "vids"
    d.mkdir(exist_ok=True)
    np.save(d / "clip.npy",
            np.random.default_rng(0).integers(
                0, 255, (4, 32, 32, 3)).astype(np.uint8))
    if sidecar is not None:
        (d / "clip.txt").write_text(sidecar)


def test_cli_refuses_prompt_without_tokenizer(tmp_path, caplog):
    from imagine360_tpu import cli
    _write_video(tmp_path, sidecar="a red ball")
    cfgp = _write_cfg(tmp_path)
    cli.main(["--config", str(cfgp), "--platform", "cpu"])
    # refused before building models or writing any outputs
    out = tmp_path / "out"
    assert not out.exists() or not any(out.glob("*_output.*"))


def test_cli_allow_unconditioned_escape_hatch(tmp_path):
    """allow_unconditioned: true (or --tiny) lets the weightless smoke run
    proceed past the guard. We only check the guard logic here (full tiny
    e2e is tests/test_pipeline_e2e.py + the verify recipe)."""
    from imagine360_tpu.config import RunConfig
    cfgp = _write_cfg(tmp_path, allow_unconditioned=True, prompt="hello")
    cfg = RunConfig.from_yaml(str(cfgp))
    assert cfg.allow_unconditioned and cfg.prompt == "hello"
