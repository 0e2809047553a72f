"""Checkpoint loading/saving.

Reference checkpoint families (inference_dual_p2e.py:175-250, 425-440):
  - per-branch UNet ckpts: {'epoch','global_step','state_dict'} with
    'module.' DDP prefixes, loaded strict=False
  - motion-LoRA ckpts merged into base weights (W += alpha * up @ down)
  - MVModel ckpt for the WarpAttn coupling blocks
  - HF-format SD2.1 VAE / CLIP text / SAM ViT-B weights

This module converts any of those into our Flax trees and persists native
orbax checkpoints so subsequent loads skip torch entirely (the reference has
load-only checkpointing; we add save/resume as a first-class subsystem).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import convert as C


def _torch_load(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return C.strip_prefix(obj)


def _load_safetensors(path: str):
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_state_dict(path: str):
    """Load a torch .ckpt/.pt/.bin or .safetensors file as {name: ndarray}."""
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    return _torch_load(path)


def load_unet_branch(params_tree, ckpt_path: str,
                     lora_path: Optional[str] = None,
                     lora_alpha: float = 1.0, prefix: str = ""):
    """Load one UNet branch: base ckpt (+optional motion LoRA pre-merge)
    into an init'd flax tree (reference load_unetbranch,
    inference_dual_p2e.py:197-250)."""
    state = load_state_dict(ckpt_path)
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    if lora_path:
        lora = load_state_dict(lora_path)
        state = C.merge_lora(state, lora, alpha=lora_alpha)
    flat = C.convert_state_dict(state)
    return C.apply_converted(params_tree, flat)


def load_dual_model(params_tree, mv_ckpt_path: str,
                    pers_ckpt: Optional[str] = None,
                    pano_ckpt: Optional[str] = None,
                    pers_lora: Optional[str] = None,
                    pano_lora: Optional[str] = None,
                    lora_alpha_pers: float = 1.0,
                    lora_alpha_pano: float = 1.0):
    """Assemble the full DualUNet tree from the reference's three ckpt
    families. The MVModel ckpt may itself contain unet./pano_unet. copies;
    per-branch ckpts (applied after) take precedence via ordering."""
    merged = {}
    if mv_ckpt_path:
        merged.update(C.convert_state_dict(load_state_dict(mv_ckpt_path)))
    for branch, ck, lora, alpha in (
            ("unet", pers_ckpt, pers_lora, lora_alpha_pers),
            ("pano_unet", pano_ckpt, pano_lora, lora_alpha_pano)):
        if not ck:
            continue
        state = load_state_dict(ck)
        if lora:
            state = C.merge_lora(state, load_state_dict(lora), alpha=alpha)
        flat = C.convert_state_dict(state)
        merged.update({f"{branch}.{k}": v for k, v in flat.items()})
    return C.apply_converted(params_tree, merged)


# ---------------------------------------------------------------------------
# native orbax persistence (save + resume)
# ---------------------------------------------------------------------------


def save_orbax(tree, path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)
