"""PyTorch checkpoint -> Flax params conversion.

Handles the reference's three checkpoint families
(reference inference_dual_p2e.py:175-250, 425-440):
  - per-branch UNet checkpoints ({'state_dict': ...}, 'module.' prefixes)
  - the MVModel checkpoint (cp_blocks_* WarpAttn weights)
  - motion-LoRA checkpoints merged as W += alpha * up @ down
plus HF-format AutoencoderKL / CLIP weights.

The mapping is mechanical because the Flax modules mirror torch names:
dots in indexed module lists become underscores (down_blocks.0 ->
down_blocks_0), Linear weights transpose, Conv weights go OIHW -> HWIO,
norm weight -> scale. Dead reference weights (mv_attn, buffers) are dropped.
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, Mapping

import numpy as np

# state-dict entries that are buffers or dead weights, never converted
_SKIP_PATTERNS = (
    r"\.pos_encoder\.pe$",
    r"\.freq_bands$",
    r"(^|\.)mv_attn\.",
    r"num_batches_tracked$",
)

# module-list index flattening: "name.3." -> "name_3."
_LIST_NAMES = (
    "down_blocks", "up_blocks", "resnets", "attentions", "motion_modules",
    "downsamplers", "upsamplers", "transformer_blocks", "attention_blocks",
    "norms", "cp_blocks_encoder", "cp_blocks_decoder", "layers", "net",
    "to_out",
)


def _to_numpy(t):
    try:
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def strip_prefix(state: Mapping[str, object], prefix: str = "module.") -> dict:
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in state.items()}


def _flatten_indices(key: str) -> str:
    for name in _LIST_NAMES:
        key = re.sub(rf"(^|\.)({name})\.(\d+)", rf"\1\2_\3", key)
    return key


def _fixups(key: str) -> str:
    """Model-specific renames between reference torch and our Flax tree."""
    # GEGLU feed-forward: ff.net_0.proj -> ff.net_0_proj
    key = key.replace(".net_0.proj.", ".net_0_proj.")
    # motion module: VanillaTemporalModule wraps a TemporalTransformer3DModel
    # (reference motion_module.py:72); ours flattens that level
    key = key.replace(".temporal_transformer.", ".")
    # motion module: VersatileAttention is the module itself in torch; ours
    # nests the generic Attention under .attn
    key = re.sub(r"(attention_blocks_\d+)\.(to_q|to_k|to_v|to_out)",
                 r"\1.attn.\2", key)
    # resampler perceiver layers: layers.i.0 / layers.i.1 module pairs
    key = re.sub(r"layers_(\d+)\.0\.", r"layers_\1_0.", key)
    key = re.sub(r"layers_(\d+)\.1\.", r"layers_\1_1.", key)
    # sequential FF inside resampler/temporal projection: indices -> net_i
    key = re.sub(r"(layers_\d+_1)\.(\d+)\.", r"\1.net_\2.", key)
    key = re.sub(r"\.(ff|ff_2)\.(\d+)\.", r".\1.net_\2.", key)
    # WarpAttn CrossAttention uses a bare to_out Linear (src/modules/
    # transformer.py:55); diffusers uses to_out.0 — both map to to_out_0
    key = re.sub(r"\.attn1\.to_out\.(weight|bias)$",
                 r".attn1.to_out_0.\1", key)
    key = re.sub(r"\.to_out_0\.0\.", r".to_out_0.", key)  # after flattening
    return key


def _leaf(path_key: str, arr: np.ndarray, is_groupnorm_or_layernorm: bool):
    """Map a torch parameter name+tensor to (flax leaf name, array)."""
    if path_key.endswith(".weight"):
        base = path_key[:-len(".weight")]
        if arr.ndim == 4:   # conv OIHW -> HWIO
            return base + ".kernel", np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:   # linear [out, in] -> [in, out]
            return base + ".kernel", np.transpose(arr, (1, 0))
        return base + ".scale", arr  # norm
    if path_key.endswith(".bias"):
        return path_key, arr
    return path_key, arr  # e.g. resampler "latents"


# norms whose Flax module nests a flax GroupNorm under "norm"
_GROUPNORM_WRAPPED = re.compile(
    r"(norm1|norm2|conv_norm_out|\bnorm)\.(scale|bias)$")


def convert_state_dict(state: Mapping[str, object],
                       groupnorm_modules: Iterable[str] = (
                           "norm1", "norm2", "conv_norm_out", "norm"),
                       ) -> Dict[str, np.ndarray]:
    """torch state_dict -> flat {'a.b.c': array} flax-style params.

    GroupNorm leaves get the extra '.norm.' level our GroupNorm wrapper
    introduces; which names are GroupNorms differs per model, so callers
    pass the module names (LayerNorms keep flat scale/bias).
    """
    out = {}
    gset = set(groupnorm_modules)
    for k, v in state.items():
        if any(re.search(p, k) for p in _SKIP_PATTERNS):
            continue
        arr = _to_numpy(v)
        key = _fixups(_flatten_indices(k))
        key, arr = _leaf(key, arr, False)
        # temporal projection patch embed conv stores flat params
        # (TemporalProjection in models/resampler.py)
        key = key.replace("patch_embed.kernel", "patch_embed_kernel")
        key = key.replace("patch_embed.bias", "patch_embed_bias")
        parts = key.split(".")
        # insert the GroupNorm wrapper level: <mod>.scale -> <mod>.norm.scale
        if len(parts) >= 2 and parts[-1] in ("scale", "bias") \
                and parts[-2] in gset and arr.ndim == 1:
            # LayerNorms share names like norm1/norm2 in transformer blocks;
            # disambiguate by where they live: GroupNorms only exist in
            # resnet blocks (norm1/norm2), Transformer/Motion 'norm', and
            # conv_norm_out.
            parent = parts[-3] if len(parts) >= 3 else ""
            is_group = (
                (parts[-2] in ("norm1", "norm2") and "resnets" in key)
                or parts[-2] == "conv_norm_out"
                or (parts[-2] == "norm" and (
                    "attentions" in parent or "motion_modules" in parent
                    or parent.startswith("attentions")
                    or parent.startswith("motion_modules")))
            )
            if is_group:
                parts = parts[:-1] + ["norm", parts[-1]]
        out[".".join(parts)] = arr
    return out


def unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def flatten_params(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def merge_lora(state: Dict[str, object], lora_state: Mapping[str, object],
               alpha: float = 1.0) -> Dict[str, object]:
    """Merge diffusers-style LoRA pairs into base weights:
    W += alpha * up @ down (reference inference_dual_p2e.py:175-195
    unet_load_diffusers_lora)."""
    out = dict(state)
    ups = {k: v for k, v in lora_state.items() if ".up.weight" in k
           or "lora.up" in k or k.endswith("lora_up.weight")}
    for up_key, up in ups.items():
        down_key = (up_key.replace(".up.", ".down.")
                    .replace("lora_up", "lora_down"))
        base_key = (up_key.replace(".lora.up.weight", ".weight")
                    .replace("_lora.up.weight", ".weight")
                    .replace(".lora_up.weight", ".weight")
                    .replace(".processor", ""))
        if down_key not in lora_state or base_key not in out:
            continue
        upm = _to_numpy(up)
        downm = _to_numpy(lora_state[down_key])
        out[base_key] = _to_numpy(out[base_key]) + alpha * (upm @ downm)
    return out


def convert_vae_state_dict(state: Mapping[str, object]) -> Dict[str, np.ndarray]:
    """AutoencoderKL torch state_dict -> our flax VAE params (flat).

    Handles both attention naming eras: the old query/key/value/proj_attn
    (vendored diffusers 0.11, reference diffusers/models/attention.py:510)
    and the modern to_q/to_k/to_v/to_out.0."""
    flat = convert_state_dict(state)
    out = {}
    for k, v in flat.items():
        # plain flax GroupNorms in the VAE (no wrapper level)
        k = k.replace("norm1.norm.", "norm1.").replace("norm2.norm.", "norm2.")
        k = k.replace("conv_norm_out.norm.", "conv_norm_out.")
        # flatten block lists into our single-level names
        k = k.replace("mid_block.resnets_", "mid_block_resnets_")
        k = k.replace("mid_block.attentions_", "mid_block_attentions_")
        k = re.sub(r"down_blocks_(\d+)\.resnets_", r"down_blocks_\1_resnets_", k)
        k = re.sub(r"down_blocks_(\d+)\.downsamplers_0\.conv",
                   r"down_blocks_\1_downsamplers_0_conv", k)
        k = re.sub(r"up_blocks_(\d+)\.resnets_", r"up_blocks_\1_resnets_", k)
        k = re.sub(r"up_blocks_(\d+)\.upsamplers_0\.conv",
                   r"up_blocks_\1_upsamplers_0_conv", k)
        # legacy attention names
        k = k.replace(".query.", ".to_q.").replace(".key.", ".to_k.")
        k = k.replace(".value.", ".to_v.").replace(".proj_attn.", ".to_out_0.")
        out[k] = v
    return out


def convert_temporal_vae_state_dict(
        state: Mapping[str, object]) -> Dict[str, np.ndarray]:
    """diffusers `AutoencoderKLTemporalDecoder` (the SVD temporal-decoder
    VAE the reference SR stage loads, reference
    sr/video_to_video_model.py:61-67) torch state_dict -> our flax
    AutoencoderKLTemporalDecoder params (flat).

    Encoder / quant_conv / spatial resblocks / mid attention flow through
    convert_vae_state_dict (identical naming, with the extra
    `spatial_res_block` module level). Temporal specifics:
      - temporal_res_block conv1/conv2 are Conv3d (3,1,1): weight
        [Co, Ci, 3, 1, 1] -> our flat 'convN_kernel' (3, Ci, Co) ('WIO')
      - a temporal conv_shortcut is Conv3d k=1 -> our Dense [Ci, Co]
      - time_mixer.mix_factor is NEGATED: the decoder's AlphaBlender runs
        with switch_spatial_to_temporal_mix=True, i.e.
        out = (1-sigmoid(m))*spatial + sigmoid(m)*temporal, while ours is
        out = sigmoid(m')*spatial + (1-sigmoid(m'))*temporal  =>  m' = -m
      - decoder.time_conv_out Conv3d (3,1,1) over the output frames ->
        flat decoder.time_conv_out_kernel / _bias
    """
    temporal: Dict[str, np.ndarray] = {}
    rest = {}
    for k, v in state.items():
        arr = _to_numpy(v)
        if k.endswith("time_mixer.mix_factor"):
            key = _flatten_indices(k[: -len(".time_mixer.mix_factor")])
            key = key.replace("mid_block.resnets_", "mid_block_resnets_")
            key = re.sub(r"up_blocks_(\d+)\.resnets_",
                         r"up_blocks_\1_resnets_", key)
            temporal[key + ".mix_factor"] = -arr.reshape(())
        elif arr.ndim == 5:                      # Conv3d weights
            key = _flatten_indices(k)
            key = key.replace("mid_block.resnets_", "mid_block_resnets_")
            key = re.sub(r"up_blocks_(\d+)\.resnets_",
                         r"up_blocks_\1_resnets_", key)
            co, ci, kt = arr.shape[:3]
            if key.endswith("conv_shortcut.weight"):     # k=1 -> Dense
                temporal[key[: -len(".weight")] + ".kernel"] = (
                    arr.reshape(co, ci).transpose(1, 0))
            else:                                        # (3,1,1) temporal
                base = key[: -len(".weight")]
                base = (base.replace(".conv1", ".conv1_kernel")
                        .replace(".conv2", ".conv2_kernel")
                        .replace(".time_conv_out", ".time_conv_out_kernel"))
                temporal[base] = arr.reshape(co, ci, kt).transpose(2, 1, 0)
        elif ".temporal_res_block.conv" in k and k.endswith(".bias") \
                and ".conv_shortcut." not in k:
            key = _flatten_indices(k[: -len(".bias")])
            key = key.replace("mid_block.resnets_", "mid_block_resnets_")
            key = re.sub(r"up_blocks_(\d+)\.resnets_",
                         r"up_blocks_\1_resnets_", key)
            temporal[key + "_bias"] = arr
        elif k.endswith("time_conv_out.bias"):
            temporal[_flatten_indices(k[: -len(".bias")]) + "_bias"] = arr
        else:
            rest[k] = v
    out = convert_vae_state_dict(rest)
    out.update(temporal)
    return out


def apply_converted(params_tree: dict, flat_converted: Mapping[str, np.ndarray],
                    strict: bool = False):
    """Copy converted arrays into an init'd flax params tree (shape-checked).
    Returns (new_tree, missing_keys, unexpected_keys)."""
    import jax

    flat_init = flatten_params(params_tree["params"]
                               if "params" in params_tree else params_tree)
    missing = [k for k in flat_init if k not in flat_converted]
    unexpected = [k for k in flat_converted if k not in flat_init]
    if strict and (missing or unexpected):
        raise ValueError(f"missing={missing[:10]} unexpected={unexpected[:10]}")
    new_flat = {}
    for k, v in flat_init.items():
        if k in flat_converted:
            src = flat_converted[k]
            if src.shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: {src.shape} vs {v.shape}")
            new_flat[k] = src.astype(np.asarray(v).dtype)
        else:
            new_flat[k] = v
    tree = unflatten(new_flat)
    if "params" in params_tree:
        return {"params": tree}, missing, unexpected
    return tree, missing, unexpected
