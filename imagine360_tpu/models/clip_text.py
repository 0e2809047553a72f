"""CLIP text encoder (OpenCLIP ViT-H text tower used by SD2.1) in Flax.

The reference loads transformers' CLIPTextModel
(reference inference_dual_p2e.py:386-388) and uses its last_hidden_state as
the 77x1024 prompt conditioning
(reference pipeline_animation_inference_dual.py:235-239). This is a plain
pre-LN causal transformer; re-implemented natively so prompt encoding also
runs on TPU under the same jit as the sampler when desired.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .layers import Dtype, LayerNorm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"   # SD2.1 (SD1.x uses quick_gelu)
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        B, S, D = x.shape
        H = c.num_heads
        hd = D // H
        q = nn.Dense(D, dtype=c.jdtype, name="q_proj")(x)
        k = nn.Dense(D, dtype=c.jdtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=c.jdtype, name="v_proj")(x)
        o = dot_product_attention(
            q.reshape(B, S, H, hd), k.reshape(B, S, H, hd),
            v.reshape(B, S, H, hd), bias=mask)
        return nn.Dense(D, dtype=c.jdtype, name="out_proj")(
            o.reshape(B, S, D))


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = LayerNorm(epsilon=c.layer_norm_eps, dtype=c.jdtype,
                      name="layer_norm1")(x)
        x = CLIPAttention(c, name="self_attn")(h, mask) + x
        h = LayerNorm(epsilon=c.layer_norm_eps, dtype=c.jdtype,
                      name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.jdtype, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=c.jdtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids):
        """input_ids [B, S] int32 -> last_hidden_state [B, S, D]."""
        c = self.cfg
        B, S = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.jdtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_position_embeddings, c.hidden_size))
        x = tok + pos[None, :S].astype(tok.dtype)
        # causal mask
        causal = jnp.tril(jnp.ones((S, S), bool))
        bias = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)
        bias = bias[None, None]
        for i in range(c.num_layers):
            x = CLIPLayer(c, name=f"layers_{i}")(x, bias)
        return LayerNorm(epsilon=c.layer_norm_eps, dtype=c.jdtype,
                         name="final_layer_norm")(x)


def convert_openclip_text(state_dict, num_layers: int = 23) -> dict:
    """open_clip-format ViT-H text tower -> flat flax params for
    CLIPTextModel.

    The reference SR encodes prompts with FrozenOpenCLIPEmbedder
    (reference sr/video_to_video_model.py:36-38,74,118), i.e. open_clip
    ViT-H-14's text transformer run to the PENULTIMATE block (23 of 24)
    followed by ln_final — mathematically identical to the SD2.1
    CLIPTextModel this module implements. This converter maps open_clip
    naming (token_embedding.weight, transformer.resblocks.N.*, ln_final)
    onto the flax tree, splits the fused in_proj qkv, DROPS resblocks
    >= num_layers (penultimate semantics) and the non-text keys
    (visual.*, logit_scale, text_projection, attn_mask).
    """
    import re

    from ..utils.convert import _to_numpy

    out = {}
    for k, v in state_dict.items():
        if k.startswith("model."):       # FrozenOpenCLIPEmbedder prefix
            k = k[len("model."):]
        if (k.startswith("visual.") or k in ("logit_scale",
                                             "text_projection", "attn_mask")
                or k.endswith(".attn_mask")):
            continue
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", k)
        arr = _to_numpy(v)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            if i >= num_layers:
                continue                  # penultimate: skip final block(s)
            base = f"layers_{i}."
            if rest == "attn.in_proj_weight":
                for name, part in zip(("q_proj", "k_proj", "v_proj"),
                                      np.split(arr, 3, axis=0)):
                    out[base + f"self_attn.{name}.kernel"] = part.T
                continue
            if rest == "attn.in_proj_bias":
                for name, part in zip(("q_proj", "k_proj", "v_proj"),
                                      np.split(arr, 3, axis=0)):
                    out[base + f"self_attn.{name}.bias"] = part
                continue
            rest = rest.replace("attn.out_proj", "self_attn.out_proj")
            rest = rest.replace("ln_1", "layer_norm1")
            rest = rest.replace("ln_2", "layer_norm2")
            rest = rest.replace("mlp.c_fc", "fc1")
            rest = rest.replace("mlp.c_proj", "fc2")
            k = base + rest
        else:
            k = k.replace("token_embedding.weight",
                          "token_embedding.embedding")
            k = k.replace("positional_embedding", "position_embedding")
            k = k.replace("ln_final", "final_layer_norm")
        if k.endswith(".weight"):
            base = k[:-len(".weight")]
            if arr.ndim == 2:
                out[base + ".kernel"] = arr.T
            elif "token_embedding" in k:   # pragma: no cover - renamed above
                out[base + ".embedding"] = arr
            else:
                out[base + ".scale"] = arr
        else:
            out[k] = arr
    return out


def openclip_tokenize(hf_tokenizer, text: str,
                      context_length: int = 77) -> np.ndarray:
    """open_clip.tokenize semantics via a HF CLIPTokenizer (same BPE vocab):
    [sot] + bpe(text) + [eot], then ZERO padding — open_clip pads with 0
    where HF/SD pads with the eos id; the reference SR conditions on
    open_clip's convention (sr/video_to_video_model.py:74)."""
    ids = hf_tokenizer(text, truncation=True, max_length=context_length,
                       add_special_tokens=True)["input_ids"]
    out = np.zeros((context_length,), np.int32)
    out[:len(ids)] = ids
    return out


def convert_hf_clip_text(state_dict) -> dict:
    """transformers CLIPTextModel state_dict -> flat flax params."""
    import re

    from ..utils.convert import _to_numpy

    out = {}
    for k, v in state_dict.items():
        arr = _to_numpy(v)
        k = k.replace("text_model.", "")
        k = k.replace("embeddings.token_embedding.weight",
                      "token_embedding.embedding")
        k = k.replace("embeddings.position_embedding.weight",
                      "position_embedding")
        k = re.sub(r"encoder\.layers\.(\d+)\.", r"layers_\1.", k)
        k = k.replace(".mlp.", ".")
        if k.endswith("position_ids"):
            continue
        if k.endswith(".weight"):
            base = k[:-len(".weight")]
            if arr.ndim == 2:
                out[base + ".kernel"] = arr.T
            else:
                out[base + ".scale"] = arr
        else:
            out[k] = arr
    return out
