"""SAM ViT-B image encoder in Flax (windowed ViT with decomposed relative
position attention + conv neck).

The reference uses segment_anything's SamPredictor purely as a frozen video
feature extractor: per-frame embeddings [F, 256, 64, 64] flattened to
[F, 4096, 256] feed the IP-plus conditioning path
(reference pipeline_animation_inference_dual.py:675-718,
inference_dual_p2e.py:366-375, image_hidden_size=256 in
configs/prompt-dual.yaml:43). Only the ViT-B image encoder is needed — no
prompt encoder / mask decoder.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Dtype, LayerNorm


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768            # ViT-B
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    # global-attention query-row chunking: the 64x64 token grid would
    # otherwise materialize [B*12, 4096, 4096] logits (24 GB at B=8 f32 —
    # OOMs a v5e chip). Chunks of `global_q_rows` grid rows bound the live
    # logits to [B*12, rows*64, 4096]; numerics identical. 0 disables.
    global_q_rows: int = 8
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Decomposed relative position lookup (SAM's get_rel_pos)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear resize along axis 0
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class SAMAttention(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, x, hw):
        # x: [B, H, W, C]
        c = self.cfg
        B, H, W, C = x.shape
        nh = c.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, dtype=c.jdtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * nh, H * W, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * hw - 1, hd))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * hw - 1, hd))
        Rh = _get_rel_pos(H, H, rel_pos_h).astype(q.dtype)   # [H, H, d]
        Rw = _get_rel_pos(W, W, rel_pos_w).astype(q.dtype)   # [W, W, d]
        scale = hd ** -0.5
        BH = q.shape[0]

        def attend(qr, Rhr):
            """qr [BH, rows, W, d], Rhr [rows, H, d] -> [BH, rows, W, d]."""
            rows = qr.shape[1]
            logits = jnp.einsum("brwd,bkd->brwk", qr * scale, k)
            rel_h = jnp.einsum("brwd,rkd->brwk", qr, Rhr)     # [BH,r,W,H]
            rel_w = jnp.einsum("brwd,wkd->brwk", qr, Rw)      # [BH,r,W,W]
            logits = (logits.reshape(BH, rows, W, H, W)
                      + rel_h[:, :, :, :, None]
                      + rel_w[:, :, :, None, :]).reshape(BH, rows, W, H * W)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum("brwk,bkd->brwd", p.astype(v.dtype), v)

        q4 = q.reshape(BH, H, W, hd)
        ch = c.global_q_rows
        if ch and H > ch and H % ch == 0:
            # scan over query-row chunks: live logits stay
            # [BH, ch, W, H*W] instead of [BH, H*W, H*W]
            qc = q4.reshape(BH, H // ch, ch, W, hd).transpose(1, 0, 2, 3, 4)
            Rc = Rh.reshape(H // ch, ch, H, hd)
            out = jax.lax.map(lambda args: attend(*args), (qc, Rc))
            out = out.transpose(1, 0, 2, 3, 4).reshape(B, nh, H * W, hd)
        else:
            out = attend(q4, Rh).reshape(B, nh, H * W, hd)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, dtype=c.jdtype, name="proj")(out)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class SAMBlock(nn.Module):
    cfg: SAMConfig
    window_size: int

    @nn.compact
    def __call__(self, x):
        from ..parallel.mesh import shard_views
        c = self.cfg
        # multi-chip: re-anchor the frame-axis sharding at every block (the
        # window partition reshapes are frame-major, so the constraint
        # survives them; no-op without an active mesh)
        x = shard_views(x)
        shortcut = x
        h = LayerNorm(epsilon=1e-6, dtype=c.jdtype, name="norm1")(x)
        if self.window_size > 0:
            H, W = h.shape[1], h.shape[2]
            h, pad_hw = _window_partition(h, self.window_size)
            h = SAMAttention(c, name="attn")(h, self.window_size)
            h = _window_unpartition(h, self.window_size, pad_hw, (H, W))
        else:
            h = SAMAttention(c, name="attn")(h, h.shape[1])
        x = shortcut + h
        h = LayerNorm(epsilon=1e-6, dtype=c.jdtype, name="norm2")(x)
        h = nn.Dense(int(c.embed_dim * c.mlp_ratio), dtype=c.jdtype,
                     name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.embed_dim, dtype=c.jdtype, name="mlp_lin2")(h)
        return x + h


class LayerNorm2d(nn.Module):
    """Channel layer norm over NHWC feature maps (SAM's LayerNorm2d)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + 1e-6)
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class SAMImageEncoder(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, x):
        """x [B, 1024, 1024, 3] (already mean/std normalized + padded) ->
        [B, 64, 64, 256]."""
        from ..parallel.mesh import shard_views
        c = self.cfg
        gh = c.img_size // c.patch_size
        # multi-chip: SAM runs per frame — shard the frame axis
        h = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=c.patch_size, padding="VALID", dtype=c.jdtype,
                    name="patch_embed_proj")(shard_views(x))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, gh, gh, c.embed_dim))
        h = h + pos.astype(h.dtype)
        for i in range(c.depth):
            ws = 0 if i in c.global_attn_indexes else c.window_size
            h = SAMBlock(c, ws, name=f"blocks_{i}")(h)
        h = nn.Conv(c.out_chans, (1, 1), use_bias=False, dtype=c.jdtype,
                    name="neck_0")(h)
        h = LayerNorm2d(c.jdtype, name="neck_1")(h)
        h = nn.Conv(c.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=c.jdtype, name="neck_2")(h)
        h = LayerNorm2d(c.jdtype, name="neck_3")(h)
        return h


SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def sam_preprocess(images_u8: np.ndarray, img_size: int = 1024) -> np.ndarray:
    """[F, H, W, 3] uint8 (long side already resized to 1024) ->
    normalized, zero-padded [F, 1024, 1024, 3] (SamPredictor.set_torch_image
    semantics)."""
    x = (images_u8.astype(np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    f, h, w, _ = x.shape
    out = np.zeros((f, img_size, img_size, 3), np.float32)
    out[:, :h, :w] = x
    return out


def convert_sam_encoder(state_dict) -> dict:
    """segment_anything ViT-B checkpoint ('image_encoder.*' keys) -> flat
    flax params for SAMImageEncoder."""
    import re

    from ..utils.convert import _to_numpy

    out = {}
    for k, v in state_dict.items():
        if not k.startswith("image_encoder."):
            continue
        k = k[len("image_encoder."):]
        arr = _to_numpy(v)
        k = re.sub(r"blocks\.(\d+)\.", r"blocks_\1.", k)
        k = k.replace("patch_embed.proj", "patch_embed_proj")
        k = re.sub(r"mlp\.lin(\d)", r"mlp_lin\1", k)
        k = re.sub(r"neck\.(\d)", r"neck_\1", k)
        if k == "pos_embed":
            out[k] = arr
            continue
        if k.endswith(".weight"):
            base = k[:-len(".weight")]
            if arr.ndim == 4:
                out[base + ".kernel"] = np.transpose(arr, (2, 3, 1, 0))
            elif arr.ndim == 2:
                out[base + ".kernel"] = arr.T
            elif "neck" in base:
                out[base + ".weight"] = arr  # LayerNorm2d keeps torch names
            else:
                out[base + ".scale"] = arr
        else:
            out[k] = arr
    return out
