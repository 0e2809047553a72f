"""Numerical golden for the SAM ViT image encoder (models/sam.py).

segment_anything is not installed in this environment, so the reference
forward is written here from the official SAM ViT-B semantics (windowed
attention with decomposed relative positions, exact-GELU MLP, conv neck
with channel LayerNorm) in plain torch, reading weights from a
segment_anything-format state_dict. This pins both the numerics of
SAMImageEncoder and the key mapping of convert_sam_encoder
(reference usage: inference_dual_p2e.py:366-375).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

from imagine360_tpu.models.sam import (SAMConfig, SAMImageEncoder,
                                       convert_sam_encoder)
from imagine360_tpu.utils.convert import apply_converted

CFG = SAMConfig(img_size=64, patch_size=8, embed_dim=32, depth=3,
                num_heads=4, mlp_ratio=2.0, out_chans=16, window_size=3,
                global_attn_indexes=(1,),
                global_q_rows=2)  # exercises the query-row-chunked path
GRID = CFG.img_size // CFG.patch_size  # 8; window 3 forces pad-to-9


def _fake_state_dict(rng):
    """Random segment_anything-style image_encoder.* checkpoint."""
    c = CFG
    hd = c.embed_dim // c.num_heads
    sd = {}

    def t(*shape, scale=0.2):
        return torch.from_numpy(
            rng.normal(size=shape).astype(np.float32) * scale)

    sd["patch_embed.proj.weight"] = t(c.embed_dim, 3, c.patch_size,
                                      c.patch_size)
    sd["patch_embed.proj.bias"] = t(c.embed_dim)
    sd["pos_embed"] = t(1, GRID, GRID, c.embed_dim)
    for i in range(c.depth):
        p = f"blocks.{i}."
        size = GRID if i in c.global_attn_indexes else c.window_size
        sd[p + "norm1.weight"] = 1 + t(c.embed_dim)
        sd[p + "norm1.bias"] = t(c.embed_dim)
        sd[p + "attn.qkv.weight"] = t(3 * c.embed_dim, c.embed_dim)
        sd[p + "attn.qkv.bias"] = t(3 * c.embed_dim)
        sd[p + "attn.proj.weight"] = t(c.embed_dim, c.embed_dim)
        sd[p + "attn.proj.bias"] = t(c.embed_dim)
        sd[p + "attn.rel_pos_h"] = t(2 * size - 1, hd)
        sd[p + "attn.rel_pos_w"] = t(2 * size - 1, hd)
        sd[p + "norm2.weight"] = 1 + t(c.embed_dim)
        sd[p + "norm2.bias"] = t(c.embed_dim)
        hidden = int(c.embed_dim * c.mlp_ratio)
        sd[p + "mlp.lin1.weight"] = t(hidden, c.embed_dim)
        sd[p + "mlp.lin1.bias"] = t(hidden)
        sd[p + "mlp.lin2.weight"] = t(c.embed_dim, hidden)
        sd[p + "mlp.lin2.bias"] = t(c.embed_dim)
    sd["neck.0.weight"] = t(c.out_chans, c.embed_dim, 1, 1)
    sd["neck.1.weight"] = 1 + t(c.out_chans)
    sd["neck.1.bias"] = t(c.out_chans)
    sd["neck.2.weight"] = t(c.out_chans, c.out_chans, 3, 3)
    sd["neck.3.weight"] = 1 + t(c.out_chans)
    sd["neck.3.bias"] = t(c.out_chans)
    return {"image_encoder." + k: v for k, v in sd.items()}


# ---- independent torch forward (official SAM ViT semantics) ----

def _get_rel_pos_t(q_size, k_size, rel_pos):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = tF.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear",
        ).reshape(-1, max_rel_dist).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


def _attn_t(x, sd, prefix, size):
    """x [B, H, W, C] -> [B, H, W, C] with decomposed rel-pos attention."""
    c = CFG
    B, H, W, C = x.shape
    nh, hd = c.num_heads, C // c.num_heads
    qkv = x.reshape(B, H * W, C) @ sd[prefix + "attn.qkv.weight"].T \
        + sd[prefix + "attn.qkv.bias"]
    qkv = qkv.reshape(B, H * W, 3, nh, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, B * nh, H * W, hd).unbind(0)
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    Rh = _get_rel_pos_t(H, H, sd[prefix + "attn.rel_pos_h"])
    Rw = _get_rel_pos_t(W, W, sd[prefix + "attn.rel_pos_w"])
    r_q = q.reshape(B * nh, H, W, hd)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (attn.view(B * nh, H, W, H, W) + rel_h[..., None]
            + rel_w[:, :, :, None, :]).view(B * nh, H * W, H * W)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).view(B, nh, H * W, hd).permute(0, 2, 1, 3)
    out = out.reshape(B, H, W, C)
    return out @ sd[prefix + "attn.proj.weight"].T \
        + sd[prefix + "attn.proj.bias"]


def _forward_t(x_np, sd_full):
    sd = {k[len("image_encoder."):]: v for k, v in sd_full.items()}
    c = CFG
    ws = c.window_size
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    h = tF.conv2d(x, sd["patch_embed.proj.weight"],
                  sd["patch_embed.proj.bias"], stride=c.patch_size)
    h = h.permute(0, 2, 3, 1) + sd["pos_embed"]
    for i in range(c.depth):
        p = f"blocks.{i}."
        shortcut = h
        hh = tF.layer_norm(h, (c.embed_dim,), sd[p + "norm1.weight"],
                           sd[p + "norm1.bias"], eps=1e-6)
        if i not in c.global_attn_indexes:
            B, H, W, C = hh.shape
            ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
            hh = tF.pad(hh, (0, 0, 0, pw, 0, ph))
            Hp, Wp = H + ph, W + pw
            hh = hh.view(B, Hp // ws, ws, Wp // ws, ws, C)
            hh = hh.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
            hh = _attn_t(hh, sd, p, ws)
            hh = hh.view(B, Hp // ws, Wp // ws, ws, ws, C)
            hh = hh.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            hh = hh[:, :H, :W]
        else:
            hh = _attn_t(hh, sd, p, hh.shape[1])
        h = shortcut + hh
        hh = tF.layer_norm(h, (c.embed_dim,), sd[p + "norm2.weight"],
                           sd[p + "norm2.bias"], eps=1e-6)
        hh = hh @ sd[p + "mlp.lin1.weight"].T + sd[p + "mlp.lin1.bias"]
        hh = tF.gelu(hh)
        hh = hh @ sd[p + "mlp.lin2.weight"].T + sd[p + "mlp.lin2.bias"]
        h = h + hh

    def ln2d(x, w, b):
        mu = x.mean(dim=-1, keepdim=True)
        var = ((x - mu) ** 2).mean(dim=-1, keepdim=True)
        return (x - mu) / torch.sqrt(var + 1e-6) * w + b

    h = tF.conv2d(h.permute(0, 3, 1, 2), sd["neck.0.weight"]
                  ).permute(0, 2, 3, 1)
    h = ln2d(h, sd["neck.1.weight"], sd["neck.1.bias"])
    h = tF.conv2d(h.permute(0, 3, 1, 2), sd["neck.2.weight"],
                  padding=1).permute(0, 2, 3, 1)
    h = ln2d(h, sd["neck.3.weight"], sd["neck.3.bias"])
    return h.numpy()


def test_sam_encoder_golden():
    rng = np.random.default_rng(0)
    sd = _fake_state_dict(rng)
    x = rng.normal(size=(2, CFG.img_size, CFG.img_size, 3)
                   ).astype(np.float32)

    with torch.no_grad():
        ref = _forward_t(x, sd)

    model = SAMImageEncoder(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    flat = convert_sam_encoder(sd)
    params, missing, unexpected = apply_converted(params, flat)
    assert not missing, missing[:10]
    assert not unexpected, unexpected[:10]

    out = np.asarray(model.apply(params, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sam_rel_pos_resize_path():
    """The resize branch of _get_rel_pos (hit when a checkpoint's rel-pos
    table length differs from 2*size-1) must match torch linear interp."""
    from imagine360_tpu.models.sam import _get_rel_pos
    rng = np.random.default_rng(1)
    table = rng.normal(size=(9, 4)).astype(np.float32)   # needs 2*6-1=11
    ours = np.asarray(_get_rel_pos(6, 6, jnp.asarray(table)))
    theirs = _get_rel_pos_t(6, 6, torch.from_numpy(table)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
