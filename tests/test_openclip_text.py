"""SR text conditioning (VERDICT r4 missing #3): the open_clip-format
converter + CLIPTextModel must reproduce FrozenOpenCLIPEmbedder's
penultimate-layer text encoding (reference sr/video_to_video_model.py:
36-38,74,118). The torch reference below re-implements open_clip's
ResidualAttentionBlock stack (pre-LN, fused in_proj qkv, causal mask,
exact GELU, run to len(resblocks)-1 then ln_final) directly from its
state-dict naming, with random weights."""
import numpy as np
import pytest
import torch

from imagine360_tpu.models.clip_text import (CLIPTextConfig, CLIPTextModel,
                                             convert_openclip_text)

V, D, H, LAYERS, CTX, FF = 100, 32, 2, 3, 8, 64


def _openclip_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {"token_embedding.weight": r(V, D),
          "positional_embedding": r(CTX, D),
          "ln_final.weight": 1 + 0.1 * r(D), "ln_final.bias": 0.1 * r(D),
          # non-text keys the converter must skip
          "logit_scale": torch.tensor(4.6),
          "text_projection": r(D, D),
          "visual.conv1.weight": r(8, 3, 2, 2),
          "attn_mask": torch.zeros(CTX, CTX)}
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}."
        sd.update({
            p + "ln_1.weight": 1 + 0.1 * r(D), p + "ln_1.bias": 0.1 * r(D),
            p + "attn.in_proj_weight": r(3 * D, D),
            p + "attn.in_proj_bias": 0.1 * r(3 * D),
            p + "attn.out_proj.weight": r(D, D),
            p + "attn.out_proj.bias": 0.1 * r(D),
            p + "ln_2.weight": 1 + 0.1 * r(D), p + "ln_2.bias": 0.1 * r(D),
            p + "mlp.c_fc.weight": r(FF, D), p + "mlp.c_fc.bias": 0.1 * r(FF),
            p + "mlp.c_proj.weight": r(D, FF),
            p + "mlp.c_proj.bias": 0.1 * r(D)})
    return sd


def _torch_penultimate_encode(sd, ids):
    """open_clip encode_with_transformer at layer='penultimate'."""
    x = sd["token_embedding.weight"][torch.as_tensor(ids)]
    x = x + sd["positional_embedding"]
    causal = torch.full((CTX, CTX), float("-inf")).triu(1)

    def ln(x, w, b):
        return torch.nn.functional.layer_norm(x, (D,), w, b, eps=1e-5)

    for i in range(LAYERS - 1):          # penultimate: skip the last block
        p = f"transformer.resblocks.{i}."
        h = ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        qkv = h @ sd[p + "attn.in_proj_weight"].T + sd[p + "attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        B, S, _ = q.shape
        hd = D // H

        def heads(t):
            return t.reshape(B, S, H, hd).permute(0, 2, 1, 3)

        logits = heads(q) @ heads(k).transpose(-1, -2) * hd ** -0.5 + causal
        attn = torch.softmax(logits, dim=-1) @ heads(v)
        attn = attn.permute(0, 2, 1, 3).reshape(B, S, D)
        x = x + attn @ sd[p + "attn.out_proj.weight"].T \
            + sd[p + "attn.out_proj.bias"]
        h = ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        h = torch.nn.functional.gelu(h @ sd[p + "mlp.c_fc.weight"].T
                                     + sd[p + "mlp.c_fc.bias"])
        x = x + h @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
    return ln(x, sd["ln_final.weight"], sd["ln_final.bias"])


@pytest.fixture(scope="module")
def setup():
    import jax
    sd = _openclip_state_dict()
    cfg = CLIPTextConfig(vocab_size=V, hidden_size=D,
                         num_layers=LAYERS - 1, num_heads=H,
                         intermediate_size=FF, max_position_embeddings=CTX)
    model = CLIPTextModel(cfg)
    ids = np.asarray([[1, 5, 7, 99, 42, 0, 0, 0],
                      [2, 3, 4, 5, 6, 7, 8, 9]], np.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    flat = convert_openclip_text(sd, num_layers=LAYERS - 1)
    return sd, model, params, flat, ids


def test_converter_maps_every_param(setup):
    from imagine360_tpu.utils.convert import apply_converted
    _, _, params, flat, _ = setup
    _, missing, unexpected = apply_converted(params, flat)
    assert not missing, missing
    assert not unexpected, unexpected


def test_penultimate_encoding_golden(setup):
    from imagine360_tpu.utils.convert import apply_converted
    sd, model, params, flat, ids = setup
    params, _, _ = apply_converted(params, flat)
    got = np.asarray(model.apply(params, ids))
    want = _torch_penultimate_encode(sd, ids).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_openclip_tokenize_zero_pads():
    from imagine360_tpu.models.clip_text import openclip_tokenize

    class FakeTok:
        def __call__(self, text, truncation, max_length, add_special_tokens):
            assert truncation and add_special_tokens
            return {"input_ids": [49406, 320, 1929, 49407]}

    out = openclip_tokenize(FakeTok(), "a dog", context_length=8)
    assert out.tolist() == [49406, 320, 1929, 49407, 0, 0, 0, 0]
    assert out.dtype == np.int32
