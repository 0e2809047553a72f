"""CLIP text encoder golden parity (vs transformers torch, tiny config) and
SAM encoder shape/window tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_clip_text_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=77, hidden_act="gelu")
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    ids = np.array([[1, 5, 9, 3, 2, 0, 0, 0]], np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))
                 ).last_hidden_state.numpy()

    from imagine360_tpu.models.clip_text import (CLIPTextModel,
                                                 CLIPTextConfig,
                                                 convert_hf_clip_text)
    from imagine360_tpu.utils.convert import apply_converted

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64)
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    flat = convert_hf_clip_text(hf.state_dict())
    params, missing, unexpected = apply_converted(params, flat)
    assert not missing, missing[:8]

    out = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_sam_encoder_shapes():
    from imagine360_tpu.models.sam import SAMImageEncoder, SAMConfig

    cfg = SAMConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=4, out_chans=16, window_size=2,
                    global_attn_indexes=(1,))
    model = SAMImageEncoder(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_sam_preprocess():
    from imagine360_tpu.models.sam import sam_preprocess
    u8 = np.full((2, 512, 1024, 3), 128, np.uint8)
    out = sam_preprocess(u8)
    assert out.shape == (2, 1024, 1024, 3)
    # padded region is exactly zero
    assert np.abs(out[:, 512:]).max() == 0.0
