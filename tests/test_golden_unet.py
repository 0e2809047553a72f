"""Golden parity: our Flax UNet vs the reference torch UNet (CPU, random
weights, tiny config). This is the keystone test: converted weights +
identical inputs must produce matching outputs."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

TINY_TORCH_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    block_out_channels=(32, 64, 64, 64),
    layers_per_block=2,
    attention_head_dim=(1, 2, 2, 2),
    cross_attention_dim=32,
    use_linear_projection=True,
    norm_num_groups=32,
    use_motion_module=True,
    motion_module_resolutions=(1, 2, 4, 8),
    motion_module_mid_block=True,
    motion_module_type="Vanilla",
    motion_module_kwargs=dict(
        num_attention_heads=8,
        num_transformer_block=1,
        attention_block_types=("Temporal_Self", "Temporal_Self"),
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=64,
        temporal_attention_dim_div=1,
        zero_initialize=True,
    ),
    unet_use_cross_frame_attention=False,
    unet_use_temporal_attention=False,
    use_fps_condition=True,
    use_relative_postions="WithAdapter",
    use_ip_plus_cross_attention=True,
    ip_plus_condition="video",
    num_tokens=8,
    use_adapter_temporal_projection=True,
    compress_video_features=True,
    image_hidden_size=8,
    image_cross_attention_dim=32,
    adapter_cross_attention_dim=32,
    use_outpaint=True,
    use_inflated_groupnorm=True,
)


def _tiny_jax_config():
    from imagine360_tpu.models.unet3d import UNet3DConfig
    return UNet3DConfig(
        block_out_channels=(32, 64, 64, 64),
        attention_heads=(1, 2, 2, 2),
        cross_attention_dim=32,
        image_cross_attention_dim=32,
        image_hidden_size=8,
        num_ip_tokens=8,
        resampler_dim=32, resampler_depth=4, resampler_heads=12,
        resampler_dim_head=64,
    )


def enable_stub_xformers(model):
    """The production config enables xformers
    (configs/prompt-dual.yaml:71); the IPCrossAttention legacy path would
    otherwise run softmax with scale=1.0 (its __init__ overwrites
    Attention.scale with the ip mixing scale — reference
    animatediff/models/attention.py:51). Our framework implements the
    xformers semantics (standard 1/sqrt(d))."""
    for mod in model.modules():
        if hasattr(mod, "_use_memory_efficient_attention_xformers"):
            mod._use_memory_efficient_attention_xformers = True


@pytest.fixture(scope="module")
def torch_unet():
    refshim.install()
    import torch
    torch.manual_seed(0)
    from animatediff.models.unet import UNet3DConditionModel as TorchUNet
    model = TorchUNet(**TINY_TORCH_KWARGS)
    model.eval()
    enable_stub_xformers(model)
    return model


def test_unet_single_branch_parity(torch_unet):
    refshim.install()
    import torch
    from imagine360_tpu.models.unet3d import UNet3DConditionModel
    from imagine360_tpu.utils.convert import (convert_state_dict,
                                              apply_converted)

    B, F, H, W = 1, 2, 16, 32
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(B, 9, F, H, W)).astype(np.float32)
    text = rng.normal(size=(B, 7, 32)).astype(np.float32)
    ref_feats = rng.normal(size=(B, 16, 16, 8)).astype(np.float32)
    t = np.array([500], np.int64)
    fps = np.array([8], np.int64)

    with torch.no_grad():
        out_t = torch_unet(
            torch.from_numpy(sample), torch.from_numpy(t),
            torch.from_numpy(text),
            use_ip_plus_cross_attention=True,
            reference_images_clip_feat=torch.from_numpy(ref_feats),
            use_fps_condition=True,
            fps_tensor=torch.from_numpy(fps),
        ).sample.numpy()

    cfg = _tiny_jax_config()
    model = UNet3DConditionModel(cfg)
    x = jnp.asarray(np.transpose(sample, (0, 2, 3, 4, 1)))  # BFHWC
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(t, jnp.float32),
                        jnp.asarray(text), jnp.asarray(fps, jnp.float32),
                        jnp.asarray(ref_feats))

    flat = convert_state_dict(torch_unet.state_dict())
    new_params, missing, unexpected = apply_converted(params, flat)
    assert not missing, f"missing: {missing[:8]}"
    # the relative-position adapter isn't exercised here (rel_pos=None), so
    # its params never materialize in the flax tree — allow only those
    leftover = [k for k in unexpected
                if not k.startswith(("add_cond_embedding", "cond_rp_proj"))]
    assert not leftover, f"unexpected: {leftover[:8]}"

    out_j = model.apply(new_params, x, jnp.asarray(t, jnp.float32),
                        jnp.asarray(text), jnp.asarray(fps, jnp.float32),
                        jnp.asarray(ref_feats))
    out_j = np.transpose(np.asarray(out_j), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)
