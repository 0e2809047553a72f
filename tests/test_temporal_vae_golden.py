"""Numeric golden for the SVD temporal-decoder VAE (reference SR stage,
sr/video_to_video_model.py:61-67) without pip diffusers.

Modern diffusers (which ships `AutoencoderKLTemporalDecoder`) is NOT
installed in this environment and the vendored copy (0.11) predates it, so
a direct torch golden is impossible. These tests pin the numerics through
two torch-anchored routes instead:

1. identity-collapse golden: with every temporal conv2 zeroed, the
   mix blend is exact passthrough and `time_conv_out` set to the identity
   center-tap, the temporal decoder must reproduce the STANDARD decoder —
   which IS golden-tested against the vendored torch AutoencoderKL
   (tests/test_golden_vae.py). This validates all spatial wiring (conv_in,
   mid res/attn/res, up blocks, upsamplers, out head) numerically through a
   torch-verified path.
2. converter round-trip: a state dict in the published diffusers SVD
   naming — built by transforming a REAL vendored-torch AutoencoderKL
   state_dict (so encoder/spatial names are genuinely torch-produced) plus
   synthetic temporal entries — must convert with zero missing/unexpected
   keys, correct Conv3d (3,1,1) transposes, and the AlphaBlender
   switch-semantics mix negation.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")

CH = (32, 32, 32, 32)
LPB = 1
F, HH, WW = 4, 4, 8      # latent grid -> 32x64 output


def _tiny_cfg():
    from imagine360_tpu.models.vae import VAEConfig
    return VAEConfig(block_out_channels=CH, layers_per_block=LPB,
                     norm_num_groups=32)


def _tiny_torch_vae():
    refshim.install()
    from diffusers.models.vae import AutoencoderKL as TorchVAE
    import torch
    torch.manual_seed(3)
    vae = TorchVAE(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=CH, layers_per_block=LPB, latent_channels=4,
        norm_num_groups=32, sample_size=64).eval()
    # non-degenerate weights
    with torch.no_grad():
        for p in vae.parameters():
            if p.dim() >= 2:
                p.normal_(0, 0.05)
    return vae


def _svd_state_dict(tvae):
    """Transform a real torch AutoencoderKL state_dict into the diffusers
    `AutoencoderKLTemporalDecoder` naming: decoder resnets gain the
    `.spatial_res_block` level plus temporal siblings; post_quant_conv is
    dropped; time_conv_out appended."""
    import torch
    sd = {}
    temporal_added = set()
    for k, v in tvae.state_dict().items():
        if k.startswith("post_quant_conv"):
            continue    # SVD layout has no post-quant conv
        if k.startswith("decoder.") and ".resnets." in k:
            pre, post = k.split(".resnets.")
            idx, rest = post.split(".", 1)
            base = f"{pre}.resnets.{idx}"
            sd[f"{base}.spatial_res_block.{rest}"] = v
            if base not in temporal_added:
                temporal_added.add(base)
                c = 32  # all-32 tiny config
                g = torch.Generator().manual_seed(hash(base) % (2 ** 31))
                for conv in ("conv1", "conv2"):
                    sd[f"{base}.temporal_res_block.{conv}.weight"] = \
                        torch.randn((c, c, 3, 1, 1), generator=g) * 0.02
                    sd[f"{base}.temporal_res_block.{conv}.bias"] = \
                        torch.randn((c,), generator=g) * 0.02
                for norm in ("norm1", "norm2"):
                    sd[f"{base}.temporal_res_block.{norm}.weight"] = \
                        torch.ones((c,))
                    sd[f"{base}.temporal_res_block.{norm}.bias"] = \
                        torch.zeros((c,))
                sd[f"{base}.time_mixer.mix_factor"] = \
                    torch.randn((1,), generator=g)
        else:
            sd[k] = v
    sd["decoder.time_conv_out.weight"] = torch.randn((3, 3, 3, 1, 1)) * 0.02
    sd["decoder.time_conv_out.bias"] = torch.randn((3,)) * 0.02
    return sd


def test_temporal_vae_converter_roundtrip():
    from imagine360_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from imagine360_tpu.utils.convert import (convert_temporal_vae_state_dict,
                                              apply_converted)
    import torch

    tvae = _tiny_torch_vae()
    sd = _svd_state_dict(tvae)

    jvae = AutoencoderKLTemporalDecoder(_tiny_cfg())
    params = jvae.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                       jax.random.PRNGKey(1))
    conv = convert_temporal_vae_state_dict(sd)
    params, missing, unexpected = apply_converted(params, conv)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    # Conv3d transpose: torch [Co, Ci, kT, 1, 1] -> ours (kT, Ci, Co)
    w_t = sd["decoder.mid_block.resnets.0.temporal_res_block.conv1.weight"]
    w_j = conv["decoder.mid_block_resnets_0.temporal_res_block.conv1_kernel"]
    np.testing.assert_allclose(
        w_j, w_t.numpy().reshape(32, 32, 3).transpose(2, 1, 0), atol=0)

    # AlphaBlender switch semantics: sigmoid(ours) == 1 - sigmoid(torch)
    m_t = float(sd["decoder.mid_block.resnets.0.time_mixer.mix_factor"])
    m_j = float(conv["decoder.mid_block_resnets_0.mix_factor"])
    assert abs(1.0 / (1 + np.exp(-m_j)) - (1 - 1.0 / (1 + np.exp(-m_t)))) \
        < 1e-6

    # converted params must actually run
    z = jax.random.normal(jax.random.PRNGKey(2), (F, HH, WW, 4)) * 0.3
    out = jvae.apply(params, z, method=jvae.decode)
    assert out.shape == (F, HH * 8, WW * 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_decoder_identity_collapse_matches_standard_decoder():
    """Temporal conv2s zeroed + identity time_conv_out => the temporal
    decoder must equal the standard Decoder (torch-golden-tested in
    test_golden_vae.py) bit-closely, with weights converted from the SAME
    torch VAE."""
    import torch
    from imagine360_tpu.models.vae import AutoencoderKL, Decoder
    from imagine360_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from imagine360_tpu.utils.convert import (
        convert_vae_state_dict, convert_temporal_vae_state_dict,
        apply_converted)

    tvae = _tiny_torch_vae()
    sd = _svd_state_dict(tvae)
    # neutralize the temporal paths
    for k in list(sd):
        if ".temporal_res_block.conv2." in k:
            sd[k] = torch.zeros_like(sd[k])
    w = torch.zeros((3, 3, 3, 1, 1))
    w[:, :, 1, 0, 0] = torch.eye(3)          # center-tap identity
    sd["decoder.time_conv_out.weight"] = w
    sd["decoder.time_conv_out.bias"] = torch.zeros((3,))

    cfg = _tiny_cfg()
    jvae_t = AutoencoderKLTemporalDecoder(cfg)
    params_t = jvae_t.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                           jax.random.PRNGKey(1))
    params_t, missing, unexpected = apply_converted(
        params_t, convert_temporal_vae_state_dict(sd))
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    jvae_s = AutoencoderKL(cfg)
    params_s = jvae_s.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                           jax.random.PRNGKey(1))
    params_s, _, _ = apply_converted(
        params_s, convert_vae_state_dict(tvae.state_dict()))

    z = jax.random.normal(jax.random.PRNGKey(5), (F, HH, WW, 4)) * 0.4
    out_t = jvae_t.apply(params_t, z, method=jvae_t.decode)

    dec = Decoder(cfg)
    dec_params = {"params": params_s["params"]["decoder"]}
    out_s = dec.apply(dec_params, z)

    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_s),
                               atol=2e-5, rtol=1e-5)

    # and the encoders agree exactly (same converted weights, same module)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 64, 3)) * 0.4
    mean_t, logvar_t = jvae_t.apply(params_t, x, method=jvae_t.encode)
    mean_s, logvar_s = jvae_s.apply(params_s, x, method=jvae_s.encode)
    np.testing.assert_allclose(np.asarray(mean_t), np.asarray(mean_s),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(logvar_t), np.asarray(logvar_s),
                               atol=1e-6)
