"""Golden parity for the AutoencoderKL vs the vendored diffusers VAE
(tiny config, random weights, CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.skipif(not refshim.available(),
                                reason="reference repo not mounted")


def _vae_pair():
    refshim.install()
    import torch
    from diffusers.models.vae import AutoencoderKL as TorchVAE
    torch.manual_seed(0)
    tm = TorchVAE(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        block_out_channels=(32, 32, 64),
        layers_per_block=2, latent_channels=4, norm_num_groups=32,
        sample_size=64,
    )
    tm.eval()

    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    cfg = VAEConfig(block_out_channels=(32, 32, 64), layers_per_block=2)
    return tm, AutoencoderKL(cfg)


def _convert_vae(tm):
    from imagine360_tpu.utils.convert import convert_vae_state_dict
    return convert_vae_state_dict(tm.state_dict())


def test_vae_roundtrip_parity():
    import torch
    tm, jm = _vae_pair()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 64)).astype(np.float32) * 0.5

    with torch.no_grad():
        post = tm.encode(torch.from_numpy(x)).latent_dist
        mean_t = post.mean.numpy()
        logvar_t = post.logvar.numpy()
        dec_t = tm.decode(torch.from_numpy(mean_t)).sample.numpy()

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = jm.init(jax.random.PRNGKey(0), xj, jax.random.PRNGKey(1))

    from imagine360_tpu.utils.convert import apply_converted
    flat = _convert_vae(tm)
    params, missing, unexpected = apply_converted(params, flat)
    assert not missing, missing[:10]
    assert not unexpected, unexpected[:10]

    mean_j, logvar_j = jm.apply(params, xj, method=jm.encode)
    np.testing.assert_allclose(np.transpose(np.asarray(mean_j), (0, 3, 1, 2)),
                               mean_t, atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(logvar_j), (0, 3, 1, 2)), logvar_t, atol=1e-4)

    dec_j = jm.apply(params, jnp.asarray(np.transpose(mean_t, (0, 2, 3, 1))),
                     method=jm.decode)
    np.testing.assert_allclose(np.transpose(np.asarray(dec_j), (0, 3, 1, 2)),
                               dec_t, atol=2e-4)
