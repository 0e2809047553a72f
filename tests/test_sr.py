"""SR stage tests: tiled decode blending, wavelet color fix, DPM++ solver."""
import numpy as np
import jax
import jax.numpy as jnp

from imagine360_tpu.sr.tiled_decode import (tiled_chunked_decode,
                                            gaussian_weights_2d)
from imagine360_tpu.sr.wavelet_fix import wavelet_color_fix
from imagine360_tpu.diffusion.dpm import (make_dpm_schedule, dpmpp_2m_step)


def test_gaussian_weights_shape_and_symmetry():
    w = gaussian_weights_2d(16, 24)
    assert w.shape == (16, 24)
    np.testing.assert_allclose(w, w[::-1, ::-1], atol=1e-6)


def test_tiled_decode_identity_blend():
    """With an identity 'decoder', overlapping tiles must blend back to the
    input exactly (weights normalize out)."""
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(3, 16, 32, 4)).astype(np.float32))

    def fake_decode(z):  # identity up to channel slice, scale 1
        return z[..., :3]

    out = tiled_chunked_decode(fake_decode, lat, tile_hw=(8, 8),
                               overlap=0.5, chunk=2, scale=1,
                               pano_wrap=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat[..., :3]),
                               atol=1e-5)


def test_tiled_decode_pano_wrap_seam():
    """Wrap mode: a constant field decodes to a constant (no seam)."""
    lat = jnp.ones((2, 8, 24, 4))

    def fake_decode(z):
        return z[..., :3] * 2.0

    out = tiled_chunked_decode(fake_decode, lat, tile_hw=(8, 8),
                               overlap=0.25, chunk=2, scale=1,
                               pano_wrap=True)
    assert out.shape == (2, 8, 24, 3)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_wavelet_color_fix_transfers_low_freq():
    rng = np.random.default_rng(1)
    base = np.linspace(0, 1, 32)[None, None, :, None] * np.ones((1, 16, 32, 3))
    detail = rng.normal(size=(1, 16, 32, 3)) * 0.05
    target = jnp.asarray((base * 0.2 + detail + 0.4).astype(np.float32))
    source = jnp.asarray(base.astype(np.float32))
    fixed = np.asarray(wavelet_color_fix(target, source))
    # low-frequency content should now track the source ramp
    assert abs(fixed[..., 0].mean() - np.asarray(source)[..., 0].mean()) < 0.05


def test_dpmpp_2m_converges_with_perfect_model():
    """With an ideal v-prediction model, DPM++ 2M must land near x0."""
    sched = make_dpm_schedule(num_inference_steps=12)
    coeffs = {k: jnp.asarray(v) for k, v in sched.step_coeffs().items()}
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    x = coeffs["alpha"][0] * x0 + coeffs["sigma"][0] * eps

    x0_prev = jnp.zeros_like(x)
    for i in range(12):
        a, s = coeffs["alpha"][i], coeffs["sigma"][i]
        eps_t = (x - a * x0) / jnp.maximum(s, 1e-8)
        v = a * eps_t - s * x0
        x, x0_prev = dpmpp_2m_step(x, v, i, coeffs, x0_prev, "v_prediction")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=2e-2)


def test_temporal_decoder_vae():
    """SVD-style temporal decoder: shapes, single-video squeeze, and the
    learned alpha actually mixing the temporal path (perturbing one frame
    must bleed into its neighbours through the (3,1,1) convs)."""
    from imagine360_tpu.models.vae import VAEConfig
    from imagine360_tpu.models.vae_temporal import (
        AutoencoderKLTemporalDecoder)
    cfg = VAEConfig(block_out_channels=(32, 32), layers_per_block=1)
    vae = AutoencoderKLTemporalDecoder(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 16, 16, 3))      # 4 frames
    params = vae.init({"params": rng}, x, rng)
    z = vae.apply(params, x, rng, method=vae.sample)
    assert z.shape == (4, 8, 8, 4)   # 2 blocks -> f2
    dec = vae.apply(params, z, method=vae.decode)
    assert dec.shape == (4, 16, 16, 3)
    # batched videos
    dec_b = vae.apply(params, jnp.stack([z, z]), method=vae.decode)
    assert dec_b.shape == (2, 4, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(dec_b[0]), np.asarray(dec),
                               atol=1e-5)
    # temporal mixing: change only frame 0's latent; frame 1 must change
    # (temporal convs), frame 3 must not (receptive field 2 frames/conv
    # stack is local but >1)
    z2 = z.at[0].add(1.0)
    dec2 = vae.apply(params, z2, method=vae.decode)
    d_per_frame = np.abs(np.asarray(dec2) - np.asarray(dec)).reshape(
        4, -1).max(axis=1)
    assert d_per_frame[0] > 1e-3
    assert d_per_frame[1] > 1e-5   # neighbour frame sees the change


def test_enhancer_with_temporal_vae():
    """Full SR pass with the SVD-style temporal-decoder VAE as the decode
    stage (reference pairs VEnhancer's diffusion with
    AutoencoderKLTemporalDecoder; sr/video_to_video_model.py:61-67)."""
    from imagine360_tpu.models.vae import VAEConfig
    from imagine360_tpu.models.vae_temporal import (
        AutoencoderKLTemporalDecoder)
    from imagine360_tpu.sr.enhance import Video360Enhancer, EnhancerConfig
    cfg = VAEConfig(block_out_channels=(32, 32, 32, 32),  # f8 like SD
                    layers_per_block=1)
    vae = AutoencoderKLTemporalDecoder(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (3, 32, 64, 3))
    params = vae.init({"params": rng}, x0, rng)

    def denoise_fn(z, t, rng):  # perfect-noise predictor stand-in
        return jnp.zeros_like(z)

    enh = Video360Enhancer(
        denoise_fn, vae, params,
        EnhancerConfig(up_scale=2, num_steps=3, noise_aug=200,
                       pano_pad_px=8, chunk_frames=2, tile_hw=(6, 10),
                       color_fix=False))
    frames = np.random.default_rng(0).random((3, 16, 32, 3)).astype(
        np.float32)
    out = enh(frames, jax.random.PRNGKey(1))
    assert out.shape == (3, 32, 64, 3)
    assert np.isfinite(out).all()


def test_pano_refiner_engine_end_to_end():
    """The default SR engine: pano UNet branch as refiner (sr/refiner.py),
    conditioned on the clean upsampled clip through the 9-channel outpaint
    interface, driven by Video360Enhancer's noise-aug + DPM++ recipe."""
    from imagine360_tpu.models.unet3d import UNet3DConditionModel
    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    from imagine360_tpu.presets import tiny_unet_config
    from imagine360_tpu.sr.enhance import Video360Enhancer, EnhancerConfig
    from imagine360_tpu.sr.refiner import PanoRefiner, PanoRefinerConfig

    F, H, W = 4, 64, 64
    ucfg = tiny_unet_config()
    unet = UNet3DConditionModel(ucfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "ip_noise": jax.random.PRNGKey(1)}
    uparams = unet.init(rngs, jnp.zeros((1, F, 16, 24, 9)),
                        jnp.zeros((1,)), jnp.zeros((1, 7, 32)),
                        jnp.zeros((1,)))
    vae = AutoencoderKL(VAEConfig(block_out_channels=(16, 16, 16, 16),
                                  layers_per_block=1, norm_num_groups=16))
    vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       jax.random.PRNGKey(1))

    refiner = PanoRefiner(unet, uparams,
                          text_pos=jnp.zeros((7, 32)),
                          cfg=PanoRefinerConfig(guidance_scale=3.0))
    cfg = EnhancerConfig(up_scale=2, num_steps=4, noise_aug=600,
                         solver_mode="ode", pano_pad_px=32,
                         chunk_frames=2, tile_hw=(8, 8), color_fix=True)
    enhancer = Video360Enhancer(refiner, vae, vparams, cfg)

    rng = np.random.default_rng(0)
    frames = rng.uniform(0.2, 0.8, size=(F, H, W, 3)).astype(np.float32)
    out = enhancer(frames, jax.random.PRNGKey(1))
    assert out.shape == (F, H * 2, W * 2, 3)
    assert np.isfinite(out).all()
    assert out.std() > 1e-4
