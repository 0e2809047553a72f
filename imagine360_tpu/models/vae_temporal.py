"""SVD-style temporal-decoder VAE for the super-resolution stage.

The reference SR pipeline decodes its refined latents with diffusers'
`AutoencoderKLTemporalDecoder` (reference sr/video_to_video_model.py:61-67,
`temporal_vae_decode` :166-167): a standard SD VAE encoder paired with a
decoder whose every resnet is a spatio-temporal pair — a per-frame spatial
resnet blended (learned alpha) with a frame-axis (3,1,1) temporal resnet —
plus a final 3-tap temporal conv over the output frames. That decoder is
what removes frame flicker from independently-refined frames.

The vendored diffusers copy in the reference repo (0.11.0) predates this
model, so there is no torch golden available in this environment; the
implementation follows the published SVD architecture (mid block: resnet,
attention, resnet; 4 up blocks of 3 spatio-temporal resnets; time_conv_out)
and is verified structurally (shapes, frame-mixing behavior) in
tests/test_sr.py.

Layout: video activations are [B, F, H, W, C] (frames explicit, NHWC per
frame); spatial convs fold F into the batch, temporal convs fold (H, W).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Dtype, _FastGN
from .vae import Encoder, VAEAttention, VAEConfig, VAEResnetBlock


class TemporalResnetBlock(nn.Module):
    """Frame-axis resnet: GroupNorm -> silu -> (3,1,1) conv, twice, with
    identity (or 1x1-projected) residual. [B, F, H, W, C]."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape

        def tconv(h, cout, name):
            ch = h.shape[-1]
            hp = h.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, ch)
            kernel = self.param(f"{name}_kernel",
                                nn.initializers.lecun_normal(),
                                (3, ch, cout), jnp.float32)
            bias = self.param(f"{name}_bias", nn.initializers.zeros,
                              (cout,), jnp.float32)
            y = jax.lax.conv_general_dilated(
                hp.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC")) \
                + bias.astype(self.dtype)
            return y.reshape(B, H, W, F, cout).transpose(0, 3, 1, 2, 4)

        # temporal_eps=1e-5: SVD's TemporalDecoder blocks run their
        # temporal resnets at a looser eps than the 1e-6 spatial ones
        h = _FastGN(32, 1e-5, name="norm1")(x)
        h = tconv(nn.silu(h), self.out_channels, "conv1")
        h = _FastGN(32, 1e-5, name="norm2")(h)
        h = tconv(nn.silu(h), self.out_channels, "conv2")
        if C != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet (per frame) + temporal resnet, merged by a learned
    scalar alpha: out = a * spatial + (1 - a) * temporal."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        s = VAEResnetBlock(self.out_channels, self.dtype,
                           name="spatial_res_block")(
            x.reshape(B * F, H, W, C)).reshape(B, F, H, W,
                                               self.out_channels)
        t = TemporalResnetBlock(self.out_channels, self.dtype,
                                name="temporal_res_block")(s)
        mix = self.param("mix_factor", nn.initializers.constant(0.5), ())
        alpha = jax.nn.sigmoid(mix).astype(s.dtype)
        return alpha * s + (1.0 - alpha) * t


class TemporalDecoder(nn.Module):
    """SVD TemporalDecoder: conv_in -> mid(res, attn, res) -> 4 up blocks
    of 3 spatio-temporal resnets (+2x upsample between) -> norm/silu ->
    conv_out -> 3-tap temporal conv. z [B, F, h, w, 4] -> [B, F, 8h, 8w, 3]."""
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        B, F, hh, ww, _ = z.shape
        ch = c.block_out_channels[-1]

        def spatial(mod, h):
            Bv, Fv, Hv, Wv, Cv = h.shape
            return mod(h.reshape(Bv * Fv, Hv, Wv, Cv)).reshape(
                Bv, Fv, Hv, Wv, -1)

        h = spatial(nn.Conv(ch, (3, 3), padding=1, dtype=c.jdtype,
                            name="conv_in"), z)
        h = SpatioTemporalResBlock(ch, c.jdtype,
                                   name="mid_block_resnets_0")(h)
        h = spatial(VAEAttention(ch, c.jdtype,
                                 name="mid_block_attentions_0"), h)
        h = SpatioTemporalResBlock(ch, c.jdtype,
                                   name="mid_block_resnets_1")(h)
        rev = list(reversed(c.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                h = SpatioTemporalResBlock(
                    ch, c.jdtype, name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                h = spatial(nn.Conv(ch, (3, 3), padding=1, dtype=c.jdtype,
                                    name=f"up_blocks_{i}_upsamplers_0_conv"),
                            h)
        # per-frame norm (diffusers folds frames into batch here)
        h = spatial(_FastGN(32, 1e-6, name="conv_norm_out"), h)
        h = nn.silu(h)
        h = spatial(nn.Conv(c.out_channels, (3, 3), padding=1,
                            dtype=c.jdtype, name="conv_out"), h)
        # final temporal smoothing conv over frames (SVD time_conv_out)
        Bv, Fv, Hv, Wv, Cv = h.shape
        hp = h.transpose(0, 2, 3, 1, 4).reshape(Bv * Hv * Wv, Fv, Cv)
        kernel = self.param("time_conv_out_kernel",
                            nn.initializers.lecun_normal(),
                            (3, Cv, c.out_channels), jnp.float32)
        bias = self.param("time_conv_out_bias", nn.initializers.zeros,
                          (c.out_channels,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            hp.astype(c.jdtype), kernel.astype(c.jdtype),
            window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC")) + bias.astype(c.jdtype)
        return y.reshape(Bv, Hv, Wv, Fv, -1).transpose(0, 3, 1, 2, 4)


class AutoencoderKLTemporalDecoder(nn.Module):
    """Standard SD encoder + temporal decoder (no post_quant conv, matching
    the SVD layout). encode/sample take per-frame batches like
    AutoencoderKL; decode takes [B, F, h, w, 4] videos."""
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = TemporalDecoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.cfg.jdtype)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample(self, x, rng):
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        """z [B, F, h, w, 4] (or [F, h, w, 4] for a single video) ->
        frames at 8x spatial."""
        squeeze = z.ndim == 4
        if squeeze:
            z = z[None]
        out = self.decoder(z)
        return out[0] if squeeze else out

    def __call__(self, x, rng):
        """x [F, H, W, 3] single video -> reconstruction."""
        z = self.sample(x, rng)
        return self.decode(z)
