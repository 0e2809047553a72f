"""Dual-branch coupler: the perspective UNet (20 views folded into batch) and
the panorama UNet walked in lockstep, with WarpAttn coupling after every
encoder downsample, at the mid block, and before every decoder upsample
(reference src/models/MVGenModel.py).

Faithfully reproduced reference quirks:
- motion modules are *skipped* in blocks without spatial attention during the
  dual walk (reference MVGenModel.py:291-303,426-443), although the single
  branch forward applies them (unet_blocks.py:569-587)
- sigma-0.1 gaussian noise is added to the ip tokens every call
  (reference MVGenModel.py:11-14,186-187), PRNG-keyed here
- the relative-position/pitch adapter conditions only the pano branch
  (reference MVGenModel.py:181,193-222)
- pano circular padding wraps every conv (pad amounts per stage exactly as
  MVGenModel.py:135-479)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.mesh import shard_views, shard_pano
from .unet3d import UNet3DConfig, UNet3DConditionModel
from .warp import WarpAttn

def warp_sites(n_blocks: int = 4):
    """(site name, resolution key) in walk order for an n-block UNet;
    resolution key r{s} = feature map at latent_size / s. One WarpAttn after
    each encoder downsample, one at mid, one before each decoder upsample
    (reference MVGenModel.py:24-37)."""
    sites = [(f"enc_{i}", f"r{2 ** (i + 1)}") for i in range(n_blocks - 1)]
    sites.append(("mid", f"r{2 ** (n_blocks - 1)}"))
    sites += [(f"dec_{i}", f"r{2 ** (n_blocks - 1 - i)}")
              for i in range(n_blocks - 1)]
    return tuple(sites)


# default 4-block layout (SD2.1 backbone)
WARP_SITES = warp_sites(4)


@dataclasses.dataclass(frozen=True)
class DualUNetConfig:
    pers: UNet3DConfig = UNet3DConfig()
    pano: UNet3DConfig = UNet3DConfig()
    num_views: int = 20
    pano_pad: bool = True
    pano_only: bool = False
    ip_noise_level: float = 0.1
    # debug/bench: skip the WarpAttn coupling (perf bisection only)
    disable_warp: bool = False


class DualUNet(nn.Module):
    cfg: DualUNetConfig

    def setup(self):
        c = self.cfg
        if not c.pano_only:
            self.unet = UNet3DConditionModel(c.pers, name="unet")
        self.pano_unet = UNet3DConditionModel(c.pano, name="pano_unet")
        if not c.pano_only:
            boc = c.pers.block_out_channels
            # encoder: one WarpAttn per down block that has a downsampler
            self.cp_blocks_encoder = [
                WarpAttn(boc[i], c.num_views, dtype=c.pers.jdtype,
                         name=f"cp_blocks_encoder_{i}")
                for i in range(len(boc) - 1)]
            self.cp_blocks_mid = WarpAttn(boc[-1], c.num_views,
                                          dtype=c.pers.jdtype)
            # decoder: one per up block that has an upsampler; channels are
            # the upsampler input channels (reversed boc[:3])
            rev = list(reversed(boc))
            self.cp_blocks_decoder = [
                WarpAttn(rev[i], c.num_views, dtype=c.pers.jdtype,
                         name=f"cp_blocks_decoder_{i}")
                for i in range(len(boc) - 1)]

    def compute_ip_tokens(self, ref_feats_pers, ref_feats_pano,
                          rel_pos=None, pitch=None):
        """The deterministic part of the IP conditioning (temporal projection
        + resampler + relative-position adapter). Loop-invariant across
        denoise steps — compute ONCE before the scan and free the large SAM
        feature tensors (the reference recomputes this inside every model
        call, MVGenModel.py:155-222). Per-step noise is applied in
        __call__."""
        c = self.cfg
        ip_pano = ip_pers = None
        if c.pano.use_ip and ref_feats_pano is not None:
            ip_pano = self.pano_unet.ip_tokens(ref_feats_pano, rel_pos, pitch)
        if not c.pano_only and c.pers.use_ip and ref_feats_pers is not None:
            ip_pers = self.unet.ip_tokens(ref_feats_pers)
        return ip_pers, ip_pano

    def _maybe_noise(self, tokens, add_noise: bool):
        if not add_noise or self.cfg.ip_noise_level <= 0:
            return tokens
        key = self.make_rng("ip_noise")
        return tokens + self.cfg.ip_noise_level * jax.random.normal(
            key, tokens.shape, tokens.dtype)

    def __call__(self,
                 pers_latents,            # [B, M, F, h, w, Cin] or None
                 pano_latent,             # [B, F, eh, ew, Cin]
                 timestep,                # [B]
                 pers_text,               # [B*M, L, 1024]
                 pano_text,               # [B, L, 1024]
                 fps=None,                # [B] or None
                 ref_feats_pers=None,     # [B*M, F, D, Csam]
                 ref_feats_pano=None,     # [B, F, D, Csam]
                 rel_pos=None,            # [B, n, 6]
                 pitch=None,              # [B, n]
                 warp_geoms=None,         # {"r2": {...}, "r4": {...},
                                          #  "r8": {...}, "pe": {site: {...}}}
                 use_opp=None,            # [7] bool (antipodal mask choice)
                 add_ip_noise: bool = True,
                 ip_tokens_pers=None,     # precomputed (compute_ip_tokens)
                 ip_tokens_pano=None):
        c = self.cfg
        pano_pad = c.pano_pad
        dual = not c.pano_only and pers_latents is not None
        sites = warp_sites(len(c.pers.block_out_channels))
        n_enc = len(c.pers.block_out_channels) - 1

        B = pano_latent.shape[0]
        if dual:
            _, M, F, h, w, Cin = pers_latents.shape
            pers = pers_latents.reshape(B * M, F, h, w, Cin)

        # 1. time + fps embeddings (reference MVGenModel.py:103-133)
        if dual:
            t_pers = jnp.repeat(timestep, M, axis=0)
            fps_pers = None if fps is None else jnp.repeat(fps, M, axis=0)
            temb = self.unet.time_embed(t_pers, fps_pers)
        pano_temb = self.pano_unet.time_embed(timestep, fps)

        # 2. ip tokens + contexts (reference MVGenModel.py:150-246);
        # tokens may be precomputed once outside the denoise loop
        if ip_tokens_pano is None and c.pano.use_ip \
                and ref_feats_pano is not None:
            ip_tokens_pano = self.pano_unet.ip_tokens(ref_feats_pano,
                                                      rel_pos, pitch)
        if ip_tokens_pano is not None:
            ip_pano = self._maybe_noise(ip_tokens_pano, add_ip_noise)
            pano_ctx = self.pano_unet.build_context(pano_text, ip_pano)
        else:
            pano_ctx = pano_text
        if dual:
            if ip_tokens_pers is None and c.pers.use_ip \
                    and ref_feats_pers is not None:
                ip_tokens_pers = self.unet.ip_tokens(ref_feats_pers)
            if ip_tokens_pers is not None:
                ip_pers = self._maybe_noise(ip_tokens_pers, add_ip_noise)
                pers_ctx = self.unet.build_context(pers_text, ip_pers)
            else:
                pers_ctx = pers_text

        def geom_for(site_idx):
            name, rkey = sites[site_idx]
            g = dict(warp_geoms[rkey])
            g.update(warp_geoms["pe"][name])
            return g, use_opp[site_idx]

        # 3. stems (sharding: perspective folds over the "view" mesh axis,
        # pano shards its latent HEIGHT axis — see parallel/mesh.py
        # shard_pano for why H, not frames)
        if dual:
            hp = self.unet.stem(shard_views(pers.astype(c.pers.jdtype)))
        ha = self.pano_unet.stem(
            shard_pano(pano_latent.astype(c.pano.jdtype)), pad=pano_pad)

        # 4. down (reference MVGenModel.py:256-327)
        if dual:
            skips_p = [hp]
        skips_a = [ha]
        for i, blk_a in enumerate(self.pano_unet.down_blocks):
            has_attn = blk_a.heads is not None
            if dual:
                hp, sp = self.unet.down_blocks[i](
                    hp, temb, pers_ctx, False, has_attn)
                skips_p.extend(sp)
            ha, sa = blk_a(ha, pano_temb, pano_ctx, pano_pad, has_attn)
            skips_a.extend(sa)
            if dual:
                hp = shard_views(hp)
            ha = shard_pano(ha)
            if blk_a.add_downsample and dual and not c.disable_warp:
                g, opp = geom_for(i)
                hp, ha = self.cp_blocks_encoder[i](hp, ha, g, opp)
                hp = shard_views(hp)
                ha = shard_pano(ha)

        # 5. mid (reference MVGenModel.py:336-380)
        if dual:
            hp = self.unet.mid_block(hp, temb, pers_ctx)
        ha = self.pano_unet.mid_block(ha, pano_temb, pano_ctx, pad=pano_pad)
        if dual and not c.disable_warp:
            g, opp = geom_for(n_enc)
            hp, ha = self.cp_blocks_mid(hp, ha, g, opp)

        # 6. up (reference MVGenModel.py:394-458)
        n_sk = c.pano.layers_per_block + 1
        for i, blk_a in enumerate(self.pano_unet.up_blocks):
            has_attn = blk_a.heads is not None
            if dual:
                sk_p = tuple(skips_p[-n_sk:])
                del skips_p[-n_sk:]
                hp = self.unet.up_blocks[i](hp, sk_p, temb, pers_ctx,
                                            False, has_attn)
            sk_a = tuple(skips_a[-n_sk:])
            del skips_a[-n_sk:]
            ha = blk_a(ha, sk_a, pano_temb, pano_ctx, pano_pad, has_attn)
            if blk_a.add_upsample:
                if dual and not c.disable_warp:
                    g, opp = geom_for(n_enc + 1 + i)
                    hp, ha = self.cp_blocks_decoder[i](hp, ha, g, opp)
                if dual:
                    hp = self.unet.up_blocks[i].upsample(shard_views(hp))
                ha = blk_a.upsample(shard_pano(ha), pad=pano_pad)

        # 7. heads (reference MVGenModel.py:462-479)
        pers_out = None
        if dual:
            pers_out = self.unet.head(hp)
            pers_out = pers_out.reshape(B, M, F, h, w, -1)
        pano_out = self.pano_unet.head(ha, pad=pano_pad)
        return pers_out, pano_out
