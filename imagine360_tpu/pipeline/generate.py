"""End-to-end perspective-to-360 video generation pipeline.

The TPU-native equivalent of the reference AnimationPipeline.__call__ + the
per-video preprocessing in inference_dual_p2e.py:500-603:

host (numpy):  video read -> pitch fit -> P2E warp -> anchor/maxrect ->
               20-view E2P -> SAM preprocessing
device (jit):  CLIP text encode, SAM encode, VAE encodes, shared-noise init,
               50-step dual denoise scan, circular-pad VAE decode

Everything device-side is batched (no per-frame python loops on the hot
path) and runs under one mesh context when multi-chip.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..geometry import CameraRig, e2p, pad_pano, unpad_pano
from ..models.dual import DualUNet, DualUNetConfig, WARP_SITES
from ..models.vae import AutoencoderKL, VAEConfig
from ..models.clip_text import CLIPTextModel, CLIPTextConfig
from ..models.sam import SAMImageEncoder, SAMConfig, sam_preprocess
from ..pipeline.sampler import (SamplerConfig, DualDiffusionSampler,
                                build_dual_warp_geoms)
from ..pipeline.conditioning import (init_shared_noise,
                                     prepare_masked_latents,
                                     downsample_mask_nearest)
from ..pipeline.elevation import PitchEstimator, pers_video_to_pano
from ..pipeline.anchor import get_anchor_target
from ..utils.video_io import to_model_range, from_model_range, resize_frames
from ..utils.observability import StageTimer, get_logger

log = get_logger("pipeline")


@dataclasses.dataclass
class PipelineModules:
    """All model objects + their params. Params may be zero/random in dev
    mode; use utils/checkpoints.py loaders for real weights."""
    dual: DualUNet
    dual_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text_encoder: Optional[CLIPTextModel] = None
    text_params: Optional[dict] = None
    sam: Optional[SAMImageEncoder] = None
    sam_params: Optional[dict] = None
    tokenizer: Optional[object] = None  # callable(str) -> [77] int ids


class Imagine360Pipeline:
    def __init__(self, modules: PipelineModules, run_cfg: RunConfig,
                 dual_cfg: DualUNetConfig, mesh=None):
        self.m = modules
        self.cfg = run_cfg
        self.dual_cfg = dual_cfg
        self.sampler = DualDiffusionSampler(
            modules.dual,
            SamplerConfig(num_steps=run_cfg.num_inference_steps,
                          solver=run_cfg.solver,
                          guidance_scale=run_cfg.guidance_scale,
                          antipodal_prob=run_cfg.antipodal_prob))
        self.pers_size = run_cfg.pano_H // 2
        self.rig = CameraRig.icosahedron(
            image_size=self.pers_size).take(dual_cfg.num_views)
        self.geoms = build_dual_warp_geoms(
            dual_cfg, self.rig,
            (self.pers_size // 8, self.pers_size // 8),
            (run_cfg.pano_H // 8, run_cfg.pano_W // 8))
        self.pitch = PitchEstimator(mode=run_cfg.angle_adapt)
        # multi-chip: the denoise scan is traced with the mesh active so the
        # shard_views/shard_pano constraints in DualUNet become real GSPMD
        # shardings over ICI (SURVEY §2.4 — the reference has no distributed
        # backend to port; inference_dual_p2e.py:17-19 is dead code)
        if mesh is None and run_cfg.use_mesh != "off":
            n = len(jax.devices())
            if run_cfg.use_mesh == "on" or n > 1:
                from ..parallel.mesh import make_mesh
                mesh = make_mesh(replicas=run_cfg.mesh_replicas)
        self.mesh = mesh
        self._denoise = self.sampler.jit_denoise(mesh=mesh)

        from ..parallel.mesh import activate_mesh

        def _ip(p, rp, ra, r, pt):
            with activate_mesh(self.mesh):
                return self.sampler.compute_ip(p, rp, ra, r, pt)

        self._compute_ip = jax.jit(_ip)

        # conditioning stages, jitted with the mesh active so the frame-axis
        # shard constraints in SAM/VAE become real GSPMD shardings (VERDICT
        # r2: these stages ran unsharded and dominated the projected v5e-8
        # clip time). The mesh is only activated when the stage's batch axis
        # divides it — otherwise GSPMD auto-shards spatial axes, inserting
        # collectives these heavy programs don't need (and which deadlock
        # the 1-core CPU test host's 40 s collective rendezvous).
        def _stage_mesh(batch: int):
            if self.mesh is not None and batch % self.mesh.size == 0:
                return self.mesh
            return None

        def _sam_apply(p, x, sharded):
            with activate_mesh(self.mesh if sharded else None):
                return self.m.sam.apply(p, x)

        sam_jit = jax.jit(_sam_apply, static_argnums=(2,))
        self._sam_apply = lambda p, x: sam_jit(
            p, x, _stage_mesh(x.shape[0]) is not None)

        def _masked_lat(p, px, key, chunk, deterministic, sharded):
            with activate_mesh(self.mesh if sharded else None):
                return prepare_masked_latents(
                    self.m.vae, p, px, key, chunk=chunk,
                    deterministic=deterministic)

        ml_jit = jax.jit(_masked_lat, static_argnums=(3, 4, 5))
        self._masked_lat = lambda p, px, key, chunk, det: ml_jit(
            p, px, key, chunk, det,
            _stage_mesh(chunk if chunk else px.shape[0]) is not None)

        def _decode(p, lat, chunked, sharded):
            # chunked=True scans 4-frame chunks to bound single-chip
            # activation memory; on a mesh the frame axis is sharded
            # instead (same per-device footprint, no serialization)
            with activate_mesh(self.mesh if sharded else None):
                if chunked:
                    F = lat.shape[0]
                    lat_c = lat.reshape(F // 4, 4, *lat.shape[1:])
                    dec = jax.lax.map(
                        lambda z: self.m.vae.apply(p, z,
                                                   method=self.m.vae.decode),
                        lat_c)
                    return dec.reshape(F, *dec.shape[2:])
                return self.m.vae.apply(p, lat, method=self.m.vae.decode)

        dec_jit = jax.jit(_decode, static_argnums=(2, 3))

        def _vae_decode(p, lat):
            sharded = _stage_mesh(lat.shape[0]) is not None
            chunked = (not sharded and lat.shape[0] % 4 == 0
                       and lat.shape[0] > 4)
            return dec_jit(p, lat, chunked, sharded)

        self._vae_decode = _vae_decode

    # ---- text ------------------------------------------------------------

    def encode_prompt(self, prompt: str, negative: str, views: int):
        """-> (pano_text [2, 77, D], pers_text [2*M, 77, D]), CFG order
        [uncond; cond] (reference _encode_prompt, pipeline:210-297)."""
        D = self.dual_cfg.pano.cross_attention_dim
        if self.m.text_encoder is None or self.m.tokenizer is None:
            # zeros == unconditioned generation (the CLI refuses this
            # combination up-front when a prompt exists; see cli.py)
            emb = jnp.zeros((2, 77, D), jnp.float32)
        else:
            ids = jnp.asarray(np.stack([self.m.tokenizer(negative),
                                        self.m.tokenizer(prompt)]))
            emb = self.m.text_encoder.apply(self.m.text_params, ids)
        pano_text = emb
        # [neg*M ; pos*M] ordering to match the CFG batch layout
        pers_text = jnp.concatenate([
            jnp.repeat(emb[:1], views, axis=0),
            jnp.repeat(emb[1:], views, axis=0)], axis=0)
        return pano_text, pers_text

    # ---- image prompt (SAM video features) --------------------------------

    def encode_sam(self, frames_minus1_1: np.ndarray):
        """[F, h, w, 3] in [-1,1] -> [F, 4096, 256] features (+uncond zeros)
        (reference pipeline:675-718)."""
        if self.m.sam is None:
            F = frames_minus1_1.shape[0]
            csam = self.dual_cfg.pano.image_hidden_size
            tokens = 4096 if csam == 256 else 16
            return jnp.zeros((F, tokens, csam), jnp.float32)
        u8 = ((frames_minus1_1 + 1) * 127.5).astype(np.uint8)
        # long side to 1024 then pad
        import cv2
        h, w = u8.shape[1:3]
        scale = 1024.0 / max(h, w)
        resized = np.stack([cv2.resize(f, (int(w * scale + 0.5),
                                           int(h * scale + 0.5)))
                            for f in u8])
        x = sam_preprocess(resized)
        feats = self._sam_apply(self.m.sam_params, jnp.asarray(x))
        F = feats.shape[0]
        return feats.reshape(F, -1, feats.shape[-1])

    # ---- main -------------------------------------------------------------

    def __call__(self, frames_u8: np.ndarray, prompt: str = "",
                 negative_prompt: Optional[str] = None,
                 rng: Optional[jax.Array] = None,
                 raw_pitches=None):
        """frames_u8 [F, h, w, 3] uint8 perspective video ->
        dict(videos [F, H, W, 3] float [0,1], pano_input, masks)."""
        cfg = self.cfg
        if negative_prompt is None:
            negative_prompt = cfg.negative_prompt
        if rng is None:
            rng = jax.random.PRNGKey(cfg.global_seed)
        timer = StageTimer(log)
        F = frames_u8.shape[0]
        M = self.dual_cfg.num_views
        H, W = cfg.pano_H, cfg.pano_W
        ps = self.pers_size

        # 1. host preprocessing
        with timer("pitch+warp"):
            frames = to_model_range(frames_u8)
            pitches = self.pitch(frames_u8, raw_pitches)
            pano_frames, pano_masks = pers_video_to_pano(
                frames, pitches, (H, W))
        with timer("anchor"):
            anchor = get_anchor_target(pano_frames, pitches)
        with timer("e2p views"):
            # ERP frames -> 20 perspective views (pixels + masks), batched
            # on device (reference process_equi, inference_dual_p2e.py:113)
            pano_j = jnp.asarray(pano_frames).transpose(0, 3, 1, 2)  # F,3,H,W
            views = jax.vmap(lambda img: e2p(img, self.rig, (ps, ps)))(pano_j)
            views = np.asarray(views)            # [F, M, 3, ps, ps]
            mask_j = jnp.asarray(pano_masks).transpose(0, 3, 1, 2)
            vmasks = jax.vmap(lambda img: e2p(img, self.rig, (ps, ps)))(mask_j)
            vmasks = (np.asarray(vmasks) > 0.5).astype(np.float32)

        # 2. conditioning encoders
        with timer("text"):
            pano_text, pers_text = self.encode_prompt(prompt, negative_prompt,
                                                      M)
        with timer("sam"):
            feats = self.encode_sam(anchor["anchor"])        # [F, 4096, 256]
            feats_pers = self.encode_sam(anchor["anchor_pers"])
            # the reference duplicates the SAME embeds for both CFG halves
            # (pipeline:695,717)
            ref_pano = jnp.stack([feats, feats], axis=0)
            ref_pers = jnp.concatenate(
                [jnp.repeat(feats_pers[None], M, axis=0),
                 jnp.repeat(feats_pers[None], M, axis=0)], axis=0)

        views_bfhwc = np.transpose(views, (0, 1, 3, 4, 2))
        vmasks_bfhwc = np.transpose(vmasks, (0, 1, 3, 4, 2))
        video, _ = self.generate_core(
            pano_frames, pano_masks, views_bfhwc, vmasks_bfhwc,
            pano_text, pers_text, ref_pano, ref_pers,
            jnp.asarray(anchor["relative_position"]),
            jnp.asarray(anchor["pitch"]), rng, timer=timer)

        return {
            "videos": video,
            "pano_input": from_model_range(pano_frames),
            "masks": pano_masks,
            "pitches": pitches,
        }

    def generate_core(self, pano_frames, pano_masks, views_bfhwc,
                      vmasks_bfhwc, pano_text, pers_text, ref_pano, ref_pers,
                      rel_pos, pitch, rng, init_noise=None,
                      deterministic_vae=False, timer=None):
        """Device-side generation given prepared conditioning — the exact
        counterpart of the reference AnimationPipeline.__call__ body
        (pipeline_animation_inference_dual.py:631-824): masked-latent VAE
        encodes, shared-noise init, CFG dual denoise scan, circular-pad
        decode. Exposed separately so the full-pipeline golden test can
        drive it with reference-matched inputs.

        pano_frames [F,H,W,3] in [-1,1]; pano_masks [F,H,W,1] in {0,1};
        views_bfhwc [F,M,ps,ps,3]; vmasks_bfhwc [F,M,ps,ps,1];
        rel_pos [F,6]; pitch [F]. init_noise optionally pins
        (pano_noise [1,F,h,w,4], pers_noise [1,M,F,ph,pw,4]) — the analogue
        of the reference's `latents` argument. Returns (video [F,H,W,3] in
        [0,1], final pano latents)."""
        cfg = self.cfg
        if timer is None:
            timer = StageTimer(log)
        F = pano_frames.shape[0]
        M = views_bfhwc.shape[1]
        H, W = cfg.pano_H, cfg.pano_W
        ps = self.pers_size

        # 3. VAE-encode masked pixels (reference pipeline:631-648)
        with timer("vae encode"):
            rng, k1, k2 = jax.random.split(rng, 3)
            pano_masked_px = pano_frames * (pano_masks < 0.5)
            pano_masked_lat = self._masked_lat(
                self.m.vae_params, jnp.asarray(pano_masked_px), k1,
                None, deterministic_vae)                  # [F, H/8, W/8, 4]
            pers_masked_px = views_bfhwc * (vmasks_bfhwc < 0.5)
            n_pers = F * M
            chunk = n_pers // 4 if n_pers % 4 == 0 else None
            pers_masked_lat = self._masked_lat(
                self.m.vae_params,
                jnp.asarray(pers_masked_px.reshape(n_pers, ps, ps, 3)), k2,
                chunk, deterministic_vae)
            pers_masked_lat = pers_masked_lat.reshape(F, M, ps // 8, ps // 8, 4)

            pano_mask_lat = downsample_mask_nearest(jnp.asarray(pano_masks))
            pers_mask_lat = downsample_mask_nearest(jnp.asarray(vmasks_bfhwc))

        # 4. shared-noise init + denoise scan
        with timer("denoise"):
            rng, kn, kd = jax.random.split(rng, 3)
            if init_noise is None:
                pano_lat0, pers_lat0 = init_shared_noise(
                    kn, 1, F, (H // 8, W // 8), (ps // 8, ps // 8), self.rig)
            else:
                pano_lat0, pers_lat0 = init_noise
            rel = jnp.asarray(rel_pos)[None]
            rel = jnp.concatenate([rel, rel], axis=0)
            pit = jnp.asarray(pitch)[None]
            pit = jnp.concatenate([pit, pit], axis=0)
            fps = jnp.full((2,), float(cfg.fps))

            # IP tokens in a separate jit: the SAM feature tensors would
            # otherwise stay HBM-resident across the whole denoise scan
            ip_pers, ip_pano = self._compute_ip(
                self.m.dual_params, ref_pers, ref_pano, rel, pit)
            pano_lat, pers_lat = self._denoise(
                self.m.dual_params, kd,
                pano_lat0, pers_lat0,
                pano_mask_lat[None], pano_masked_lat[None],
                pers_mask_lat.transpose(1, 0, 2, 3, 4)[None],
                pers_masked_lat.transpose(1, 0, 2, 3, 4)[None],
                pano_text, pers_text, self.geoms,
                fps, None, None, rel, pit,
                ip_tokens_pers=ip_pers, ip_tokens_pano=ip_pano)

        # 5. circular-pad decode (reference pipeline:813-815), frame-chunked
        # to bound activation memory at full resolution
        with timer("vae decode"):
            lat = pano_lat[0] / 0.18215                      # [F, h, w, 4]
            lat = jnp.concatenate([lat[..., -4:, :], lat, lat[..., :4, :]],
                                  axis=-2)
            # single chip: scan 4-frame chunks (activation memory); on a
            # mesh the frame axis shards instead — same per-device
            # footprint with all chips busy
            dec = self._vae_decode(self.m.vae_params, lat)
            dec = dec[..., 32:-32, :]
            video = from_model_range(np.asarray(dec, np.float32))
        return video, pano_lat
