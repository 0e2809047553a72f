"""The dual-branch DDIM sampler: 50 denoise steps compiled to one
jax.lax.scan under jit (replacing the reference's python loop with per-step
host sync — reference pipeline_animation_inference_dual.py:734-809).

Design:
- CFG is the leading batch axis (2), exactly like the reference
- per-step stochastic elements (antipodal mask choice p=0.4, ip-token noise)
  are PRNG-keyed inside the scan
- latent buffers are donated; everything stays on device until decode
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddim import make_ddim_schedule, ddim_step
from ..geometry.corr_masks import warp_geometry
from ..models.dual import DualUNet, DualUNetConfig, WARP_SITES, warp_sites


def build_dual_warp_geoms(cfg: DualUNetConfig, cameras,
                          pers_latent_hw, equi_latent_hw,
                          bias_dtype=None):
    """All WarpAttn constants for one latent resolution: per-resolution bias
    masks (shared across sites) + per-site spherical PEs."""
    if bias_dtype is None:
        # bf16 halves the resident mask memory; values live in [-1, 1]
        import ml_dtypes
        bias_dtype = ml_dtypes.bfloat16
    boc = cfg.pers.block_out_channels
    n = len(boc)
    sites = warp_sites(n)
    rev = list(reversed(boc))
    site_dims = {f"enc_{i}": boc[i] for i in range(n - 1)}
    site_dims["mid"] = boc[-1]
    site_dims.update({f"dec_{i}": rev[i] for i in range(n - 1)})
    scales = {f"r{2 ** (i + 1)}": 2 ** (i + 1) for i in range(n - 1)}
    ph, pw = pers_latent_hw
    eh, ew = equi_latent_hw
    max_s = 2 ** (n - 1)
    if min(ph, pw, eh, ew) < max_s:
        raise ValueError(
            f"latent sizes pers={pers_latent_hw} equi={equi_latent_hw} too "
            f"small for a {n}-level UNet (deepest stride {max_s}); "
            f"pano_H must be >= {max_s * 8 * 2} (pers views are pano_H/2, "
            f"latents /8)")
    geoms = {"pe": {}}
    for rkey, s in scales.items():
        g = warp_geometry(cameras, (ph // s, pw // s), (eh // s, ew // s),
                          dim=4)  # dim irrelevant for biases
        geoms[rkey] = {k: v.astype(bias_dtype)
                       for k, v in g.items() if "bias" in k}
    for name, rkey in sites:
        s = scales[rkey]
        g = warp_geometry(cameras, (ph // s, pw // s), (eh // s, ew // s),
                          dim=site_dims[name])
        geoms["pe"][name] = {"pers_pe": g["pers_pe"],
                             "equi_pe": g["equi_pe"]}
    return geoms


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_steps: int = 50
    guidance_scale: float = 7.5
    antipodal_prob: float = 0.4   # reference src/utils/utils.py:15-21
    add_ip_noise: bool = True
    latent_dtype: str = "float32"
    prediction_type: str = "v_prediction"
    # "ddim" reproduces the reference recipe (50 steps,
    # inference_dual_p2e.py:324); "dpmpp_2m" reaches comparable quality in
    # ~half the steps (the reference itself samples its SR stage with
    # dpmpp_2m_sde, sr/video_to_video_model.py:138-152)
    solver: str = "ddim"


class DualDiffusionSampler:
    """Functional sampler around a DualUNet. All arrays live on device; the
    step loop is one compiled scan."""

    def __init__(self, model: DualUNet, cfg: SamplerConfig = SamplerConfig()):
        self.model = model
        self.cfg = cfg
        self.schedule = make_ddim_schedule(
            num_inference_steps=cfg.num_steps,
            prediction_type=cfg.prediction_type)
        self.dpm_schedule = None
        if cfg.solver.startswith("dpmpp"):
            from ..diffusion.dpm import make_dpm_schedule
            self.dpm_schedule = make_dpm_schedule(
                cfg.num_steps, prediction_type=cfg.prediction_type)

    def compute_ip(self, params, ref_feats_pers=None, ref_feats_pano=None,
                   rel_pos=None, pitch=None):
        """Jit this separately and pass the resulting (ip_pers, ip_pano)
        into denoise: keeping the multi-GB SAM feature tensors as denoise
        arguments would pin them in HBM for the entire 50-step scan."""
        return self.model.apply(params, ref_feats_pers, ref_feats_pano,
                                rel_pos, pitch,
                                method=self.model.compute_ip_tokens)

    def denoise(self, params, rng,
                pano_latent, pers_latent,          # [B,F,eh,ew,4] / [B,M,F,h,w,4]
                pano_mask, pano_masked,            # [B,F,eh,ew,1] / [B,F,eh,ew,4]
                pers_mask, pers_masked,            # [B,M,F,h,w,1] / [B,M,F,h,w,4]
                pano_text, pers_text,              # [2,L,D] / [2M,L,D] (CFG pairs)
                warp_geoms,
                fps=None,                          # [2] or None
                ref_feats_pano=None,               # [2,F,D,C]
                ref_feats_pers=None,               # [2M,F,D,C]
                rel_pos=None, pitch=None,          # [2,n,6] / [2,n]
                ip_tokens_pers=None,               # precomputed (compute_ip)
                ip_tokens_pano=None):
        """Runs the full CFG denoise loop. Latent batch B must be 1 (the
        CFG duplication to 2 happens inside, reference pipeline:750-751)."""
        cfg = self.cfg
        use_dpm = self.dpm_schedule is not None
        if use_dpm:
            dpm_coeffs = {k: jnp.asarray(v) for k, v in
                          self.dpm_schedule.step_coeffs().items()}
            xs = {
                "t": jnp.asarray(dpm_coeffs["timestep"], jnp.float32),
                "i": jnp.arange(cfg.num_steps),
                "key": jax.random.split(rng, cfg.num_steps),
            }
        else:
            coeffs = self.schedule.step_coeffs()
            xs = {
                "t": jnp.asarray(coeffs["timestep"], jnp.float32),
                "a_t": jnp.asarray(coeffs["alpha_prod_t"]),
                "a_prev": jnp.asarray(coeffs["alpha_prod_t_prev"]),
                "key": jax.random.split(rng, cfg.num_steps),
            }
        g = cfg.guidance_scale
        dual = pers_latent is not None
        n_sites = len(warp_sites(
            len(self.model.cfg.pers.block_out_channels)))

        # the deterministic IP conditioning is loop-invariant: run the SAM
        # temporal projection + resampler ONCE so the multi-GB feature
        # tensors aren't kept live (or recomputed) across 50 steps.
        # Prefer tokens precomputed via compute_ip in a separate jit —
        # feature tensors passed here stay HBM-resident for the whole scan.
        ip_pers, ip_pano = ip_tokens_pers, ip_tokens_pano
        if ip_pers is None and ip_pano is None and (
                ref_feats_pano is not None or ref_feats_pers is not None):
            ip_pers, ip_pano = self.model.apply(
                params, ref_feats_pers, ref_feats_pano, rel_pos, pitch,
                method=self.model.compute_ip_tokens)

        def step(carry, x):
            pano_lat, pers_lat, x0p_pano, x0p_pers = carry
            key = x["key"]
            k_opp, k_ip = jax.random.split(key)
            use_opp = jax.random.bernoulli(k_opp, cfg.antipodal_prob,
                                           (n_sites,))

            pano_in = jnp.concatenate([pano_lat, pano_mask, pano_masked],
                                      axis=-1)
            pano_in = jnp.concatenate([pano_in] * 2, axis=0)  # CFG
            pers_in = None
            if dual:
                pers_in = jnp.concatenate([pers_lat, pers_mask, pers_masked],
                                          axis=-1)
                pers_in = jnp.concatenate([pers_in] * 2, axis=0)
            t_vec = jnp.full((pano_in.shape[0],), x["t"])

            pers_pred, pano_pred = self.model.apply(
                params, pers_in, pano_in, t_vec, pers_text, pano_text,
                fps, None, None, rel_pos, pitch,
                warp_geoms, use_opp, add_ip_noise=cfg.add_ip_noise,
                ip_tokens_pers=ip_pers, ip_tokens_pano=ip_pano,
                rngs={"ip_noise": k_ip})

            # CFG combine (reference pipeline:789-795)
            pano_u, pano_c = jnp.split(pano_pred, 2, axis=0)
            pano_out = pano_u + g * (pano_c - pano_u)
            if use_dpm:
                from ..diffusion.dpm import dpmpp_2m_step
                sde = cfg.solver.endswith("sde")
                k_n1, k_n2 = jax.random.split(jax.random.fold_in(key, 7))
                noise_a = (jax.random.normal(k_n1, pano_lat.shape,
                                             pano_lat.dtype) if sde
                           else None)
                pano_lat, x0p_pano = dpmpp_2m_step(
                    pano_lat, pano_out, x["i"], dpm_coeffs, x0p_pano,
                    self.schedule.prediction_type, sde_noise=noise_a)
            else:
                pano_lat = ddim_step(pano_out, pano_lat, x["a_t"],
                                     x["a_prev"],
                                     self.schedule.prediction_type)
            if dual:
                pers_u, pers_c = jnp.split(pers_pred, 2, axis=0)
                pers_out = pers_u + g * (pers_c - pers_u)
                if use_dpm:
                    noise_p = (jax.random.normal(k_n2, pers_lat.shape,
                                                 pers_lat.dtype) if sde
                               else None)
                    pers_lat, x0p_pers = dpmpp_2m_step(
                        pers_lat, pers_out, x["i"], dpm_coeffs, x0p_pers,
                        self.schedule.prediction_type, sde_noise=noise_p)
                else:
                    pers_lat = ddim_step(pers_out, pers_lat, x["a_t"],
                                         x["a_prev"],
                                         self.schedule.prediction_type)
            return (pano_lat, pers_lat, x0p_pano, x0p_pers), None

        # x0 history carries are f32 (dpmpp_2m_step returns f32 x0)
        x0p_pano = jnp.zeros(pano_latent.shape, jnp.float32)
        x0p_pers = (jnp.zeros(pers_latent.shape, jnp.float32)
                    if dual else None)
        (pano_lat, pers_lat, _, _) = jax.lax.scan(
            step, (pano_latent, pers_latent, x0p_pano, x0p_pers), xs)[0]
        return pano_lat, pers_lat

    def jit_denoise(self, donate=True, mesh=None):
        """jit-compiled denoise with latent donation.

        With `mesh` (jax.sharding.Mesh over ('view',) or
        ('replica','view')), the scan is traced with the mesh active so the
        shard_views/shard_pano constraints inside DualUNet become real
        GSPMD shardings: the folded CFGxviews perspective batch and the pano
        latent HEIGHT axis distribute over ICI-connected chips, and the WarpAttn
        all-gathers ride ICI (SURVEY §2.4 — a new first-class component; the
        reference has no distributed backend)."""
        from ..parallel.mesh import activate_mesh

        def fn(*args, **kw):
            with activate_mesh(mesh):
                return self.denoise(*args, **kw)

        return jax.jit(fn, donate_argnums=(2, 3) if donate else ())
