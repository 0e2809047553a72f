"""Step-time attribution for the full CFG dual denoise step.

Times 4-step compiled scans of config-ablated variants and reports the
differential cost of each subsystem (WarpAttn sites, motion modules,
IP conditioning, each branch). Run variants one at a time (the remote
compile service serializes):

    python scripts/step_breakdown.py full nowarp nomotion noip pano_only

Results print one JSON line per variant; diff them by hand or run with no
args to get all five serially.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0])


VARIANTS = ("full", "nowarp", "nomotion", "noip", "pano_only")


def build_cfg(variant: str):
    from imagine360_tpu.presets import full_dual_config
    cfg = full_dual_config("bfloat16")
    if variant == "nowarp":
        cfg = dataclasses.replace(cfg, disable_warp=True)
    elif variant == "nomotion":
        cfg = dataclasses.replace(
            cfg,
            pers=dataclasses.replace(cfg.pers, use_motion_module=False),
            pano=dataclasses.replace(cfg.pano, use_motion_module=False))
    elif variant == "noip":
        cfg = dataclasses.replace(
            cfg,
            pers=dataclasses.replace(cfg.pers, use_ip=False),
            pano=dataclasses.replace(cfg.pano, use_ip=False))
    elif variant == "pano_only":
        cfg = dataclasses.replace(cfg, pano_only=True)
    return cfg


def run_variant(variant: str, bench_steps: int = 4):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _zeros_params
    from imagine360_tpu.models.dual import DualUNet
    from imagine360_tpu.geometry import CameraRig
    from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                                 SamplerConfig,
                                                 build_dual_warp_geoms)

    frames, M = 16, 20
    jd = jnp.bfloat16
    cfg = build_cfg(variant)
    model = DualUNet(cfg)
    rig = CameraRig.icosahedron(image_size=256)
    geoms = build_dual_warp_geoms(cfg, rig, (32, 32), (64, 128))
    sampler = DualDiffusionSampler(
        model, SamplerConfig(num_steps=bench_steps, add_ip_noise=True))

    dual = variant != "pano_only"
    use_ip = variant != "noip"
    pano_lat = jnp.zeros((1, frames, 64, 128, 4), jd)
    pano_mask = jnp.zeros((1, frames, 64, 128, 1), jd)
    pano_masked = jnp.zeros((1, frames, 64, 128, 4), jd)
    pano_text = jnp.zeros((2, 77, 1024), jd)
    pers_lat = jnp.zeros((1, M, frames, 32, 32, 4), jd) if dual else None
    pers_mask = jnp.zeros((1, M, frames, 32, 32, 1), jd) if dual else None
    pers_masked = jnp.zeros((1, M, frames, 32, 32, 4), jd) if dual else None
    pers_text = jnp.zeros((2 * M, 77, 1024), jd)
    fps = jnp.full((2,), 8.0, jnp.float32)
    ref_pano = jnp.zeros((2, 16, 4096, 256), jd) if use_ip else None
    ref_pers = (jnp.zeros((2 * M, 16, 4096, 256), jd)
                if (use_ip and dual) else None)
    rel = jnp.zeros((2, frames, 6), jnp.float32)
    pitch = jnp.zeros((2, frames), jnp.float32)

    pers_in = (jnp.concatenate([pers_lat, pers_mask, pers_masked], -1)
               .repeat(2, 0) if dual else None)
    init_args = (
        pers_in,
        jnp.concatenate([pano_lat, pano_mask, pano_masked], -1).repeat(2, 0),
        jnp.full((2,), 500.0), pers_text, pano_text, fps, ref_pers,
        ref_pano, rel, pitch, geoms, jnp.zeros((7,), bool))
    params = _zeros_params(model, init_args, "bfloat16")

    # IP tokens precomputed in their own jit so the SAM feature tensors
    # are not pinned in HBM across the denoise scan
    ip_pers, ip_pano = jax.jit(sampler.compute_ip)(
        params, ref_pers, ref_pano, rel, pitch)
    if ip_pano is not None or ip_pers is not None:
        _fetch(ip_pano if ip_pano is not None else ip_pers)
    # free the SAM feature buffers (and the init-arg refs to them) before
    # the scan — they are ~1.4 GB of HBM
    del init_args
    ref_pano = ref_pers = None
    fn = jax.jit(sampler.denoise)

    def run(key):
        return fn(params, key, pano_lat, pers_lat,
                  pano_mask, pano_masked, pers_mask, pers_masked,
                  pano_text, pers_text, geoms, fps, None, None,
                  rel, pitch, ip_tokens_pers=ip_pers,
                  ip_tokens_pano=ip_pano)

    t0 = time.time()
    _fetch(run(jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    t_loop = min(
        (lambda t: (_fetch(run(jax.random.PRNGKey(i))), time.time() - t)[1])(
            time.time()) for i in (1, 2))
    step_s = t_loop / bench_steps
    print(json.dumps({"variant": variant,
                      "step_s": round(float(step_s), 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return step_s


def main():
    variants = sys.argv[1:] or list(VARIANTS)
    out = {}
    for v in variants:
        out[v] = run_variant(v)
    if "full" in out:
        full = out["full"]
        diffs = {f"cost_{k}": round(full - s, 4) for k, s in out.items()
                 if k != "full"}
        print(json.dumps({"full_step_s": round(full, 4), **diffs}))


if __name__ == "__main__":
    main()
