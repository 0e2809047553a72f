"""Perf bisection of the denoise step on real TPU: times K-step scans for
model variants to attribute step time. Usage: python tools/bisect_perf.py A B C"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from __graft_entry__ import _zeros_params
from imagine360_tpu.presets import full_dual_config
from imagine360_tpu.models.dual import DualUNet
from imagine360_tpu.geometry import CameraRig
from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                             SamplerConfig,
                                             build_dual_warp_geoms)

FRAMES = 16
STEPS = 3
M = 20


def run(tag, cfg, use_ip=True):
    jd = jnp.bfloat16
    model = DualUNet(cfg)
    rig = CameraRig.icosahedron(image_size=256)
    geoms = build_dual_warp_geoms(cfg, rig, (32, 32), (64, 128))
    sampler = DualDiffusionSampler(model, SamplerConfig(num_steps=STEPS))
    pano_lat = jnp.zeros((1, FRAMES, 64, 128, 4), jd)
    pers_lat = jnp.zeros((1, M, FRAMES, 32, 32, 4), jd)
    args = dict(
        pano_mask=jnp.zeros((1, FRAMES, 64, 128, 1), jd),
        pano_masked=jnp.zeros((1, FRAMES, 64, 128, 4), jd),
        pers_mask=jnp.zeros((1, M, FRAMES, 32, 32, 1), jd),
        pers_masked=jnp.zeros((1, M, FRAMES, 32, 32, 4), jd),
        pano_text=jnp.zeros((2, 77, 1024), jd),
        pers_text=jnp.zeros((2 * M, 77, 1024), jd),
        warp_geoms=geoms,
        fps=jnp.full((2,), 8.0, jnp.float32),
        ref_feats_pano=jnp.zeros((2, 16, 4096, 256), jd) if use_ip else None,
        ref_feats_pers=jnp.zeros((2 * M, 16, 4096, 256), jd) if use_ip else None,
        rel_pos=jnp.zeros((2, FRAMES, 6), jnp.float32),
        pitch=jnp.zeros((2, FRAMES), jnp.float32),
    )
    init_args = (
        jnp.concatenate([pers_lat, args["pers_mask"], args["pers_masked"]],
                        -1).repeat(2, 0),
        jnp.concatenate([pano_lat, args["pano_mask"], args["pano_masked"]],
                        -1).repeat(2, 0),
        jnp.full((2,), 500.0), args["pers_text"], args["pano_text"],
        args["fps"], args["ref_feats_pers"], args["ref_feats_pano"],
        args["rel_pos"], args["pitch"], geoms, jnp.zeros((7,), bool))
    params = _zeros_params(model, init_args, "bfloat16")
    fn = jax.jit(sampler.denoise)
    out = fn(params, jax.random.PRNGKey(0), pano_lat, pers_lat,
             args["pano_mask"], args["pano_masked"], args["pers_mask"],
             args["pers_masked"], args["pano_text"], args["pers_text"],
             geoms, args["fps"], args["ref_feats_pano"],
             args["ref_feats_pers"], args["rel_pos"], args["pitch"])
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(params, jax.random.PRNGKey(1), pano_lat, pers_lat,
             args["pano_mask"], args["pano_masked"], args["pers_mask"],
             args["pers_masked"], args["pano_text"], args["pers_text"],
             geoms, args["fps"], args["ref_feats_pano"],
             args["ref_feats_pers"], args["rel_pos"], args["pitch"])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / STEPS
    print(f"{tag}: {dt*1000:.1f} ms/step", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["A"]
    base = full_dual_config("bfloat16")
    if "A" in which:
        run("A full", base)
    if "B" in which:
        run("B no-warp", dataclasses.replace(base, disable_warp=True))
    if "C" in which:
        import dataclasses as dc
        u = dc.replace(base.pers, use_motion_module=False)
        run("C no-motion", dc.replace(base, pers=u, pano=u))
    if "D" in which:
        u = dataclasses.replace(base.pers, use_ip=False)
        run("D no-ip", dataclasses.replace(base, pers=u, pano=u),
            use_ip=False)
