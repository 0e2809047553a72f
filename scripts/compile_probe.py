"""Cross-process compile-cache probe for the BIG denoise executable (TPU).

Builds the bench denoise jit exactly like bench.py and compiles it (no
execution). First process pays the full remote compile; a second process
must hit the persistent cache and finish in seconds. jax_explain_cache_misses
is on via enable_compile_cache, so a miss prints why.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/compile_probe.py
"""
import sys
import time

from imagine360_tpu.utils.compile_cache import enable_compile_cache

import jax
import jax.numpy as jnp

enable_compile_cache()

from __graft_entry__ import _zeros_params
from imagine360_tpu.presets import full_dual_config
from imagine360_tpu.models.dual import DualUNet
from imagine360_tpu.geometry import CameraRig
from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                             SamplerConfig,
                                             build_dual_warp_geoms)

frames, M, bench_steps = 16, 20, 10
jd = jnp.bfloat16

cfg = full_dual_config("bfloat16")
model = DualUNet(cfg)
rig = CameraRig.icosahedron(image_size=256)
geoms = build_dual_warp_geoms(cfg, rig, (32, 32), (64, 128))
sampler = DualDiffusionSampler(
    model, SamplerConfig(num_steps=bench_steps, add_ip_noise=True))

pano_lat = jnp.zeros((1, frames, 64, 128, 4), jd)
pers_lat = jnp.zeros((1, M, frames, 32, 32, 4), jd)
pano_mask = jnp.zeros((1, frames, 64, 128, 1), jd)
pano_masked = jnp.zeros((1, frames, 64, 128, 4), jd)
pers_mask = jnp.zeros((1, M, frames, 32, 32, 1), jd)
pers_masked = jnp.zeros((1, M, frames, 32, 32, 4), jd)
pano_text = jnp.zeros((2, 77, 1024), jd)
pers_text = jnp.zeros((2 * M, 77, 1024), jd)
fps = jnp.full((2,), 8.0, jnp.float32)
ref_pano = jnp.zeros((2, 16, 4096, 256), jd)
ref_pers = jnp.zeros((2 * M, 16, 4096, 256), jd)
rel = jnp.zeros((2, frames, 6), jnp.float32)
pitch = jnp.zeros((2, frames), jnp.float32)

init_args = (
    jnp.concatenate([pers_lat, pers_mask, pers_masked], -1).repeat(2, 0),
    jnp.concatenate([pano_lat, pano_mask, pano_masked], -1).repeat(2, 0),
    jnp.full((2,), 500.0), pers_text, pano_text, fps, ref_pers,
    ref_pano, rel, pitch, geoms, jnp.zeros((7,), bool))
params = _zeros_params(model, init_args, "bfloat16")

ip_pers = jnp.zeros((2 * M, 64, 1024), jd)
ip_pano = jnp.zeros((2, 80, 1024), jd)

# mirror bench.py's _scalarize wrapper + call signature exactly so the
# compiled program is the byte-identical one bench.py will look up
sys.path.insert(0, "/root/repo")
import bench

fn = bench._scalarize(sampler.denoise)

t0 = time.time()
lowered = fn.lower(params, jax.random.PRNGKey(0), pano_lat, pers_lat,
                   pano_mask, pano_masked, pers_mask, pers_masked,
                   pano_text, pers_text, geoms, fps, None, None,
                   rel, pitch, ip_tokens_pers=ip_pers, ip_tokens_pano=ip_pano)
print(f"lower: {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
compiled = lowered.compile()
print(f"compile: {time.time()-t0:.1f}s")
