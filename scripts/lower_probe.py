"""Lowering-determinism probe for the bench denoise step.

Builds the denoise jit EXACTLY like bench.py (params/geoms/latents as jit
*arguments*, not closure constants), lowers it (no compile), and prints a
sha256 of the serialized StableHLO bytecode. Run in two separate processes
and compare hashes: a mismatch means tracing is nondeterministic across
processes (e.g. set-iteration order), which would explain why the
persistent compile cache misses on the big executable while tiny jits hit.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/lower_probe.py [out.txt]
With an out.txt argument the (large) textual IR is also dumped for diffing.
"""
import hashlib
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")  # lowering is backend-local math

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


def run(params, key, geoms, ip_pers, ip_pano):
    return sampler.denoise(params, key, pano_lat, pers_lat,
                           pano_mask, pano_masked, pers_mask, pers_masked,
                           pano_text, pers_text, geoms, fps, None, None,
                           rel, pitch, ip_tokens_pers=ip_pers,
                           ip_tokens_pano=ip_pano)


t0 = time.time()
lowered = jax.jit(run).lower(params, jax.random.PRNGKey(0), geoms,
                             ip_pers, ip_pano)
print(f"lower: {time.time()-t0:.1f}s", file=sys.stderr)

from jax._src.interpreters import mlir
t0 = time.time()
bc = mlir.module_to_bytecode(lowered.compiler_ir())
print(f"bytecode: {time.time()-t0:.1f}s, {len(bc)} bytes", file=sys.stderr)
print("sha256:", hashlib.sha256(bc).hexdigest())

if len(sys.argv) > 1:
    txt = lowered.as_text()
    with open(sys.argv[1], "w") as f:
        f.write(txt)
    print("text bytes:", len(txt))
