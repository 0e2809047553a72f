"""Ground-truth step timing: time denoise scans of two lengths and use the
slope ((t_long - t_short) / (n_long - n_short)) so constant overhead and any
tunnel/async timing slack cancel out."""
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
M = 20


def build(num_steps, cfg, params=None, geoms=None, model=None):
    jd = jnp.bfloat16
    if model is None:
        model = DualUNet(cfg)
    if geoms is None:
        rig = CameraRig.icosahedron(image_size=256)
        geoms = build_dual_warp_geoms(cfg, rig, (32, 32), (64, 128))
    sampler = DualDiffusionSampler(model, SamplerConfig(num_steps=num_steps))
    a = dict(
        pano_latent=jnp.zeros((1, FRAMES, 64, 128, 4), jd),
        pers_latent=jnp.zeros((1, M, FRAMES, 32, 32, 4), jd),
        pano_mask=jnp.zeros((1, FRAMES, 64, 128, 1), jd),
        pano_masked=jnp.zeros((1, FRAMES, 64, 128, 4), jd),
        pers_mask=jnp.zeros((1, M, FRAMES, 32, 32, 1), jd),
        pers_masked=jnp.zeros((1, M, FRAMES, 32, 32, 4), jd),
        pano_text=jnp.zeros((2, 77, 1024), jd),
        pers_text=jnp.zeros((2 * M, 77, 1024), jd),
        fps=jnp.full((2,), 8.0, jnp.float32),
        ref_pano=jnp.zeros((2, 16, 4096, 256), jd),
        ref_pers=jnp.zeros((2 * M, 16, 4096, 256), jd),
        rel=jnp.zeros((2, FRAMES, 6), jnp.float32),
        pitch=jnp.zeros((2, FRAMES), jnp.float32),
    )
    if params is None:
        init_args = (
            jnp.concatenate([a["pers_latent"], a["pers_mask"],
                             a["pers_masked"]], -1).repeat(2, 0),
            jnp.concatenate([a["pano_latent"], a["pano_mask"],
                             a["pano_masked"]], -1).repeat(2, 0),
            jnp.full((2,), 500.0), a["pers_text"], a["pano_text"], a["fps"],
            a["ref_pers"], a["ref_pano"], a["rel"], a["pitch"], geoms,
            jnp.zeros((7,), bool))
        params = _zeros_params(model, init_args, "bfloat16")
    fn = jax.jit(sampler.denoise)

    def call(key):
        return fn(params, key, a["pano_latent"], a["pers_latent"],
                  a["pano_mask"], a["pano_masked"], a["pers_mask"],
                  a["pers_masked"], a["pano_text"], a["pers_text"], geoms,
                  a["fps"], a["ref_pano"], a["ref_pers"], a["rel"],
                  a["pitch"])

    return call, params, geoms, model


def timed(call, key):
    import numpy as np
    t0 = time.time()
    out = call(key)
    # fetch a slice to host: unlike block_until_ready (which the tunneled
    # device reports optimistically), a transfer can't complete early
    np.asarray(out[0])
    return time.time() - t0


def main():
    cfg = full_dual_config("bfloat16")
    short, long_ = 5, 25
    call_s, params, geoms, model = build(short, cfg)
    timed(call_s, jax.random.PRNGKey(0))  # compile
    t_s = min(timed(call_s, jax.random.PRNGKey(i)) for i in (1, 2))
    call_l, *_ = build(long_, cfg, params, geoms, model)
    timed(call_l, jax.random.PRNGKey(0))  # compile
    t_l = min(timed(call_l, jax.random.PRNGKey(i)) for i in (1, 2))
    step = (t_l - t_s) / (long_ - short)
    print(f"t({short})={t_s:.3f}s t({long_})={t_l:.3f}s -> "
          f"{step*1000:.1f} ms/step, clip(50)={50*step:.2f}s", flush=True)


if __name__ == "__main__":
    main()
