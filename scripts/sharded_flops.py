"""Per-device cost accounting for the sharded denoise step.

Evidence that the ('replica','view') mesh sharding actually divides the
work: AOT-compile the same 2-step CFG dual denoise scan on a 1-device and
an 8-virtual-device CPU mesh and print XLA's per-device cost analysis
(flops + bytes accessed per device program). CPU wall-clock over virtual
devices is meaningless, but the per-device FLOP count is the compiler's
own statement of how the GSPMD partitioner split the program — a
~1/8 per-device FLOP count proves view-parallel scaling, independent of
hardware (SURVEY §2.4; VERDICT r1 "published sharded-step measurement").

Run: python scripts/sharded_flops.py   (pins CPU + 8 virtual devices)
"""
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_disable_most_optimizations", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from __graft_entry__ import _zeros_params  # noqa: E402
from imagine360_tpu.presets import micro_dual_config  # noqa: E402
from imagine360_tpu.models.dual import DualUNet, warp_sites  # noqa: E402
from imagine360_tpu.geometry import CameraRig  # noqa: E402
from imagine360_tpu.pipeline.sampler import (  # noqa: E402
    DualDiffusionSampler, SamplerConfig, build_dual_warp_geoms)
from imagine360_tpu.parallel.mesh import make_mesh, activate_mesh  # noqa: E402
from imagine360_tpu.training.train import make_dual_batch  # noqa: E402


def build(num_views=8, frames=4, scale=1):
    import dataclasses
    PH = PW = 8 * scale
    EH, EW = 8 * scale, 16 * scale
    cfg = micro_dual_config(num_views=num_views)
    model = DualUNet(cfg)
    rig_full = CameraRig.icosahedron(image_size=16)
    reps = -(-num_views // 20)
    rig = dataclasses.replace(
        rig_full,
        **{f: np.tile(getattr(rig_full, f), reps)[:num_views]
           for f in ("fov", "theta", "phi", "height", "width")},
        K=np.tile(rig_full.K, (reps, 1, 1))[:num_views],
        R=np.tile(rig_full.R, (reps, 1, 1))[:num_views])
    geoms = build_dual_warp_geoms(cfg, rig, (PH, PW), (EH, EW))
    n_sites = len(warp_sites(len(cfg.pers.block_out_channels)))
    batch = make_dual_batch(jax.random.PRNGKey(0), cfg, frames, (PH, PW),
                            (EH, EW), text_len=4, sam_tokens=16,
                            sam_frames=4)
    pers_in = jnp.concatenate([batch["pers_latents"], batch["pers_mask"],
                               batch["pers_masked"]], axis=-1)
    pano_in = jnp.concatenate([batch["pano_latents"], batch["pano_mask"],
                               batch["pano_masked"]], axis=-1)
    init_args = (pers_in, pano_in, jnp.zeros((1,)), batch["pers_text"],
                 batch["pano_text"], batch["fps"], batch["ref_feats_pers"],
                 batch["ref_feats_pano"], batch["rel_pos"], batch["pitch"],
                 geoms, jnp.zeros((n_sites,), bool))
    params = _zeros_params(model, init_args, "float32")
    return model, cfg, geoms, batch, params


def cost(n_devices: int, frames=4, scale=1):
    model, cfg, geoms, batch, params = build(frames=frames, scale=scale)
    sampler = DualDiffusionSampler(
        model, SamplerConfig(num_steps=2, add_ip_noise=True))
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    with activate_mesh(mesh):
        ip_pers, ip_pano = jax.jit(sampler.compute_ip)(
            params, jnp.concatenate([batch["ref_feats_pers"]] * 2, 0),
            jnp.concatenate([batch["ref_feats_pano"]] * 2, 0),
            jnp.concatenate([batch["rel_pos"]] * 2, 0),
            jnp.concatenate([batch["pitch"]] * 2, 0))

    def fn(params, key):
        from imagine360_tpu.parallel.mesh import activate_mesh as am
        with am(mesh):
            return sampler.denoise(
                params, key, batch["pano_latents"], batch["pers_latents"],
                batch["pano_mask"], batch["pano_masked"],
                batch["pers_mask"], batch["pers_masked"],
                jnp.concatenate([batch["pano_text"]] * 2, 0),
                jnp.concatenate([batch["pers_text"]] * 2, 0),
                geoms, jnp.concatenate([batch["fps"]] * 2, 0), None, None,
                jnp.concatenate([batch["rel_pos"]] * 2, 0),
                jnp.concatenate([batch["pitch"]] * 2, 0),
                ip_tokens_pers=ip_pers, ip_tokens_pano=ip_pano)

    t0 = time.time()
    compiled = jax.jit(fn).lower(params, jax.random.PRNGKey(0)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(f"mesh={n_devices}d compile {time.time()-t0:.0f}s  "
          f"flops/device {ca.get('flops', float('nan')):.3e}  "
          f"bytes/device {ca.get('bytes accessed', float('nan')):.3e}",
          flush=True)
    return ca.get("flops", float("nan"))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    f1 = cost(1, frames, scale)
    f8 = cost(8, frames, scale)
    print(f"frames={frames} scale={scale}: per-device FLOP ratio 1d/8d = "
          f"{f1 / f8:.2f}x (ideal view-parallel scaling = 8.00x minus the "
          f"replicated small-model overhead; ratio rises toward 8 with "
          f"model scale — production is 20 views x 16 frames x 8x the "
          f"spatial area)")


if __name__ == "__main__":
    main()
