"""Device-accurate profile of the full dual denoise step.

Captures a jax.profiler trace of the compiled denoise scan (2 steps) and
aggregates per-HLO device durations from the exported Chrome trace, grouped
by hlo_category and by source op. This is ground truth for where the
3.3 s/step goes (host-side ablation timing can only approximate it).

Usage: python scripts/profile_step.py [outdir]
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0])


def build_run():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _zeros_params
    from imagine360_tpu.presets import full_dual_config
    from imagine360_tpu.models.dual import DualUNet
    from imagine360_tpu.geometry import CameraRig
    from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                                 SamplerConfig,
                                                 build_dual_warp_geoms)
    frames, M, bench_steps = 16, 20, 2
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
    import jax as _jax
    ip_pers, ip_pano = _jax.jit(sampler.compute_ip)(
        params, ref_pers, ref_pano, rel, pitch)
    del init_args
    fn = _jax.jit(sampler.denoise)

    def run(key):
        return fn(params, key, pano_lat, pers_lat,
                  pano_mask, pano_masked, pers_mask, pers_masked,
                  pano_text, pers_text, geoms, fps, None, None,
                  rel, pitch, ip_tokens_pers=ip_pers,
                  ip_tokens_pano=ip_pano)
    # expose the jit + full args so tools (dump_step_hlo) can lower with
    # params as real arguments (a jit over the closure would bake 4.9 GB of
    # weights in as constants and distort the lowering)
    run.fn = fn
    import jax as __jax
    run.args = (params, __jax.random.PRNGKey(0), pano_lat, pers_lat,
                pano_mask, pano_masked, pers_mask, pers_masked,
                pano_text, pers_text, geoms, fps, None, None, rel, pitch)
    run.kwargs = dict(ip_tokens_pers=ip_pers, ip_tokens_pano=ip_pano)
    return run, bench_steps


def aggregate(trace_path, steps):
    with gzip.open(trace_path) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name")
    dev_pid = [p for p, n in pids.items() if "TPU" in str(n)]
    by_cat = collections.Counter()
    by_op = collections.Counter()
    n_by_op = collections.Counter()
    flops_by_op = collections.Counter()
    bytes_by_op = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pid:
            continue
        args = e.get("args") or {}
        if "device_duration_ps" not in args:
            continue
        # tid 2 carries the whole-program spans (jit__...); skip those and
        # aggregate individual HLO ops
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        dur = int(args["device_duration_ps"]) / 1e12
        cat = args.get("hlo_category", "?")
        op = args.get("tf_op") or name
        src = (args.get("source_stack") or "").strip().split("\n")
        src = src[-1] if src and src[0] else ""
        key = f"{cat} | {op} | {src}"
        by_cat[cat] += dur
        by_op[key] += dur
        n_by_op[key] += 1
        flops_by_op[key] += int(args.get("model_flops", 0) or 0)
        bytes_by_op[key] += int(args.get("raw_bytes_accessed", 0) or 0)
        total += dur
    print(f"\n=== total device time: {total:.3f}s over {steps} steps "
          f"({total/steps*1000:.0f} ms/step) ===")
    print("\n--- by category (ms/step) ---")
    for cat, t in by_cat.most_common():
        print(f"{t/steps*1000:9.1f}  {cat}")
    print("\n--- top 45 ops (ms/step | count/step | TFLOP/s | GB/s) ---")
    for key, t in by_op.most_common(45):
        n = n_by_op[key]
        fl = flops_by_op[key] / t / 1e12 if t else 0
        bw = bytes_by_op[key] / t / 1e9 if t else 0
        print(f"{t/steps*1000:9.1f}  n={n/steps:6.1f}  {fl:6.1f}TF/s "
              f"{bw:7.0f}GB/s  {key[:170]}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stepprof"
    import jax
    run, steps = build_run()
    t0 = time.time()
    _fetch(run(jax.random.PRNGKey(0)))
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    with jax.profiler.trace(outdir):
        _fetch(run(jax.random.PRNGKey(1)))
    traces = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))
    print("trace:", traces[-1], flush=True)
    aggregate(traces[-1], steps)


if __name__ == "__main__":
    main()
