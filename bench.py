"""Benchmark: seconds per 16-frame 512x1024 panorama clip on one TPU chip.

Times the *actual compiled sampler loop* (DualDiffusionSampler.denoise — a
lax.scan of full CFG dual-branch denoise steps, production architecture,
bf16) plus the VAE decode/encode stages, then reports the reference sampling
recipe cost (50 DDIM steps — reference inference_dual_p2e.py:324).

Timing: one compiled scan of `bench_steps` full steps, fetched to host (a
transfer cannot complete before execution, unlike block_until_ready over a
tunneled device); per-step = total / bench_steps. Single compile keeps the
bench robust when the remote compile service is slow; the included per-call
dispatch overhead (~1/bench_steps) makes the number slightly conservative.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline is measured against the 60 s north-star target from
BASELINE.json (the reference publishes no numbers of its own).
"""
import json
import time

import numpy as np


def _fetch(out):
    import jax
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0])  # host transfer forces real completion


def _scalarize(fn):
    """Wrap fn so it returns one f32 scalar depending on every output
    element. Timing then fetches 4 bytes instead of the raw outputs —
    execution still provably completes, but the measurement excludes the
    axon dev-tunnel transfer (fetching the 54 MB decoded clip through the
    tunnel costs 8-16 s; the device runs the whole decode in 0.5 s,
    scripts/vae_profile.py). On local hardware the transfer is PCIe and
    this distinction vanishes."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*args, **kw):
        out = fn(*args, **kw)
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(out))
    return wrapped


def _time(fn, *args, iters=3):
    fn = _scalarize(fn)
    _fetch(fn(*args))   # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        _fetch(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from imagine360_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _zeros_params
    from imagine360_tpu.presets import full_dual_config
    from imagine360_tpu.models.dual import DualUNet
    from imagine360_tpu.geometry import CameraRig
    from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                                 SamplerConfig,
                                                 build_dual_warp_geoms)

    frames = 16
    total_steps = 50
    bench_steps = 10
    M = 20
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

    # init params once (zeros, bf16 — identical FLOP/memory profile)
    init_args = (
        jnp.concatenate([pers_lat, pers_mask, pers_masked], -1)
        .repeat(2, 0), jnp.concatenate([pano_lat, pano_mask, pano_masked],
                                       -1).repeat(2, 0),
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
    fn = _scalarize(sampler.denoise)

    def run(key):
        return fn(params, key, pano_lat, pers_lat,
                  pano_mask, pano_masked, pers_mask, pers_masked,
                  pano_text, pers_text, geoms, fps, None, None,
                  rel, pitch, ip_tokens_pers=ip_pers,
                  ip_tokens_pano=ip_pano)

    t0 = time.time()
    _fetch(run(jax.random.PRNGKey(0)))   # compile
    compile_s = time.time() - t0
    t_loop = min(
        (lambda t: (_fetch(run(jax.random.PRNGKey(i))), time.time() - t)[1])(
            time.time()) for i in (1, 2))
    step_s = t_loop / bench_steps
    print(f"# denoise: {step_s*1000:.1f} ms/step (compile {compile_s:.0f}s)",
          flush=True)
    # free the big sampler buffers before the VAE stages
    del params
    ref_pano = ref_pers = None

    # VAE decode of the full clip (circularly padded width) + cond encodes
    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    vae = AutoencoderKL(VAEConfig(dtype="bfloat16"))
    vparams = _zeros_params(
        vae, (jnp.zeros((1, 64, 64, 3), jd), jax.random.PRNGKey(0)),
        "bfloat16", rngs={"params": jax.random.PRNGKey(0)})
    z = jnp.zeros((frames, 64, 136, 4), jd)
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    decode_s = _time(dec, vparams, z, iters=2)

    enc_in = jnp.zeros((frames, 512, 1024, 3), jd)
    enc = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    pano_encode_s = _time(enc, vparams, enc_in, iters=2)
    # perspective view encodes, chunked like the pipeline (80 frames/chunk)
    enc_pers_in = jnp.zeros((80, 256, 256, 3), jd)
    encp = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    pers_encode_s = _time(encp, vparams, enc_pers_in, iters=2) * (frames * M / 80)
    del vparams

    # conditioning encoders (the reference runs SAM over 2xF anchor frames,
    # pipeline:675-718; round-1 bench omitted these — now included)
    from imagine360_tpu.models.sam import SAMImageEncoder, SAMConfig
    sam = SAMImageEncoder(SAMConfig(dtype="bfloat16"))
    sparams = _zeros_params(sam, (jnp.zeros((1, 1024, 1024, 3), jd),),
                            "bfloat16", rngs={"params": jax.random.PRNGKey(0)})
    sam_in = jnp.zeros((8, 1024, 1024, 3), jd)
    sfn = jax.jit(lambda p, x: sam.apply(p, x))
    sam_s = _time(sfn, sparams, sam_in, iters=2) * (2 * frames / 8)
    del sparams
    # CLIP text encode (2 prompts x 77 tokens) is <10 ms — folded into the
    # SAM figure's rounding rather than timed separately

    clip_s = (total_steps * step_s + decode_s + pano_encode_s
              + pers_encode_s + sam_s)
    # north star: <60 s on a v5e-8 (BASELINE.md) = 480 chip-seconds;
    # we measure on ONE chip, so compare chip-seconds to chip-seconds.
    # projected_v5e8_s assumes linear scaling over the ('view',) mesh axis
    # (the folded 2x20-view batch shards 5 rows/chip; WarpAttn all-gathers
    # ride ICI). The sharding is validated functionally on an 8-virtual-
    # device mesh (tests/test_mesh_parity.py, dryrun_multichip) — real
    # multi-chip hardware is not available to this environment, so this is
    # a projection, not a measurement.
    target_chip_seconds = 60.0 * 8
    result = {
        "metric": "sec per 16-frame 512x1024 pano clip (1 chip, incl. SAM/VAE conditioning)",
        "value": round(float(clip_s), 3),
        "unit": "s",
        "vs_baseline": round(float(target_chip_seconds / clip_s), 3),
        "detail": {
            "denoise_step_s": round(float(step_s), 4),
            "steps_per_sec_chip": round(float(1.0 / step_s), 3),
            "vae_decode_s": round(float(decode_s), 3),
            "vae_encode_s": round(float(pano_encode_s + pers_encode_s), 3),
            "sam_encode_s": round(float(sam_s), 3),
            "compile_s": round(float(compile_s), 1),
            # conservative: only the denoise scan is mesh-sharded today;
            # SAM/VAE conditioning stages are charged at single-chip speed
            "projected_v5e8_s": round(
                float(total_steps * step_s / 8 + decode_s + pano_encode_s
                      + pers_encode_s + sam_s), 3),
            "projection_basis": "denoise/8 + unsharded conditioning: XLA's "
                                "per-device cost analysis divides the "
                                "denoise step's FLOPs 7.83x on an 8-device "
                                "mesh (scripts/sharded_flops.py; pers "
                                "batch + pano latent-H sharded); sharded "
                                "execution proven on virtual mesh "
                                "(tests/test_mesh_parity.py), real "
                                "multi-chip hardware unavailable here",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
