"""Benchmark: seconds per 16-frame 512x1024 panorama clip on one TPU chip.

Measures the real compiled hot path: one full dual-branch denoise step
(CFG 2 x [20 perspective views + panorama], 16 frames, bf16, production
architecture) and the VAE decode, then extrapolates the reference sampling
recipe (50 DDIM steps, reference inference_dual_p2e.py:324 + per-frame VAE
decode, pipeline_animation_inference_dual.py:306-308).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline is measured against the 60 s north-star target from
BASELINE.json (the reference publishes no numbers of its own).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _zeros_params

    frames = 16
    num_steps = 50

    model, args = _flagship(frames=frames)
    params = _zeros_params(model, args, "bfloat16")

    def fn(params, *args):
        return model.apply(params, *args, add_ip_noise=False)

    step = jax.jit(fn)
    # warmup/compile
    t0 = time.time()
    out = step(params, *args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    n = 3
    t0 = time.time()
    for _ in range(n):
        out = step(params, *args)
    jax.block_until_ready(out)
    step_s = (time.time() - t0) / n

    # VAE decode: 16 frames of 64x(128+8 wrap pad) latents -> 512x1088
    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    vae = AutoencoderKL(VAEConfig(dtype="bfloat16"))
    z = jnp.zeros((1, 64, 136, 4), jnp.bfloat16)
    vparams = _zeros_params(vae, (jnp.zeros((1, 512, 1088, 3), jnp.bfloat16),
                                  jax.random.PRNGKey(0)), "bfloat16",
                            rngs={"params": jax.random.PRNGKey(0)})
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    jax.block_until_ready(dec(vparams, z))
    t0 = time.time()
    for _ in range(2):
        o = dec(vparams, z)
    jax.block_until_ready(o)
    decode_s = (time.time() - t0) / 2 * frames

    # VAE encodes for conditioning: 16 pano frames (512x1024) + 320
    # perspective frames (256x256) ~= equivalent of ~36 pano frames
    enc_in = jnp.zeros((1, 512, 1024, 3), jnp.bfloat16)
    enc = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    jax.block_until_ready(enc(vparams, enc_in))
    t0 = time.time()
    o = enc(vparams, enc_in)
    jax.block_until_ready(o)
    encode_s = (time.time() - t0) * (frames + frames * 20 / 8.0)

    clip_s = num_steps * step_s + decode_s + encode_s
    target = 60.0
    result = {
        "metric": "sec per 16-frame 512x1024 pano clip (1 chip)",
        "value": round(clip_s, 3),
        "unit": "s",
        "vs_baseline": round(target / clip_s, 3),
        "detail": {
            "denoise_step_s": round(step_s, 4),
            "steps_per_sec_chip": round(1.0 / step_s, 3),
            "vae_decode_s": round(decode_s, 3),
            "vae_encode_s": round(encode_s, 3),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
