"""Device profile of the VAE decode (16 frames, 512x1024 pano + circular
pad) — bench shows 8-12 s for ~30 TFLOP of convs (should be ~0.3 s), a
30x anomaly worth root-causing.

Usage: python scripts/vae_profile.py [outdir]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vaeprof"
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _zeros_params
    from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
    from scripts.profile_step import aggregate

    jd = jnp.bfloat16
    vae = AutoencoderKL(VAEConfig(dtype="bfloat16"))
    vparams = _zeros_params(
        vae, (jnp.zeros((1, 64, 64, 3), jd), jax.random.PRNGKey(0)),
        "bfloat16", rngs={"params": jax.random.PRNGKey(0)})
    z = jnp.zeros((16, 64, 136, 4), jd)
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    np.asarray(dec(vparams, z))
    t0 = time.time()
    np.asarray(dec(vparams, z))
    print(f"decode: {time.time()-t0:.2f}s", flush=True)

    with jax.profiler.trace(outdir):
        np.asarray(dec(vparams, z))
    import glob
    import gzip
    time.sleep(2)
    traces = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, outdir
    aggregate(max(traces, key=os.path.getmtime), 1)


if __name__ == "__main__":
    main()
