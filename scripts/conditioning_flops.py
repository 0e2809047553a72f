"""Per-device cost accounting for the sharded conditioning stages.

Same method as scripts/sharded_flops.py, applied to SAM encode and VAE
encode/decode (VERDICT r2 item 4: these stages ran unsharded and were
charged at single-chip speed in bench.py's v5e-8 projection): AOT-compile
each stage on a 1-device and an 8-virtual-device CPU mesh and print XLA's
per-device FLOP count. A ~8x division is the compiler's own statement that
the frame-axis sharding split the program.

Run: python scripts/conditioning_flops.py   (pins CPU + 8 virtual devices)
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

from imagine360_tpu.models.sam import SAMImageEncoder, SAMConfig  # noqa: E402
from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from imagine360_tpu.parallel.mesh import make_mesh, activate_mesh  # noqa: E402

B = 16  # frames


def _flops(fn, args, n_devices):
    mesh = make_mesh(n_devices) if n_devices > 1 else None

    def wrapped(*a):
        with activate_mesh(mesh):
            return fn(*a)

    t0 = time.time()
    compiled = jax.jit(wrapped).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    f = ca.get("flops", float("nan"))
    print(f"  mesh={n_devices}d compile {time.time()-t0:.0f}s  "
          f"flops/device {f:.3e}", flush=True)
    return f


def report(name, fn, args):
    print(name, flush=True)
    f1 = _flops(fn, args, 1)
    f8 = _flops(fn, args, 8)
    print(f"  {name}: per-device FLOP ratio 1d/8d = {f1 / f8:.2f}x "
          f"(ideal 8.00x)", flush=True)
    return f1 / f8


def main():
    # mid-size stand-ins: the FLOP *ratio* is shape-independent once every
    # op carries the frame-axis sharding (production SAM is ViT-B @ 1024^2,
    # too slow to AOT-compile on this 1-core CPU host)
    sam_cfg = SAMConfig(img_size=128, patch_size=16, embed_dim=64, depth=3,
                        num_heads=4, out_chans=32, window_size=4,
                        global_attn_indexes=(1,), global_q_rows=4)
    sam = SAMImageEncoder(sam_cfg)
    x = jnp.zeros((B, 128, 128, 3), jnp.float32)
    sp = sam.init(jax.random.PRNGKey(0), x[:1])
    r_sam = report("SAM encode", lambda p, x: sam.apply(p, x), (sp, x))

    vae_cfg = VAEConfig(block_out_channels=(32, 64, 64),
                        layers_per_block=1, norm_num_groups=8)
    vae = AutoencoderKL(vae_cfg)
    xe = jnp.zeros((B, 64, 128, 3), jnp.float32)
    vp = vae.init({"params": jax.random.PRNGKey(0)}, xe[:1],
                  jax.random.PRNGKey(1))
    r_enc = report("VAE encode",
                   lambda p, x: vae.apply(p, x, method=vae.encode), (vp, xe))
    z = jnp.zeros((B, 16, 32, 4), jnp.float32)
    r_dec = report("VAE decode",
                   lambda p, z: vae.apply(p, z, method=vae.decode), (vp, z))
    print(f"summary: sam {r_sam:.2f}x  vae_enc {r_enc:.2f}x  "
          f"vae_dec {r_dec:.2f}x")


if __name__ == "__main__":
    main()
