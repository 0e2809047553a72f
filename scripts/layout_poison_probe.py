"""Reproduce the in-step layout poison in the smallest context.

The full-step profile shows motion/spatial transformer matmuls running
with transposed-layout conv emitters (EmitAllBatchInSublanes etc.) at ~48
TF/s + repair copies, while the identical chains in isolation run at 157
TF/s. This probe runs the REAL model modules at in-step shapes in
increasingly step-like contexts until the slow emitters appear, reporting
device ms/iter vs the matmul roofline.

Usage: python scripts/layout_poison_probe.py [probe ...]
Probes: motion, motion_scan, spatial, block, block2, dual_slice
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from scripts.devtime import dev_time_per_iter  # noqa: E402

B, F, H, W, C = 40, 16, 32, 32, 320


def _params(model, *args):
    return model.init(jax.random.PRNGKey(0), *args)


def probe_motion():
    """One MotionModule at pers stage-0 shape."""
    from imagine360_tpu.models.motion import MotionModule
    m = MotionModule(heads=8, dtype=jnp.bfloat16)
    x = jnp.zeros((B, F, H, W, C), jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x)
    xr = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)

    def body(c, xr, p):
        return m.apply(p, xr + c.astype(xr.dtype))

    t, by = dev_time_per_iter(body, 10, xr, p)
    return t


def probe_spatial():
    """One spatial Transformer3D block (attention3d) at stage-0 shape."""
    from imagine360_tpu.models.attention3d import Transformer3DModel
    m = Transformer3DModel(heads=5, dim_head=64, dtype=jnp.bfloat16)
    x = jnp.zeros((B, F, H, W, C), jnp.bfloat16)
    ctx = jnp.zeros((B, 141, 1024), jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x, ctx)
    xr = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)

    def body(c, xr, p):
        return m.apply(p, xr + c.astype(xr.dtype), ctx)

    t, by = dev_time_per_iter(body, 10, xr, p)
    return t


def probe_block(n_res=1):
    """Resnet(s) + spatial attention + motion module chained (the real
    down-block composition at stage 0)."""
    from imagine360_tpu.models.unet3d import UNet3DConfig, UNet3DConditionModel
    cfg = UNet3DConfig(dtype="bfloat16")
    model = UNet3DConditionModel(cfg)
    # full single-branch stage-0 walk is complex; use the down block alone
    from imagine360_tpu.models.resnet import ResnetBlock3D
    from imagine360_tpu.models.attention3d import Transformer3DModel
    from imagine360_tpu.models.motion import MotionModule
    import flax.linen as nn

    class Stage0(nn.Module):
        @nn.compact
        def __call__(self, x, temb, ctx):
            for i in range(n_res):
                x = ResnetBlock3D(C, dtype=jnp.bfloat16,
                                  name=f"res{i}")(x, temb)
                x = Transformer3DModel(heads=5, dim_head=64,
                                       dtype=jnp.bfloat16,
                                       name=f"attn{i}")(x, ctx)
                x = MotionModule(heads=8, dtype=jnp.bfloat16,
                                 name=f"mm{i}")(x)
            return x

    m = Stage0()
    x = jnp.zeros((B, F, H, W, C), jnp.bfloat16)
    temb = jnp.zeros((B, 1280), jnp.bfloat16)
    ctx = jnp.zeros((B, 141, 1024), jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x, temb, ctx)
    xr = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)

    def body(c, xr, p):
        return m.apply(p, xr + c.astype(xr.dtype), temb, ctx)

    t, by = dev_time_per_iter(body, 8, xr, p)
    return t


PROBES = {
    "motion": probe_motion,
    "spatial": probe_spatial,
    "block": lambda: probe_block(1),
    "block2": lambda: probe_block(2),
}


def main():
    names = sys.argv[1:] or ["motion", "spatial", "block"]
    for n in names:
        t = PROBES[n]()
        print(f"{n:10s}: {t*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
