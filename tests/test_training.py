"""Training step + remat tests (micro config, CPU)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from imagine360_tpu.presets import micro_unet_config
from imagine360_tpu.models.unet3d import UNet3DConditionModel


def test_remat_grads_match():
    """Gradients with per-block remat must equal the non-remat gradients."""
    cfg0 = micro_unet_config()
    cfg1 = dataclasses.replace(cfg0, remat=True)
    x = jnp.ones((1, 2, 8, 16, 9)) * 0.1
    t = jnp.array([10.0])
    fps = jnp.array([8.0])
    text = jnp.ones((1, 7, 32)) * 0.1
    ref = jnp.ones((1, 16, 16, 8)) * 0.1

    m0 = UNet3DConditionModel(cfg0)
    m1 = UNet3DConditionModel(cfg1)
    p0 = m0.init(jax.random.PRNGKey(0), x, t, text, fps, ref)

    def loss(p, m):
        return jnp.mean(m.apply(p, x, t, text, fps, ref) ** 2)

    g0 = jax.grad(lambda p: loss(p, m0))(p0)
    g1 = jax.grad(lambda p: loss(p, m1))(p0)
    md = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g0, g1)))
    assert md < 1e-5, md


def test_metrics():
    from imagine360_tpu.utils.metrics import psnr, ssim
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(32, 32, 3))
    assert ssim(a, a) > 0.9999
    assert psnr(a, a) == float("inf")
    b = np.clip(a + rng.normal(size=a.shape) * 0.1, 0, 1)
    assert 0.2 < ssim(a, b) < 0.99
    assert 15 < psnr(a, b) < 30
