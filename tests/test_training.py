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


def test_train_config_ema_accum():
    """EMA shadow params track the weights; gradient accumulation defers
    the optax update until the accumulation boundary."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from imagine360_tpu.training.train import (TrainConfig, TrainState,
                                               make_optimizer)
    import optax

    cfg = TrainConfig(lr=1e-2, ema_decay=0.9, accum_steps=2, grad_clip=1.0,
                      warmup_steps=2, total_steps=10)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       ema_params=jax.tree.map(jnp.copy, params))

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2)

    prev_w = np.asarray(state.params["w"])
    for i in range(4):
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: e * cfg.ema_decay + (1 - cfg.ema_decay) * p,
            state.ema_params, new_params)
        state = TrainState(new_params, opt_state, state.step + 1, ema)
        w = np.asarray(state.params["w"])
        if i == 0:
            # first micro-step of an accumulation pair: no update yet
            np.testing.assert_allclose(w, prev_w)
        prev_w = w
    # after 4 micro-steps (2 real updates + warmup) the weights moved
    assert abs(float(state.params["w"][0]) - 1.0) > 1e-6
    # EMA lags behind but tracks
    assert abs(float(state.ema_params["w"][0]) - 1.0) < \
        abs(float(state.params["w"][0]) - 1.0) + 1e-9
