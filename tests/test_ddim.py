import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from imagine360_tpu.diffusion import (
    make_ddim_schedule, ddim_step, add_noise, get_velocity,
)

CONFIG = dict(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    beta_schedule="linear", steps_offset=1, prediction_type="v_prediction",
    rescale_betas_zero_snr=True, clip_sample=False,
)


def test_schedule_shapes_and_zero_snr():
    s = make_ddim_schedule(num_inference_steps=50, **CONFIG)
    assert s.timesteps.shape == (50,)
    # steps_offset=1: first timestep is 981, last is 1
    assert s.timesteps[0] == 981 and s.timesteps[-1] == 1
    # zero terminal SNR: alpha_bar at T-1 is ~0
    assert s.alphas_cumprod[-1] == pytest.approx(0.0, abs=1e-10)
    # first alpha unchanged by the rescale
    assert s.alphas_cumprod[0] == pytest.approx(1 - 0.00085, rel=1e-5)


def test_vpred_step_recovers_ideal_target():
    """With a perfect v prediction, one step lands exactly on the DDIM
    posterior mean sqrt(a_prev) x0 + sqrt(1-a_prev) eps."""
    s = make_ddim_schedule(num_inference_steps=50, **CONFIG)
    c = s.step_coeffs()
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    eps = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    for i in [0, 10, 49]:
        a_t, a_prev = c["alpha_prod_t"][i], c["alpha_prod_t_prev"][i]
        x_t = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
        v = np.sqrt(a_t) * eps - np.sqrt(1 - a_t) * x0
        prev = np.asarray(ddim_step(jnp.asarray(v), jnp.asarray(x_t),
                                    a_t, a_prev))
        expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(prev, expected, atol=1e-5)


def test_add_noise_get_velocity_consistency():
    s = make_ddim_schedule(num_inference_steps=50, **CONFIG)
    acp = jnp.asarray(s.alphas_cumprod)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    t = jnp.asarray([5, 500, 990])
    x_t = add_noise(x0, eps, acp, t)
    v = get_velocity(x0, eps, acp, t)
    # invert: x0 = sqrt(a) x_t - sqrt(1-a) v
    a = s.alphas_cumprod[np.asarray(t)][:, None, None]
    rec = np.sqrt(a) * np.asarray(x_t) - np.sqrt(1 - a) * np.asarray(v)
    np.testing.assert_allclose(rec, np.asarray(x0), atol=1e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_golden_vs_reference_scheduler():
    """Bit-compare schedule + step against the vendored diffusers scheduler
    the reference pipeline uses (run on CPU torch)."""
    torch = pytest.importorskip("torch")
    import refshim
    refshim.install()
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    ref = DDIMScheduler(num_train_timesteps=1000, beta_start=0.00085,
                        beta_end=0.012, beta_schedule="linear",
                        steps_offset=1, clip_sample=False,
                        prediction_type="v_prediction",
                        rescale_betas_zero_snr=True)
    ref.set_timesteps(50)
    ours = make_ddim_schedule(num_inference_steps=50, **CONFIG)

    np.testing.assert_array_equal(ours.timesteps,
                                  ref.timesteps.numpy().astype(np.int32))
    np.testing.assert_allclose(ours.alphas_cumprod,
                               ref.alphas_cumprod.numpy(), atol=1e-6)

    rng = np.random.default_rng(2)
    sample = rng.normal(size=(1, 4, 8, 16)).astype(np.float32)
    model_out = rng.normal(size=(1, 4, 8, 16)).astype(np.float32)
    coeffs = ours.step_coeffs()
    for i in [0, 25, 49]:
        t = int(ours.timesteps[i])
        theirs = ref.step(torch.from_numpy(model_out), t,
                          torch.from_numpy(sample)).prev_sample.numpy()
        mine = np.asarray(ddim_step(jnp.asarray(model_out),
                                    jnp.asarray(sample),
                                    coeffs["alpha_prod_t"][i],
                                    coeffs["alpha_prod_t_prev"][i]))
        np.testing.assert_allclose(mine, theirs, atol=2e-5)
