"""Sampler unit tests: shared-noise init correspondence + mask downsample."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from imagine360_tpu.geometry import CameraRig
from imagine360_tpu.pipeline.conditioning import (init_shared_noise,
                                                  downsample_mask_nearest)


def _rig(m=4, size=16):
    r = CameraRig.icosahedron(image_size=size)
    return r.take(m)


def test_init_shared_noise_correspondence():
    """Perspective noise must be a nearest-neighbor resample of the pano
    noise (shared randomness, reference pipeline init_noise :361-387)."""
    rig = _rig()
    pano, pers = init_shared_noise(jax.random.PRNGKey(0), 1, 2, (16, 32),
                                   (8, 8), rig)
    assert pano.shape == (1, 2, 16, 32, 4)
    assert pers.shape == (1, 4, 2, 8, 8, 4)
    # every pers value must exist somewhere in the pano noise field of the
    # same frame (nearest-neighbor sampling copies values)
    pano_f = np.asarray(pano)[0, 0].reshape(-1, 4)
    pers_f = np.asarray(pers)[0, :, 0].reshape(-1, 4)
    # check a handful of positions
    for i in range(0, pers_f.shape[0], 37):
        diff = np.abs(pano_f - pers_f[i]).sum(-1)
        assert diff.min() < 1e-6


def test_denoise_scan_matches_closed_form():
    """With a zero model output (zero params), v-prediction DDIM has the
    closed form x' = (sqrt(a_prev * a_t) + sqrt((1-a_prev)(1-a_t))) * x at
    every step; the compiled scan must reproduce it (validates CFG combine,
    step coefficient gathers, and the scan plumbing)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    from __graft_entry__ import _zeros_params
    from imagine360_tpu.presets import micro_dual_config
    from imagine360_tpu.models.dual import DualUNet, warp_sites
    from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                                 SamplerConfig,
                                                 build_dual_warp_geoms)

    M, F = 8, 2
    cfg = micro_dual_config(num_views=M)
    rig = _rig(M, 16)
    geoms = build_dual_warp_geoms(cfg, rig, (16, 16), (16, 32))
    model = DualUNet(cfg)
    steps = 3
    sampler = DualDiffusionSampler(
        model, SamplerConfig(num_steps=steps, add_ip_noise=False))

    rng = np.random.default_rng(0)
    pano0 = jnp.asarray(rng.normal(size=(1, F, 16, 32, 4)).astype(np.float32))
    pers0 = jnp.asarray(rng.normal(size=(1, M, F, 16, 16, 4)).astype(np.float32))
    z = lambda *s: jnp.zeros(s, jnp.float32)
    n_sites = len(warp_sites(2))
    init_args = (
        jnp.concatenate([pers0, z(1, M, F, 16, 16, 1),
                         z(1, M, F, 16, 16, 4)], -1),
        jnp.concatenate([pano0, z(1, F, 16, 32, 1), z(1, F, 16, 32, 4)], -1),
        z(1), z(M, 7, 32), z(1, 7, 32), z(1), z(M, 16, 16, 8),
        z(1, 16, 16, 8), z(1, F, 6), z(1, F), geoms, jnp.zeros((n_sites,),
                                                               bool))
    params = _zeros_params(model, init_args, "float32")

    pano_out, pers_out = sampler.denoise(
        params, jax.random.PRNGKey(0), pano0, pers0,
        z(1, F, 16, 32, 1), z(1, F, 16, 32, 4),
        z(1, M, F, 16, 16, 1), z(1, M, F, 16, 16, 4),
        z(2, 7, 32), z(2 * M, 7, 32), geoms,
        None, z(2, 16, 16, 8), z(2 * M, 16, 16, 8), z(2, F, 6), z(2, F))

    c = sampler.schedule.step_coeffs()
    factor = 1.0
    for i in range(steps):
        a_t, a_p = c["alpha_prod_t"][i], c["alpha_prod_t_prev"][i]
        factor *= (np.sqrt(a_p * a_t) + np.sqrt((1 - a_p) * (1 - a_t)))
    np.testing.assert_allclose(np.asarray(pano_out), np.asarray(pano0) * factor,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pers_out), np.asarray(pers0) * factor,
                               rtol=2e-4, atol=1e-5)


def test_downsample_mask_nearest():
    m = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1)
    d = downsample_mask_nearest(m, 4)
    assert d.shape == (1, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(d)[0, :, :, 0],
                                  [[0, 4], [32, 36]])


def test_denoise_dpm_solver_closed_form():
    """solver='dpmpp_2m' in the dual sampler: with a zero model, the
    v-prediction data estimate is x0 = alpha_t * x, and the per-step DPM++
    update has a closed form the compiled scan must reproduce."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _zeros_params
    from imagine360_tpu.presets import micro_dual_config
    from imagine360_tpu.models.dual import DualUNet, warp_sites
    from imagine360_tpu.pipeline.sampler import (DualDiffusionSampler,
                                                 SamplerConfig,
                                                 build_dual_warp_geoms)
    from imagine360_tpu.diffusion.dpm import dpmpp_2m_step

    M, F = 8, 2
    cfg = micro_dual_config(num_views=M)
    rig = _rig(M, 16)
    geoms = build_dual_warp_geoms(cfg, rig, (16, 16), (16, 32))
    model = DualUNet(cfg)
    steps = 3
    sampler = DualDiffusionSampler(
        model, SamplerConfig(num_steps=steps, add_ip_noise=False,
                             solver="dpmpp_2m"))

    rng = np.random.default_rng(1)
    pano0 = jnp.asarray(rng.normal(size=(1, F, 16, 32, 4)).astype(np.float32))
    pers0 = jnp.asarray(rng.normal(size=(1, M, F, 16, 16, 4)).astype(np.float32))
    z = lambda *s: jnp.zeros(s, jnp.float32)
    n_sites = len(warp_sites(2))
    init_args = (
        jnp.concatenate([pers0, z(1, M, F, 16, 16, 1),
                         z(1, M, F, 16, 16, 4)], -1),
        jnp.concatenate([pano0, z(1, F, 16, 32, 1), z(1, F, 16, 32, 4)], -1),
        z(1), z(M, 7, 32), z(1, 7, 32), z(1), z(M, 16, 16, 8),
        z(1, 16, 16, 8), z(1, F, 6), z(1, F), geoms, jnp.zeros((n_sites,),
                                                               bool))
    params = _zeros_params(model, init_args, "float32")

    pano_out, _ = sampler.denoise(
        params, jax.random.PRNGKey(0), pano0, pers0,
        z(1, F, 16, 32, 1), z(1, F, 16, 32, 4),
        z(1, M, F, 16, 16, 1), z(1, M, F, 16, 16, 4),
        z(2, 7, 32), z(2 * M, 7, 32), geoms,
        None, z(2, 16, 16, 8), z(2 * M, 16, 16, 8), z(2, F, 6), z(2, F))

    # replay the same updates with dpmpp_2m_step directly
    coeffs = {k: jnp.asarray(v) for k, v in
              sampler.dpm_schedule.step_coeffs().items()}
    x = pano0
    x0_prev = jnp.zeros_like(pano0)
    for i in range(steps):
        x, x0_prev = dpmpp_2m_step(x, jnp.zeros_like(x), i, coeffs,
                                   x0_prev, "v_prediction")
    np.testing.assert_allclose(np.asarray(pano_out), np.asarray(x),
                               rtol=2e-4, atol=1e-5)
