"""Sharded conditioning stages == single-device (VERDICT r2 item 4).

Round 2 left SAM encode and the VAE encode/decode unsharded — on a real
v5e-8 they become the tail of the clip time. These tests run the same
tiny SAM encoder / VAE on (a) one device and (b) under an active 8-device
('view',) mesh with the new frame-axis shard constraints
(models/sam.py, models/vae.py), and assert identical outputs plus real
8-way sharding annotations in the lowered HLO.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from imagine360_tpu.models.sam import SAMImageEncoder, SAMConfig
from imagine360_tpu.models.vae import AutoencoderKL, VAEConfig
from imagine360_tpu.parallel.mesh import make_mesh, activate_mesh

B = 16   # frame batch: 2 per device on the 8-device mesh

SAM_CFG = SAMConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=4, out_chans=16, window_size=2,
                    global_attn_indexes=(1,), global_q_rows=2)
VAE_CFG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4)


@pytest.fixture(scope="module")
def sam_setup():
    model = SAMImageEncoder(SAM_CFG)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    return model, params, x


@pytest.fixture(scope="module")
def vae_setup():
    model = AutoencoderKL(VAE_CFG)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, 32, 32, 3)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1],
                        jax.random.PRNGKey(1))
    return model, params, x


def _run(fn, mesh):
    def wrapped(*a):
        with activate_mesh(mesh):
            return fn(*a)
    return jax.jit(wrapped)


def test_sam_sharded_matches_single(sam_setup):
    model, params, x = sam_setup
    single = np.asarray(_run(lambda p, x: model.apply(p, x), None)(params, x))
    mesh = make_mesh(8)
    sharded = np.asarray(
        _run(lambda p, x: model.apply(p, x), mesh)(params, x))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-4)


def test_sam_actually_shards(sam_setup):
    model, params, x = sam_setup
    mesh = make_mesh(8)
    txt = _run(lambda p, x: model.apply(p, x), mesh
               ).lower(params, x).as_text()
    shardy = ('sdy.sharding_constraint' in txt
              and '["view"=8]' in txt.replace(" ", ""))
    mhlo = ("mhlo.sharding" in txt and "devices=[8" in txt.replace(" ", ""))
    assert shardy or mhlo, "no 8-way sharding annotations in SAM HLO"


def test_vae_encode_sharded_matches_single(vae_setup):
    model, params, x = vae_setup
    enc = lambda p, x: model.apply(p, x, method=model.encode)  # noqa: E731
    m1, l1 = _run(enc, None)(params, x)
    mesh = make_mesh(8)
    m8, l8 = _run(enc, mesh)(params, x)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1),
                               atol=2e-5, rtol=1e-4)


def test_vae_decode_sharded_matches_single(vae_setup):
    model, params, _ = vae_setup
    z = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, 4, 4, 4)), jnp.float32)
    dec = lambda p, z: model.apply(p, z, method=model.decode)  # noqa: E731
    single = np.asarray(_run(dec, None)(params, z))
    mesh = make_mesh(8)
    sharded = np.asarray(_run(dec, mesh)(params, z))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-4)


def test_vae_decode_actually_shards(vae_setup):
    model, params, _ = vae_setup
    z = jnp.zeros((B, 4, 4, 4), jnp.float32)
    dec = lambda p, z: model.apply(p, z, method=model.decode)  # noqa: E731
    mesh = make_mesh(8)
    txt = _run(dec, mesh).lower(params, z).as_text()
    shardy = ('sdy.sharding_constraint' in txt
              and '["view"=8]' in txt.replace(" ", ""))
    mhlo = ("mhlo.sharding" in txt and "devices=[8" in txt.replace(" ", ""))
    assert shardy or mhlo, "no 8-way sharding annotations in VAE HLO"
