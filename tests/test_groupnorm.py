"""GroupNorm implementations: the matmul-reduction path (both stats modes)
must match flax nn.GroupNorm bit-closely (golden parity depends on it)."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _ref(p, x, inflated=True):
    class Ref(nn.Module):
        @nn.compact
        def __call__(self, z):
            norm = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")
            if inflated and z.ndim == 5:
                B, F, H, W, C = z.shape
                return norm(z.reshape(B * F, H, W, C)).reshape(z.shape)
            return norm(z)
    return Ref().apply(p, x)


def test_fast_group_norm_modes():
    from imagine360_tpu.models.layers import GroupNorm
    from imagine360_tpu.ops.dispatch import configure
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 320),
                          jnp.float32) * 2 + 0.5
    gn = GroupNorm(32, 1e-6, inflated=True)
    p = gn.init(jax.random.PRNGKey(1), x)
    for mode in ({}, {"gn_mmstats": True}, {"flax_gn": True}):
        with configure(**mode):
            y = gn.apply(p, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(p, x)),
                                   atol=5e-5, err_msg=str(mode))


def test_fast_group_norm_huge_spatial_regime():
    """spatial > 16384 routes to the flax path; numerics must agree."""
    from imagine360_tpu.models.layers import GroupNorm
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 192, 96, 32),
                          jnp.float32)
    gn = GroupNorm(32, 1e-6)
    p = gn.init(jax.random.PRNGKey(1), x)
    y = gn.apply(p, x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_ref(p, x, inflated=False)),
                               atol=5e-5)
