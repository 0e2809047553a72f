"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

NOTE: this machine's sitecustomize registers a remote-tunneled TPU ("axon")
platform and pins JAX_PLATFORMS=axon; running the test suite over the tunnel
makes every eager dispatch a network round trip. Hard-override to CPU here,
both via env (before first backend init) and via jax.config (in case the
plugin prepended itself)."""
import os

# silence XLA's cpu_aot_loader false-positive SIGILL warnings on every
# compile-cache hit (the cache stores XLA's prefer-no-gather/scatter
# pseudo-features, which the loader doesn't recognize as host features —
# same machine, spurious message)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()

# persistent compilation cache: repeat suite runs skip most XLA compiles
from imagine360_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

# ---------------------------------------------------------------------------
# fast/slow split: the full suite costs ~50 min on this 1-core host, almost
# all of it XLA CPU compiles in the virtual-mesh and golden-e2e modules.
# Default developer loop:  pytest -m "not slow and not mesh"   (~ minutes)
# Full suite (driver/CI):  pytest tests/ -x -q                 (unchanged)
# ---------------------------------------------------------------------------
_MESH_MODULES = {
    "test_mesh_parity", "test_sharded_attention", "test_sharded_flops",
    "test_sharded_conditioning",
}
_SLOW_MODULES = {
    "test_golden_pipeline", "test_pipeline_e2e", "test_golden_dual",
    "test_golden_unet", "test_training", "test_real_video",
    "test_ssim_harness",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _MESH_MODULES:
            item.add_marker(pytest.mark.mesh)
            item.add_marker(pytest.mark.slow)
        elif mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
