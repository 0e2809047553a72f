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
