"""Cross-process persistent-cache probe (axon TPU).

Runs a tiny jit twice; with jax_explain_cache_misses on, a second process
should HIT the entry the first wrote. If it misses, the explanation log
shows whether the key (backend fingerprint, compile options, etc.) differs
across processes — diagnosing why the big denoise executable recompiles
despite a written cache entry.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/cache_probe.py
"""
import logging
import sys

logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

from imagine360_tpu.utils.compile_cache import enable_compile_cache

import jax
import jax.numpy as jnp

enable_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

print("devices:", jax.devices(), file=sys.stderr)


@jax.jit
def probe(x):
    for _ in range(8):
        x = jnp.tanh(x @ x) + 0.5
    return x.sum()


x = jnp.ones((256, 256), jnp.bfloat16)
import time
t0 = time.time()
out = float(probe(x))
print(f"probe out={out:.3f} first-call wall={time.time()-t0:.2f}s")
