"""Micro-bench: GEGLU activation cost at the r1 feed-forward shape.

Profiling showed the spatial/motion FF fusions run at ~45 TF/s because the
exact (erf) gelu on the [tokens, 2560] gate tensor dominates VPU time.
Candidates: exact erf vs tanh approximation vs sigmoid approximation, in
f32 vs bf16 compute. In bf16 output precision the tanh approximation is
sub-ULP vs exact gelu for the magnitudes seen in practice.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0])


def timeit(name, fn, *args, iters=6):
    t0 = time.time()
    _fetch(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        _fetch(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms (compile {c:.0f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    T, C = 640 * 1024, 1280   # r1 pers FF gate tensor
    x = jax.random.normal(jax.random.PRNGKey(0), (T, C), jnp.bfloat16)
    h = jax.random.normal(jax.random.PRNGKey(1), (T, C), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(2), (C, 320), jnp.bfloat16)

    # numerics: tanh vs exact in bf16
    xs = x[:4096]
    exact = jax.nn.gelu(xs.astype(jnp.float32), approximate=False)
    tanh_ = jax.nn.gelu(xs, approximate=True).astype(jnp.float32)
    sig = (xs.astype(jnp.float32)
           * jax.nn.sigmoid(1.702 * xs.astype(jnp.float32)))
    print("tanh-vs-exact bf16-out maxerr:",
          float(jnp.max(jnp.abs(tanh_.astype(jnp.bfloat16).astype(jnp.float32)
                                - exact.astype(jnp.bfloat16).astype(jnp.float32)))))
    print("sigmoid-vs-exact bf16-out maxerr:",
          float(jnp.max(jnp.abs(sig.astype(jnp.bfloat16).astype(jnp.float32)
                                - exact.astype(jnp.bfloat16).astype(jnp.float32)))))

    # elementwise-only timings (activation + mul, materialized)
    for name, fn in [
        ("gelu_exact", lambda h, x: h * jax.nn.gelu(x, approximate=False)),
        ("gelu_tanh", lambda h, x: h * jax.nn.gelu(x, approximate=True)),
        ("gelu_sigmoid", lambda h, x: h * (x * jax.nn.sigmoid(1.702 * x))),
    ]:
        timeit(name, jax.jit(fn), h, x)

    # fused into the consuming matmul (the real usage): geglu -> net_2
    for name, act in [
        ("ff_exact", lambda x: jax.nn.gelu(x, approximate=False)),
        ("ff_tanh", lambda x: jax.nn.gelu(x, approximate=True)),
        ("ff_sigmoid", lambda x: x * jax.nn.sigmoid(1.702 * x)),
    ]:
        f = jax.jit(lambda h, x, w2, act=act: (h * act(x)) @ w2)
        timeit(name, f, h, x, w2)


if __name__ == "__main__":
    main()
