"""Device-time microbench helper: run a jitted scan-chain under
jax.profiler.trace and report TPU device time per iteration from the
trace's device_duration_ps counters (immune to host/tunnel jitter — the
1-core host is often contended).

Usage as a library:
    from scripts.devtime import dev_time_per_iter
    ms = dev_time_per_iter(lambda c, x: f(x + c), n=20, x)
"""
import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def _trace_device_seconds(logdir):
    tr = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in str(n)}
    total = 0.0
    by_op = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        dur = int(a["device_duration_ps"]) / 1e12
        if name.startswith("while"):
            # the whole-loop span already includes its body; count the
            # loop span alone as ground truth
            total += dur
            continue
        by_op[name] += dur
    if total == 0.0:   # no while wrapper: sum the individual ops
        total = sum(by_op.values())
    return total, by_op


def dev_time_per_iter(body, n, *ops, carry_dtype=jnp.float32):
    """body(carry_scalar, *ops) -> tensor. Chains n dependent iterations
    (scalar carry), traces one execution, returns (seconds_per_iter,
    by_op Counter of device seconds for the whole trace)."""

    @jax.jit
    def g(s0, *ops):
        def step(c, _):
            y = body(c, *ops)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        return jax.lax.scan(step, s0, None, length=n)[0]

    s0 = carry_dtype(0.0)
    np.asarray(g(s0, *ops))  # compile
    logdir = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(logdir):
            np.asarray(g(carry_dtype(1.0), *ops))
        total, by_op = _trace_device_seconds(logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    return total / n, by_op


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache")
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    C = 320
    w = jax.random.normal(key, (C, C), bf)
    shapes = [("pers  [640,1024,320]", (640, 1024, C)),
              ("pano  [32,8192,320]", (32, 8192, C)),
              ("motion[40960,16,320]", (40960, 16, C))]
    for name, shp in shapes:
        x = jax.random.normal(key, shp, bf)
        t3, _ = dev_time_per_iter(
            lambda c, x, w: (x + c.astype(x.dtype)) @ w, 20, x, w)
        t2, _ = dev_time_per_iter(
            lambda c, x, w: ((x + c.astype(x.dtype)).reshape(-1, C) @ w
                             ).reshape(x.shape), 20, x, w)
        tok = int(np.prod(shp[:-1]))
        fl = 2 * tok * C * C
        print(f"{name}: 3d {t3*1e3:7.3f} ms ({fl/t3/1e12:5.1f} TF/s)   "
              f"flat2d {t2*1e3:7.3f} ms ({fl/t2/1e12:5.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
