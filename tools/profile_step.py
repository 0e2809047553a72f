"""Dump a jax.profiler trace of one full denoise scan (view in xprof/
tensorboard). Usage: python tools/profile_step.py [logdir]"""
import sys

import jax

sys.path.insert(0, ".")
from tools.measure_step import build  # noqa: E402
from imagine360_tpu.presets import full_dual_config  # noqa: E402
from imagine360_tpu.utils.observability import profile_trace  # noqa: E402


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/i360_trace"
    cfg = full_dual_config("bfloat16")
    call, *_ = build(3, cfg)
    out = call(jax.random.PRNGKey(0))   # compile outside the trace
    jax.block_until_ready(out)
    with profile_trace(logdir):
        out = call(jax.random.PRNGKey(1))
        jax.block_until_ready(out)
    print("trace written to", logdir)


if __name__ == "__main__":
    main()
