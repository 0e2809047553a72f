"""Logging, stage timing and device profiling.

The reference's observability is manual memory printfs + tqdm
(src/modules/utils.py:24-35, SURVEY.md §5). Here: structured stage timers,
a step-rate meter for the denoise loop, and a jax.profiler trace helper.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional


def get_logger(name: str = "imagine360") -> logging.Logger:
    logger = logging.getLogger(f"imagine360_tpu.{name}")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class StageTimer:
    """Context-manager stage timer collecting a {stage: seconds} report."""

    def __init__(self, logger: Optional[logging.Logger] = None):
        self.logger = logger
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            if self.logger:
                self.logger.info("stage %-14s %.3fs", name, dt)

    def report(self) -> dict:
        return dict(self.stages)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device HBM stats (replaces the reference's check_cuda_memo)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out
