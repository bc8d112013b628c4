"""Tracing / profiling.

The reference's observability is wall-clock split into data/iter time plus
max CUDA memory (SURVEY.md §5.1, trainer.py:441-473, logger_hook.py:91-94).
TPU equivalent: the trainer already records data_time/iter_time; this module
adds xprof trace capture (jax.profiler) — either a programmatic window or an
on-demand HTTP server — and device-memory introspection.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

import jax

from ..train.hooks import HookBase

logger = logging.getLogger("lhrs_tpu")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace of the enclosed block (view with tensorboard
    or xprof)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("xprof trace written to %s", log_dir)


def start_profiler_server(port: int = 9999) -> None:
    """On-demand profiling endpoint (connect with xprof/tensorboard)."""
    jax.profiler.start_server(port)
    logger.info("jax profiler server on port %d", port)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for dev in jax.local_devices():
        try:
            stats[str(dev)] = dev.memory_stats()
        except Exception:  # pragma: no cover — backend-dependent
            stats[str(dev)] = None
    return stats


class ProfilerHook(HookBase):
    """Capture an xprof trace for steps [start, stop) of training
    (replaces eyeballing per-iter times when hunting regressions)."""

    def __init__(self, log_dir: str, start_step: int = 10,
                 num_steps: int = 3):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def before_iter(self):
        if self.trainer.cur_iter == self.start_step and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def after_iter(self):
        if self.trainer.cur_iter + 1 == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace (%d steps) → %s",
                        self.stop_step - self.start_step, self.log_dir)

    def after_train(self):
        if self._active:  # trace window extended past the end of training
            jax.profiler.stop_trace()
            self._active = False
