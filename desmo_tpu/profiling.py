"""Profiling and sanitizing hooks (SURVEY §5.1-5.2).

The reference has no profiler, timers, or sanitizers — its only timing signal
is checkpoint filename timestamps. Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace of the training chunk.
* ``StepTimer`` — throughput bookkeeping with correct synchronization on
  runtimes where ``block_until_ready`` does not fence (values are fetched).
* ``debug_nans(enable)`` — toggles JAX's NaN checker, the purity-preserving
  analog of the reference's determinism/sanitizer story (fixed seeds only).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with profiling.trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def fence(tree) -> None:
    """Reliable device fence: fetches one scalar per leaf. On some TPU
    runtimes ``block_until_ready`` returns before execution completes."""
    for leaf in jax.tree.leaves(tree):
        np.asarray(jax.device_get(jax.numpy.ravel(leaf)[0]))


class StepTimer:
    """Accumulates (steps, seconds) intervals; reports steps/sec."""

    def __init__(self):
        self.steps = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, steps: int, sync_tree=None) -> None:
        if sync_tree is not None:
            fence(sync_tree)
        self.seconds += time.perf_counter() - self._t0
        self.steps += steps

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.seconds if self.seconds > 0 else float("nan")
