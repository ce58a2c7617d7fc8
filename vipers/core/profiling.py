"""Tracing / profiling / sanitizers.

Counterpart of SURVEY §5 'Auxiliary subsystems':
  * the reference's only tracing is wall-clock meters
    (`/root/reference/utils.py:101-156`) — ours adds real device traces via
    ``jax.profiler`` (viewable in XProf/TensorBoard),
  * sanitizer story: the reference's file side channel was racy by design
    (SURVEY §5); here purity removes the race class and ``enable_nan_check``
    adds jax's NaN debugger as the numeric sanitizer.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """Capture a device profile for the enclosed region (no-op when None)."""
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[vipers.profiling] trace written to {trace_dir}")


def enable_nan_check(enable: bool = True):
    """jax.debug_nans: fail fast on NaN production anywhere under jit."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """images/sec/chip meter — the BASELINE headline metric
    (keeps the reference's img/s convention, `/root/reference/train.py:80`)."""

    def __init__(self, n_chips: Optional[int] = None):
        self.n_chips = n_chips or jax.local_device_count()
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0

    def step(self, batch_size: int):
        self._images += batch_size

    @property
    def images_per_sec_per_chip(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._images / dt / self.n_chips
