"""Tracing / profiling hooks (SURVEY.md §7 row 1).

The reference has time.time() prints at most; here: jax.profiler traces
(XProf/Perfetto-compatible dumps for per-kernel MXU utilization checks of
the fused layer kernel) plus an optional NaN-debug mode (§7 row 2 — jit
purity makes data races structurally absent; NaN checks are the
remaining runtime hazard class).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dladmm_trace"):
    """Capture an XLA profiler trace around a code block:

        with profiling.trace("/tmp/tr"):
            step(state, batch)[1].block_until_ready()

    Inspect with XProf/TensorBoard or convert to Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug(enable: bool = True) -> None:
    """Config-flagged NaN detection (SURVEY.md §7 race/sanitizer row)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Lightweight scalar-sync step timer for training-loop logging."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        t = time.perf_counter()
        dt = t - self.t0
        self.t0 = t
        return dt
