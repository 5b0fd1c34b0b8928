"""Device-honest timing (SURVEY.md N9).

The sandbox TPU sits behind an RPC relay where ``block_until_ready`` can
return before execution finishes and a dispatch round-trip costs ~25 ms,
so naive wall-clock loops measure the relay, not the chip. The honest
recipe has two parts:

1. Chain `iters` applications of the op INSIDE one jit via lax.fori_loop
   (real data dependency between iterations), reduce to a scalar, and
   fetch it to host — the fetch is the only true sync point.
2. TWO-POINT CALIBRATION: even a single chained run still pays the relay
   round-trip once (~26 ms measured here — comparable to dozens of
   iterations of a fast step!). Measure at two iteration counts and take
   the slope: per_iter = (t_hi - t_lo) / (iters_hi - iters_lo). This
   cancels the RTT and any other fixed per-dispatch cost exactly.

The iteration count is a TRACED argument to one jitted runner per step
(dynamic-trip-count fori_loop), so a full calibration — lo chain, hi
chain, and any chain-doubling retries on noise — costs exactly ONE XLA
compile per measured path. (Round 2 compiled a fresh program per
iteration count; with 4 measured paths that put `bench.py` at 9+ min
wall, over the driver's capture budget — VERDICT.md r2 #1.)

Calibration on this chip (2026-08-16): RTT ≈ 26.6 ms; slope-measured
bf16 4096³ matmul hits 190 TF/s (96% of v5e peak) and elementwise
streams at ~620 GB/s — so slope numbers reflect real silicon.
"""

from __future__ import annotations

import time
import weakref
from typing import Callable

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp

# One compiled runner per step function (weak so benches don't leak
# compiled executables). Keyed on the step object: all lo/hi/retry
# chains inside one time_chained call share a single compile. The
# cached runner must reference `step` only through a weakref — a value
# that strongly references its own key is the documented
# WeakKeyDictionary pitfall that would keep every entry alive forever.
_RUNNERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _runner_for(step: Callable):
    try:
        run = _RUNNERS.get(step)
    except TypeError:  # unhashable/non-weakrefable step: just rebuild
        run = None
    if run is None:
        try:
            get_step = weakref.ref(step)
        except TypeError:  # non-weakrefable: uncacheable, strong is fine
            get_step = lambda: step  # noqa: E731

        @jax.jit
        def run(carry, iters):
            s = get_step()
            if s is None:  # retrace after the step died (can't happen
                raise RuntimeError(  # while the caller holds `step`)
                    "bench step function was garbage-collected"
                )
            carry = jax.lax.fori_loop(0, iters, lambda _, c: s(c), carry)
            return jnp.sum(jax.flatten_util.ravel_pytree(carry)[0][:8])

        try:
            _RUNNERS[step] = run
        except TypeError:
            pass
    return run


def _run_chained(step: Callable, init_carry, iters: int, repeats: int) -> float:
    """Best-of-N wall time of `iters` chained steps in one dispatch.

    `iters` is traced (dynamic fori_loop trip count): calling this again
    with a different count reuses the same executable.
    """
    run = _runner_for(step)
    s = float(run(init_carry, iters))  # compile (first call only) + warm
    assert s == s, "NaN in timing chain"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(init_carry, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def time_chained(
    step: Callable,
    init_carry,
    iters: int = 32,
    warmup: bool = True,  # kept for API compat; warmup always happens
    repeats: int = 3,
    calibrate: bool = True,
    strict: bool = False,
) -> float:
    """Seconds per iteration of ``carry -> step(carry)`` chained on device.

    ``step`` must return a pytree of the same structure as ``init_carry``
    (that dependency is what defeats dead-code elimination and pipelined
    dispatch). With calibrate=True (default) the fixed dispatch/RTT cost
    is cancelled by measuring at two iteration counts and taking the
    slope; calibrate=False returns the naive t/iters (inflated by RTT/
    iters — only useful for very slow steps).

    If the slope stays non-positive after four chain-doublings (relay
    noise), the default strict=False falls back to the naive long-chain
    estimate with a warning (an upper bound: inflated by RTT/iters) so
    one noisy measurement cannot abort a whole multi-shape bench sweep;
    strict=True raises instead.
    """
    del warmup
    if not calibrate:
        return _run_chained(step, init_carry, iters, repeats) / iters
    iters = max(iters, 4)  # the slope needs lo < iters
    # Relay noise can make a short pair non-monotone; lengthen the chain
    # until the slope is positive (every caller gets this guard). All
    # retries reuse the single compiled runner.
    t_hi = None
    for _ in range(4):
        lo = max(1, iters // 4)
        t_lo = _run_chained(step, init_carry, lo, repeats)
        t_hi = _run_chained(step, init_carry, iters, repeats)
        slope = (t_hi - t_lo) / (iters - lo)
        if slope > 0:
            return slope
        iters *= 2
    if strict:
        raise RuntimeError(
            "calibrated timing: no positive slope after lengthening chains "
            "(relay too noisy or step too fast)"
        )
    import warnings

    # iters was doubled once past the last run; the last t_hi used iters//2.
    naive = t_hi / (iters // 2)
    warnings.warn(
        "calibrated timing: no positive slope after lengthening chains; "
        f"falling back to UNCALIBRATED estimate {naive:.3e}s/iter "
        "(upper bound — includes dispatch RTT/iters)"
    )
    return naive
