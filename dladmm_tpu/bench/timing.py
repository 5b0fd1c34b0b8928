"""Device-honest timing (SURVEY.md N9).

The sandbox TPU sits behind an RPC relay where ``block_until_ready`` can
return before execution finishes and a dispatch round-trip costs ~25 ms,
so naive wall-clock loops measure the relay, not the chip. The honest
recipe: chain `iters` applications of the op INSIDE one jit via
lax.fori_loop (real data dependency between iterations), reduce to a
scalar, and fetch it to host — the fetch is the only true sync point.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_chained(
    step: Callable,
    init_carry,
    iters: int = 50,
    warmup: bool = True,
) -> float:
    """Seconds per iteration of ``carry -> step(carry)`` chained on device.

    ``step`` must return a pytree of the same structure as ``init_carry``
    (that dependency is what defeats dead-code elimination and pipelined
    dispatch). Scalar-fetch syncs the measurement.
    """

    @jax.jit
    def run(carry):
        carry = jax.lax.fori_loop(
            0, iters, lambda _, c: step(c), carry
        )
        return jnp.sum(jax.flatten_util.ravel_pytree(carry)[0][:8])

    if warmup:
        float(run(init_carry))
    t0 = time.perf_counter()
    s = float(run(init_carry))
    dt = time.perf_counter() - t0
    assert s == s, "NaN in timing chain"
    return dt / iters
