"""Serving path: low-latency / high-throughput inference on a trained
solver (production-deployment scope from the north star; the reference
has no serving story — SURVEY.md §3.1).

Design:
  * AOT compilation: every batch bucket is lowered + compiled at server
    construction (jit(...).lower().compile()), so no request ever pays
    the multi-second XLA compile.
  * Batch bucketing: requests are padded up to the next power-of-two
    bucket (static shapes for XLA; padded rows are discarded — every row
    is independent, so padding is exact).
  * The megakernel is used when the shape qualifies (models/api policy),
    giving single-kernel whole-unroll latency.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dladmm_tpu.models.api import resolve_forward
from dladmm_tpu.models.unroll import DLADMMParams


def _buckets(max_batch: int) -> Tuple[int, ...]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class InferenceServer:
    """AOT-compiled D-LADMM inference over batch buckets.

    >>> server = InferenceServer(params, A, max_batch=256)
    >>> x, e = server.solve(b)     # b: (S, m), any S <= max_batch
    """

    def __init__(
        self,
        params: DLADMMParams,
        A: Array,
        max_batch: int = 256,
        kernel: str = "auto",
        buckets: Optional[Sequence[int]] = None,
        donate_input: bool = False,
        dtype=None,
        layers: Optional[int] = None,
        B: Optional[Array] = None,
    ):
        """dtype=jnp.bfloat16 serves in bf16 (params/A cast once at
        construction, requests cast per call): ~2x less HBM per solve.
        Accuracy impact at the benchmark shapes is ~0.1 dB NMSE —
        measure for your dictionary before enabling.

        layers=k serves only the FIRST k of the trained K layers — an
        early-exit latency/quality knob: the per-layer NMSE curve
        (run.py's table) tells you exactly what each extra layer buys,
        and a k-layer solve costs ~k/K of the full latency. Layer
        parameters are untied (SURVEY.md §2 pt 1), so slicing the
        stacked [K,...] pytree is exact — the k-layer net IS the trained
        net's k-layer prefix (pinned by tests/test_serve.py).

        B: general z-dictionary (m, d) for solvers trained on the full
        Ax + Bz = b constraint — served via the XLA-scan forward (the
        fused kernels assume B = I); returns (x, z) with z in R^d."""
        if layers is not None:
            K = params.W1.shape[0]
            if not 1 <= layers <= K:
                raise ValueError(f"layers must be in [1, {K}], got {layers}")
            params = jax.tree.map(lambda v: v[:layers], params)
        if dtype is not None:
            params = jax.tree.map(lambda v: v.astype(dtype), params)
            A = A.astype(dtype)
            B = None if B is None else B.astype(dtype)
        m, n = A.shape
        d = params.W2.shape[1]
        self.params = params
        self.A = A
        self.B = B
        self.m = m
        self.buckets = tuple(sorted(buckets or _buckets(max_batch)))
        self._compiled: Dict[int, jax.stages.Compiled] = {}
        if B is not None and kernel not in ("auto", "reference"):
            raise ValueError(
                f"kernel={kernel!r} requires identity B; general-B "
                "serving runs the XLA scan"
            )
        for S in self.buckets:
            if B is None:
                forward_fn, _ = resolve_forward(m, n, d, S, kernel=kernel)
                fn = jax.jit(
                    lambda p, A_, b_, _f=forward_fn: _f(p, A_, b_)[:2]
                )
                self._compiled[S] = fn.lower(
                    params, A, jax.ShapeDtypeStruct((S, m), A.dtype)
                ).compile()
            else:
                # General z-dictionary: the XLA-scan forward with B as a
                # real argument (kept out of the compiled constant pool).
                from dladmm_tpu.models.unroll import dladmm_forward

                fn = jax.jit(
                    lambda p, A_, B_, b_: dladmm_forward(p, A_, b_, B=B_)[:2]
                )
                self._compiled[S] = fn.lower(
                    params, A, B, jax.ShapeDtypeStruct((S, m), A.dtype)
                ).compile()

    def _bucket_for(self, S: int) -> int:
        for b in self.buckets:
            if S <= b:
                return b
        raise ValueError(
            f"batch {S} exceeds max bucket {self.buckets[-1]}"
        )

    def solve(self, b: Array) -> Tuple[Array, Array]:
        """b (S, m) -> (x (S, n), z (S, d)); pads to the bucket size and
        slices back. Rows are independent, so results are exact."""
        S = b.shape[0]
        bucket = self._bucket_for(S)
        if b.shape[1] != self.m:
            raise ValueError(f"expected (S, {self.m}), got {b.shape}")
        b = b.astype(self.A.dtype)
        if bucket != S:
            b = jnp.concatenate(
                [b, jnp.zeros((bucket - S, self.m), b.dtype)]
            )
        if self.B is None:
            x, z = self._compiled[bucket](self.params, self.A, b)
        else:
            x, z = self._compiled[bucket](self.params, self.A, self.B, b)
        return x[:S], z[:S]
