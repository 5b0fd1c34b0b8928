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


def _prep_serving(params, A, B, dtype, layers):
    """Shared serving preamble (single-chip and sharded servers):
    early-exit layer slice + serving-dtype cast. Returns
    (params, A, B, quantized) — with dtype="int8" the cast is deferred
    to ops/quantized.quantize_params and ``quantized`` is True."""
    if layers is not None:
        K = params.W1.shape[0]
        if not 1 <= layers <= K:
            raise ValueError(f"layers must be in [1, {K}], got {layers}")
        params = jax.tree.map(lambda v: v[:layers], params)
    quantized = dtype == "int8"
    if quantized:
        if B is not None:
            raise ValueError(
                "dtype='int8' requires identity B (the quantized "
                "forward specializes to B = I like the fused kernels)"
            )
    elif dtype is not None:
        params = jax.tree.map(lambda v: v.astype(dtype), params)
        A = A.astype(dtype)
        B = None if B is None else B.astype(dtype)
    return params, A, B, quantized


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
        step_fn=None,
        prox_pair=None,
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
        fused kernels assume B = I); returns (x, z) with z in R^d.

        dtype="int8" serves with int8-quantized weights + dynamic
        per-sample activation quantization (ops/quantized.py): 2x the
        bf16 MXU peak and half its weight HBM traffic on TPU v5e.
        Identity-B only; quality delta vs fp32 is measured in
        BASELINE.md — check it for your dictionary before enabling,
        exactly as for bf16.

        step_fn: a general-prox layer step (ops/reference.make_cached_step
        over ops/prox.py operators) for solvers trained with non-l1
        prox_x/prox_z — served via the XLA-scan forward, like general B.
        A model trained under a non-l1 prox MUST be served with the same
        step_fn, or the l1 shrink silently replaces the trained prox.

        prox_pair: the (prox_x, prox_z) CALLABLES themselves (round 5) —
        strictly better than step_fn when the prox is an ops/prox.py-
        style elementwise pair: buckets whose tile fits VMEM serve
        through the prox-templated whole-unroll megakernel
        (ops/pallas_unroll.make_unrolled_inference_prox) at l1-megakernel
        speed; over-VMEM buckets fall back to the XLA scan. Identity-B
        only; serve.main passes it automatically for trained prox
        configs."""
        params, A, B, self._quantized = _prep_serving(
            params, A, B, dtype, layers
        )
        if prox_pair is not None:
            if B is not None:
                raise ValueError(
                    "prox_pair requires identity B (the megakernel "
                    "specializes B = I); pass step_fn for general B"
                )
            if step_fn is None:
                from dladmm_tpu.ops.reference import make_cached_step

                step_fn = make_cached_step(*prox_pair)
        if step_fn is not None:
            if self._quantized:
                raise ValueError(
                    "dtype='int8' serving is l1/l1-only (ops/quantized.py "
                    "hard-codes the shrink); serve general-prox solvers "
                    "in float32 or bfloat16"
                )
            allowed = (
                ("auto", "reference", "megakernel")
                if prox_pair is not None
                else ("auto", "reference")
            )
            if kernel not in allowed:
                raise ValueError(
                    f"kernel={kernel!r} does not apply to general-prox "
                    f"serving (allowed here: {allowed}); the megakernel "
                    "path needs the prox CALLABLES (prox_pair)"
                )
        if self._quantized and kernel not in (
            "auto",
            "reference",
            "megakernel",
        ):
            raise ValueError(
                f"dtype='int8' serves via ops/quantized.py; "
                f"kernel={kernel!r} does not apply (use 'auto' for "
                "the XLA scan or 'megakernel' for the int8 Pallas "
                "tiled megakernel)"
            )
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
        if self._quantized:
            from dladmm_tpu.ops.quantized import (
                dladmm_forward_int8,
                dladmm_forward_int8_pallas,
                int8_tile_batch,
                quantize_params,
            )

            # Weights/dictionary quantized ONCE here; requests only pay
            # the dynamic activation quantization inside the dots.
            self._qp, self._qd = quantize_params(params, A)
            scan_fn = jax.jit(
                lambda qp, qd, b_: dladmm_forward_int8(qp, qd, b_)[:2]
            )
            mega_fn = jax.jit(
                lambda qp, qd, b_: dladmm_forward_int8_pallas(qp, qd, b_)[
                    :2
                ]
            )
            for S in self.buckets:
                use_mega = (
                    kernel == "megakernel"
                    and int8_tile_batch(m, n, d, S) is not None
                )
                if kernel == "megakernel" and not use_mega:
                    raise ValueError(
                        f"no int8 megakernel tile fits VMEM at bucket {S} "
                        f"(m={m}, n={n}); use kernel='auto'"
                    )
                fn = mega_fn if use_mega else scan_fn
                self._compiled[S] = fn.lower(
                    self._qp,
                    self._qd,
                    jax.ShapeDtypeStruct((S, m), jnp.float32),
                ).compile()
            return
        for S in self.buckets:
            if B is None and step_fn is None:
                forward_fn, _ = resolve_forward(m, n, d, S, kernel=kernel)
                fn = jax.jit(
                    lambda p, A_, b_, _f=forward_fn: _f(p, A_, b_)[:2]
                )
                self._compiled[S] = fn.lower(
                    params, A, jax.ShapeDtypeStruct((S, m), A.dtype)
                ).compile()
            elif B is None:
                # General prox, identity B: the prox-templated megakernel
                # where a tile fits VMEM (round 5 — l1-megakernel speed
                # for the trained prox), else the XLA-scan forward with
                # the prox pair baked into the layer step.
                from dladmm_tpu.ops.pallas_unroll import (
                    prox_megakernel_available,
                )

                avail, why = prox_megakernel_available(
                    prox_pair, m, n, d, S
                )
                use_mega = avail and kernel in ("auto", "megakernel")
                if kernel == "megakernel" and not use_mega:
                    raise ValueError(
                        "prox megakernel unavailable at bucket "
                        f"{S} (m={m}, n={n}): {why}; use kernel='auto'"
                    )
                if use_mega:
                    from dladmm_tpu.ops.pallas_unroll import (
                        make_unrolled_inference_prox,
                    )

                    mega = make_unrolled_inference_prox(*prox_pair)
                    fn = jax.jit(
                        lambda p, A_, b_, _f=mega: _f(p, A_, b_)[:2]
                    )
                else:
                    from dladmm_tpu.models.unroll import dladmm_forward

                    fn = jax.jit(
                        lambda p, A_, b_: dladmm_forward(
                            p, A_, b_, step_fn=step_fn
                        )[:2]
                    )
                self._compiled[S] = fn.lower(
                    params, A, jax.ShapeDtypeStruct((S, m), A.dtype)
                ).compile()
            else:
                # General z-dictionary: the XLA-scan forward with B as a
                # real argument (kept out of the compiled constant pool).
                from dladmm_tpu.models.unroll import dladmm_forward

                fn = jax.jit(
                    lambda p, A_, B_, b_: dladmm_forward(
                        p, A_, b_, B=B_, step_fn=step_fn
                    )[:2]
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
        b = b.astype(jnp.float32 if self._quantized else self.A.dtype)
        if bucket != S:
            b = jnp.concatenate(
                [b, jnp.zeros((bucket - S, self.m), b.dtype)]
            )
        if self._quantized:
            x, z = self._compiled[bucket](self._qp, self._qd, b)
        elif self.B is None:
            x, z = self._compiled[bucket](self.params, self.A, b)
        else:
            x, z = self._compiled[bucket](self.params, self.A, self.B, b)
        return x[:S], z[:S]


class ShardedInferenceServer:
    """Data-parallel serving over a device mesh.

    Parameters and the dictionary are replicated on every chip; request
    rows are sharded over the mesh's ``data`` axis, and each chip runs
    the SAME single-chip serving stack (megakernel policy, bf16/int8
    precision, general-B scan) on its row shard inside ``shard_map``.
    Rows are independent, so the forward contains ZERO collectives and
    throughput scales linearly with chips (ICI carries nothing; the
    only cross-device traffic is the host scattering/gathering request
    rows). No reference counterpart (the reference is single-GPU with
    no serving story — SURVEY.md §3.1/§4.1).

    Buckets must be multiples of the data-axis size T (each chip gets
    ``bucket/T`` rows, statically shaped for AOT compilation); the
    defaults are the single-chip power-of-two ladder scaled by T.

    This sandbox has ONE real TPU chip, so multi-chip serving numbers
    are not measurable here; correctness parity with InferenceServer is
    pinned on the 8-virtual-device CPU mesh (tests/test_serve.py) and
    the driver's multichip dryrun compiles/executes this path.

    >>> mesh = make_mesh()                     # all devices, DP-only
    >>> server = ShardedInferenceServer(params, A, mesh, max_batch=4096)
    >>> x, z = server.solve(b)                 # b: (S, m), S <= 4096
    """

    def __init__(
        self,
        params: DLADMMParams,
        A: Array,
        mesh=None,
        max_batch: int = 4096,
        kernel: str = "auto",
        buckets: Optional[Sequence[int]] = None,
        dtype=None,
        layers: Optional[int] = None,
        B: Optional[Array] = None,
        step_fn=None,
        prox_pair=None,
    ):
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from dladmm_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            make_mesh,
        )

        if mesh is None:
            mesh = make_mesh()
        if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] != 1:
            raise ValueError(
                "serving is data-parallel only: rows are independent, "
                f"so use a model=1 mesh (got {dict(mesh.shape)}); TP "
                "serving would add collectives for no throughput"
            )
        T = mesh.shape[DATA_AXIS]
        params, A, B, self._quantized = _prep_serving(
            params, A, B, dtype, layers
        )
        if prox_pair is not None:
            if B is not None:
                raise ValueError(
                    "prox_pair requires identity B (the megakernel "
                    "specializes B = I); pass step_fn for general B"
                )
            if step_fn is None:
                from dladmm_tpu.ops.reference import make_cached_step

                step_fn = make_cached_step(*prox_pair)
        if step_fn is not None:
            if self._quantized:
                raise ValueError(
                    "dtype='int8' serving is l1/l1-only; serve "
                    "general-prox solvers in float32 or bfloat16"
                )
            allowed = (
                ("auto", "reference", "megakernel")
                if prox_pair is not None
                else ("auto", "reference")
            )
            if kernel not in allowed:
                raise ValueError(
                    f"kernel={kernel!r} does not apply to general-prox "
                    f"serving (allowed here: {allowed}); the megakernel "
                    "path needs the prox CALLABLES (prox_pair)"
                )
        m, n = A.shape
        d = params.W2.shape[1]
        self.mesh = mesh
        self.m = m
        self.T = T
        if buckets is None:
            # Round max_batch UP to a multiple of the data-axis size:
            # solve() pads rows exactly, so the cost is padding, not
            # correctness — and callers shouldn't need to know T.
            max_batch = -(-max_batch // T) * T
            buckets = tuple(b * T for b in _buckets(max_batch // T))
        self.buckets = tuple(sorted(buckets))
        for S in self.buckets:
            if S % T:
                raise ValueError(
                    f"bucket {S} not divisible by data axis size {T}"
                )
        rep = NamedSharding(mesh, P())
        self._rows = NamedSharding(mesh, P(DATA_AXIS))
        self._compiled: Dict[int, jax.stages.Compiled] = {}

        def _sharded(local_fn, n_operands):
            # check_vma=False as in parallel/collectives.py: the local
            # body composes pallas_calls/scans that cannot declare
            # varying-axis types; there are no collectives to insert.
            return jax.jit(
                jax.shard_map(
                    local_fn,
                    mesh=mesh,
                    in_specs=(P(),) * (n_operands - 1) + (P(DATA_AXIS),),
                    out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                    check_vma=False,
                )
            )

        if self._quantized:
            from dladmm_tpu.ops.quantized import (
                dladmm_forward_int8,
                dladmm_forward_int8_pallas,
                int8_tile_batch,
                quantize_params,
            )

            if kernel not in ("auto", "reference", "megakernel"):
                raise ValueError(
                    f"dtype='int8' serves via ops/quantized.py; "
                    f"kernel={kernel!r} does not apply"
                )
            qp, qd = quantize_params(params, A)
            self._qp = jax.device_put(qp, rep)
            self._qd = jax.device_put(qd, rep)
            for S in self.buckets:
                Sl = S // T
                use_mega = (
                    kernel == "megakernel"
                    and int8_tile_batch(m, n, d, Sl) is not None
                )
                if kernel == "megakernel" and not use_mega:
                    raise ValueError(
                        f"no int8 megakernel tile fits VMEM at the "
                        f"per-chip rows {Sl} (bucket {S} / T={T}, "
                        f"m={m}, n={n}); use kernel='auto'"
                    )
                local = (
                    dladmm_forward_int8_pallas
                    if use_mega
                    else dladmm_forward_int8
                )
                fn = _sharded(
                    lambda qp_, qd_, b_, _f=local: _f(qp_, qd_, b_)[:2], 3
                )
                self._compiled[S] = fn.lower(
                    self._qp,
                    self._qd,
                    jax.ShapeDtypeStruct(
                        (S, m), jnp.float32, sharding=self._rows
                    ),
                ).compile()
            return
        self.params = jax.device_put(params, rep)
        self.A = jax.device_put(A, rep)
        self.B = None if B is None else jax.device_put(B, rep)
        if B is not None and kernel not in ("auto", "reference"):
            raise ValueError(
                f"kernel={kernel!r} requires identity B; general-B "
                "serving runs the XLA scan"
            )
        for S in self.buckets:
            Sl = S // T
            if B is None and step_fn is None:
                # Kernel policy resolved at the PER-CHIP rows: each
                # chip serves bucket/T rows of the bucket.
                forward_fn, _ = resolve_forward(m, n, d, Sl, kernel=kernel)
                fn = _sharded(
                    lambda p, A_, b_, _f=forward_fn: _f(p, A_, b_)[:2], 3
                )
                self._compiled[S] = fn.lower(
                    self.params,
                    self.A,
                    jax.ShapeDtypeStruct(
                        (S, m), self.A.dtype, sharding=self._rows
                    ),
                ).compile()
            elif B is None:
                # Per-chip policy at the local rows, like the l1 path:
                # prox megakernel where a tile fits, else the XLA scan.
                from dladmm_tpu.ops.pallas_unroll import (
                    prox_megakernel_available,
                )

                avail, why = prox_megakernel_available(
                    prox_pair, m, n, d, Sl
                )
                use_mega = avail and kernel in ("auto", "megakernel")
                if kernel == "megakernel" and not use_mega:
                    raise ValueError(
                        "prox megakernel unavailable at the per-chip "
                        f"rows {Sl} (bucket {S} / T={T}): {why}; use "
                        "kernel='auto'"
                    )
                if use_mega:
                    from dladmm_tpu.ops.pallas_unroll import (
                        make_unrolled_inference_prox,
                    )

                    mega = make_unrolled_inference_prox(*prox_pair)
                    fn = _sharded(
                        lambda p, A_, b_, _f=mega: _f(p, A_, b_)[:2], 3
                    )
                else:
                    from dladmm_tpu.models.unroll import dladmm_forward

                    fn = _sharded(
                        lambda p, A_, b_: dladmm_forward(
                            p, A_, b_, step_fn=step_fn
                        )[:2],
                        3,
                    )
                self._compiled[S] = fn.lower(
                    self.params,
                    self.A,
                    jax.ShapeDtypeStruct(
                        (S, m), self.A.dtype, sharding=self._rows
                    ),
                ).compile()
            else:
                from dladmm_tpu.models.unroll import dladmm_forward

                fn = _sharded(
                    lambda p, A_, B_, b_: dladmm_forward(
                        p, A_, b_, B=B_, step_fn=step_fn
                    )[:2],
                    4,
                )
                self._compiled[S] = fn.lower(
                    self.params,
                    self.A,
                    self.B,
                    jax.ShapeDtypeStruct(
                        (S, m), self.A.dtype, sharding=self._rows
                    ),
                ).compile()

    def _bucket_for(self, S: int) -> int:
        for b in self.buckets:
            if S <= b:
                return b
        raise ValueError(
            f"batch {S} exceeds max bucket {self.buckets[-1]}"
        )

    def solve(self, b: Array) -> Tuple[Array, Array]:
        """b (S, m) -> (x (S, n), z (S, d)); pads rows to the bucket,
        scatters them over the data axis, slices the gathered result
        back. Padding and sharding are exact — rows are independent."""
        S = b.shape[0]
        if b.ndim != 2 or b.shape[1] != self.m:
            raise ValueError(f"expected (S, {self.m}), got {b.shape}")
        bucket = self._bucket_for(S)
        want = jnp.float32 if self._quantized else self.A.dtype
        b = np.asarray(b, dtype=want)
        if bucket != S:
            b = np.concatenate(
                [b, np.zeros((bucket - S, self.m), b.dtype)]
            )
        b = jax.device_put(b, self._rows)
        if self._quantized:
            x, z = self._compiled[bucket](self._qp, self._qd, b)
        elif self.B is None:
            x, z = self._compiled[bucket](self.params, self.A, b)
        else:
            x, z = self._compiled[bucket](self.params, self.A, self.B, b)
        return x[:S], z[:S]


class BatchingServer:
    """Host-side micro-batching front end over an InferenceServer.

    Production serving is many small concurrent requests, not one
    pre-assembled batch: this aggregator queues rows from concurrent
    clients and dispatches them to the AOT-compiled buckets as ONE
    device call per window, amortizing dispatch overhead and filling
    the large (throughput-optimal) buckets. Rows are independent
    (bucketed padding is already exact), so batching requests together
    is exact too — pinned by tests/test_serve.py against per-request
    solves. No reference counterpart (SURVEY.md §3.1: the reference has
    no serving story).

    Policy: a dispatch fires as soon as (a) the queued rows fill the
    largest bucket, or (b) ``max_delay_ms`` has elapsed since the
    OLDEST queued request (bounded per-request latency). One worker
    thread owns the device dispatch; jax compiled calls release the
    GIL while the device runs, so clients keep enqueueing during a
    dispatch.

    >>> bs = BatchingServer(InferenceServer(params, A, max_batch=256))
    >>> fut = bs.submit(b_rows)          # (s, m), any small s
    >>> x, z = fut.result()              # (s, n), (s, d)
    >>> bs.close()
    """

    def __init__(self, server: InferenceServer, max_delay_ms: float = 2.0):
        import queue
        import threading

        self.server = server
        self.max_delay = max_delay_ms / 1e3
        self.max_rows = server.buckets[-1]
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # Serializes the closed-check-then-enqueue in submit() against
        # close()'s set-closed-then-sentinel, so no request can land
        # behind the None sentinel and strand its future.
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, b: Array):
        """Enqueue a (s, m) request (s <= the largest bucket); returns a
        concurrent.futures.Future resolving to (x (s, n), z (s, d))."""
        from concurrent.futures import Future

        if self._closed:
            raise RuntimeError("BatchingServer is closed")
        b = np.asarray(b)
        if b.ndim != 2 or b.shape[1] != self.server.m:
            raise ValueError(f"expected (s, {self.server.m}), got {b.shape}")
        if b.shape[0] > self.max_rows:
            raise ValueError(
                f"request rows {b.shape[0]} exceed the largest bucket "
                f"{self.max_rows}; split the request"
            )
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("BatchingServer is closed")
            self._q.put((b, fut))
        return fut

    def solve(self, b: Array) -> Tuple[Array, Array]:
        """Blocking convenience wrapper around submit()."""
        return self.submit(b).result()

    def close(self):
        """Drain the queue, stop the worker. Idempotent."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # wake the worker (FIFO: after all requests)
        self._worker.join()

    # -- worker ---------------------------------------------------------

    def _run(self):
        import queue as _queue
        import time as _time

        while True:
            item = self._q.get()
            if item is None:
                return
            window = [item]
            rows = item[0].shape[0]
            deadline = _time.monotonic() + self.max_delay
            # Fill the window until the largest bucket or the oldest
            # request's latency budget runs out.
            while rows < self.max_rows:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except _queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(window)
                    return
                if rows + nxt[0].shape[0] > self.max_rows:
                    # Doesn't fit this window: dispatch, start the next
                    # window with it (keeps requests whole — simpler and
                    # exact; splitting across dispatches is not needed
                    # for correctness).
                    self._dispatch(window)
                    window = [nxt]
                    rows = nxt[0].shape[0]
                    deadline = _time.monotonic() + self.max_delay
                    continue
                window.append(nxt)
                rows += nxt[0].shape[0]
            self._dispatch(window)

    def _dispatch(self, window):
        # Claim each future first: a client may have cancelled while its
        # request was queued; set_result on a cancelled future raises
        # InvalidStateError (which would kill the worker). A claimed
        # (RUNNING) future can no longer be cancelled, so the set_*
        # calls below are safe.
        window = [
            (b, fut)
            for b, fut in window
            if fut.set_running_or_notify_cancel()
        ]
        if not window:
            return
        bs = np.concatenate([b for b, _ in window])
        try:
            x, z = self.server.solve(jnp.asarray(bs))
            x, z = np.asarray(x), np.asarray(z)
        except Exception as e:  # surface device errors on the futures
            for _, fut in window:
                fut.set_exception(e)
            return
        off = 0
        for b, fut in window:
            s = b.shape[0]
            fut.set_result((x[off : off + s], z[off : off + s]))
            off += s


def _load_ckpt_params(ckpt_dir: str, config, A, B) -> DLADMMParams:
    """Restore trained params from a fit/fit_sharded checkpoint dir.

    Checkpoints hold the full TrainState (params + opt_state + step), so
    the restore template mirrors fit()'s optimizer selection exactly;
    only .params is returned."""
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import _build_optimizer, make_train_state
    from dladmm_tpu.utils.checkpoint import (
        latest_step_dir,
        restore_checkpoint,
    )

    p, t = config.problem, config.train
    dtype = jnp.dtype(t.dtype)
    params0 = init_dladmm_params(A, B, K=p.K, beta=p.beta, dtype=dtype)
    latest = latest_step_dir(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(
            f"no step_N checkpoint under {ckpt_dir!r} — train one with "
            f"`dladmm-train --config=... --ckpt-dir={ckpt_dir}`"
        )
    if getattr(t, "optimizer", "adam") == "fused_adam":
        from dladmm_tpu.train.fused_adam import make_fused_adam_state

        tmpl = make_fused_adam_state(params0, t.clip_norm, None)
    else:
        tmpl = make_train_state(params0, _build_optimizer(t), None)
    return restore_checkpoint(
        latest, tmpl._replace(compute_params=None)
    ).params


def _read_requests(spec: str) -> np.ndarray:
    """Load request rows from ``file.npy`` or ``file.npz[:key]`` (shared
    file grammar: data.synthetic.load_array_spec)."""
    from dladmm_tpu.data.synthetic import load_array_spec

    arr = np.asarray(load_array_spec(spec), np.float32)
    if arr.ndim == 1:
        arr = arr[None, :]
    if arr.ndim != 2:
        raise ValueError(f"requests must be (S, m); got shape {arr.shape}")
    return arr


def main(argv=None) -> int:
    """CLI: serve a trained solver over a file of requests (or a
    synthetic demo batch) through the AOT bucketed server.

    The reference has no serving counterpart (SURVEY.md §3.1); this is
    the batch front door of the production path — the library surface
    (InferenceServer / ShardedInferenceServer / BatchingServer) is the
    one a real service embeds.
    """
    import argparse
    import json
    import time

    from dladmm_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DLADMM_PLATFORM=cpu for smoke runs / outages
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--config", default="synthetic_small")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt-dir", help="fit checkpoint dir (latest step)")
    src.add_argument(
        "--import-torch",
        metavar="CKPT",
        help="serve weights from a reference-style PyTorch checkpoint",
    )
    ap.add_argument(
        "--allow-pickle",
        action="store_true",
        help="permit --import-torch to fully unpickle torch.save(net) "
        "whole-module checkpoints (trusted files only)",
    )
    req = ap.add_mutually_exclusive_group(required=True)
    req.add_argument(
        "--input",
        default=None,
        metavar="FILE[:key]",
        help="request rows (S, m) from .npy or .npz; default key 'b'",
    )
    req.add_argument(
        "--demo",
        type=int,
        default=None,
        metavar="S",
        help="serve S synthetic requests from the config's eval "
        "distribution instead of --input, and report NMSE vs the "
        "ground truth",
    )
    ap.add_argument("--out", default=None, help="write x, z to this .npz")
    ap.add_argument(
        "--dtype",
        choices=["float32", "bfloat16", "int8"],
        default="float32",
        help="serving precision (quality deltas measured in BASELINE.md)",
    )
    ap.add_argument(
        "--kernel", choices=["auto", "megakernel", "reference"], default="auto"
    )
    ap.add_argument(
        "--layers",
        type=int,
        default=None,
        help="early exit: serve only the first k trained layers",
    )
    ap.add_argument("--max-batch", type=int, default=None)
    ap.add_argument(
        "--sharded",
        action="store_true",
        help="data-parallel serving over all visible devices "
        "(ShardedInferenceServer)",
    )
    args = ap.parse_args(argv)

    from dladmm_tpu.data.synthetic import problem_matrices
    from dladmm_tpu.utils.config import get_config

    cfg = get_config(args.config)
    A, B = problem_matrices(cfg)
    # General-prox configs (ADVICE r3): the served forward must run the
    # SAME prox pair the model was trained with — silently serving the
    # l1 shrink would return wrong outputs for e.g. synthetic_nonneg.
    from dladmm_tpu.train.loop import resolve_prox

    prox = resolve_prox(cfg.problem)
    step_fn = None
    if prox is not None:
        from dladmm_tpu.ops.reference import make_cached_step

        if args.dtype == "int8":
            ap.error(
                f"--dtype=int8 is l1/l1-only; config {args.config!r} "
                f"trains prox {cfg.problem.prox_x}/{cfg.problem.prox_z}"
            )
        # Every --kernel choice (auto/megakernel/reference) is valid for
        # general-prox serving since round 5: the whole-unroll megakernel
        # is prox-templated (prox_pair below), and the l1-only per-layer
        # "pallas" kernel is not a CLI choice at all (argparse rejects
        # it before this code runs).
        step_fn = make_cached_step(*prox)
    if args.ckpt_dir:
        params = _load_ckpt_params(args.ckpt_dir, cfg, A, B)
    else:
        from dladmm_tpu.utils.torch_compat import from_torch

        params = from_torch(
            args.import_torch, A=np.asarray(A), allow_pickle=args.allow_pickle
        )

    demo = None
    if args.demo is not None:
        from dladmm_tpu.data.synthetic import make_batch

        from dladmm_tpu.data.synthetic import seed_keys

        p = cfg.problem
        # fit()'s eval key (shared derivation): demo NMSE is comparable
        # to training evals.
        demo = make_batch(
            seed_keys(cfg)[1],
            A,
            args.demo,
            p.sparsity_x,
            p.sparsity_e,
            B=B,
            nonneg_x=getattr(p, "nonneg_x", False),
        )
        requests = np.asarray(demo.b, np.float32)
    else:
        requests = _read_requests(args.input)

    dtype = {
        "float32": None,
        "bfloat16": jnp.bfloat16,
        "int8": "int8",
    }[args.dtype]
    max_batch = args.max_batch or max(1, requests.shape[0])
    cls = ShardedInferenceServer if args.sharded else InferenceServer
    # One-shot CLI: a single bucket covering the whole request set — the
    # power-of-two ladder would AOT-compile ~log2(S) programs and
    # execute only the top one. (Library users who reuse a server across
    # many calls get the ladder by default.) Sharded buckets must be a
    # multiple of the data-axis size; solve() pads rows exactly.
    if args.sharded:
        max_batch = -(-max_batch // len(jax.devices())) * len(jax.devices())
    t_build = time.monotonic()
    server = cls(
        params,
        A,
        max_batch=max_batch,
        kernel=args.kernel,
        buckets=(max_batch,),
        dtype=dtype,
        layers=args.layers,
        B=B,
        step_fn=step_fn,
        # Identity-B trained-prox configs get the prox-templated
        # megakernel (round 5); general-B keeps the scan via step_fn.
        prox_pair=prox if (prox is not None and B is None) else None,
    )
    build_s = time.monotonic() - t_build

    t_solve = time.monotonic()
    x, z = server.solve(jnp.asarray(requests))
    x = np.asarray(jax.block_until_ready(x))
    z = np.asarray(z)
    solve_s = time.monotonic() - t_solve

    if args.out:
        np.savez(args.out, x=x, z=z)
    summary = {
        "requests": int(requests.shape[0]),
        "config": args.config,
        "dtype": args.dtype,
        "kernel": args.kernel,
        "layers": args.layers,
        "sharded": bool(args.sharded),
        "buckets": list(server.buckets),
        "aot_build_s": round(build_s, 3),
        # Single-dispatch wall time: includes the host<->device RTT, so
        # it is NOT a device-latency benchmark (bench/serving.py is).
        "solve_wall_s": round(solve_s, 4),
        "out": args.out,
    }
    if demo is not None:
        from dladmm_tpu.metrics.core import nmse_db

        summary["nmse_db"] = round(
            float(nmse_db(jnp.asarray(x), demo.x_star)), 2
        )
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
