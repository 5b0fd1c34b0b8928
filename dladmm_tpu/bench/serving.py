"""Serving latency/throughput bench (SURVEY.md N9; serve.py path).

``python -m dladmm_tpu.bench.serving [--out serving.json]``

Reports calibrated ON-DEVICE solve latency per batch bucket (what a
host-local client sees; the sandbox relay's ~26 ms RPC round-trip is a
sandbox artifact, reported separately as dispatch_overhead_ms) and the
resulting throughput, for the trained reference-shape solver.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _cal_latency(fn, args, hi=256):
    """Calibrated seconds per call via the shared bench/timing.py
    implementation. fn must map b -> (x, z); z is (S, d=m) at B=I."""
    from dladmm_tpu.bench.timing import time_chained

    b0 = args
    return time_chained(lambda b: b0 + 1e-12 * fn(b)[1], b0, iters=hi)


def measure(m=250, n=500, K=15,
            buckets=(1, 8, 64, 256, 1024, 2048, 4096), kernel="auto",
            dtype=None, prox=None, prox_rho=0.0):
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.api import resolve_forward
    from dladmm_tpu.models.unroll import init_dladmm_params

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    quantized = dtype == "int8"
    prox_step_fn = None
    if prox is not None:
        # General-prox serving (VERDICT r4 weak #5): what a trained
        # synthetic_nonneg / elastic_net user actually pays — the
        # XLA-scan forward with the trained prox baked into the layer
        # step (serve.py's step_fn path; the l1 megakernels do not
        # apply). prox_x = the named prox, prox_z stays l1, matching the
        # synthetic_nonneg preset's pairing.
        if quantized:
            raise ValueError("general prox rejects int8 (serve.py guard)")
        from dladmm_tpu.ops.prox import get_prox, is_l1, prox_l1
        from dladmm_tpu.ops.reference import make_cached_step

        if is_l1(prox, "l1", prox_rho):
            # Mirrors run.py's guard: elastic_net with rho=0 IS l1 — a
            # row labeled "elastic_net" measuring plain l1 would be a
            # mislabeled publication, not a measurement.
            raise ValueError(
                f"prox {prox!r} with rho={prox_rho} reduces to l1 — "
                "pass --prox-rho > 0 (or pick a non-l1 prox)"
            )
        prox_x_fn = get_prox(prox, prox_rho)
        prox_step_fn = make_cached_step(prox_x_fn, prox_l1)
    if quantized:  # serve.py's int8 serving mode (ops/quantized.py)
        from dladmm_tpu.ops.quantized import (
            dladmm_forward_int8,
            dladmm_forward_int8_pallas,
            int8_tile_batch,
            quantize_params,
        )

        qp, qd = quantize_params(params, A)
        int8_fn = jax.jit(lambda b: dladmm_forward_int8(qp, qd, b)[:2])
        int8_mega_fn = jax.jit(
            lambda b: dladmm_forward_int8_pallas(qp, qd, b)[:2]
        )
        dtype = None
    elif dtype is not None:  # serve.py's bf16 serving mode
        params = jax.tree.map(lambda v: v.astype(dtype), params)
        A = A.astype(dtype)

    # Dispatch overhead: one tiny jitted call, wall-clock (the relay RTT).
    tiny = jax.jit(lambda v: v + 1.0)
    float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    float(tiny(jnp.zeros(())))
    dispatch_ms = (time.perf_counter() - t0) * 1e3

    rows = []
    for S in buckets:
        data = make_batch(kb, A.astype(jnp.float32), S)
        data = type(data)(*(v.astype(A.dtype) for v in data))
        if quantized:
            # Both int8 paths per bucket (same quantized math): the XLA
            # scan and, where a tile fits, the Pallas tiled megakernel.
            variants = [(int8_fn, "int8-scan")]
            if int8_tile_batch(m, n, m, S) is not None:
                variants.append((int8_mega_fn, "int8-megakernel"))
        elif prox_step_fn is not None:
            from dladmm_tpu.models.unroll import dladmm_forward

            variants = [
                (
                    jax.jit(
                        lambda b: dladmm_forward(
                            params, A, b, step_fn=prox_step_fn
                        )[:2]
                    ),
                    f"xla-scan prox_x={prox}",
                )
            ]
            # Round 5: the prox-templated megakernel (what serve.main's
            # kernel='auto' now picks when a tile fits).
            from dladmm_tpu.ops.pallas_unroll import (
                make_unrolled_inference_prox,
                prox_megakernel_available,
            )
            from dladmm_tpu.ops.prox import prox_l1

            if prox_megakernel_available(
                (prox_x_fn, prox_l1), m, n, m, S
            )[0]:
                pm = make_unrolled_inference_prox(prox_x_fn, prox_l1)
                variants.append(
                    (
                        jax.jit(lambda b: pm(params, A, b)[:2]),
                        f"megakernel prox_x={prox}",
                    )
                )
        else:
            forward_fn, desc = resolve_forward(m, n, m, S, kernel=kernel)
            variants = [(lambda b: forward_fn(params, A, b)[:2], desc)]
        for fn, desc in variants:
            print(f"bucket {S} ({desc})...", file=sys.stderr, flush=True)
            t = _cal_latency(fn, data.b, hi=512)
            rows.append(
                {
                    "bucket": S,
                    "path": desc,
                    "device_latency_us": round(t * 1e6, 1),
                    "throughput_solves_per_s": round(S / t, 1),
                }
            )
            print(f"  -> {t * 1e6:.1f} us", file=sys.stderr, flush=True)
    return {
        "shape": f"A {m}x{n}, K={K}",
        "dispatch_overhead_ms": round(dispatch_ms, 1),
        "buckets": rows,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    # "both"/"all" measure the dtypes back-to-back in ONE session so the
    # published table rows share a chip session (mixed-session rows
    # drifted ~3x on the shared relay — VERDICT r2 weak #3).
    ap.add_argument(
        "--dtype",
        choices=["float32", "bfloat16", "int8", "both", "all"],
        default="float32",
    )
    ap.add_argument(
        "--prox",
        default=None,
        help="also measure the general-prox serving path (XLA-scan AND "
        "prox-megakernel forwards with this prox_x baked into the layer "
        "step, prox_z=l1 — the synthetic_nonneg pairing) next to each "
        "dtype's l1 rows (fp32 only; bf16/int8 reject general prox like "
        "serve.py)",
    )
    ap.add_argument(
        "--prox-rho",
        type=float,
        default=0.0,
        help="elastic_net curvature for --prox=elastic_net (rho=0 "
        "reduces to l1 and is rejected, mirroring run.py)",
    )
    ap.add_argument(
        "--smoke",
        action="store_true",
        help="tiny shapes/buckets on CPU: validates the harness control "
        "flow end-to-end (pre-flight for the unattended measurement "
        "battery) — numbers are meaningless",
    )
    ap.add_argument(
        "--shape",
        choices=["paper", "flagship"],
        default="paper",
        help="paper = A 250x500 K=15 (the reference benchmark; the "
        "megakernel fast path applies); flagship = A 1000x2000 K=20 "
        "(BASELINE.json:8 — over the megakernel's VMEM tile, so the "
        "serving policy resolves to the per-layer/scan paths: the "
        "large-model serving latency a production user sees)",
    )
    args = ap.parse_args(argv)
    shape = {}
    if args.shape == "flagship":
        shape = dict(m=1000, n=2000, K=20, buckets=(1, 64, 256, 1024))
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        shape = dict(m=32, n=64, K=4, buckets=(1, 8, 64))
    dtypes = {
        "both": ["float32", "bfloat16"],
        "all": ["float32", "bfloat16", "int8"],
    }.get(args.dtype, [args.dtype])
    results = []
    for name in dtypes:
        result = measure(
            dtype={"bfloat16": jnp.bfloat16, "int8": "int8"}.get(name),
            **shape,
        )
        result["dtype"] = name
        if args.smoke:
            result["SMOKE_MODE"] = "tiny shapes — numbers meaningless"
        results.append(result)
    if args.prox:
        result = measure(prox=args.prox, prox_rho=args.prox_rho, **shape)
        result["dtype"] = "float32"
        result["prox_x"] = args.prox
        if args.smoke:
            result["SMOKE_MODE"] = "tiny shapes — numbers meaningless"
        results.append(result)
    out = json.dumps(results[0] if len(results) == 1 else results, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
