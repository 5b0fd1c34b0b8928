"""ICI/DCN traffic + per-chip FLOP/memory model per config (VERDICT r1
weak #4: make the >=80%-scaling claim analyzable without N real hosts;
also records the replicated-vs-sharded-W2 trade, docs/DESIGN.md §4).

``python -m dladmm_tpu.bench.comm_model [--config NAME] [--out f.json]``

For every sharded preset (or one --config) and BOTH TP layouts, prints:
  * per-chip HBM footprint (parallel/memory.py per_chip_bytes)
  * per-chip matmul FLOPs per training step (fwd ~1/3, bwd ~2/3)
  * ICI bytes moved per step (TP collectives) and the DP gradient
    allreduce, with the DCN crossing flagged for multihost configs
  * model-predicted step-time components at v5e rates and the implied
    scaling efficiency (compute_time / (compute_time + exposed_comm) —
    an upper bound that assumes no compute/comm overlap, i.e. the
    conservative side of the >=80% target).
"""

from __future__ import annotations

import argparse
import json
import sys

# v5e per-chip rates (same constants as bench/roofline.py + ICI).
PEAK_BF16_TFLOPS = 197.0
PEAK_FP32_TFLOPS = 49.0
ICI_GBPS = 180.0  # per-chip bidirectional ring bandwidth, ~2x45 GB/s/link
DCN_GBPS = 25.0  # per-host, conservative


def flops_per_chip_per_step(m, n, K, S, T, layout):
    """Matmul FLOPs per chip per TRAINING step (fwd + ~2x bwd).

    Per layer forward (B = I, cached-Ax recurrence — ops/reference.py):
      x-contraction u W1^T : 2 S m n / T   (W1 row-sharded, both layouts)
      A-matvec x1 A^T      : 2 S m n / T   (A column-sharded, both)
      z-update v W2^T      : 2 S m d / T   sharded_w2, else 2 S m d FULL
    Backward ~doubles each matmul (grad wrt input + grad wrt weight).
    """
    d = m
    x_side = 2 * S * m * n / T
    a_side = 2 * S * m * n / T
    z_side = 2 * S * m * d / (T if layout == "sharded_w2" else 1)
    return 3 * K * (x_side + a_side + z_side)  # fwd + 2x bwd


def analyze(name, m, n, K, S, data_axis, model_axis, layout, hosts=1,
            compute_dtype_bytes=None):
    """compute_dtype_bytes=2 models a bf16 mixed-precision step: the
    ACTIVATION collectives and the gradient allreduce move bf16, and the
    per-chip footprint gains the persistent compute copy — while the
    fp32 masters/moments stay 4-byte (matching parallel/memory.py's
    startup audit; the two must agree or mesh sizing from this artifact
    picks configs fit_sharded refuses)."""
    from dladmm_tpu.parallel.memory import per_chip_bytes, step_traffic_bytes

    T, D = model_axis, data_axis
    cb = compute_dtype_bytes or 4
    bd = per_chip_bytes(
        m, n, K, S, D, T, layout, 4, compute_dtype_bytes
    )
    tr = step_traffic_bytes(m, n, K, S, D, T, layout, cb, hosts)
    fl = flops_per_chip_per_step(m, n, K, max(1, S // D), T, layout)
    t_compute = fl / (PEAK_BF16_TFLOPS * 1e12)
    t_ici = tr["tp_ici_bytes_per_step"] / (ICI_GBPS * 1e9)
    t_dp = tr["dp_grad_allreduce_bytes"] / (
        (DCN_GBPS if hosts > 1 else ICI_GBPS) * 1e9
    )
    t_total = t_compute + t_ici + t_dp  # no-overlap upper bound
    return {
        "config": name,
        "layout": layout,
        "mesh": f"{D}x{T}",
        "hosts": hosts,
        "per_chip_gb": round(bd.total / 1e9, 2),
        "fits_16gb_chip": bd.total <= 16e9 * 0.9,
        "per_chip_tflops_per_step": round(fl / 1e12, 3),
        "ici_mb_per_step": round(tr["tp_ici_bytes_per_step"] / 1e6, 1),
        "dp_allreduce_mb": round(tr["dp_grad_allreduce_bytes"] / 1e6, 1),
        "dp_crosses_dcn": tr["dp_crosses_dcn"],
        "model_step_ms": {
            "compute": round(t_compute * 1e3, 3),
            "tp_ici": round(t_ici * 1e3, 3),
            "dp_allreduce": round(t_dp * 1e3, 3),
        },
        # Bracket for the >=80%-linear-scaling target (BASELINE.json:5):
        # no_overlap = compute/(compute+all comm) — every byte exposed;
        # perfect_overlap = compute/max(compute, comm) — XLA's async
        # collectives hide comm behind compute entirely. Real runs land
        # between; the claim holds iff the bracket's upper end clears
        # 0.8 AND comm < compute (so overlap CAN hide it).
        "scaling_efficiency_no_overlap": round(t_compute / t_total, 3)
        if t_total
        else 1.0,
        "scaling_efficiency_perfect_overlap": round(
            t_compute / max(t_compute, t_ici + t_dp), 3
        )
        if t_total
        else 1.0,
    } | (
        _fused_dp_fields(K, t_compute, t_ici, t_dp)
        | _zero1_dp_fields(bd, D)
        if model_axis == 1
        else {}
    )


def _zero1_dp_fields(bd, D):
    """ShardingConfig.zero1 (cross-replica weight-update sharding) on a
    DP mesh: collective bytes are UNCHANGED (a ring allreduce is
    reduce-scatter + all-gather, which is literally what zero1 issues),
    so t_dp stays — what shrinks by D is the per-chip optimizer work:
    Adam's ~7 params-sized HBM streams (grads/params/mu/nu reads,
    params/mu/nu writes) and the moment storage itself. Model fields
    only; the real step-time effect needs a multi-chip measurement."""
    opt_stream = 7 * bd.params  # bytes per step, replicated optimizer
    return {
        "zero1_optimizer_hbm_mb_per_step": round(opt_stream / D / 1e6, 1),
        "zero1_optimizer_hbm_mb_replicated": round(opt_stream / 1e6, 1),
        "zero1_moments_gb_per_chip": round(bd.opt_moments / D / 1e9, 3),
        # Round 5: moment_dtype='int8_pallas' composes with zero1 (the
        # fused sweep runs on each chip's (rows, 256) shard), stacking a
        # further /4 on the moment bytes — flagship 480 MB replicated
        # fp32 -> ~15 MB/chip at D=8 (parallel/memory.py charges the
        # same; the ~2% block-scale overhead is inside the 1.02 factor
        # there and omitted here).
        "zero1_int8_fused_moments_gb_per_chip": round(
            bd.opt_moments / D / 4 / 1e9, 4
        ),
        "zero1_note": (
            "collective bytes unchanged (ring allreduce = RS+AG); "
            "clip_norm becomes the exact single-pass global clip"
        ),
    }


def _fused_dp_fields(K, t_compute, t_ici, t_dp):
    """optimizer='fused_adam' on a DP mesh splits the bulk gradient
    allreduce into K per-layer psums issued inside the reverse scan.

    Overlap is NOT automatic: the psums live inside a lax.scan (an XLA
    while loop), and a loop iteration completes before the next begins,
    so without compiler help the K collectives serialize — exposed comm
    equals the bulk allreduce's (same bytes) plus K-1 extra collective
    setup latencies. What the program structure DOES buy is
    pipelinability: the fused step keeps every optimizer-side value
    (params/moments/norm partial) out of the scan CARRY (they are ys
    outputs), so layer k's psum result is never an input to iteration
    k-1 — exactly the dependence shape XLA's while-loop collective
    pipeliner (collective_pipeliner on TPU) needs to hoist a
    collective's start into the previous iteration. The
    "..._if_pipelined" fields model that best case (only the final
    layer's psum exposed); the honest claim is the bracket
    [no_overlap, if_pipelined], to be replaced by a real multi-chip
    measurement when hardware allows."""
    t_dp_layer = t_dp / K
    t_layer_bwd = (t_compute * 2 / 3) / K  # bwd is ~2/3 of step FLOPs
    exposed = t_dp_layer + (K - 1) * max(0.0, t_dp_layer - t_layer_bwd)
    denom = t_compute + t_ici + exposed
    return {
        "dp_fused_exposed_ms_if_pipelined": round(exposed * 1e3, 3),
        "scaling_efficiency_fused_if_pipelined": round(
            t_compute / denom, 3
        )
        if denom
        else 1.0,
        "fused_pipelining_note": (
            "requires XLA while-loop collective pipelining; "
            "serialized fallback = the no_overlap row + (K-1) "
            "collective latencies"
        ),
    }


def main(argv=None) -> int:
    from dladmm_tpu.utils.config import PRESETS

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rows = []
    for name, cfg in PRESETS.items():
        if args.config and name != args.config:
            continue
        s = cfg.sharding
        if s.data_axis * s.model_axis == 1 and not s.multihost:
            continue
        p, t = cfg.problem, cfg.train
        hosts = 2 if s.multihost else 1
        cb = 2 if t.compute_dtype == "bfloat16" else None
        for layout in ("sharded_w2", "replicated_w2"):
            rows.append(
                analyze(
                    name, p.m, p.n, p.K, t.batch,
                    s.data_axis, s.model_axis, layout, hosts,
                    compute_dtype_bytes=cb,
                )
            )
    out = json.dumps(rows, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
