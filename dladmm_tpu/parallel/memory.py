"""Per-chip memory audit + communication traffic model (VERDICT r1 #1,
weak #4).

The round-1 TP layout replicated W2 (K, d, m) and its two Adam moments
across the model axis; at the tp_large acceptance shape
(BASELINE.json:10, A 8192x16384, K=20) that is ~16.1 GB/chip before W1's
shard — over a v5e's 16 GB HBM. The fix (parallel/collectives.py
layout="sharded_w2") shards W2/theta2 and therefore their moments, and
THIS module is the startup audit that makes the memory math explicit:
fit_sharded calls audit_or_raise() before allocating anything.

Also provides the per-step ICI/DCN traffic model (VERDICT weak #4: "round
2 should at least produce an ICI/DCN traffic model per config so the
[>=80% scaling] claim is analyzable") — see step_traffic_bytes().

No reference counterpart (single-GPU, SURVEY.md §4.1); shapes/axes follow
SURVEY.md §9.3.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# v5e per-chip HBM; override for other parts (v4: 32e9, v5p: 95e9).
DEFAULT_HBM_BYTES = 16e9
# Margin for XLA temporaries/fusion buffers/collective staging.
DEFAULT_HEADROOM = 0.10


def detect_hbm_bytes() -> float:
    """Per-chip memory limit from the runtime when it reports one
    (`device.memory_stats()['bytes_limit']` — real TPUs do), else
    DEFAULT_HBM_BYTES. So v4/v5p parts aren't audited against the v5e
    16 GB figure (ADVICE r2); CLI callers can still override via
    --hbm-gb (run.py) -> fit_sharded(hbm_bytes=...). Virtual CPU devices
    report host RAM or nothing — only trust real accelerators."""
    import jax

    try:
        dev = jax.local_devices()[0]
        if dev.platform == "cpu":
            return DEFAULT_HBM_BYTES
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit and limit > 1e9:
            return float(limit)
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


@dataclasses.dataclass(frozen=True)
class MemoryBreakdown:
    params: float  # fp32 masters, per chip
    opt_moments: float  # Adam mu+nu, sharded like params
    compute_copy: float  # persistent low-precision copy (0 if fp32)
    dictionary: float  # A shard
    activations: float  # fwd state + autodiff residuals estimate
    batch: float  # b, x_star, e_star shards

    @property
    def total(self) -> float:
        return (
            self.params
            + self.opt_moments
            + self.compute_copy
            + self.dictionary
            + self.activations
            + self.batch
        )

    def rows(self):
        return [
            ("params (fp32 masters)", self.params),
            ("Adam moments (2x)", self.opt_moments),
            ("compute-dtype copy", self.compute_copy),
            ("dictionary A shard", self.dictionary),
            ("activations + bwd residuals", self.activations),
            ("batch shards", self.batch),
        ]


def per_chip_bytes(
    m: int,
    n: int,
    K: int,
    batch: int,
    data_axis: int = 1,
    model_axis: int = 1,
    layout: str = "sharded_w2",
    dtype_bytes: int = 4,
    compute_dtype_bytes: Optional[int] = None,
    d: Optional[int] = None,
    opt_shard_degree: int = 1,
    moment_bytes: Optional[float] = None,
) -> MemoryBreakdown:
    """Bytes per chip for one sharded training step (B = I, d = m).

    Layouts (parallel/collectives.py):
      * "sharded_w2"   — W1/theta1 sharded over n, W2/theta2 sharded over
        d, A column-sharded; Adam moments inherit every shard.
      * "replicated_w2" — round-1 layout: W2/theta2 (and moments)
        replicated across 'model'. Kept for the measured trade
        (docs/DESIGN.md §4) and small-m configs.

    The activation term is a conservative estimate of the XLA-autodiff
    residual stacks: per layer the backward needs the carry entering the
    layer (x S*n/T + z,lam,Ax each S*m) plus the u/v intermediates are
    recomputed or saved depending on fusion — we charge 2 extra S*m per
    layer. Replicated m-sized state is charged FULL m per chip (that is
    the point of the layout: only n-sized state and weights shard).
    """
    d = m if d is None else d
    T, D = model_axis, data_axis
    S_l = max(1, batch // D)
    cb = compute_dtype_bytes or dtype_bytes

    w2_div = T if layout == "sharded_w2" else 1
    p_elems = (
        K * n * m / T  # W1
        + K * d * m / w2_div  # W2
        + K * n / T  # theta1
        + K * d / w2_div  # theta2
        + K  # beta
    )
    params = p_elems * dtype_bytes
    # ZeRO-1 (opt_shard_degree = data_axis): each chip holds 1/D of the
    # Adam moments (collectives.make_dp_zero1_train_step). moment_bytes
    # charges reduced-precision moment STORAGE (TrainConfig.moment_dtype
    # — train/qmoments.py: bf16 = 2, blockwise int8 = ~1.02 incl. the
    # per-block fp32 scales); composed with ZeRO-1 the flagship's 480 MB
    # replicated fp32 moments become moments*(bytes/4)/D per chip.
    moments = (
        2 * p_elems * (moment_bytes or dtype_bytes)
        / max(1, opt_shard_degree)
    )
    copy = 0.0 if compute_dtype_bytes is None else p_elems * cb
    A_bytes = m * n / T * cb + (m * n / T * dtype_bytes if cb != dtype_bytes else 0)
    # Forward carry + per-layer residual stacks (see docstring). The
    # z stream lives in R^d (= R^m for the identity-B benchmarks).
    carry = S_l * (n / T + 2 * m + d) * cb
    acts = carry + K * S_l * (n / T + 4 * m + d) * cb
    batch_bytes = S_l * (m + d) * cb + S_l * n / T * cb  # b, z*, x* shards
    return MemoryBreakdown(
        params=params,
        opt_moments=moments,
        compute_copy=copy,
        dictionary=A_bytes,
        activations=acts,
        batch=batch_bytes,
    )


def audit_or_raise(
    m,
    n,
    K,
    batch,
    data_axis=1,
    model_axis=1,
    layout="sharded_w2",
    dtype_bytes=4,
    compute_dtype_bytes=None,
    hbm_bytes: float = DEFAULT_HBM_BYTES,
    headroom: float = DEFAULT_HEADROOM,
    print_fn=None,
    d=None,
    opt_shard_degree: int = 1,
    moment_bytes: Optional[float] = None,
) -> MemoryBreakdown:
    """Assert the projected per-chip footprint fits device HBM (with
    headroom for XLA temporaries); returns the breakdown. fit_sharded
    runs this BEFORE allocating, so infeasible configs fail with the
    memory math instead of an OOM deep inside compilation. d: width of
    the general z-dictionary B (defaults to m — the identity-B case)."""
    bd = per_chip_bytes(
        m,
        n,
        K,
        batch,
        data_axis,
        model_axis,
        layout,
        dtype_bytes,
        compute_dtype_bytes,
        d,
        opt_shard_degree,
        moment_bytes,
    )
    budget = hbm_bytes * (1 - headroom)
    if print_fn:
        for name, b in bd.rows():
            print_fn(f"  {name:<30} {b / 1e9:7.2f} GB")
        print_fn(
            f"  {'TOTAL per chip':<30} {bd.total / 1e9:7.2f} GB "
            f"(budget {budget / 1e9:.2f} GB = {hbm_bytes / 1e9:.0f} GB "
            f"- {headroom:.0%} headroom, layout={layout})"
        )
    if bd.total > budget:
        raise MemoryError(
            f"projected {bd.total / 1e9:.2f} GB/chip exceeds "
            f"{budget / 1e9:.2f} GB budget (HBM {hbm_bytes / 1e9:.0f} GB "
            f"- {headroom:.0%} headroom) for layout={layout}, mesh "
            f"{data_axis}x{model_axis}. Raise model_axis, shrink the "
            "batch, or use compute_dtype=bfloat16's smaller activations."
        )
    return bd


def step_traffic_bytes(
    m: int,
    n: int,
    K: int,
    batch: int,
    data_axis: int = 1,
    model_axis: int = 1,
    layout: str = "sharded_w2",
    dtype_bytes: int = 4,
    hosts: int = 1,
) -> dict:
    """Per-chip bytes MOVED per training step, by link class (ring
    collective cost model: allreduce moves 2(P-1)/P * size per chip,
    all-gather/reduce-scatter (P-1)/P * size).

    TP collectives per layer (forward):
      * psum of partial A-matvecs, (S_l, m)                 [both layouts]
      * all_gather of the z1 d-shard, (S_l, m/T) -> (S_l,m) [sharded_w2]
    Backward transposes: the psum's cotangent is replicated (no comm);
    the all_gather transposes to a reduce_scatter (same bytes); the
    x-side's replicated-u broadcast transposes to a psum of (S_l, m).

    DP: one gradient allreduce of the chip's param shard per step. With
    data as the OUTER mesh axis, only this allreduce crosses DCN in the
    multi-host case, and it crosses once (parallel/mesh.py).
    """
    T, D = model_axis, data_axis
    S_l = max(1, batch // D)
    f = dtype_bytes

    tp = {"psum_fwd": 0.0, "gather_fwd": 0.0, "bwd": 0.0}
    if T > 1:
        ring = (T - 1) / T
        psum_layer = 2 * ring * S_l * m * f
        tp["psum_fwd"] = K * psum_layer
        # backward of the replicated-u fan-out: one psum of (S_l, m)/layer
        tp["bwd"] = K * psum_layer
        if layout == "sharded_w2":
            gather_layer = ring * S_l * m * f
            tp["gather_fwd"] = K * gather_layer
            tp["bwd"] += K * gather_layer  # reduce_scatter transpose

    grad_shard = per_chip_bytes(
        m, n, K, batch, D, T, layout, dtype_bytes
    ).params
    dp_allreduce = 2 * (D - 1) / D * grad_shard if D > 1 else 0.0

    ici_total = tp["psum_fwd"] + tp["gather_fwd"] + tp["bwd"]
    out = {
        "tp_ici_bytes_per_step": ici_total,
        "tp_detail": tp,
        "dp_grad_allreduce_bytes": dp_allreduce,
        # The mesh keeps 'data' as the OUTER axis (parallel/mesh.py), so
        # only the DP gradient allreduce can span hosts — and only when
        # there IS a data axis. TP collectives stay intra-host/ICI by
        # construction (a model axis wider than one host is out of this
        # model's scope and of the supported mesh layouts).
        "dp_crosses_dcn": hosts > 1 and D > 1,
        "layout": layout,
    }
    if hosts > 1 and D > 1:
        # The data axis spans hosts: the slowest hop of the allreduce is
        # the DCN segment; everything TP stays on ICI by construction.
        out["dcn_bytes_per_step"] = 2 * (hosts - 1) / hosts * grad_shard
    return out
