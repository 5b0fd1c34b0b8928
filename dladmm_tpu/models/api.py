"""Kernel/forward selection policy (the kernel={...} config switch,
SURVEY.md §9.1).

Measured on TPU v5e (see BASELINE.md):
  * whole-unroll megakernel  — fastest whenever one layer's weights
    (double-buffered) + full batch state fit VMEM (covers both reference
    benchmark shapes); state never leaves VMEM across all K layers.
  * per-layer fused kernel   — next, when weights fit VMEM residently.
  * XLA scan over the golden op (default bf16 MXU precision) — large
    shapes (flagship weights exceed VMEM; XLA's per-matmul streaming
    wins there until the streamed-weight kernel lands).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

from dladmm_tpu.models.unroll import dladmm_forward
from dladmm_tpu.ops.pallas_layer import auto_fused_step
from dladmm_tpu.ops.pallas_unroll import (
    make_unrolled_forward,
    unroll_tile_batch,
)

ForwardFn = Callable  # (params, A, b) -> (x, z, lam)


def select_forward(
    m: int,
    n: int,
    d: int,
    S: int,
    kernel: str = "auto",
    need_trajectory: bool = False,
    identity_B: bool = True,
) -> Tuple[Optional[ForwardFn], Optional[Callable], str]:
    """Returns (forward_fn, step_fn, description).

    forward_fn replaces the whole unroll (megakernel); step_fn plugs into
    dladmm_forward's scan. At most one is non-None; (None, None) means
    the pure-XLA reference path.
    """
    if kernel == "reference" or not identity_B:
        return None, None, "xla-scan-reference"
    if need_trajectory:
        # Deep supervision / trajectory losses: forward_fn returns the
        # STACKED (K, S, ·) trajectory (loss_fn contract). The
        # trajectory megakernel (tiled when the whole batch exceeds
        # VMEM) carries a custom_vjp that folds per-layer cotangents
        # into the manual reverse-scan backward. NOTE: XLA autodiff
        # through a scan of the fused-layer custom_vjp step (the round-1
        # selection here) wedges the TPU compiler at this combination —
        # measured round 2; the reference scan is the safe fallback.
        from dladmm_tpu.ops.pallas_unroll import (
            make_unrolled_trajectory,
            traj_tile_batch,
        )

        if kernel in ("auto", "pallas", "megakernel"):
            # make_unrolled_trajectory internally picks the (tiled)
            # Pallas trajectory kernel when a tile fits VMEM and an
            # XLA-scan trajectory otherwise; EITHER way the backward is
            # the manual reverse-scan with folded per-layer cotangents —
            # so even the flagship shape gets the manual VJP's
            # residual-traffic win for deep supervision.
            desc = (
                "trajectory-megakernel"
                if traj_tile_batch(m, n, d, S) is not None
                else "trajectory-xla-fwd+manual-bwd"
            )
            return make_unrolled_trajectory(), None, desc
        return None, None, "xla-scan-reference"
    if kernel in ("auto", "pallas", "megakernel"):
        bs = unroll_tile_batch(m, n, d, S)
        if bs == S:
            return make_unrolled_forward(), None, "whole-unroll-megakernel"
        if bs is not None:
            # Tile-outer grid: state VMEM-resident per batch tile.
            return (
                make_unrolled_forward(),
                None,
                f"whole-unroll-megakernel-tiled-bs{bs}",
            )
        step = auto_fused_step(m, n, d)
        if step is not None:
            return None, step, "scan+fused-layer-kernel"
    return None, None, "xla-scan-reference"


def resolve_forward(
    m: int,
    n: int,
    d: int,
    S: int,
    kernel: str = "auto",
    need_trajectory: bool = False,
    identity_B: bool = True,
) -> Tuple[ForwardFn, str]:
    """select_forward collapsed to ONE callable (params, A, b) ->
    (x, z, lam): the megakernel when selected, else the scan with the
    selected (or default) step_fn. The single place encoding the
    'forward_fn or partial(dladmm_forward, step_fn)' policy."""
    import functools

    forward_fn, step_fn, desc = select_forward(
        m, n, d, S, kernel, need_trajectory, identity_B
    )
    if forward_fn is None:
        forward_fn = functools.partial(dladmm_forward, step_fn=step_fn)
    return forward_fn, desc
