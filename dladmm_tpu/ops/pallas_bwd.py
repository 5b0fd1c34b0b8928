"""Whole-unroll BACKWARD Pallas megakernel (SURVEY.md §9 hard part 1).

Counterpart of ops/pallas_unroll.py for the gradient: one pallas_call
walks the K layers in REVERSE with the four cotangent-state arrays
(gx, gz, glam, gAx) living in VMEM scratch for the entire sweep, while
each layer's weights and trajectory slices stream in via k-indexed
BlockSpecs (double-buffered by the Mosaic pipeliner). The backward math
is the same recompute-from-carries algebra as ops/unroll_vjp.py:
u, v, and the shrink masks are rebuilt elementwise from the trajectory,
so the kernel's only HBM traffic is weights + trajectory once, plus the
per-layer parameter-gradient blocks out.

Layer k's INPUT carries are layer k-1's outputs, so the same trajectory
arrays are passed twice with index maps k and k-1 (clamped at 0; the
k=0 inputs are the zero initial state, selected in-kernel).

gA / gb correctness: A and b are data, but a caller may still
differentiate through them. The kernel additionally emits the per-layer
gAx1 stack and the accumulated gb, from which the wrapper forms
gA = sum_k gAx1_k^T x1_k as one batched contraction (dead-code
eliminated by XLA when the caller never uses gA).

Eligibility: bwd_fits_vmem — weights (double-buffered) + six trajectory
blocks (double-buffered) + fp32 cotangent scratch must fit VMEM. Covers
both reference benchmark shapes in bf16/fp32 at batch <= ~1024/512.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dladmm_tpu.models.unroll import DLADMMParams
from dladmm_tpu.ops.reference import _BETA_MIN

_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def bwd_fits_vmem(m: int, n: int, d: int, S: int, itemsize: int = 4) -> bool:
    """VMEM budget for the backward megakernel (module docstring)."""
    weights = 2 * (n * m + d * m) * itemsize  # W1+W2 double-buffered
    a_mat = m * n * itemsize
    traj = 2 * S * (n + 5 * m) * itemsize  # six blocks, double-buffered
    scratch = S * (n + 4 * m) * 4  # fp32 cotangents + gb accumulator
    cts = S * (n + 2 * m) * itemsize
    out = 2 * (n * m + d * m) * itemsize + 2 * S * m * itemsize
    return weights + a_mat + traj + scratch + cts + out <= _VMEM_BUDGET_BYTES


def _bwd_kernel(
    # inputs
    b_ref,  # (S, m) whole
    a_mat_ref,  # (m, n) whole
    w1_ref,  # (1, n, m) layer k
    w2_ref,  # (1, d, m) layer k
    th1_ref,  # (1, 1, n) layer k
    th2_ref,  # (1, 1, d) layer k
    beta_ref,  # (K, 1) SMEM whole
    tx_out_ref,  # (1, S, n)  x_{k+1}
    tz_out_ref,  # (1, S, d)  z_{k+1}
    tax_out_ref,  # (1, S, m) Ax_{k+1}
    tz_in_ref,  # (1, S, d)  z_k   (same array as tz, index k-1)
    tlam_in_ref,  # (1, S, m) lam_k (tlam, index k-1)
    tax_in_ref,  # (1, S, m) Ax_k  (tax, index k-1)
    gx0_ref,  # (S, n) final-state cotangents
    gz0_ref,  # (S, d)
    glam0_ref,  # (S, m)
    # outputs
    gw1_ref,  # (1, n, m)
    gw2_ref,  # (1, d, m)
    gth1_ref,  # (1, 1, n)
    gth2_ref,  # (1, 1, d)
    gbeta_ref,  # (1, 1)
    gax1_ref,  # (1, S, m) per-layer gAx1 (for gA outside)
    gb_ref,  # (S, m) accumulated gb
    # scratch (fp32, resident across the whole reverse sweep)
    gx_s,
    gz_s,
    glam_s,
    gax_s,
    *,
    K: int,
):
    pid = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(pid == 0)
    def _init():
        gx_s[:] = gx0_ref[:].astype(f32)
        gz_s[:] = gz0_ref[:].astype(f32)
        glam_s[:] = glam0_ref[:].astype(f32)
        gax_s[:] = jnp.zeros_like(gax_s)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    k = K - 1 - pid  # layer being processed
    is_layer0 = k == 0

    def dot32(a, w, dims):
        return jax.lax.dot_general(
            a.astype(w.dtype), w, (dims, ((), ())), preferred_element_type=f32
        )

    b = b_ref[:].astype(f32)
    x1 = tx_out_ref[0].astype(f32)
    z1 = tz_out_ref[0].astype(f32)
    Ax1 = tax_out_ref[0].astype(f32)
    zero_m = jnp.zeros_like(b)
    z_in = jnp.where(is_layer0, zero_m, tz_in_ref[0].astype(f32))
    lam_in = jnp.where(is_layer0, zero_m, tlam_in_ref[0].astype(f32))
    Ax_in = jnp.where(is_layer0, zero_m, tax_in_ref[0].astype(f32))

    beta_raw = beta_ref[k, 0].astype(f32)
    beta = jnp.maximum(beta_raw, _BETA_MIN)
    ib = 1.0 / beta
    base = z_in - b + lam_in * ib
    u = Ax_in + base
    v = Ax1 + base

    gx = gx_s[:]
    gz = gz_s[:]
    glam1 = glam_s[:]
    gAx = gax_s[:]

    gbeta = jnp.sum(glam1 * (Ax1 + z1 - b))
    gz1 = gz + beta * glam1
    gAx1 = gAx + beta * glam1

    dt_out = gw1_ref.dtype
    # z1 = shrink(z_in - v @ W2^T, max(theta2, 0))
    mask2 = (z1 != 0).astype(f32)
    sign2 = jnp.sign(z1)
    gp2 = gz1 * mask2
    th2 = th2_ref[0, 0].astype(f32)
    tie2 = (th2 > 0).astype(f32) + 0.5 * (th2 == 0).astype(f32)
    gth2_ref[0] = (-jnp.sum(gp2 * sign2, axis=0) * tie2).astype(dt_out)[
        None, :
    ]
    gv = -dot32(gp2, w2_ref[0], (((1,), (0,))))  # (S,d)x(d,m)
    gw2_ref[0] = -dot32(gp2, v, (((0,), (0,)))).astype(dt_out)  # (d, m)

    gAx1 = gAx1 + gv
    gbase = gv

    # Ax1 = x1 @ A^T
    gax1_ref[0] = gAx1.astype(gax1_ref.dtype)
    gx1 = gx + dot32(gAx1, a_mat_ref[:], (((1,), (0,))))  # (S,m)x(m,n)

    # x1 = shrink(x_in - u @ W1^T, max(theta1, 0))
    mask1 = (x1 != 0).astype(f32)
    sign1 = jnp.sign(x1)
    gp1 = gx1 * mask1
    th1 = th1_ref[0, 0].astype(f32)
    tie1 = (th1 > 0).astype(f32) + 0.5 * (th1 == 0).astype(f32)
    gth1_ref[0] = (-jnp.sum(gp1 * sign1, axis=0) * tie1).astype(dt_out)[
        None, :
    ]
    gu = -dot32(gp1, w1_ref[0], (((1,), (0,))))  # (S,n)x(n,m)
    gw1_ref[0] = -dot32(gp1, u, (((0,), (0,)))).astype(dt_out)  # (n, m)
    gbase = gbase + gu

    # base = z_in - b + lam_in / beta; dual lam1 = lam_in + beta*r1
    gb_ref[:] = gb_ref[:] + (-(gbase) - beta * glam1).astype(gb_ref.dtype)
    gbeta = gbeta - jnp.sum(gbase * lam_in) * ib * ib
    tie_b = (beta_raw > _BETA_MIN).astype(f32) + 0.5 * (
        beta_raw == _BETA_MIN
    ).astype(f32)
    # gbeta lives in SMEM (scalars; VMEM blocks need 8x128 tiles).
    gbeta_ref[k, 0] = (gbeta * tie_b).astype(gbeta_ref.dtype)

    # carry cotangents to layer k-1
    gx_s[:] = gp1
    gz_s[:] = gp2 + gbase
    glam_s[:] = glam1 + gbase * ib
    gax_s[:] = gu


def unroll_bwd_pallas(
    params: DLADMMParams,
    A: Array,
    b: Array,
    traj,  # (tx, tz, tlam, tax) stacked (K, S, ·)
    cts,  # (gx, gz, glam) on the final state
    interpret: Optional[bool] = None,
):
    """Run the backward megakernel; returns (gparams, gA, gb).

    Gradient parity with the reverse-scan backward (and therefore with
    jax.grad of the golden op) is pinned by tests/test_pallas_bwd.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tx, tz, tlam, tax = traj
    gx0, gz0, glam0 = cts
    K, n, m = params.W1.shape
    d = params.W2.shape[1]
    S = b.shape[0]
    dt = b.dtype

    th1 = jnp.broadcast_to(
        params.theta1.reshape(K, 1, -1).astype(dt), (K, 1, n)
    )
    th2 = jnp.broadcast_to(
        params.theta2.reshape(K, 1, -1).astype(dt), (K, 1, d)
    )
    beta = params.beta.reshape(K, 1).astype(jnp.float32)  # SMEM scalars must be 32-bit on TPU

    whole = lambda shape: pl.BlockSpec(
        shape, lambda p: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # pid p processes layer k = K-1-p; "out view" blocks index k,
    # "in view" blocks index k-1 (clamped; layer 0 masked in-kernel).
    at_k = lambda *dims: pl.BlockSpec(
        (1,) + dims,
        lambda p: (K - 1 - p,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    at_km1 = lambda *dims: pl.BlockSpec(
        (1,) + dims,
        lambda p: (jnp.maximum(K - 2 - p, 0),) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K),
        grid=(K,),
        in_specs=[
            whole((S, m)),  # b
            whole((m, n)),  # A
            at_k(n, m),  # W1
            at_k(d, m),  # W2
            at_k(1, n),  # th1
            at_k(1, d),  # th2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta
            at_k(S, n),  # tx  (out view)
            at_k(S, d),  # tz  (out view)
            at_k(S, m),  # tax (out view)
            at_km1(S, d),  # tz  (in view)
            at_km1(S, m),  # tlam (in view)
            at_km1(S, m),  # tax (in view)
            whole((S, n)),  # gx0
            whole((S, d)),  # gz0
            whole((S, m)),  # glam0
        ],
        out_specs=[
            at_k(n, m),
            at_k(d, m),
            at_k(1, n),
            at_k(1, d),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gbeta (K, 1) whole
            at_k(S, m),  # gAx1 stack
            whole((S, m)),  # gb (accumulated)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, n, m), dt),
            jax.ShapeDtypeStruct((K, d, m), dt),
            jax.ShapeDtypeStruct((K, 1, n), dt),
            jax.ShapeDtypeStruct((K, 1, d), dt),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),  # SMEM: 32-bit
            jax.ShapeDtypeStruct((K, S, m), dt),
            jax.ShapeDtypeStruct((S, m), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, n), jnp.float32),
            pltpu.VMEM((S, d), jnp.float32),
            pltpu.VMEM((S, m), jnp.float32),
            pltpu.VMEM((S, m), jnp.float32),
        ],
        interpret=interpret,
    )(
        b,
        A,
        params.W1.astype(dt),
        params.W2.astype(dt),
        th1,
        th2,
        beta,
        tx,
        tz,
        tax,
        tz,
        tlam,
        tax,
        gx0,
        gz0,
        glam0,
    )
    gW1, gW2, gth1_full, gth2_full, gbeta, gax1, gb = outs

    # Reduce theta grads from the kernel's (K, 1, n) layout back to the
    # parameter's true (possibly scalar) shape.
    def red(gfull, pshape):
        g = gfull[:, 0, :]
        if g.shape != tuple(pshape):
            g = g.sum(axis=-1, keepdims=True)[:, : pshape[-1]]
        return g

    gparams = type(params)(
        W1=gW1,
        W2=gW2,
        theta1=red(gth1_full, params.theta1.shape),
        theta2=red(gth2_full, params.theta2.shape),
        beta=gbeta[:, 0].astype(params.beta.dtype),
    )
    # gA = sum_k gAx1_k^T x1_k — one batched contraction; XLA removes it
    # (and this einsum's read of gax1) when gA is never consumed.
    gA = jax.lax.dot_general(
        gax1, tx, (((1,), (1,)), ((0,), (0,))), preferred_element_type=dt
    ).sum(axis=0)
    return gparams, gA, gb


def bwd_chunk_batch(
    m: int, n: int, d: int, S: int, itemsize: int = 4
) -> Optional[int]:
    """Largest batch-tile size for the CHUNKED backward megakernel, or
    None if no tile fits. Budget terms (grid (K, S/bs), k outer so
    weights stream once per LAYER, not once per tile):

      * full-batch fp32 cotangent state + gb accumulator — resident
        scratch across the entire grid (the whole point: the per-sample
        reverse recursion survives k-steps, only its TILE is touched)
      * fp32 param-grad accumulators (gW1/gW2/gth) — scratch, so
        cross-tile accumulation never round-trips HBM or loses bf16 bits
      * per-layer weights + A (double-buffered on k change)
      * per-(k, tile) trajectory/cotangent/output blocks, double-buffered
    """
    if d != m:
        # The chunked kernel's layer-0 zero states reuse the (bs, m)
        # b-shaped zero for z_in/lam_in/Ax_in (identity-B layout); a
        # d != m caller would hit a shape break (ADVICE r2).
        return None
    for bs in (512, 256, 128, 64):
        if S % bs or S <= bs:
            continue
        total = (
            S * (n + d + 3 * m) * 4  # gx,gz,glam,gax + gb (fp32 scratch)
            + (n * m + d * m + n + d) * 4  # gw/gth accumulators (fp32)
            + 2 * (n * m + d * m) * itemsize  # W1+W2 double-buffered
            + m * n * itemsize  # A
            + 2 * bs * (n + 5 * m) * itemsize  # 6 traj blocks, db
            + 2 * bs * (n + 2 * m) * itemsize  # gx0/gz0/glam0 tiles, db
            + 2 * bs * m * itemsize * 3  # b, gAx1-out, gb-out tiles, db
            + 2 * (n * m + d * m) * itemsize  # gw out blocks, db
        )
        if total <= _VMEM_BUDGET_BYTES:
            return bs
    return None


def _bwd_kernel_chunked(
    # inputs (tiles of bs samples; weights per layer k)
    b_ref,  # (bs, m)
    a_mat_ref,  # (m, n) whole
    w1_ref,  # (1, n, m)
    w2_ref,  # (1, d, m)
    th1_ref,  # (1, 1, n)
    th2_ref,  # (1, 1, d)
    beta_ref,  # (K, 1) SMEM whole
    tx_out_ref,  # (1, bs, n)
    tz_out_ref,  # (1, bs, d)
    tax_out_ref,  # (1, bs, m)
    tz_in_ref,  # (1, bs, d)
    tlam_in_ref,  # (1, bs, m)
    tax_in_ref,  # (1, bs, m)
    gx0_ref,  # (bs, n)
    gz0_ref,  # (bs, d)
    glam0_ref,  # (bs, m)
    # outputs
    gw1_ref,  # (1, n, m)
    gw2_ref,  # (1, d, m)
    gth1_ref,  # (1, 1, n)
    gth2_ref,  # (1, 1, d)
    gbeta_ref,  # (K, 1) SMEM
    gax1_ref,  # (1, bs, m)
    gb_ref,  # (bs, m)
    # scratch
    gx_s,  # (S, n) fp32 — FULL batch, persists across all k
    gz_s,  # (S, d)
    glam_s,  # (S, m)
    gax_s,  # (S, m)
    gb_s,  # (S, m)
    gw1_s,  # (n, m) fp32 accumulator for the current layer
    gw2_s,  # (d, m)
    gth1_s,  # (1, n)
    gth2_s,  # (1, d)
    *,
    K: int,
    bs: int,
):
    pk = pl.program_id(0)
    ps = pl.program_id(1)
    f32 = jnp.float32
    sl = pl.ds(ps * bs, bs)

    @pl.when(pk == 0)
    def _init_tile():
        gx_s[sl] = gx0_ref[:].astype(f32)
        gz_s[sl] = gz0_ref[:].astype(f32)
        glam_s[sl] = glam0_ref[:].astype(f32)
        gax_s[sl] = jnp.zeros((bs,) + gax_s.shape[1:], f32)
        gb_s[sl] = jnp.zeros((bs,) + gb_s.shape[1:], f32)

    k = K - 1 - pk
    is_layer0 = k == 0

    def dot32(a, w, dims):
        return jax.lax.dot_general(
            a.astype(w.dtype), w, (dims, ((), ())), preferred_element_type=f32
        )

    b = b_ref[:].astype(f32)
    x1 = tx_out_ref[0].astype(f32)
    z1 = tz_out_ref[0].astype(f32)
    Ax1 = tax_out_ref[0].astype(f32)
    zero_m = jnp.zeros_like(b)
    z_in = jnp.where(is_layer0, zero_m, tz_in_ref[0].astype(f32))
    lam_in = jnp.where(is_layer0, zero_m, tlam_in_ref[0].astype(f32))
    Ax_in = jnp.where(is_layer0, zero_m, tax_in_ref[0].astype(f32))

    beta_raw = beta_ref[k, 0].astype(f32)
    beta = jnp.maximum(beta_raw, _BETA_MIN)
    ib = 1.0 / beta
    base = z_in - b + lam_in * ib
    u = Ax_in + base
    v = Ax1 + base

    gx = gx_s[sl]
    gz = gz_s[sl]
    glam1 = glam_s[sl]
    gAx = gax_s[sl]

    gbeta = jnp.sum(glam1 * (Ax1 + z1 - b))
    gz1 = gz + beta * glam1
    gAx1 = gAx + beta * glam1

    dt_out = gw1_ref.dtype
    # z1 = shrink(z_in - v @ W2^T, max(theta2, 0))
    mask2 = (z1 != 0).astype(f32)
    sign2 = jnp.sign(z1)
    gp2 = gz1 * mask2
    th2 = th2_ref[0, 0].astype(f32)
    tie2 = (th2 > 0).astype(f32) + 0.5 * (th2 == 0).astype(f32)
    gth2_tile = -jnp.sum(gp2 * sign2, axis=0) * tie2
    gv = -dot32(gp2, w2_ref[0], (((1,), (0,))))
    gw2_tile = -dot32(gp2, v, (((0,), (0,))))

    gAx1 = gAx1 + gv
    gbase = gv

    # Ax1 = x1 @ A^T
    gax1_ref[0] = gAx1.astype(gax1_ref.dtype)
    gx1 = gx + dot32(gAx1, a_mat_ref[:], (((1,), (0,))))

    # x1 = shrink(x_in - u @ W1^T, max(theta1, 0))
    mask1 = (x1 != 0).astype(f32)
    sign1 = jnp.sign(x1)
    gp1 = gx1 * mask1
    th1 = th1_ref[0, 0].astype(f32)
    tie1 = (th1 > 0).astype(f32) + 0.5 * (th1 == 0).astype(f32)
    gth1_tile = -jnp.sum(gp1 * sign1, axis=0) * tie1
    gu = -dot32(gp1, w1_ref[0], (((1,), (0,))))
    gw1_tile = -dot32(gp1, u, (((0,), (0,))))
    gbase = gbase + gu

    # Cross-tile fp32 accumulation of the layer's parameter grads.
    @pl.when(ps == 0)
    def _acc_init():
        gw1_s[:] = gw1_tile
        gw2_s[:] = gw2_tile
        gth1_s[:] = gth1_tile[None, :]
        gth2_s[:] = gth2_tile[None, :]

    @pl.when(ps != 0)
    def _acc_add():
        gw1_s[:] = gw1_s[:] + gw1_tile
        gw2_s[:] = gw2_s[:] + gw2_tile
        gth1_s[:] = gth1_s[:] + gth1_tile[None, :]
        gth2_s[:] = gth2_s[:] + gth2_tile[None, :]

    # Out blocks carry the running totals; the LAST tile's write (the
    # one flushed when k advances) holds the complete layer gradient.
    gw1_ref[0] = gw1_s[:].astype(dt_out)
    gw2_ref[0] = gw2_s[:].astype(dt_out)
    gth1_ref[0] = gth1_s[:].astype(dt_out)
    gth2_ref[0] = gth2_s[:].astype(dt_out)

    # base = z_in - b + lam_in / beta; dual lam1 = lam_in + beta*r1
    gb_s[sl] = gb_s[sl] + (-(gbase) - beta * glam1)
    gb_ref[:] = gb_s[sl].astype(gb_ref.dtype)
    gbeta = gbeta - jnp.sum(gbase * lam_in) * ib * ib
    tie_b = (beta_raw > _BETA_MIN).astype(f32) + 0.5 * (
        beta_raw == _BETA_MIN
    ).astype(f32)
    gbeta_tb = gbeta * tie_b

    @pl.when(ps == 0)
    def _gbeta_init():
        gbeta_ref[k, 0] = gbeta_tb.astype(gbeta_ref.dtype)

    @pl.when(ps != 0)
    def _gbeta_add():
        gbeta_ref[k, 0] = gbeta_ref[k, 0] + gbeta_tb.astype(gbeta_ref.dtype)

    # carry cotangents to layer k-1 (this tile's slice only)
    gx_s[sl] = gp1
    gz_s[sl] = gp2 + gbase
    glam_s[sl] = glam1 + gbase * ib
    gax_s[sl] = gu


def unroll_bwd_pallas_chunked(
    params: DLADMMParams,
    A: Array,
    b: Array,
    traj,  # (tx, tz, tlam, tax) stacked (K, S, ·)
    cts,  # (gx, gz, glam) on the final state
    bs: int,
    interpret: Optional[bool] = None,
):
    """Batch-chunked backward megakernel: grid (K, S/bs) with k OUTER so
    each layer's weights stream from HBM once per layer (not once per
    tile), while the full-batch fp32 cotangent state lives in VMEM
    scratch for the entire reverse sweep and each grid step touches only
    its bs-sample slice. Extends full-Pallas training past the
    whole-batch kernel's VMEM cliff (VERDICT r1 #4). Same math and
    gradient parity pins as unroll_bwd_pallas (tests/test_pallas_bwd.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tx, tz, tlam, tax = traj
    gx0, gz0, glam0 = cts
    K, n, m = params.W1.shape
    d = params.W2.shape[1]
    assert d == m, (
        "chunked backward megakernel is identity-B only (its layer-0 "
        f"zero states are b-shaped): d={d} != m={m}"
    )
    S = b.shape[0]
    assert S % bs == 0, (S, bs)
    nS = S // bs
    dt = b.dtype

    th1 = jnp.broadcast_to(
        params.theta1.reshape(K, 1, -1).astype(dt), (K, 1, n)
    )
    th2 = jnp.broadcast_to(
        params.theta2.reshape(K, 1, -1).astype(dt), (K, 1, d)
    )
    beta = params.beta.reshape(K, 1).astype(jnp.float32)  # SMEM: 32-bit

    whole = lambda shape: pl.BlockSpec(
        shape, lambda pk, ps: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tile2 = lambda dim: pl.BlockSpec(
        (bs, dim), lambda pk, ps: (ps, 0), memory_space=pltpu.VMEM
    )
    w_at_k = lambda *dims: pl.BlockSpec(
        (1,) + dims,
        lambda pk, ps: (K - 1 - pk,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    t_at_k = lambda dim: pl.BlockSpec(
        (1, bs, dim),
        lambda pk, ps: (K - 1 - pk, ps, 0),
        memory_space=pltpu.VMEM,
    )
    t_at_km1 = lambda dim: pl.BlockSpec(
        (1, bs, dim),
        lambda pk, ps: (jnp.maximum(K - 2 - pk, 0), ps, 0),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_chunked, K=K, bs=bs),
        grid=(K, nS),
        in_specs=[
            tile2(m),  # b
            whole((m, n)),  # A
            w_at_k(n, m),  # W1
            w_at_k(d, m),  # W2
            w_at_k(1, n),  # th1
            w_at_k(1, d),  # th2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta
            t_at_k(n),  # tx (out view)
            t_at_k(d),  # tz (out view)
            t_at_k(m),  # tax (out view)
            t_at_km1(d),  # tz (in view)
            t_at_km1(m),  # tlam (in view)
            t_at_km1(m),  # tax (in view)
            tile2(n),  # gx0
            tile2(d),  # gz0
            tile2(m),  # glam0
        ],
        out_specs=[
            w_at_k(n, m),
            w_at_k(d, m),
            w_at_k(1, n),
            w_at_k(1, d),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gbeta
            t_at_k(m),  # gAx1 stack
            tile2(m),  # gb
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, n, m), dt),
            jax.ShapeDtypeStruct((K, d, m), dt),
            jax.ShapeDtypeStruct((K, 1, n), dt),
            jax.ShapeDtypeStruct((K, 1, d), dt),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, S, m), dt),
            jax.ShapeDtypeStruct((S, m), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, n), jnp.float32),
            pltpu.VMEM((S, d), jnp.float32),
            pltpu.VMEM((S, m), jnp.float32),
            pltpu.VMEM((S, m), jnp.float32),
            pltpu.VMEM((S, m), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((d, m), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        b,
        A,
        params.W1.astype(dt),
        params.W2.astype(dt),
        th1,
        th2,
        beta,
        tx,
        tz,
        tax,
        tz,
        tlam,
        tax,
        gx0,
        gz0,
        glam0,
    )
    gW1, gW2, gth1_full, gth2_full, gbeta, gax1, gb = outs

    def red(gfull, pshape):
        g = gfull[:, 0, :]
        if g.shape != tuple(pshape):
            g = g.sum(axis=-1, keepdims=True)[:, : pshape[-1]]
        return g

    gparams = type(params)(
        W1=gW1,
        W2=gW2,
        theta1=red(gth1_full, params.theta1.shape),
        theta2=red(gth2_full, params.theta2.shape),
        beta=gbeta[:, 0].astype(params.beta.dtype),
    )
    gA = jax.lax.dot_general(
        gax1, tx, (((1,), (1,)), ((0,), (0,))), preferred_element_type=dt
    ).sum(axis=0)
    return gparams, gA, gb


__all__ = [
    "unroll_bwd_pallas",
    "unroll_bwd_pallas_chunked",
    "bwd_fits_vmem",
    "bwd_chunk_batch",
]
