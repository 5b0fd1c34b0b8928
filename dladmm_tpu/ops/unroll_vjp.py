"""Hand-written VJP for the whole K-layer unroll (SURVEY.md §9 hard part 1).

XLA's autodiff through ``lax.scan`` saves every intermediate the transpose
rules mention (u, v, both pre-shrink activations, and the carry chain) —
for the flagship config that is ~1 GB of residual HBM traffic per step.
But the D-LADMM layer's backward needs far less: every intermediate is
*elementwise-recomputable from the carry trajectory alone*:

    u_k   = Ax_k  + z_k - b + lam_k/beta      (all carries at layer input)
    v_k   = Ax_{k+1} + z_k - b + lam_k/beta   (Ax_{k+1} is the NEXT carry)
    shrink masks/signs = support/sign of x_{k+1}, z_{k+1}  (outputs!)

So this module runs a reverse ``lax.scan`` that rebuilds u, v, and the
shrink masks on the fly from the (x, z, lam, Ax) trajectory. All matmuls
(the 6 backward contractions per layer) stay ordinary dot_generals on the
MXU — no Pallas needed; the win is pure residual-traffic elimination.
The same backward core (``bwd_from_carries``) serves three callers:

  * ``dladmm_unroll_manual``      — XLA-scan forward, final-state loss
    (the default training path; train/loop.py vjp="auto").
  * the whole-unroll Pallas megakernel's custom_vjp
    (ops/pallas_unroll.py) — the trajectory comes out of the kernel, so
    training needs NO rematerialized second forward.
  * trajectory/deep-supervision training — optional per-layer cotangents
    are folded in as the reverse scan passes each layer.

Exactness vs ``jax.grad`` of the golden op is pinned by
tests/test_unroll_vjp.py. The B = I fast path (both reference
benchmarks; SURVEY.md §2 point 4) carries (x, z, lam, Ax);
``dladmm_unroll_manual_general`` extends the same backward to a general
z-dictionary B with a (x, z, lam, Ax, Bz) carry, two extra Bᵀ
contractions per layer, and a gB accumulator (VERDICT r2 #9).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dladmm_tpu.ops.reference import _BETA_MIN, LayerParams, shrink

_mm = lambda a, M: jax.lax.dot_general(  # (S,k) x (j,k)ᵀ -> (S,j)
    a, M, (((1,), (1,)), ((), ())), preferred_element_type=a.dtype
)
_mn = lambda a, M: jax.lax.dot_general(  # (S,k) x (k,j) -> (S,j)
    a, M, (((1,), (0,)), ((), ())), preferred_element_type=a.dtype
)
_outer = lambda a, c: jax.lax.dot_general(  # (S,j)ᵀ x (S,k) -> (j,k)
    a, c, (((0,), (0,)), ((), ())), preferred_element_type=a.dtype
)


def _unbroadcast(g: Array, shape) -> Array:
    """Sum-reduce a full-shape gradient back to a broadcastable param shape."""
    if g.shape == tuple(shape):
        return g
    extra = g.ndim - len(shape)
    if extra:
        g = g.sum(axis=tuple(range(extra)))
    axes = tuple(
        i for i, (gd, sd) in enumerate(zip(g.shape, shape)) if sd == 1 and gd != 1
    )
    return g.sum(axis=axes, keepdims=True) if axes else g


def _max_grad(a: Array, c, g: Array) -> Array:
    """Gradient of max(a, c) w.r.t. a, matching jnp.maximum's tie rule
    (ties split the cotangent evenly)."""
    return g * ((a > c) + 0.5 * (a == c)).astype(g.dtype)


def bwd_layer(
    p: LayerParams,
    r,
    cts: Tuple[Array, Array, Array, Array],
    A: Array,
    b: Array,
    B: Optional[Array] = None,
    acc=None,
):
    """One layer of the reverse sweep (the module-docstring algebra).

    cts: cotangents flowing in from layer k+1 as (gx, gz, glam, gAx);
    r: layer k's residuals (6-tuple for B=None, 8-tuple for general B —
    see ``bwd_from_carries``). acc: optional data-cotangent accumulators
    — (gA, gb) for B=None, (gA, gB, gb) for general B. When acc is None
    the A/B/b outer products are never traced at all (the fused-
    optimizer training step never needs them; train/fused_adam.py).

    Returns (new_cts, gparams, new_acc).
    """
    gx, gz, glam, gAx = cts
    dt = b.dtype
    if B is None:
        # Identity B: Bz coincides with z (no separate stacks).
        (lam_in, Ax_in, z_in, x1, z1, Ax1) = r
        Bz_in, Bz1 = z_in, z1
        if acc is not None:
            gA, gb = acc
    else:
        (lam_in, Ax_in, Bz_in, z_in, x1, z1, Ax1, Bz1) = r
        if acc is not None:
            gA, gB, gb = acc
    beta_raw = p.beta
    beta = jnp.maximum(beta_raw, _BETA_MIN)
    ib = 1.0 / beta
    base = Bz_in - b + lam_in * ib
    u = Ax_in + base
    v = Ax1 + base
    r1 = Ax1 + Bz1 - b  # dual residual in lam1 = lam + beta*r1

    # lam1 = lam_in + beta * (Ax1 + B z1 - b)
    glam1 = glam
    gbeta = jnp.sum(glam1 * r1)
    gBz1 = beta * glam1
    if B is None:
        gz1 = gz + gBz1
    else:
        # Bz1 = z1 @ Bᵀ
        gz1 = gz + _mn(gBz1, B)
        if acc is not None:
            gB = gB + _outer(gBz1, z1)
    gAx1 = gAx + beta * glam1
    glam_in = glam1

    # z1 = shrink(z_in - v @ W2ᵀ, max(theta2, 0))
    mask2 = (z1 != 0).astype(dt)
    sign2 = jnp.sign(z1)
    gp2 = gz1 * mask2
    gth2 = _max_grad(
        p.theta2, 0.0, _unbroadcast(-(gp2 * sign2), p.theta2.shape)
    )
    gz_in = gp2
    gv = -_mn(gp2, p.W2)
    gW2 = -_outer(gp2, v)

    # v = Ax1 + base
    gAx1 = gAx1 + gv
    gbase = gv

    # Ax1 = x1 @ Aᵀ
    gx1 = gx + _mn(gAx1, A)
    if acc is not None:
        gA = gA + _outer(gAx1, x1)

    # x1 = shrink(x_in - u @ W1ᵀ, max(theta1, 0))
    mask1 = (x1 != 0).astype(dt)
    sign1 = jnp.sign(x1)
    gp1 = gx1 * mask1
    gth1 = _max_grad(
        p.theta1, 0.0, _unbroadcast(-(gp1 * sign1), p.theta1.shape)
    )
    gx_in = gp1
    gu = -_mn(gp1, p.W1)
    gW1 = -_outer(gp1, u)

    # u = Ax_in + base
    gAx_in = gu
    gbase = gbase + gu

    # base = B z_in - b + lam_in / beta
    if B is None:
        gz_in = gz_in + gbase
    else:
        gz_in = gz_in + _mn(gbase, B)
        if acc is not None:
            gB = gB + _outer(gbase, z_in)
    if acc is not None:
        gb = gb - gbase - beta * glam1
    glam_in = glam_in + gbase * ib
    gbeta = gbeta - jnp.sum(gbase * lam_in) * ib * ib
    gbeta_raw = _max_grad(beta_raw, _BETA_MIN, gbeta)

    new_cts = (gx_in, gz_in, glam_in, gAx_in)
    if acc is None:
        new_acc = None
    elif B is None:
        new_acc = (gA, gb)
    else:
        new_acc = (gA, gB, gb)
    return new_cts, LayerParams(gW1, gW2, gth1, gth2, gbeta_raw), new_acc


def bwd_from_carries(
    params,
    A: Array,
    b: Array,
    resid,
    final_cts: Tuple[Array, Array, Array],
    traj_cts: Optional[Tuple[Array, Array, Array]] = None,
    B: Optional[Array] = None,
):
    """Reverse-scan backward from per-layer residuals.

    resid: (K, ...)-stacked arrays — with B=None (identity) a 6-tuple
      (lam_in, Ax_in, z_in, x1, z1, Ax1); with general B an 8-tuple
      (lam_in, Ax_in, Bz_in, z_in, x1, z1, Ax1, Bz1) — layer k's input
      pieces and outputs. Use ``shifted_residuals`` to build the 6-tuple
      from a plain (x, z, lam, Ax) output trajectory.
    final_cts: cotangents (gx, gz, glam) of the final state.
    traj_cts: optional per-layer cotangents on each layer's
      (x_k, z_k, lam_k) stacks (deep supervision / trajectory loss).
    B: (m, d) dictionary for the z stream, or None for the B = I fast
      path (the branch is trace-time static; the B=None program is
      bit-identical to before the generalization).

    Returns (gparams, gA, gb) for B=None, or (gparams, gA, gB, gb) for
    general B — the unused ones (A, B, b are data) are dead-code-
    eliminated by XLA when the caller never consumes them.
    """
    gx_out, gz_out, glam_out = final_cts
    S, m = b.shape
    n = params.W1.shape[1]
    d = params.W2.shape[-2]
    dt = b.dtype

    def body(carry, xs):
        if B is None:
            gx, gz, glam, gAx, gA, gb = carry
            acc = (gA, gb)
        else:
            gx, gz, glam, gAx, gA, gB, gb = carry
            acc = (gA, gB, gb)
        if traj_cts is None:
            r, p = xs
        else:
            r, p, (ctx, ctz, ctlam) = xs
            # This layer's outputs also feed the loss directly.
            gx = gx + ctx
            gz = gz + ctz
            glam = glam + ctlam
        cts, gp, acc = bwd_layer(p, r, (gx, gz, glam, gAx), A, b, B, acc)
        return cts + acc, gp

    init = (
        gx_out,
        gz_out,
        glam_out,
        jnp.zeros((S, m), dt),  # final Ax carry is not an output
        jnp.zeros((m, n), dt),  # gA accumulator
    )
    if B is not None:
        init = init + (jnp.zeros((m, d), dt),)  # gB accumulator
    init = init + (jnp.zeros((S, m), dt),)  # gb accumulator
    xs = (resid, LayerParams(*params))
    if traj_cts is not None:
        xs = xs + (traj_cts,)
    out_carry, gp = jax.lax.scan(body, init, xs, reverse=True)
    if B is None:
        (_, _, _, _, gA, gb) = out_carry
        return type(params)(*gp), gA, gb
    (_, _, _, _, gA, gB, gb) = out_carry
    return type(params)(*gp), gA, gB, gb


def shifted_residuals(tx: Array, tz: Array, tlam: Array, tax: Array):
    """Build bwd_from_carries residuals from an output trajectory: layer
    k's inputs are layer k-1's outputs (zeros for k=0)."""
    shift = lambda t: jnp.concatenate([jnp.zeros_like(t[:1]), t[:-1]])
    return (shift(tlam), shift(tax), shift(tz), tx, tz, tax)


@jax.custom_vjp
def dladmm_unroll_manual(params, A: Array, b: Array):
    """K-layer unroll (B = I), final state only, manual-VJP trainable.

    Semantically identical to ``dladmm_forward(params, A, b)`` (pinned by
    tests); the difference is the backward pass described in the module
    docstring. Returns (x_K, z_K, lam_K).
    """
    (x, z, lam, _), _ = _fwd_scan(params, A, b)
    return x, z, lam


def _layer_fwd(A, b, x, z, lam, Ax, p: LayerParams):
    beta = jnp.maximum(p.beta, _BETA_MIN)
    base = z - b + lam * (1.0 / beta)
    u = Ax + base
    x1 = shrink(x - _mm(u, p.W1), p.theta1)
    Ax1 = _mm(x1, A)
    v = Ax1 + base
    z1 = shrink(z - _mm(v, p.W2), p.theta2)
    lam1 = lam + beta * (Ax1 + z1 - b)
    return x1, z1, lam1, Ax1


def _fwd_scan(params, A, b):
    S = b.shape[0]
    n = params.W1.shape[1]
    dt = b.dtype
    x = jnp.zeros((S, n), dt)
    z = jnp.zeros_like(b)
    lam = jnp.zeros_like(b)
    Ax = jnp.zeros_like(b)

    def body(carry, p: LayerParams):
        x, z, lam, Ax = carry
        x1, z1, lam1, Ax1 = _layer_fwd(A, b, x, z, lam, Ax, p)
        # Residuals emitted directly in bwd layout (input pieces +
        # outputs) — avoids the shift-copy of shifted_residuals on the
        # hot training path.
        ys = (lam, Ax, z, x1, z1, Ax1)
        return (x1, z1, lam1, Ax1), ys

    return jax.lax.scan(body, (x, z, lam, Ax), LayerParams(*params))


def _fwd_rule(params, A, b):
    (x, z, lam, _), traj = _fwd_scan(params, A, b)
    return (x, z, lam), (params, A, b, traj)


def _bwd_rule(res, cts):
    params, A, b, traj = res
    return bwd_from_carries(params, A, b, traj, cts)


dladmm_unroll_manual.defvjp(_fwd_rule, _bwd_rule)


@jax.custom_vjp
def dladmm_unroll_manual_general(params, A: Array, B: Array, b: Array):
    """K-layer unroll with a GENERAL z-dictionary B (m, d), final state
    only, manual-VJP trainable (VERDICT r2 #9: general-B training is no
    longer stuck on XLA autodiff).

    Semantically identical to ``dladmm_forward(params, A, b, B=B)``
    (pinned by tests/test_unroll_vjp.py); the backward is the same
    recompute-from-carries reverse scan with the two extra Bᵀ
    contractions per layer and a gB accumulator. Returns (x_K, z_K,
    lam_K). For B = I use ``dladmm_unroll_manual`` (no Bz stacks)."""
    (x, z, lam, _, _), _ = _fwd_scan_general(params, A, B, b)
    return x, z, lam


def _fwd_scan_general(params, A, B, b):
    from dladmm_tpu.ops.reference import dladmm_layer_step_cached

    S = b.shape[0]
    n = params.W1.shape[1]
    d = params.W2.shape[-2]
    dt = b.dtype
    x = jnp.zeros((S, n), dt)
    z = jnp.zeros((S, d), dt)
    lam = jnp.zeros_like(b)
    Ax = jnp.zeros_like(b)
    Bz = jnp.zeros_like(b)

    def body(carry, p: LayerParams):
        x, z, lam, Ax, Bz = carry
        x1, z1, lam1, Ax1, Bz1 = dladmm_layer_step_cached(
            A, B, b, x, z, lam, Ax, Bz, p
        )
        # Residuals in bwd layout: this layer's input pieces + outputs.
        ys = (lam, Ax, Bz, z, x1, z1, Ax1, Bz1)
        return (x1, z1, lam1, Ax1, Bz1), ys

    return jax.lax.scan(body, (x, z, lam, Ax, Bz), LayerParams(*params))


def _fwd_rule_general(params, A, B, b):
    (x, z, lam, _, _), traj = _fwd_scan_general(params, A, B, b)
    return (x, z, lam), (params, A, B, b, traj)


def _bwd_rule_general(res, cts):
    params, A, B, b, traj = res
    return bwd_from_carries(params, A, b, traj, cts, B=B)


dladmm_unroll_manual_general.defvjp(_fwd_rule_general, _bwd_rule_general)


@jax.custom_vjp
def dladmm_traj_manual_general(params, A: Array, B: Array, b: Array):
    """General-B trajectory (deep supervision): (params, A, B, b) ->
    stacked per-layer (x, z, lam) of shape (K, S, ·), with the manual
    reverse-scan backward folding the per-layer cotangents — the
    general-B analog of pallas_unroll.make_unrolled_trajectory, so
    trajectory losses with B != I are not stuck on XLA autodiff
    either."""
    _, ys = _traj_scan_general(params, A, B, b)
    return ys[4], ys[5], ys[6]  # (tx, tz, tlam) stacks


def _traj_scan_general(params, A, B, b):
    from dladmm_tpu.ops.reference import dladmm_layer_step_cached

    S = b.shape[0]
    n = params.W1.shape[1]
    d = params.W2.shape[-2]
    dt = b.dtype
    x = jnp.zeros((S, n), dt)
    z = jnp.zeros((S, d), dt)
    lam = jnp.zeros_like(b)
    Ax = jnp.zeros_like(b)
    Bz = jnp.zeros_like(b)

    def body(carry, p: LayerParams):
        x, z, lam, Ax, Bz = carry
        x1, z1, lam1, Ax1, Bz1 = dladmm_layer_step_cached(
            A, B, b, x, z, lam, Ax, Bz, p
        )
        # Input pieces + every output stack (lam1 included so the
        # trajectory primal is a plain slice of ys).
        ys = (lam, Ax, Bz, z, x1, z1, lam1, Ax1, Bz1)
        return (x1, z1, lam1, Ax1, Bz1), ys

    return jax.lax.scan(body, (x, z, lam, Ax, Bz), LayerParams(*params))


def _traj_fwd_general(params, A, B, b):
    _, ys = _traj_scan_general(params, A, B, b)
    return (ys[4], ys[5], ys[6]), (params, A, B, b, ys)


def _traj_bwd_general(res, cts):
    params, A, B, b, ys = res
    resid = (ys[0], ys[1], ys[2], ys[3], ys[4], ys[5], ys[7], ys[8])
    zeros = (
        jnp.zeros_like(ys[4][-1]),
        jnp.zeros_like(ys[5][-1]),
        jnp.zeros_like(ys[6][-1]),
    )
    return bwd_from_carries(
        params, A, b, resid, zeros, traj_cts=cts, B=B
    )


dladmm_traj_manual_general.defvjp(_traj_fwd_general, _traj_bwd_general)

__all__ = [
    "dladmm_unroll_manual",
    "dladmm_unroll_manual_general",
    "dladmm_traj_manual_general",
    "bwd_from_carries",
    "bwd_layer",
    "shifted_residuals",
]
