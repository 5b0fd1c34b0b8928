"""Pure-JAX golden ops for the D-LADMM recurrence (SURVEY.md §2, component N1).

These are the semantic reference for everything else in the framework: the
fused Pallas kernel (ops/pallas_layer.py), the sharded TP step
(parallel/collectives.py), and the classical LADMM baseline
(baselines/ladmm.py) are all tested against these functions.

Math (SURVEY.md §2, paper Eq. 8-10, l1/l1 robust sparse coding instantiation):

    u_k      = A x_k + B z_k - b + lam_k / beta_k
    x_{k+1}  = shrink( x_k - W1_k u_k ,  theta1_k )      W1_k in R^{n x m}
    v_k      = A x_{k+1} + B z_k - b + lam_k / beta_k    (Gauss-Seidel)
    z_{k+1}  = shrink( z_k - W2_k v_k ,  theta2_k )      W2_k in R^{d x m}
    lam_{k+1}= lam_k + beta_k (A x_{k+1} + B z_{k+1} - b)

Conventions:
  * Everything is batch-first: x (S, n), z (S, d), lam/b (S, m).
  * Matrices are stored in math convention (A: (m, n), W1: (n, m),
    W2: (d, m), B: (m, d)); application is ``v @ M.T`` expressed as a
    dot_general with contraction on the matrix's second axis, which XLA
    maps onto the MXU without a physical transpose.
  * ``B=None`` means B = I (the benchmark fast path, d == m).
  * Thresholds may be scalars, per-coordinate vectors (n,)/(d,), or any
    shape broadcastable against the state; they are clamped to >= 0 at use
    so training can never flip the shrinkage direction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

_BETA_MIN = 1e-6


class LayerParams(NamedTuple):
    """Learnable parameters of one D-LADMM layer (or K stacked layers).

    Stacked form (leading K axis on every leaf) is what models/unroll.py
    scans over.
    """

    W1: Array  # (n, m)    x-update weight
    W2: Array  # (d, m)    z-update weight
    theta1: Array  # broadcastable to (S, n); typically (n,) or scalar
    theta2: Array  # broadcastable to (S, d)
    beta: Array  # scalar penalty / dual step size


def shrink(u: Array, theta: Array) -> Array:
    """Soft-thresholding prox of the l1 norm: sign(u) * max(|u| - theta, 0).

    theta is clamped to >= 0 (SURVEY.md §2 point 1: thresholds stay
    positive). Gradient w.r.t. theta is well-defined away from the kink.
    """
    theta = jnp.maximum(theta, 0.0)
    return jnp.sign(u) * jnp.maximum(jnp.abs(u) - theta, 0.0)


def apply_dict(v: Array, M: Array) -> Array:
    """Batched mat-vec  (S, k) x (j, k)^T -> (S, j)  without copying M.

    Equivalent to ``v @ M.T``; expressed as dot_general so XLA contracts
    M's second axis directly (MXU-friendly, no transpose materialized).
    """
    return jax.lax.dot_general(
        v, M, (((1,), (1,)), ((), ())), preferred_element_type=v.dtype
    )


def apply_B(z: Array, B: Optional[Array]) -> Array:
    """B z with the B = I fast path (B=None) used by both benchmarks."""
    return z if B is None else apply_dict(z, B)


def make_layer_step(prox_x=shrink, prox_z=shrink):
    """Build a plain layer step for general proximal operators f/g.

    The D-LADMM recurrence (SURVEY.md §2) with the two shrink
    applications replaced by arbitrary ``prox(u, theta)`` callables
    (ops/prox.py registry): the parameters, Gauss-Seidel ordering, and
    dual update are identical — only the nonlinearity changes. The
    default (shrink, shrink) IS the reference l1/l1 instantiation;
    ``dladmm_layer_step`` below is that instance.

    Returned signature: ``step(A, B, b, x, z, lam, p) -> (x1, z1, lam1)``.
    """

    def step(
        A: Array,
        B: Optional[Array],
        b: Array,
        x: Array,
        z: Array,
        lam: Array,
        p: LayerParams,
    ):
        beta = jnp.maximum(p.beta, _BETA_MIN)
        inv_beta = 1.0 / beta
        # Shifted primal residual u = A x + B z - b + lam/beta.
        Ax = apply_dict(x, A)
        base = apply_B(z, B) - b + lam * inv_beta
        u = Ax + base
        x_next = prox_x(x - apply_dict(u, p.W1), p.theta1)
        # Gauss-Seidel: v uses the fresh x_next (SURVEY.md §2 point 3).
        Ax_next = apply_dict(x_next, A)
        v = Ax_next + base
        z_next = prox_z(z - apply_dict(v, p.W2), p.theta2)
        lam_next = lam + beta * (Ax_next + apply_B(z_next, B) - b)
        return x_next, z_next, lam_next

    return step


def make_cached_step(prox_x=shrink, prox_z=shrink):
    """Build a cached-matvec layer step for general proximal operators.

    Same recurrence as make_layer_step but carrying A x_k / B z_k across
    layers (~33% fewer matmul FLOPs — see dladmm_layer_step_cached).
    This is the step_fn shape dladmm_forward's scan consumes; non-l1
    proxes plug into the full train/eval stack through it
    (ProblemConfig.prox_x/prox_z -> train.loop.fit).

    Returned signature:
    ``step(A, B, b, x, z, lam, Ax, Bz, p) -> (x1, z1, lam1, Ax1, Bz1)``.
    """

    def step(
        A: Array,
        B: Optional[Array],
        b: Array,
        x: Array,
        z: Array,
        lam: Array,
        Ax: Array,
        Bz: Array,
        p: LayerParams,
    ):
        beta = jnp.maximum(p.beta, _BETA_MIN)
        inv_beta = 1.0 / beta
        base = Bz - b + lam * inv_beta
        u = Ax + base
        x_next = prox_x(x - apply_dict(u, p.W1), p.theta1)
        Ax_next = apply_dict(x_next, A)
        v = Ax_next + base
        z_next = prox_z(z - apply_dict(v, p.W2), p.theta2)
        Bz_next = apply_B(z_next, B)
        lam_next = lam + beta * (Ax_next + Bz_next - b)
        return x_next, z_next, lam_next, Ax_next, Bz_next

    return step


_l1_plain_step = make_layer_step()
_l1_cached_step = make_cached_step()


def dladmm_layer_step(
    A: Array,
    B: Optional[Array],
    b: Array,
    x: Array,
    z: Array,
    lam: Array,
    p: LayerParams,
):
    """One D-LADMM layer (SURVEY.md §2 recurrence; call stack §5.2).

    The reference l1/l1 instantiation of make_layer_step (shrink for
    both proxes).

    Args:
      A: dictionary (m, n) — data, not a parameter.
      B: (m, d) or None for B = I.
      b: observations (S, m).
      x, z, lam: state (S, n), (S, d), (S, m).
      p: this layer's LayerParams.

    Returns:
      (x_next, z_next, lam_next).
    """
    return _l1_plain_step(A, B, b, x, z, lam, p)


def dladmm_layer_step_cached(
    A: Array,
    B: Optional[Array],
    b: Array,
    x: Array,
    z: Array,
    lam: Array,
    Ax: Array,
    Bz: Array,
    p: LayerParams,
):
    """Layer step carrying A x_k and B z_k across layers.

    Mathematically identical to dladmm_layer_step (pinned by
    tests/test_unroll.py) but eliminates one of the two A-matvecs
    per layer: the dual update's A x_{k+1} is exactly the A x needed by
    layer k+1's residual, so the scan carries (Ax, Bz) alongside the
    state — ~33% fewer matmul FLOPs than the reference recurrence at
    B = I. For k=0 the carries are zero because x_0 = z_0 = 0.
    The reference l1/l1 instantiation of make_cached_step.

    Returns (x1, z1, lam1, Ax1, Bz1).
    """
    return _l1_cached_step(A, B, b, x, z, lam, Ax, Bz, p)


def init_state(b: Array, n: int, d: int):
    """Zero initial (x, z, lam) for a batch b of shape (S, m).

    Matches the reference's zero-init of the unrolled trajectory
    (SURVEY.md §5.1).
    """
    S = b.shape[0]
    dt = b.dtype
    return (
        jnp.zeros((S, n), dt),
        jnp.zeros((S, d), dt),
        jnp.zeros((S, b.shape[1]), dt),
    )
