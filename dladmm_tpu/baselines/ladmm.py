"""Classical (fixed-parameter) linearized ADMM baseline (SURVEY.md R3/N8).

Deliberately an *independent* implementation written straight from the
SURVEY.md §2 classical equations — NOT a call into the D-LADMM layer step —
so that tests/test_ladmm_equivalence.py genuinely cross-checks the
LADMM-exact initialization of the learned model against it:

    x_{k+1} = shrink( x_k - (1/(beta L_A)) A^T (lam_k + beta (A x_k + B z_k - b)),
                      1/(beta L_A) )
    z_{k+1} = shrink( z_k - (1/(beta L_B)) B^T (lam_k + beta (A x_{k+1} + B z_k - b)),
                      1/(beta L_B) )
    lam_{k+1} = lam_k + beta (A x_{k+1} + B z_{k+1} - b)

with L_A >= ||A^T A||_2, L_B >= ||B^T B||_2.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from dladmm_tpu.models.unroll import spectral_norm_sq


@functools.partial(
    jax.jit,
    static_argnames=("iters", "capture_trajectory", "prox_x", "prox_z"),
)
def ladmm_run(
    A: Array,
    b: Array,
    B: Optional[Array] = None,
    iters: int = 15,
    beta: float = 1.0,
    L_A: Optional[Array] = None,
    L_B: Optional[Array] = None,
    capture_trajectory: bool = False,
    prox_x=None,
    prox_z=None,
):
    """Run `iters` classical LADMM iterations from zero state.

    Args mirror dladmm_forward; batch-first shapes (b: (S, m)).
    Returns the final (x, z, lam), plus stacked per-iteration states when
    capture_trajectory (for the NMSE-vs-iteration comparison curve,
    SURVEY.md §5.3).

    prox_x/prox_z: optional proximal operators ``prox(u, theta)``
    replacing the l1 soft-threshold (None = l1), so the classical
    baseline covers the same general-f/g instantiations as the learned
    net (ops/prox.py). The LADMM-exact-init equivalence holds for ANY
    prox pair as long as both sides use the same one
    (tests/test_prox.py).
    """
    m, n = A.shape
    d = m if B is None else B.shape[1]
    S = b.shape[0]
    dt = b.dtype

    if L_A is None:
        L_A = spectral_norm_sq(A)
    if L_B is None:
        L_B = jnp.asarray(1.0, dt) if B is None else spectral_norm_sq(B)
    L_A = jnp.asarray(L_A, dt)
    L_B = jnp.asarray(L_B, dt)

    Bz = (lambda z: z) if B is None else (lambda z: z @ B.T)
    BT = (lambda r: r) if B is None else (lambda r: r @ B)

    x = jnp.zeros((S, n), dt)
    z = jnp.zeros((S, d), dt)
    lam = jnp.zeros((S, m), dt)

    sx = 1.0 / (beta * L_A)
    sz = 1.0 / (beta * L_B)

    def shrink(u, t):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - t, 0.0)

    px = shrink if prox_x is None else prox_x
    pz = shrink if prox_z is None else prox_z

    def body(carry, _):
        x, z, lam = carry
        r = x @ A.T + Bz(z) - b
        x = px(x - sx * ((lam + beta * r) @ A), sx)
        r2 = x @ A.T + Bz(z) - b
        z = pz(z - sz * BT(lam + beta * r2), sz)
        lam = lam + beta * (x @ A.T + Bz(z) - b)
        ys = (x, z, lam) if capture_trajectory else None
        return (x, z, lam), ys

    (x, z, lam), traj = jax.lax.scan(body, (x, z, lam), None, length=iters)
    if capture_trajectory:
        return (x, z, lam), traj
    return x, z, lam
