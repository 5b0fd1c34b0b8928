"""K-layer D-LADMM unroll as a lax.scan over stacked per-layer params.

TPU-native replacement for the reference's Python ``for k in range(K)``
forward loop (SURVEY.md §3.1 "Model" row, §5.1): per-layer parameters are
stacked into a single ``[K, ...]`` pytree and the unroll is one
``jax.lax.scan``, so XLA traces a single layer body and the whole forward
is one fused compiled loop regardless of K.

Also implements the LADMM-exact initialization (SURVEY.md §2 point 2):
an untrained, freshly initialized net reproduces classical LADMM
trajectories bit-for-bit; tests/test_ladmm_equivalence.py pins this.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from dladmm_tpu.ops.reference import (
    LayerParams,
    apply_B,
    apply_dict,
    dladmm_layer_step,
    dladmm_layer_step_cached,
    init_state,
)

StepFn = Callable[..., tuple]


class DLADMMParams(NamedTuple):
    """Stacked per-layer parameters: every leaf has a leading K axis.

    Untied per-layer parameters per SURVEY.md §2 point 1.
    """

    W1: Array  # (K, n, m)
    W2: Array  # (K, d, m)
    theta1: Array  # (K, n) or (K, 1)
    theta2: Array  # (K, d) or (K, 1)
    beta: Array  # (K,)

    @property
    def K(self) -> int:
        return self.W1.shape[0]

    def layer(self, k) -> LayerParams:
        return LayerParams(*(leaf[k] for leaf in self))


def spectral_norm_sq(M: Array) -> Array:
    """L = ||M^T M||_2 = sigma_max(M)^2, the Lipschitz constant used by
    classical LADMM step sizes. Exact (SVD); init-time only, never in the
    hot path."""
    return jnp.linalg.norm(M, ord=2) ** 2


def init_dladmm_params(
    A: Array,
    B: Optional[Array] = None,
    K: int = 15,
    beta: float = 1.0,
    per_coordinate: bool = True,
    dtype=jnp.float32,
) -> DLADMMParams:
    """LADMM-exact initialization (SURVEY.md §2 point 2).

    Factoring lam + beta*r = beta*u in the classical x-update gives
        x+ = shrink(x - (A^T / L_A) u, 1/(beta L_A)),
    so  W1 = A^T / L_A,  theta1 = 1/(beta L_A)  (and likewise for B).
    With this init the K-layer net's trajectory equals K classical LADMM
    iterations exactly (pinned by tests/test_ladmm_equivalence.py).

    Args:
      per_coordinate: store thresholds as per-coordinate vectors (K, n) /
        (K, d) — the reference uses vector thresholds (SURVEY.md §2 point 1);
        False keeps scalars (K, 1). Both broadcast identically at init.
    """
    m, n = A.shape
    d = m if B is None else B.shape[1]
    L_A = spectral_norm_sq(A).astype(dtype)
    L_B = jnp.asarray(1.0, dtype) if B is None else spectral_norm_sq(B).astype(dtype)

    W1_0 = (A.T / L_A).astype(dtype)  # (n, m)
    if B is None:
        W2_0 = (jnp.eye(m, dtype=dtype) / L_B).astype(dtype)  # (m, m)
    else:
        W2_0 = (B.T / L_B).astype(dtype)  # (d, m)

    th1 = jnp.full((n,) if per_coordinate else (1,), 1.0 / (beta * L_A), dtype)
    th2 = jnp.full((d,) if per_coordinate else (1,), 1.0 / (beta * L_B), dtype)

    tile = lambda a: jnp.broadcast_to(a, (K,) + a.shape)
    return DLADMMParams(
        W1=tile(W1_0),
        W2=tile(W2_0),
        theta1=tile(th1),
        theta2=tile(th2),
        beta=jnp.full((K,), beta, dtype),
    )


def as_cached_step(plain_step) -> StepFn:
    """Adapt a plain step (A,B,b,x,z,lam,p)->(x,z,lam) to the cached
    interface by recomputing the matvec carries (test/compat shim)."""

    def step(A, B, b, x, z, lam, Ax, Bz, p):
        x1, z1, lam1 = plain_step(A, B, b, x, z, lam, p)
        return x1, z1, lam1, apply_dict(x1, A), apply_B(z1, B)

    return step


@functools.partial(
    jax.jit, static_argnames=("capture_trajectory", "step_fn", "unroll")
)
def dladmm_forward(
    params: DLADMMParams,
    A: Array,
    b: Array,
    B: Optional[Array] = None,
    x0: Optional[Array] = None,
    z0: Optional[Array] = None,
    lam0: Optional[Array] = None,
    capture_trajectory: bool = False,
    step_fn: Optional[StepFn] = None,
    unroll: int = 1,
):
    """Run the K-layer unroll: scan the layer step over stacked params.

    Replaces the reference's Python-loop ``net.forward(b)`` (SURVEY.md §5.1).

    Args:
      params: stacked (K, ...) parameters.
      A: (m, n) dictionary; b: (S, m) observations; B: (m, d) or None (=I).
      x0/z0/lam0: optional initial state; zeros by default.
      capture_trajectory: if True, additionally return the per-layer
        (x_k, z_k, lam_k) stacked as (K, S, ·) — scan's ys — used for deep
        supervision and NMSE-vs-layer curves (SURVEY.md §5.3).
      step_fn: layer step implementation with the *cached* signature
        ``step(A, B, b, x, z, lam, Ax, Bz, p) -> (x1, z1, lam1, Ax1, Bz1)``
        (the scan carries A x_k / B z_k so each layer does ONE A-matvec,
        not two — mathematically identical, ~33% fewer FLOPs). Defaults to
        the pure-JAX golden op; the fused Pallas kernel is swapped in here
        (kernel={reference|pallas} config switch, SURVEY.md §9.1).
      unroll: scan unroll factor (XLA loop unrolling of the layer body).

    Returns:
      (x_K, z_K, lam_K) and, if capture_trajectory, the (K, S, ·) stacks.
    """
    if step_fn is None:
        step_fn = dladmm_layer_step_cached
    n = params.W1.shape[1]
    d = params.W2.shape[1]
    m = A.shape[0]
    if A.shape[1] != n or params.W1.shape[2] != m:
        raise ValueError(
            f"A {A.shape} inconsistent with W1 {params.W1.shape[1:]} — "
            "expected A (m, n) and per-layer W1 (n, m)"
        )
    if b.ndim != 2 or b.shape[1] != m:
        raise ValueError(f"b must be (batch, m={m}); got {b.shape}")
    if B is not None and B.shape != (m, d):
        raise ValueError(f"B must be (m={m}, d={d}); got {B.shape}")
    x = jnp.zeros((b.shape[0], n), b.dtype) if x0 is None else x0
    z = jnp.zeros((b.shape[0], d), b.dtype) if z0 is None else z0
    lam = jnp.zeros_like(b) if lam0 is None else lam0
    # Matvec carries; for the default zero init they are zeros for free.
    Ax = jnp.zeros_like(lam) if x0 is None else apply_dict(x, A)
    Bz = (
        (z if B is None else jnp.zeros_like(lam))
        if z0 is None
        else apply_B(z, B)
    )

    def body(carry, p: LayerParams):
        x, z, lam, Ax, Bz = carry
        x, z, lam, Ax, Bz = step_fn(A, B, b, x, z, lam, Ax, Bz, p)
        ys = (x, z, lam) if capture_trajectory else None
        return (x, z, lam, Ax, Bz), ys

    (x, z, lam, _, _), traj = jax.lax.scan(
        body, (x, z, lam, Ax, Bz), LayerParams(*params), unroll=unroll
    )
    if capture_trajectory:
        return (x, z, lam), traj
    return x, z, lam


__all__ = [
    "DLADMMParams",
    "init_dladmm_params",
    "dladmm_forward",
    "spectral_norm_sq",
    "init_state",
]
