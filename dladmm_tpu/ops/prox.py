"""Proximal-operator registry — general f/g instantiations of D-LADMM.

The paper (SURVEY.md §1-2) states D-LADMM for the general composite
problem ``min f(x) + g(z) s.t. Ax + Bz = b``: the learned layer applies
the proximal operator of f (resp. g) after each learned descent step.
The reference code instantiates f = g = ||.||_1 (soft-threshold) only;
this module makes the prox a pluggable axis of the framework so other
classical f/g choices train with the SAME unroll, init, loss, and eval
machinery (ops/reference.make_cached_step, ProblemConfig.prox_x/prox_z).

Every operator has the signature ``prox(u, theta) -> Array`` with theta
the learned per-layer threshold (clamped to >= 0 at use, matching
ops.reference.shrink — SURVEY.md §2 point 1), so the stacked parameter
pytree, LADMM-exact init, and optimizer are unchanged: only the
nonlinearity differs. The fused Pallas kernels and the manual
reverse-scan VJP remain l1-specialized (the benchmark fast path); every
other prox routes through the XLA scan + autodiff, which loss_fn's
"auto" routing does whenever a custom step_fn is present.

Exactness notes per operator (u the descent point, t = max(theta, 0)):

  l1           prox of t*||w||_1                 sign(u) * max(|u|-t, 0)
  nonneg_l1    prox of t*||w||_1 + I(w >= 0)     max(u - t, 0)
  elastic_net  prox of t*||w||_1 + rho/2 ||w||^2 shrink(u, t) / (1 + rho)
  box          prox of I(|w_i| <= t_i)           clip(u, -t, t)
  group_l2     prox of t*||w||_2 (per sample)    u * max(1 - t/||u||_2, 0)

group_l2 is the exact block soft-threshold for SCALAR t; with a learned
per-coordinate theta vector it is the same row-rescaling applied with a
broadcast threshold — no longer the exact prox of a norm, but a
well-defined learned shrinkage (in D-LADMM every parameter is learned
away from its classical value anyway, theta included).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import Array

from dladmm_tpu.ops.reference import shrink

ProxFn = Callable[[Array, Array], Array]


def prox_l1(u: Array, theta: Array) -> Array:
    """Soft-threshold — the reference benchmarks' prox (= ops.reference.shrink)."""
    return shrink(u, theta)


def prox_nonneg_l1(u: Array, theta: Array) -> Array:
    """One-sided shrink: prox of theta*||w||_1 + indicator(w >= 0).

    Nonnegative sparse coding / NMF-style codes; pairs with
    ProblemConfig.nonneg_x=True so the synthetic x* lives in the model
    class.
    """
    return jnp.maximum(u - jnp.maximum(theta, 0.0), 0.0)


def prox_box(u: Array, theta: Array) -> Array:
    """Projection onto the box [-theta, theta] (prox of its indicator)."""
    t = jnp.maximum(theta, 0.0)
    return jnp.clip(u, -t, t)


def prox_group_l2(u: Array, theta: Array) -> Array:
    """Row-wise block soft-threshold: u * max(1 - theta/||u||_2, 0).

    The norm is over the feature axis (axis -1, the state layout of
    ops/reference.py: (S, n)/(S, d)), i.e. one group per sample.
    """
    t = jnp.maximum(theta, 0.0)
    # Safe-norm: sqrt's VJP is inf at 0, so an exactly-zero row yields
    # 0 * inf = NaN gradients that poison the whole batch's parameter
    # grads — and a `where` AFTER the norm doesn't help (0 * NaN = NaN in
    # the VJP chain). Guard inside: route zero rows through sqrt(1), then
    # select the 0 branch; the outer where's VJP sends those rows a zero
    # cotangent through a finite path.
    sq = jnp.sum(u * u, axis=-1, keepdims=True)
    pos = sq > 0.0
    norm = jnp.sqrt(jnp.where(pos, sq, 1.0))
    scale = jnp.where(pos, jnp.maximum(1.0 - t / norm, 0.0), 0.0)
    return u * scale


def make_prox_elastic_net(rho: float) -> ProxFn:
    """Prox of theta*||w||_1 + (rho/2)*||w||^2: shrink then 1/(1+rho).

    rho is a fixed (non-learned) curvature hyperparameter
    (ProblemConfig.prox_rho); rho = 0 reduces to l1.
    """
    if rho < 0:
        raise ValueError(f"elastic_net rho must be >= 0, got {rho}")
    inv = 1.0 / (1.0 + rho)

    def prox(u: Array, theta: Array) -> Array:
        return shrink(u, theta) * inv

    return prox


# Measured on chip (round 5, verify_tpu [prox-mega]): every elementwise
# prox is BIT-EXACT between the prox-templated Pallas megakernel and the
# XLA scan, but group_l2's row-norm deviates by ~5e-4..2e-3 relative —
# Mosaic lowers the sqrt/divide chain with a different approximation
# than XLA. Serving therefore keeps the XLA scan for group_l2 (the flag
# below); the deviation is a numerics difference, not a bug in either.
prox_group_l2.kernel_exact_on_tpu = False

_REGISTRY = {
    "l1": lambda rho: prox_l1,
    "nonneg_l1": lambda rho: prox_nonneg_l1,
    "elastic_net": make_prox_elastic_net,
    "box": lambda rho: prox_box,
    "group_l2": lambda rho: prox_group_l2,
}


def kernel_exact(prox_fn) -> bool:
    """True when the prox's megakernel output is bit-exact vs the XLA
    scan on TPU (see the group_l2 note above) — the condition the
    serving paths require before routing a trained prox through
    ops/pallas_unroll.make_unrolled_inference_prox."""
    return getattr(prox_fn, "kernel_exact_on_tpu", True)

PROX_NAMES = tuple(sorted(_REGISTRY))


def get_prox(name: str, rho: float = 0.0) -> ProxFn:
    """Resolve a prox by registry name ('l1', 'nonneg_l1', 'elastic_net',
    'box', 'group_l2'). rho only affects 'elastic_net'."""
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown prox {name!r}; available: {', '.join(PROX_NAMES)}"
        ) from None
    return factory(rho)


def is_l1(prox_x: str, prox_z: str, rho: float = 0.0) -> bool:
    """True when the (prox_x, prox_z, rho) config is the reference l1/l1
    instantiation — the condition for the Pallas/manual-VJP fast paths."""
    return (
        (prox_x == "l1" or (prox_x == "elastic_net" and rho == 0.0))
        and (prox_z == "l1" or (prox_z == "elastic_net" and rho == 0.0))
    )


__all__ = [
    "ProxFn",
    "PROX_NAMES",
    "get_prox",
    "is_l1",
    "kernel_exact",
    "prox_l1",
    "prox_nonneg_l1",
    "prox_box",
    "prox_group_l2",
    "make_prox_elastic_net",
]
