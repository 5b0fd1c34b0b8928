"""Patch dictionaries for the image-denoising benchmark (SURVEY.md R8/N5).

The reference ships a LEARNED dictionary as a .mat fixture; with no
fixtures available (empty mount, SURVEY.md §9.5) we provide both
fixture-free stand-ins called out in the build plan:

  * ``dct_dictionary`` — the standard overcomplete 2-D DCT dictionary
    (the classical K-SVD starting point), and
  * ``learn_dictionary`` — dictionary learning on clean training patches
    with our own solver: batched FISTA sparse coding alternated with a
    MOD (least-squares) dictionary update, the whole alternation inside
    one ``lax.scan``/jit so it runs as large batched matmuls on the MXU.

The metric-comparability caveat vs the reference's exact fixture is
noted in BASELINE.md.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array


def dct_dictionary(patch: int = 8, atoms_per_dim: int = 16, dtype=jnp.float32) -> Array:
    """Overcomplete 2-D DCT dictionary: (patch^2, atoms_per_dim^2),
    columns unit-norm. patch=8, atoms=16 -> 64 x 256 (4x overcomplete)."""
    k = np.arange(patch)[:, None]
    j = np.arange(atoms_per_dim)[None, :]
    D1 = np.cos(np.pi * (k + 0.5) * j / atoms_per_dim)  # (patch, atoms)
    D1 -= D1.mean(axis=0, keepdims=True) * (j > 0)  # zero-mean AC atoms
    D1 /= np.linalg.norm(D1, axis=0, keepdims=True)
    D = np.kron(D1, D1)  # (patch^2, atoms^2)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    return jnp.asarray(D, dtype)


def _fista_code(D: Array, P: Array, lam: float, iters: int) -> Array:
    """Batched LASSO coding: argmin_X 0.5||P - X Dᵀ||² + lam ||X||₁.

    P is (S, m) patches, D is (m, n); returns codes X (S, n). FISTA with
    a fixed step 1/L, L = ||DᵀD||₂ (power iteration). The iteration is a
    ``lax.scan`` of two (S, m/n)x(m, n) matmuls + shrink per step — pure
    MXU work, no data-dependent control flow.
    """
    G = D.T @ D  # (n, n) Gram, reused every iteration
    # Power iteration for L = lambda_max(G); fixed 16 steps is ample for
    # the well-conditioned Grams of unit-norm dictionaries.
    v0 = jnp.ones((G.shape[0],), D.dtype) / jnp.sqrt(G.shape[0])

    def pw(v, _):
        w = G @ v
        return w / jnp.linalg.norm(w), None

    v, _ = jax.lax.scan(pw, v0, None, length=16)
    L = v @ (G @ v)
    step = 1.0 / L
    thresh = lam * step
    PD = P @ D  # (S, n), constant across iterations

    def shrink(u):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - thresh, 0.0)

    X0 = shrink(step * PD)

    def body(carry, _):
        X, Y, t = carry
        Xn = shrink(Y - step * (Y @ G - PD))
        tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        Yn = Xn + ((t - 1.0) / tn) * (Xn - X)
        return (Xn, Yn, tn), None

    (X, _, _), _ = jax.lax.scan(
        body, (X0, X0, jnp.asarray(1.0, D.dtype)), None, length=iters
    )
    return X


@functools.partial(
    jax.jit, static_argnames=("n_atoms", "outer", "fista_iters")
)
def learn_dictionary(
    patches: Array,
    init: Array,
    *,
    n_atoms: int = 256,
    outer: int = 12,
    fista_iters: int = 40,
    lam: float = 0.05,
    eps: float = 1e-6,
) -> Array:
    """Learn an overcomplete patch dictionary by alternating minimization.

    min_{D, X} 0.5 ||P - X Dᵀ||² + lam ||X||₁, columns of D unit-norm —
    FISTA coding step + MOD update D ← Pᵀ X (XᵀX + eps I)⁻¹, fixture-free
    stand-in for the reference's learned .mat dictionary (SURVEY.md §9.5).

    patches: (S, m) zero-DC training patches. init: (m, n_atoms) starting
    dictionary (use ``dct_dictionary``). Fully jitted: the outer
    alternation is a ``lax.scan``, so the whole learning run is one XLA
    program of batched matmuls + an (n, n) Cholesky solve per outer step.
    """
    assert init.shape[1] == n_atoms, (init.shape, n_atoms)
    P = patches
    eye = jnp.eye(n_atoms, dtype=init.dtype)

    def outer_step(D, _):
        X = _fista_code(D, P, lam, fista_iters)  # (S, n)
        # MOD: least-squares dictionary given codes (SPD solve).
        gram = X.T @ X + eps * eye
        Dn = jax.scipy.linalg.solve(gram, X.T @ P, assume_a="pos").T
        norms = jnp.linalg.norm(Dn, axis=0, keepdims=True)
        # Dead atoms (never used) keep their previous direction.
        Dn = jnp.where(norms > 1e-8, Dn / jnp.maximum(norms, 1e-8), D)
        return Dn.astype(init.dtype), None

    D, _ = jax.lax.scan(outer_step, init, None, length=outer)
    return D
