"""Evaluation metrics (SURVEY.md R6/N10).

  * NMSE(dB) = 10 log10( E_s[ ||x_hat_s - x*_s||^2 / ||x*_s||^2 ] ),
    the paper's signature per-layer curve metric (SURVEY.md §2 point 7).
  * Relative constraint residual ||A x + B z - b|| / ||b|| (north-star
    metric, BASELINE.json:2).
  * PSNR for the image-denoising benchmark.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

_EPS = 1e-12


def nmse_db(x_hat: Array, x_star: Array) -> Array:
    """Batch-mean normalized MSE in dB. Inputs (S, n).

    Samples whose ground truth has (numerically) zero support are
    excluded from the mean: their per-sample ratio ||x̂||²/0 is
    undefined and would otherwise dominate the batch with +80 dB noise.
    At the benchmark shapes (n >= 500, sparsity 0.1) empty supports have
    probability ~1e-23, so this changes nothing there; it matters for
    tiny unit-test shapes (P(empty) ≈ 3% at n = 32).
    """
    num = jnp.sum((x_hat - x_star) ** 2, axis=-1)
    den = jnp.sum(x_star**2, axis=-1)
    valid = den > _EPS
    n_valid = jnp.sum(valid)
    ratio = jnp.where(valid, num / jnp.maximum(den, _EPS), 0.0)
    mean = jnp.sum(ratio) / jnp.maximum(n_valid, 1)
    # All-degenerate batch: there is no meaningful NMSE — surface NaN
    # rather than the near-perfect -120 dB that log10(0+eps) would give.
    return jnp.where(
        n_valid > 0, 10.0 * jnp.log10(mean + _EPS), jnp.nan
    )


def per_layer_nmse_db(traj_x: Array, x_star: Array) -> Array:
    """NMSE(dB) at every layer: traj_x (K, S, n) -> (K,). This is the
    NMSE-vs-layer curve compared against the LADMM baseline
    (SURVEY.md §5.3)."""
    return jax.vmap(nmse_db, in_axes=(0, None))(traj_x, x_star)


def constraint_residual(
    A: Array, b: Array, x: Array, z: Array, B: Optional[Array] = None
) -> Array:
    """Batch-mean relative residual ||A x + B z - b||_2 / ||b||_2."""
    Bz = z if B is None else z @ B.T
    r = x @ A.T + Bz - b
    num = jnp.linalg.norm(r, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(b, axis=-1), _EPS)
    return jnp.mean(num / den)


def psnr(x: Array, ref: Array, data_range: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB over the full array."""
    mse = jnp.mean((x - ref) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, _EPS))
