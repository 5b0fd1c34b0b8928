"""LADMM-equivalence test — SURVEY.md §6.2-2, "the most important one":

A freshly init_from_ladmm'd D-LADMM net must produce IDENTICAL
trajectories to baselines/ladmm.py for all K. This pins the init
semantics (SURVEY.md §2 point 2: untrained net == classical LADMM).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from dladmm_tpu.baselines.ladmm import ladmm_run
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params


@pytest.mark.parametrize("identity_B", [True, False])
@pytest.mark.parametrize("beta", [1.0, 0.5])
def test_init_reproduces_ladmm_trajectory(identity_B, beta):
    key = jax.random.PRNGKey(42)
    kA, kB, kd = jax.random.split(key, 3)
    m, n, K, S = 20, 40, 12, 8
    A = make_dictionary(kA, m, n)
    B = None
    if not identity_B:
        B = make_dictionary(kB, m, 24)
    data = make_batch(kd, A, S)
    b = data.b

    params = init_dladmm_params(A, B, K=K, beta=beta)
    (_, _, _), (tx, tz, tlam) = dladmm_forward(
        params, A, b, B=B, capture_trajectory=True
    )
    (_, _, _), (lx, lz, llam) = ladmm_run(
        A, b, B=B, iters=K, beta=beta, capture_trajectory=True
    )

    # Trajectories must agree at every layer to float32 roundoff.
    np.testing.assert_allclose(np.asarray(tx), np.asarray(lx), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tz), np.asarray(lz), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tlam), np.asarray(llam), rtol=2e-5, atol=1e-6
    )


def test_scalar_and_vector_thresholds_agree():
    """per_coordinate thresholds init to the same broadcast value."""
    key = jax.random.PRNGKey(7)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, 10, 20)
    b = make_batch(kd, A, 4).b
    pv = init_dladmm_params(A, K=5, per_coordinate=True)
    ps = init_dladmm_params(A, K=5, per_coordinate=False)
    xv, zv, _ = dladmm_forward(pv, A, b)
    xs, zs, _ = dladmm_forward(ps, A, b)
    np.testing.assert_allclose(np.asarray(xv), np.asarray(xs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(zv), np.asarray(zs), rtol=1e-6)


def test_ladmm_converges_on_solvable_problem():
    """Sanity: classical LADMM drives the constraint residual down."""
    key = jax.random.PRNGKey(3)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, 25, 50)
    data = make_batch(kd, A, 16)
    from dladmm_tpu.metrics.core import constraint_residual

    x1, z1, _ = ladmm_run(A, data.b, iters=5)
    x2, z2, _ = ladmm_run(A, data.b, iters=200)
    r1 = float(constraint_residual(A, data.b, x1, z1))
    r2 = float(constraint_residual(A, data.b, x2, z2))
    assert r2 < r1
    assert r2 < 0.1
