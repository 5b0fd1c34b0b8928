"""High-level DLADMMSolver API tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.solver import DLADMMSolver


@pytest.mark.slow
def test_solver_end_to_end():
    key = jax.random.PRNGKey(0)
    kA, kd, kt = jax.random.split(key, 3)
    A = make_dictionary(kA, 30, 60)
    data = make_batch(kd, A, 32)

    solver = DLADMMSolver.create(A, K=8)
    curve0 = solver.nmse_curve(data.b, data.x_star)
    assert curve0.shape == (8,)

    trained = solver.fit(kt, steps=150, batch=32, lr=3e-3)
    curve1 = trained.nmse_curve(data.b, data.x_star)
    assert float(curve1[-1]) < float(curve0[-1]) - 0.5  # training helps

    x, z = trained.solve(data.b)
    assert x.shape == (32, 60) and z.shape == (32, 30)
    assert float(trained.residual(data.b)) < float(solver.residual(data.b)) + 0.1


def test_solver_untrained_equals_ladmm():
    from dladmm_tpu.baselines.ladmm import ladmm_run

    key = jax.random.PRNGKey(1)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, 20, 40)
    data = make_batch(kd, A, 8)
    solver = DLADMMSolver.create(A, K=6)
    x, z = solver.solve(data.b)
    xl, zl, _ = ladmm_run(A, data.b, iters=6)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xl), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zl), rtol=2e-5, atol=1e-6)


def test_solver_general_prox_kernel_semantics():
    """ADVICE r3 / round 5: the per-layer 'pallas' kernel is l1-only and
    must raise with a non-l1 prox; 'megakernel' is prox-templated since
    round 5 and must match the XLA-scan ('reference') result exactly."""
    import pytest

    key = jax.random.PRNGKey(2)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, 16, 32)
    data = make_batch(kd, A, 8)
    solver = DLADMMSolver.create(A, K=4, kernel="pallas", prox_x="nonneg_l1")
    with pytest.raises(ValueError, match="l1/l1-only"):
        solver.solve(data.b)
    x_mega, z_mega = DLADMMSolver.create(
        A, K=4, kernel="megakernel", prox_x="nonneg_l1"
    ).solve(data.b)
    x_scan, z_scan = DLADMMSolver.create(
        A, K=4, kernel="reference", prox_x="nonneg_l1"
    ).solve(data.b)
    np.testing.assert_allclose(
        np.asarray(x_mega), np.asarray(x_scan), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(z_mega), np.asarray(z_scan), rtol=1e-5, atol=1e-6
    )
    # auto with a general prox works (prox megakernel where a tile fits).
    solver = DLADMMSolver.create(A, K=4, prox_x="nonneg_l1")
    x, _ = solver.solve(data.b)
    assert np.asarray(x).min() >= 0.0
