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


def test_solver_rejects_explicit_pallas_kernel_with_general_prox():
    """ADVICE r3: an explicit Pallas kernel selection with a non-l1 prox
    must raise (mirroring run.py) instead of silently running the
    XLA-scan general step."""
    import pytest

    key = jax.random.PRNGKey(2)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, 16, 32)
    data = make_batch(kd, A, 8)
    for kernel in ("pallas", "megakernel"):
        solver = DLADMMSolver.create(A, K=4, kernel=kernel, prox_x="nonneg_l1")
        with pytest.raises(ValueError, match="l1/l1-only"):
            solver.solve(data.b)
    # auto with a general prox still works (runs the XLA scan).
    solver = DLADMMSolver.create(A, K=4, prox_x="nonneg_l1")
    x, _ = solver.solve(data.b)
    assert np.asarray(x).min() >= 0.0
