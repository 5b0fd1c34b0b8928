"""Data-generation and metric unit tests (SURVEY.md N5/N10)."""

import jax
import jax.numpy as jnp
import numpy as np

from dladmm_tpu.data.synthetic import batch_stream, make_batch, make_dictionary
from dladmm_tpu.metrics.core import (
    constraint_residual,
    nmse_db,
    per_layer_nmse_db,
    psnr,
)


def test_dictionary_columns_unit_norm():
    A = make_dictionary(jax.random.PRNGKey(0), 30, 60)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(A), axis=0), 1.0, rtol=1e-5
    )


def test_batch_consistency():
    A = make_dictionary(jax.random.PRNGKey(0), 30, 60)
    d = make_batch(jax.random.PRNGKey(1), A, 8, sparsity_x=0.2, sparsity_e=0.1)
    np.testing.assert_allclose(
        np.asarray(d.b),
        np.asarray(d.x_star) @ np.asarray(A).T + np.asarray(d.e_star),
        rtol=1e-4, atol=1e-6,
    )
    # Sparsity is in the right ballpark.
    frac_x = float((jnp.abs(d.x_star) > 0).mean())
    assert 0.1 < frac_x < 0.3


def test_batch_deterministic():
    A = make_dictionary(jax.random.PRNGKey(0), 10, 20)
    d1 = make_batch(jax.random.PRNGKey(5), A, 4)
    d2 = make_batch(jax.random.PRNGKey(5), A, 4)
    np.testing.assert_array_equal(np.asarray(d1.b), np.asarray(d2.b))


def test_stream_advances():
    A = make_dictionary(jax.random.PRNGKey(0), 10, 20)
    it = batch_stream(jax.random.PRNGKey(5), A, 4)
    b1, b2 = next(it), next(it)
    assert not np.array_equal(np.asarray(b1.b), np.asarray(b2.b))


def test_nmse_db_zero_error_is_very_negative():
    x = jnp.ones((4, 8))
    assert float(nmse_db(x, x)) < -100.0


def test_nmse_db_known_value():
    x_star = jnp.ones((2, 4))
    x_hat = jnp.full((2, 4), 1.1)
    # ratio = (0.1^2*4)/(4) = 0.01 -> -20 dB
    np.testing.assert_allclose(float(nmse_db(x_hat, x_star)), -20.0, atol=1e-3)


def test_per_layer_nmse_shape():
    traj = jnp.ones((5, 3, 7)) * jnp.arange(1, 6)[:, None, None]
    out = per_layer_nmse_db(traj, jnp.ones((3, 7)))
    assert out.shape == (5,)


def test_constraint_residual_exact_solution():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(5, 9)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 9)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)
    b = x @ A.T + z
    assert float(constraint_residual(A, b, x, z)) < 1e-5


def test_psnr_identity_is_large():
    img = jnp.linspace(0, 1, 64).reshape(8, 8)
    assert float(psnr(img, img)) > 100.0
    noisy = img + 0.1
    np.testing.assert_allclose(float(psnr(noisy, img)), 20.0, atol=1e-3)


def test_make_batch_general_B():
    """make_batch with a z-dictionary B: e_star becomes z* in R^d and
    b = A x* + B z* exactly."""
    import numpy as np

    A = make_dictionary(jax.random.PRNGKey(0), 10, 20)
    B = make_dictionary(jax.random.PRNGKey(1), 10, 14)
    d = make_batch(jax.random.PRNGKey(2), A, 6, B=B)
    assert d.x_star.shape == (6, 20)
    assert d.e_star.shape == (6, 14)
    np.testing.assert_allclose(
        np.asarray(d.b),
        np.asarray(d.x_star @ A.T + d.e_star @ B.T),
        rtol=1e-6,
        atol=1e-6,
    )
