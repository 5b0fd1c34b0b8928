"""Golden-math unit tests (SURVEY.md §6.2-1): shrink, one D-LADMM step,
one LADMM iteration vs a float64 numpy re-derivation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.baselines.ladmm import ladmm_run
from dladmm_tpu.ops.reference import (
    LayerParams,
    apply_dict,
    dladmm_layer_step,
    shrink,
)


def np_shrink(u, t):
    return np.sign(u) * np.maximum(np.abs(u) - t, 0.0)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_shrink_matches_numpy(rng):
    u = rng.normal(size=(7, 13)).astype(np.float32)
    t = 0.3
    got = np.asarray(shrink(jnp.asarray(u), t))
    np.testing.assert_allclose(got, np_shrink(u, t), rtol=1e-6)


def test_shrink_negative_theta_clamped():
    u = jnp.array([1.0, -2.0, 0.5])
    # Negative threshold must behave as theta=0 (identity), never expand.
    np.testing.assert_allclose(np.asarray(shrink(u, -1.0)), np.asarray(u))


def test_shrink_per_coordinate_broadcast(rng):
    u = rng.normal(size=(4, 6)).astype(np.float32)
    t = np.abs(rng.normal(size=(6,))).astype(np.float32)
    got = np.asarray(shrink(jnp.asarray(u), jnp.asarray(t)))
    np.testing.assert_allclose(got, np_shrink(u, t[None, :]), rtol=1e-6)


def test_apply_dict_is_right_matmul(rng):
    v = rng.normal(size=(5, 8)).astype(np.float32)
    M = rng.normal(size=(3, 8)).astype(np.float32)
    got = np.asarray(apply_dict(jnp.asarray(v), jnp.asarray(M)))
    np.testing.assert_allclose(got, v @ M.T, rtol=1e-5, atol=1e-6)


def _numpy_dladmm_step(A, B, b, x, z, lam, W1, W2, th1, th2, beta):
    """Independent float64 re-derivation of SURVEY.md §2's recurrence."""
    Bz = z if B is None else z @ B.T
    u = x @ A.T + Bz - b + lam / beta
    x1 = np_shrink(x - u @ W1.T, th1)
    v = x1 @ A.T + Bz - b + lam / beta
    z1 = np_shrink(z - v @ W2.T, th2)
    B1 = z1 if B is None else z1 @ B.T
    lam1 = lam + beta * (x1 @ A.T + B1 - b)
    return x1, z1, lam1


@pytest.mark.parametrize("identity_B", [True, False])
def test_dladmm_step_matches_numpy(rng, identity_B):
    m, n, d, S = 6, 10, 6 if identity_B else 9, 4
    A = rng.normal(size=(m, n))
    B = None if identity_B else rng.normal(size=(m, d))
    b = rng.normal(size=(S, m))
    x = rng.normal(size=(S, n))
    z = rng.normal(size=(S, d))
    lam = rng.normal(size=(S, m))
    W1 = rng.normal(size=(n, m))
    W2 = rng.normal(size=(d, m))
    th1 = np.abs(rng.normal(size=(n,)))
    th2 = np.abs(rng.normal(size=(d,)))
    beta = 0.7

    want = _numpy_dladmm_step(A, B, b, x, z, lam, W1, W2, th1, th2, beta)

    f32 = lambda a: None if a is None else jnp.asarray(a, jnp.float32)
    p = LayerParams(
        f32(W1), f32(W2), f32(th1), f32(th2), jnp.float32(beta)
    )
    got = dladmm_layer_step(
        f32(A), f32(B), f32(b), f32(x), f32(z), f32(lam), p
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)


def _numpy_ladmm(A, B, b, iters, beta):
    """Independent float64 classical LADMM per SURVEY.md §2."""
    m, n = A.shape
    d = m if B is None else B.shape[1]
    S = b.shape[0]
    L_A = np.linalg.norm(A, 2) ** 2
    L_B = 1.0 if B is None else np.linalg.norm(B, 2) ** 2
    x = np.zeros((S, n))
    z = np.zeros((S, d))
    lam = np.zeros((S, m))
    Bz = (lambda z: z) if B is None else (lambda z: z @ B.T)
    BT = (lambda r: r) if B is None else (lambda r: r @ B)
    for _ in range(iters):
        r = x @ A.T + Bz(z) - b
        x = np_shrink(x - (lam + beta * r) @ A / (beta * L_A), 1 / (beta * L_A))
        r2 = x @ A.T + Bz(z) - b
        z = np_shrink(z - BT(lam + beta * r2) / (beta * L_B), 1 / (beta * L_B))
        lam = lam + beta * (x @ A.T + Bz(z) - b)
    return x, z, lam


@pytest.mark.parametrize("identity_B", [True, False])
def test_ladmm_matches_numpy(rng, identity_B):
    m, n, d, S = 8, 16, 8 if identity_B else 12, 3
    A = rng.normal(size=(m, n)) / np.sqrt(m)
    B = None if identity_B else rng.normal(size=(m, d)) / np.sqrt(m)
    x_true = np_shrink(rng.normal(size=(S, n)), 1.0)
    b = x_true @ A.T + 0.01 * rng.normal(size=(S, m))
    want = _numpy_ladmm(A, B, b, iters=5, beta=0.9)

    f32 = lambda a: None if a is None else jnp.asarray(a, jnp.float32)
    got = ladmm_run(f32(A), f32(b), B=f32(B), iters=5, beta=0.9)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4, atol=1e-5)


def test_step_grads_flow(rng):
    """Gradients flow through W1/W2/thresholds/beta of a single step."""
    m, n, S = 5, 8, 3
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(S, m)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(S, n)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(S, m)), jnp.float32)
    lam = jnp.zeros((S, m), jnp.float32)
    p = LayerParams(
        jnp.asarray(rng.normal(size=(n, m)), jnp.float32),
        jnp.asarray(rng.normal(size=(m, m)), jnp.float32),
        jnp.full((n,), 0.1, jnp.float32),
        jnp.full((m,), 0.1, jnp.float32),
        jnp.float32(1.0),
    )

    def loss(p):
        x1, z1, _ = dladmm_layer_step(A, None, b, x, z, lam, p)
        return jnp.sum(x1**2) + jnp.sum(z1**2)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in g)
    assert float(jnp.abs(g.W1).sum()) > 0
    assert float(jnp.abs(g.beta)) >= 0
