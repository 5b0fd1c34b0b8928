"""Unroll-driver tests: cached-matvec scan == plain golden recurrence
(the ~33% FLOP cut must be a pure refactor), trajectory capture, grads."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import (
    as_cached_step,
    dladmm_forward,
    init_dladmm_params,
)
from dladmm_tpu.ops.reference import dladmm_layer_step


def _setup(identity_B=True, seed=0, m=12, n=24, K=6, S=5):
    key = jax.random.PRNGKey(seed)
    kA, kB, kd, kp = jax.random.split(key, 4)
    A = make_dictionary(kA, m, n)
    B = None if identity_B else make_dictionary(kB, m, 16)
    data = make_batch(kd, A, S)
    params = init_dladmm_params(A, B, K=K)
    # Perturb so we're NOT at the LADMM point (exercise generic params).
    noise = jax.tree.map(
        lambda k, p: 0.1 * jax.random.normal(k, p.shape, p.dtype),
        dict(zip("abcde", jax.random.split(kp, 5))),
        dict(zip("abcde", list(params))),
    )
    params = type(params)(*(p + noise[k] for k, p in zip("abcde", params)))
    return A, B, data, params


@pytest.mark.slow
def test_cached_step_matches_plain():
    for identity_B in (True, False):
        A, B, data, params = _setup(identity_B)
        out_cached = dladmm_forward(params, A, data.b, B=B)
        out_plain = dladmm_forward(
            params, A, data.b, B=B, step_fn=as_cached_step(dladmm_layer_step)
        )
        for g, w in zip(out_cached, out_plain):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
            )


def test_trajectory_final_matches_forward():
    A, B, data, params = _setup()
    x, z, lam = dladmm_forward(params, A, data.b)
    (_, _, _), (tx, tz, tlam) = dladmm_forward(
        params, A, data.b, capture_trajectory=True
    )
    np.testing.assert_allclose(np.asarray(tx[-1]), np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tlam[-1]), np.asarray(lam), rtol=1e-6)
    assert tx.shape[0] == params.K


def test_grads_through_unroll_match_plain():
    A, B, data, params = _setup()

    def loss(params, step_fn=None):
        x, z, _ = dladmm_forward(params, A, data.b, step_fn=step_fn)
        return jnp.mean((x - data.x_star) ** 2) + jnp.mean(
            (z - data.e_star) ** 2
        )

    g_cached = jax.grad(loss)(params)
    g_plain = jax.grad(lambda p: loss(p, as_cached_step(dladmm_layer_step)))(
        params
    )
    for gc, gp in zip(g_cached, g_plain):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gp), rtol=1e-4, atol=1e-6
        )


def test_nonzero_initial_state():
    A, B, data, params = _setup()
    S, n = data.b.shape[0], A.shape[1]
    key = jax.random.PRNGKey(9)
    x0 = jax.random.normal(key, (S, n))
    out = dladmm_forward(params, A, data.b, x0=x0)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
