"""Manual unroll VJP (ops/unroll_vjp.py) vs XLA autodiff of the golden op.

The hand-written reverse-scan backward must reproduce jax.grad through
dladmm_forward to float32 tolerance — for every parameter leaf AND for
the (normally unused) A and b cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.ops.unroll_vjp import dladmm_unroll_manual


def _setup(m, n, K, S, seed=0, per_coordinate=True):
    key = jax.random.PRNGKey(seed)
    kA, kb, kp = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K, per_coordinate=per_coordinate)
    # Perturb away from the LADMM init so grads exercise generic values.
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(kp, len(leaves))
    leaves = [
        l + 0.1 * jnp.abs(l).mean() * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, ks)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    b = make_batch(kb, A, S).b
    return params, A, b


@pytest.mark.parametrize(
    "shape",
    [
        (16, 32, 5, 8),
        pytest.param((40, 80, 10, 16), marks=pytest.mark.slow),
    ],
)
@pytest.mark.parametrize("per_coordinate", [True, False])
def test_manual_vjp_matches_autodiff(shape, per_coordinate):
    m, n, K, S = shape
    params, A, b = _setup(m, n, K, S, per_coordinate=per_coordinate)

    def loss_auto(params, A, b):
        x, z, lam = dladmm_forward(params, A, b)
        return jnp.sum(x * x) + jnp.sum(z * jnp.cos(z)) + jnp.sum(lam) * 0.1

    def loss_manual(params, A, b):
        x, z, lam = dladmm_unroll_manual(params, A, b)
        return jnp.sum(x * x) + jnp.sum(z * jnp.cos(z)) + jnp.sum(lam) * 0.1

    va = jax.jit(loss_auto)(params, A, b)
    vm = jax.jit(loss_manual)(params, A, b)
    np.testing.assert_allclose(float(va), float(vm), rtol=1e-6)

    ga = jax.jit(jax.grad(loss_auto, argnums=(0, 1, 2)))(params, A, b)
    gm = jax.jit(jax.grad(loss_manual, argnums=(0, 1, 2)))(params, A, b)
    for name, a_leaf, m_leaf in zip(
        list(params._fields) + ["A", "b"],
        list(ga[0]) + [ga[1], ga[2]],
        list(gm[0]) + [gm[1], gm[2]],
    ):
        scale = np.abs(np.asarray(a_leaf)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=2e-5,
            atol=2e-5 * scale,
            err_msg=f"grad mismatch in {name}",
        )


@pytest.mark.slow
def test_manual_vjp_forward_equals_scan():
    params, A, b = _setup(24, 48, 7, 12)
    xa, za, la = dladmm_forward(params, A, b)
    xm, zm, lm = dladmm_unroll_manual(params, A, b)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xm), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(za), np.asarray(zm), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lm), rtol=1e-6)


@pytest.mark.slow
def test_manual_vjp_trains_identically():
    """One Adam step with either VJP produces the same new params."""
    import optax

    from dladmm_tpu.data.synthetic import make_batch

    params, A, b = _setup(16, 32, 5, 8)
    key = jax.random.PRNGKey(3)
    data = make_batch(key, A, 8)
    opt = optax.adam(1e-3)

    def step(params, fwd):
        def loss(p):
            x, z, _ = fwd(p, A, data.b)
            return jnp.mean((x - data.x_star) ** 2) + jnp.mean(
                (z - data.e_star) ** 2
            )

        g = jax.grad(loss)(params)
        updates, _ = opt.update(g, opt.init(params), params)
        return optax.apply_updates(params, updates)

    pa = step(params, lambda p, A, b: dladmm_forward(p, A, b))
    pm = step(params, dladmm_unroll_manual)
    for name, a_leaf, m_leaf in zip(params._fields, pa, pm):
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=1e-5,
            atol=1e-6,
            err_msg=name,
        )
