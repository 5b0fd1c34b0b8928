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


@pytest.mark.parametrize(
    "d", [12, pytest.param(16, marks=pytest.mark.slow)]
)
def test_general_B_manual_vjp_matches_autodiff(d):
    """dladmm_unroll_manual_general (VERDICT r2 #9): the reverse-scan
    backward with the (Ax, Bz) carry must reproduce jax.grad through the
    golden general-B scan for every param leaf AND the A, B, b
    cotangents, at d != m shapes."""
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.ops.unroll_vjp import dladmm_unroll_manual_general

    m, n, K, S = 10, 20, 5, 6
    key = jax.random.PRNGKey(3)
    kA, kB, kb, kp = jax.random.split(key, 4)
    A = make_dictionary(kA, m, n)
    B = make_dictionary(kB, m, d)
    params = init_dladmm_params(A, B, K=K)
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(kp, len(leaves))
    leaves = [
        l + 0.1 * jnp.abs(l).mean() * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, ks)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    b = make_batch(kb, A, S).b

    def loss_auto(params, A, B, b):
        x, z, lam = dladmm_forward(params, A, b, B=B)
        return jnp.sum(x * x) + jnp.sum(z * jnp.cos(z)) + jnp.sum(lam) * 0.1

    def loss_manual(params, A, B, b):
        x, z, lam = dladmm_unroll_manual_general(params, A, B, b)
        return jnp.sum(x * x) + jnp.sum(z * jnp.cos(z)) + jnp.sum(lam) * 0.1

    va = jax.jit(loss_auto)(params, A, B, b)
    vm = jax.jit(loss_manual)(params, A, B, b)
    np.testing.assert_allclose(float(va), float(vm), rtol=1e-6)

    ga = jax.jit(jax.grad(loss_auto, argnums=(0, 1, 2, 3)))(params, A, B, b)
    gm = jax.jit(jax.grad(loss_manual, argnums=(0, 1, 2, 3)))(params, A, B, b)
    for name, a_leaf, m_leaf in zip(
        list(params._fields) + ["A", "B", "b"],
        list(ga[0]) + [ga[1], ga[2], ga[3]],
        list(gm[0]) + [gm[1], gm[2], gm[3]],
    ):
        scale = np.abs(np.asarray(a_leaf)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=2e-5,
            atol=2e-5 * scale,
            err_msg=f"grad mismatch in {name}",
        )


def test_general_B_manual_vjp_via_loss_fn():
    """loss_fn(vjp='manual') now accepts general B (train/loop.py) and
    matches the XLA-autodiff value/grads."""
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import loss_fn

    m, n, d, K, S = 8, 16, 12, 4, 5
    key = jax.random.PRNGKey(4)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    B = make_dictionary(kB, m, d)
    params = init_dladmm_params(A, B, K=K)
    data = make_batch(kb, A, S)
    z_star = jnp.zeros((S, d), jnp.float32)

    gm = jax.grad(loss_fn)(
        params, A, data.b, data.x_star, z_star, B, vjp="manual"
    )
    ga = jax.grad(loss_fn)(
        params, A, data.b, data.x_star, z_star, B, vjp="xla"
    )
    for name, a_leaf, m_leaf in zip(params._fields, ga, gm):
        scale = np.abs(np.asarray(a_leaf)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=2e-5,
            atol=2e-5 * scale,
            err_msg=f"grad mismatch in {name}",
        )


def test_general_B_trajectory_manual_vjp_matches_autodiff():
    """dladmm_traj_manual_general: the trajectory (deep-supervision)
    stacks and the reverse-scan backward with folded per-layer
    cotangents must reproduce jax.grad through the golden general-B
    trajectory scan — every param leaf AND the A, B, b cotangents, at
    d != m shapes."""
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.ops.unroll_vjp import dladmm_traj_manual_general

    m, n, d, K, S = 10, 20, 14, 5, 6
    key = jax.random.PRNGKey(7)
    kA, kB, kb, kp = jax.random.split(key, 4)
    A = make_dictionary(kA, m, n)
    B = make_dictionary(kB, m, d)
    params = init_dladmm_params(A, B, K=K)
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(kp, len(leaves))
    leaves = [
        l + 0.1 * jnp.abs(l).mean() * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, ks)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    b = make_batch(kb, A, S).b
    w = jnp.linspace(0.2, 1.0, K)  # non-uniform layer weights

    def traj_loss(tx, tz, tlam):
        # Touches every stack at every layer, non-uniformly.
        per = (
            jnp.sum(tx * tx, axis=(1, 2))
            + jnp.sum(tz * jnp.cos(tz), axis=(1, 2))
            + 0.1 * jnp.sum(tlam, axis=(1, 2))
        )
        return jnp.sum(w * per)

    def loss_auto(params, A, B, b):
        _, traj = dladmm_forward(params, A, b, B=B, capture_trajectory=True)
        return traj_loss(*traj)

    def loss_manual(params, A, B, b):
        return traj_loss(*dladmm_traj_manual_general(params, A, B, b))

    va = jax.jit(loss_auto)(params, A, B, b)
    vm = jax.jit(loss_manual)(params, A, B, b)
    np.testing.assert_allclose(float(va), float(vm), rtol=1e-6)

    ga = jax.jit(jax.grad(loss_auto, argnums=(0, 1, 2, 3)))(params, A, B, b)
    gm = jax.jit(jax.grad(loss_manual, argnums=(0, 1, 2, 3)))(params, A, B, b)
    for name, a_leaf, m_leaf in zip(
        list(params._fields) + ["A", "B", "b"],
        list(ga[0]) + [ga[1], ga[2], ga[3]],
        list(gm[0]) + [gm[1], gm[2], gm[3]],
    ):
        scale = np.abs(np.asarray(a_leaf)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=2e-5,
            atol=2e-5 * scale,
            err_msg=f"grad mismatch in {name}",
        )


def test_general_B_deep_supervision_via_loss_fn():
    """loss_fn with general B AND layer_weights (deep supervision) routes
    through dladmm_traj_manual_general on vjp='auto' (train/loop.py) and
    matches forced XLA autodiff."""
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import loss_fn

    m, n, d, K, S = 8, 16, 12, 4, 5
    key = jax.random.PRNGKey(11)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    B = make_dictionary(kB, m, d)
    params = init_dladmm_params(A, B, K=K)
    data = make_batch(kb, A, S)
    z_star = jnp.zeros((S, d), jnp.float32)
    w = jnp.linspace(0.25, 1.0, K)

    gm = jax.grad(loss_fn)(
        params, A, data.b, data.x_star, z_star, B,
        layer_weights=w, vjp="auto",
    )
    ga = jax.grad(loss_fn)(
        params, A, data.b, data.x_star, z_star, B,
        layer_weights=w, vjp="xla",
    )
    for name, a_leaf, m_leaf in zip(params._fields, ga, gm):
        scale = np.abs(np.asarray(a_leaf)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=2e-5,
            atol=2e-5 * scale,
            err_msg=f"grad mismatch in {name}",
        )
