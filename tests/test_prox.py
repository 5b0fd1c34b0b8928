"""General proximal-operator surface (ops/prox.py; SURVEY.md §1's general
f/g problem class — the reference instantiates l1/l1 only, the framework
makes the prox pluggable).

Covers: golden numpy parity for every registry operator, the factory
steps vs the l1 module-level steps, LADMM-exact-init equivalence for
non-l1 proxes (the init argument is prox-agnostic), gradient flow
through the general step, fit()-level training on the nonneg preset
shape, and the validation guards on the l1-specialized fast paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.baselines.ladmm import ladmm_run
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.ops.prox import (
    PROX_NAMES,
    get_prox,
    is_l1,
    make_prox_elastic_net,
    prox_box,
    prox_group_l2,
    prox_nonneg_l1,
)
from dladmm_tpu.ops.reference import (
    dladmm_layer_step,
    make_cached_step,
    make_layer_step,
    shrink,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _np_shrink(u, t):
    t = np.maximum(t, 0.0)
    return np.sign(u) * np.maximum(np.abs(u) - t, 0.0)


def test_prox_golden_numpy(rng):
    # Inputs are cast to float32 FIRST so both sides see identical
    # values; the numpy golden then runs in float64 from those fp32
    # inputs, and the tolerance is the fp32 rounding of the op itself
    # (the test suite runs with x64 disabled — conftest.py).
    u = rng.normal(size=(9, 17)).astype(np.float32)
    t = np.abs(rng.normal(size=(17,))).astype(np.float32)
    uj, tj = jnp.asarray(u), jnp.asarray(t)
    u64, t64 = u.astype(np.float64), t.astype(np.float64)

    np.testing.assert_allclose(
        np.asarray(get_prox("l1")(uj, tj)),
        _np_shrink(u64, t64),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(prox_nonneg_l1(uj, tj)),
        np.maximum(u64 - t64, 0.0),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(prox_box(uj, tj)), np.clip(u64, -t64, t64), rtol=1e-6
    )
    rho = 0.37
    np.testing.assert_allclose(
        np.asarray(make_prox_elastic_net(rho)(uj, tj)),
        _np_shrink(u64, t64) / (1.0 + rho),
        rtol=1e-6,
        atol=1e-7,
    )
    # group_l2: row-wise block soft-threshold with scalar theta.
    th = 0.8
    norm = np.linalg.norm(u64, axis=-1, keepdims=True)
    expect = u64 * np.maximum(1.0 - th / norm, 0.0)
    np.testing.assert_allclose(
        np.asarray(prox_group_l2(uj, th)), expect, rtol=1e-5, atol=1e-7
    )


def test_prox_group_l2_zero_row_grad_finite():
    """Regression (ADVICE r3): an exactly-zero input row must not yield
    NaN gradients — sqrt's VJP at 0 needs the inside-the-norm guard."""
    u = jnp.array([[0.0, 0.0, 0.0], [1.0, -2.0, 2.0]])
    th = jnp.array(0.5)

    def loss(v, t):
        return jnp.sum(prox_group_l2(v, t) ** 2)

    gu = jax.grad(loss)(u, th)
    gt = jax.grad(loss, argnums=1)(u, th)
    assert np.isfinite(np.asarray(gu)).all(), gu
    assert np.isfinite(float(gt)), gt
    # Nonzero row still gets real gradients (norm 3 > th → active).
    assert float(jnp.abs(gu[1]).sum()) > 0.0


def test_prox_negative_theta_clamped():
    u = jnp.array([2.0, -3.0, 0.5])
    for name in PROX_NAMES:
        p = get_prox(name, rho=0.1)
        got_neg = np.asarray(p(u, -1.0))
        got_zero = np.asarray(p(u, 0.0))
        np.testing.assert_allclose(got_neg, got_zero, rtol=1e-7)


def test_get_prox_unknown_name():
    with pytest.raises(ValueError, match="unknown prox"):
        get_prox("l0")


def test_is_l1_classification():
    assert is_l1("l1", "l1")
    assert is_l1("elastic_net", "l1", rho=0.0)  # rho=0 IS l1
    assert not is_l1("elastic_net", "l1", rho=0.1)
    assert not is_l1("nonneg_l1", "l1")
    assert not is_l1("l1", "box")


def test_factory_default_matches_l1_step(rng):
    m, n, S = 12, 20, 5
    A = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(S, m)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(S, n)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(S, m)).astype(np.float32))
    lam = jnp.asarray(rng.normal(size=(S, m)).astype(np.float32))
    p = init_dladmm_params(A, None, K=1).layer(0)
    got = make_layer_step()(A, None, b, x, z, lam, p)
    want = dladmm_layer_step(A, None, b, x, z, lam, p)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-7)


def _forward_prox(params, A, b, prox_x, prox_z, B=None, traj=False):
    return dladmm_forward(
        params,
        A,
        b,
        B=B,
        capture_trajectory=traj,
        step_fn=make_cached_step(prox_x, prox_z),
    )


@pytest.mark.parametrize(
    "px,pz",
    [("nonneg_l1", "l1"), ("box", "group_l2"), ("elastic_net", "box")],
)
def test_ladmm_init_equivalence_general_prox(rng, px, pz):
    """SURVEY.md §2 point 2's equivalence argument is prox-agnostic: the
    LADMM-exact init reproduces classical LADMM running the SAME prox
    pair, layer for layer."""
    m, n, K, S = 24, 40, 6, 8
    A = make_dictionary(jax.random.PRNGKey(0), m, n)
    b = jnp.asarray(rng.normal(size=(S, m)).astype(np.float32))
    fx, fz = get_prox(px, rho=0.25), get_prox(pz, rho=0.25)
    params = init_dladmm_params(A, None, K=K)
    _, (tx, tz, tl) = _forward_prox(params, A, b, fx, fz, traj=True)
    _, (lx, lz, ll) = ladmm_run(
        A, b, iters=K, capture_trajectory=True, prox_x=fx, prox_z=fz
    )
    np.testing.assert_allclose(np.asarray(tx), np.asarray(lx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tz), np.asarray(lz), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tl), np.asarray(ll), atol=2e-5)


def test_general_prox_composes_with_general_B(rng):
    """prox plumbing and the general z-dictionary compose (both route
    through the XLA scan)."""
    m, n, d, K, S = 16, 30, 22, 4, 6
    A = make_dictionary(jax.random.PRNGKey(1), m, n)
    B = make_dictionary(jax.random.PRNGKey(2), m, d)
    b = jnp.asarray(rng.normal(size=(S, m)).astype(np.float32))
    fx, fz = get_prox("nonneg_l1"), get_prox("l1")
    params = init_dladmm_params(A, B, K=K)
    (x, z, lam) = _forward_prox(params, A, b, fx, fz, B=B)
    _, (lx, lz, _) = ladmm_run(
        A, b, B=B, iters=K, capture_trajectory=True, prox_x=fx, prox_z=fz
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(lx[-1]), atol=2e-5)
    assert np.asarray(x).min() >= 0.0  # nonneg prox respected


def test_gradients_flow_through_general_prox(rng):
    m, n, K, S = 12, 20, 3, 4
    A = make_dictionary(jax.random.PRNGKey(3), m, n)
    b = jnp.asarray(rng.normal(size=(S, m)).astype(np.float32))
    fx, fz = get_prox("elastic_net", rho=0.2), get_prox("nonneg_l1")
    params = init_dladmm_params(A, None, K=K)

    def loss(p):
        x, z, _ = _forward_prox(p, A, b, fx, fz)
        return jnp.mean(x**2) + jnp.mean(z**2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda v: jnp.sum(jnp.abs(v)), g))
    total = sum(float(v) for v in flat)
    assert np.isfinite(total) and total > 0.0


def test_nonneg_batch_generator(rng):
    A = make_dictionary(jax.random.PRNGKey(4), 10, 18)
    d = make_batch(jax.random.PRNGKey(5), A, 32, nonneg_x=True)
    xs = np.asarray(d.x_star)
    assert xs.min() >= 0.0 and (xs > 0).any()
    # b is consistent with the nonneg x*.
    np.testing.assert_allclose(
        np.asarray(d.b),
        xs @ np.asarray(A).T + np.asarray(d.e_star),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.slow
def test_fit_nonneg_preset_beats_ladmm_init():
    """Short fit() on the synthetic_nonneg preset shape: training must
    improve on the LADMM(nonneg) starting point, outputs must respect
    the prox's constraint, and the eval curves must be the nonneg-LADMM
    comparison (like-for-like)."""
    from dladmm_tpu.train.loop import evaluate, fit
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("synthetic_nonneg")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, steps=300, eval_every=300, eval_batch=128
        ),
    )
    params, history = fit(cfg)
    final = history[-1]
    # The untrained (LADMM-init) curve's layer-K value is the classical
    # nonneg-LADMM NMSE; the trained net must clearly beat it.
    ladmm_at_K = float(final["curves"]["ladmm_curve_db"][-1])
    assert final["nmse_db"] < ladmm_at_K - 1.0, (final["nmse_db"], ladmm_at_K)

    # Constraint respected on eval data: x >= 0 everywhere.
    from dladmm_tpu.data.synthetic import problem_matrices, seed_keys
    from dladmm_tpu.ops.prox import get_prox
    from dladmm_tpu.ops.reference import make_cached_step

    A, B = problem_matrices(cfg)
    _, k_eval, _ = seed_keys(cfg)
    data = make_batch(k_eval, A, 64, nonneg_x=True)
    x, z, _ = dladmm_forward(
        params,
        A,
        data.b,
        step_fn=make_cached_step(get_prox("nonneg_l1"), get_prox("l1")),
    )
    assert np.asarray(x).min() >= 0.0


def test_fit_guards_reject_l1_fast_paths():
    from dladmm_tpu.train.loop import fit, fit_greedy, fit_sharded
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("synthetic_nonneg")
    with pytest.raises(ValueError, match="fused_adam"):
        fit(
            dataclasses.replace(
                cfg,
                train=dataclasses.replace(cfg.train, optimizer="fused_adam"),
            )
        )
    with pytest.raises(ValueError, match="vjp"):
        fit(
            dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, vjp="manual")
            )
        )
    with pytest.raises(ValueError, match="general-prox"):
        fit(cfg, step_fn=make_cached_step())
    with pytest.raises(ValueError, match="l1/l1"):
        fit_greedy(cfg)
    with pytest.raises(ValueError, match="l1/l1"):
        fit_sharded(cfg)


def test_solver_general_prox_roundtrip(rng):
    from dladmm_tpu.models.solver import DLADMMSolver

    A = make_dictionary(jax.random.PRNGKey(6), 16, 28)
    solver = DLADMMSolver.create(A, K=5, prox_x="nonneg_l1")
    b = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    x, z = solver.solve(b)
    assert np.asarray(x).min() >= 0.0
    traj = solver.trajectory(b)
    assert traj[0].shape == (5, 4, 28)
    # Matches the raw forward with the same prox step.
    want, _, _ = _forward_prox(
        solver.params, A, b, get_prox("nonneg_l1"), get_prox("l1")
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), rtol=1e-6)
