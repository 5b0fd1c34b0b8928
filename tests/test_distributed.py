"""Distributed tests without a cluster (SURVEY.md §6.2-5): 8 virtual CPU
devices; run the full DP-psum and TP-partial-matvec paths on meshes and
assert tolerance equality with the single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.parallel import mesh as pmesh
from dladmm_tpu.parallel.collectives import (
    A_SPEC,
    B_SPEC,
    X_SPEC,
    Z_SPEC,
    make_sharded_train_step,
    sharded_forward,
)
from dladmm_tpu.train.loop import TrainState, loss_fn


def _setup(m=16, n=64, K=6, S=16, seed=0):
    key = jax.random.PRNGKey(seed)
    kA, kd, kp = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    data = make_batch(kd, A, S)
    params = init_dladmm_params(A, K=K)
    # Perturb off the LADMM point so the test exercises generic params.
    leaves = list(params)
    keys = jax.random.split(kp, len(leaves))
    params = type(params)(
        *(p + 0.05 * jax.random.normal(k, p.shape) for k, p in zip(keys, leaves))
    )
    return A, data, params


@pytest.mark.parametrize("shape", [(1, 4), (4, 1), (2, 4), (4, 2)])
def test_sharded_forward_matches_single_device(shape):
    data_ax, model_ax = shape
    mesh = pmesh.make_mesh(data=data_ax, model=model_ax)
    A, data, params = _setup()
    x_ref, z_ref, lam_ref = dladmm_forward(params, A, data.b)
    x, z, lam = sharded_forward(mesh, params, A, data.b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 2), (8, 1), (2, 4)])
def test_sharded_train_step_matches_single_device(shape):
    data_ax, model_ax = shape
    mesh = pmesh.make_mesh(data=data_ax, model=model_ax)
    A, data, params = _setup()
    optimizer = optax.adam(1e-3)

    # Single-device step.
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star, None, None, None
    )
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    # Sharded step on device_put inputs.
    from jax.sharding import NamedSharding

    put = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))
    sh = pmesh.param_shardings_tp(mesh)
    params_s = jax.device_put(params, sh["params"])
    A_s = jax.device_put(A, sh["A"])
    batch_s = type(data)(
        b=put(data.b, B_SPEC),
        x_star=put(data.x_star, X_SPEC),
        e_star=put(data.e_star, Z_SPEC),
    )
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(optimizer, mesh)
    state2, loss = step(state, A_s, batch_s)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for got, want in zip(state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6
        )


def test_mesh_validation():
    with pytest.raises(ValueError):
        pmesh.make_mesh(data=8, model=3)
    m = pmesh.make_mesh(model=2)
    assert m.shape["data"] == 4 and m.shape["model"] == 2


def test_sharded_training_improves_nmse():
    """Short sharded training run actually learns (DP=4, TP=2)."""
    mesh = pmesh.make_mesh(data=4, model=2)
    A, data, _ = _setup(S=32)
    params = init_dladmm_params(A, K=6)
    optimizer = optax.adam(3e-3)
    sh = pmesh.param_shardings_tp(mesh)
    from jax.sharding import NamedSharding

    put = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))
    params = jax.device_put(params, sh["params"])
    A_s = jax.device_put(A, sh["A"])
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(optimizer, mesh)

    key = jax.random.PRNGKey(1)
    first = last = None
    for i in range(60):
        key, sub = jax.random.split(key)
        d = make_batch(sub, A, 32)
        d = type(d)(
            b=put(d.b, B_SPEC),
            x_star=put(d.x_star, X_SPEC),
            e_star=put(d.e_star, Z_SPEC),
        )
        state, loss = step(state, A_s, d)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first


def test_fit_sharded_end_to_end():
    """fit_sharded trains the sharded path end-to-end on the virtual
    mesh and improves NMSE over the first eval."""
    import dataclasses

    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="test_sharded",
        problem=ProblemConfig(m=16, n=32, K=4),
        train=TrainConfig(batch=16, steps=40, lr=1e-3, eval_every=10,
                          eval_batch=32),
        sharding=ShardingConfig(data_axis=4, model_axis=2),
    )
    params, history = fit_sharded(cfg)
    assert history[-1]["mesh"] == "4x2"
    assert all(jnp.isfinite(h["loss"]) for h in history)
    assert history[-1]["nmse_db"] < history[0]["nmse_db"], history
