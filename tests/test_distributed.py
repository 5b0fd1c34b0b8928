"""Distributed tests without a cluster (SURVEY.md §6.2-5): 8 virtual CPU
devices; run the full DP-psum and TP paths (both weight layouts) on
meshes and assert tolerance equality with the single-device run."""

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
    make_dp_train_step,
    make_sharded_eval,
    make_sharded_train_step,
    sharded_forward,
)
from dladmm_tpu.train.loop import TrainState, evaluate, loss_fn

LAYOUTS = ("sharded_w2", "replicated_w2")


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


def _put_batch(mesh, data):
    from jax.sharding import NamedSharding

    put = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))
    return type(data)(
        b=put(data.b, B_SPEC),
        x_star=put(data.x_star, X_SPEC),
        e_star=put(data.e_star, Z_SPEC),
    )


def _put(mesh, data, params, A, layout):
    # NOTE: device_put may ALIAS buffers whose layout already matches
    # (e.g. replicated beta on 1 device); donated steps then delete the
    # caller's original. Tests that keep using the originals must not
    # pass the aliased results into a donating step twice.
    sh = pmesh.param_shardings_tp(mesh, layout)
    return (
        jax.device_put(params, sh["params"]),
        jax.device_put(A, sh["A"]),
        _put_batch(mesh, data),
    )


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("shape", [(1, 4), (4, 1), (2, 4), (4, 2)])
def test_sharded_forward_matches_single_device(shape, layout):
    data_ax, model_ax = shape
    mesh = pmesh.make_mesh(data=data_ax, model=model_ax)
    A, data, params = _setup()
    x_ref, z_ref, lam_ref = dladmm_forward(params, A, data.b)
    x, z, lam = sharded_forward(mesh, params, A, data.b, layout)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("shape", [(2, 2), (8, 1), (2, 4)])
def test_sharded_train_step_matches_single_device(shape, layout):
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

    params_s, A_s, batch_s = _put(mesh, data, params, A, layout)
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(optimizer, mesh, layout, donate=False)
    state2, loss = step(state, A_s, batch_s)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for got, want in zip(state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6
        )


@pytest.mark.parametrize("layout", LAYOUTS)
def test_sharded_eval_curve_matches_single(layout):
    """The gather-free per-layer NMSE curve (psum of local sums) matches
    metrics.core.per_layer_nmse_db bit-for-tolerance (VERDICT r1 #6)."""
    mesh = pmesh.make_mesh(data=2, model=4)
    A, data, params = _setup()
    ev_ref = evaluate(params, A, data)
    params_s, A_s, batch_s = _put(mesh, data, params, A, layout)
    ev = jax.device_get(make_sharded_eval(mesh, layout)(params_s, A_s, batch_s))
    np.testing.assert_allclose(
        np.asarray(ev["nmse_curve_db"]),
        np.asarray(ev_ref["nmse_curve_db"]),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        float(ev["nmse_db"]), float(ev_ref["nmse_db"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(ev["residual"]), float(ev_ref["residual"]), rtol=1e-4
    )


@pytest.mark.parametrize("layout", LAYOUTS)
def test_deep_supervision_matches_single_device(layout):
    """Sharded per-layer (deep-supervision) loss == single-device
    loss_fn with layer_weights (capture path, no trajectory gather)."""
    mesh = pmesh.make_mesh(data=2, model=2)
    A, data, params = _setup()
    K = params.W1.shape[0]
    lw = jnp.full((K,), 1.0 / K)
    loss_ref = loss_fn(params, A, data.b, data.x_star, data.e_star, None, lw)
    optimizer = optax.adam(1e-3)
    params_s, A_s, batch_s = _put(mesh, data, params, A, layout)
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(
        optimizer, mesh, layout, layer_weights=lw, donate=False
    )
    _, loss = step(state, A_s, batch_s)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_bf16_and_freeze_sharded(layout):
    """Mixed-precision sharded step: loss tracks fp32 closely, frozen
    beta stays at its initial value, params move."""
    mesh = pmesh.make_mesh(data=2, model=4)
    A, data, params = _setup()
    optimizer = optax.adam(1e-3)
    loss_ref = float(
        loss_fn(params, A, data.b, data.x_star, data.e_star, None, None, None)
    )
    params_s, A_s, batch_s = _put(mesh, data, params, A, layout)
    cp = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params_s)
    state = TrainState(
        params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32), cp
    )
    step = make_sharded_train_step(
        optimizer,
        mesh,
        layout,
        compute_dtype=jnp.bfloat16,
        freeze=("beta",),
        donate=False,
    )
    state2, loss = step(state, A_s.astype(jnp.bfloat16), batch_s)
    assert np.isfinite(float(loss))
    assert abs(float(loss) - loss_ref) < 0.05 * abs(loss_ref) + 1e-3
    np.testing.assert_array_equal(
        np.asarray(state2.params.beta), np.asarray(params.beta)
    )
    assert not np.allclose(np.asarray(state2.params.W1), np.asarray(params.W1))
    assert state2.compute_params.W1.dtype == jnp.bfloat16


@pytest.mark.parametrize("vjp", ["auto", "xla"])
def test_dp_fast_path_matches_single_device(vjp):
    """DP-only fast path (single-chip perf stack inside shard_map):
    manual reverse-scan VJP / XLA autodiff per shard + automatic grad
    psum == single-device global-batch step (VERDICT r1 #2)."""
    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    optimizer = optax.adam(1e-3)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star, None, None, None, None,
        None, vjp,
    )
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_dp_train_step(optimizer, mesh, vjp=vjp, donate=False)
    state2, loss = step(state, A_s, batch_s)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for got, want in zip(state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6
        )


def test_dp_fast_path_deep_supervision():
    """DP fast path + deep supervision: the trajectory-megakernel
    forward (models/api need_trajectory selection) runs per-shard inside
    shard_map and matches the single-device deep-supervised step."""
    from dladmm_tpu.models.api import select_forward

    mesh = pmesh.make_mesh(data=4, model=1)
    A, data, params = _setup(S=16)
    K = params.W1.shape[0]
    lw = jnp.full((K,), 1.0 / K)
    fwd, step_fn, desc = select_forward(16, 64, 16, 4, need_trajectory=True)
    assert desc == "trajectory-megakernel"
    optimizer = optax.adam(1e-3)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star, None, lw
    )
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_dp_train_step(
        optimizer, mesh, layer_weights=lw, forward_fn=fwd, step_fn=step_fn,
        donate=False,
    )
    state2, loss = step(state, A_s, batch_s)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    for got, want in zip(state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6
        )


def test_dp_fast_path_megakernel_forward():
    """The Pallas whole-unroll megakernel (interpret mode on CPU) runs
    inside shard_map on the DP mesh and matches the reference step."""
    from dladmm_tpu.models.api import select_forward

    mesh = pmesh.make_mesh(data=4, model=1)
    A, data, params = _setup(S=16)
    forward_fn, step_fn, desc = select_forward(16, 64, 16, 4, kernel="auto")
    assert desc != "xla-scan-reference"  # tiny shape must select a kernel
    optimizer = optax.adam(1e-3)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star, None, None, None
    )
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_dp_train_step(
        optimizer, mesh, step_fn=step_fn, forward_fn=forward_fn, donate=False
    )
    state2, loss = step(state, A_s, batch_s)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    for got, want in zip(state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6
        )


def test_mesh_validation():
    with pytest.raises(ValueError):
        pmesh.make_mesh(data=8, model=3)
    m = pmesh.make_mesh(model=2)
    assert m.shape["data"] == 4 and m.shape["model"] == 2


def test_memory_audit_tp_large():
    """The tp_large acceptance shape (BASELINE.json:10) fits per-chip
    HBM with layout=sharded_w2 and is correctly REJECTED with the
    round-1 replicated_w2 layout (VERDICT r1 what's-missing #1)."""
    from dladmm_tpu.parallel.memory import audit_or_raise, per_chip_bytes

    bd = audit_or_raise(
        8192, 16384, 20, 256, data_axis=1, model_axis=4, layout="sharded_w2"
    )
    assert bd.total <= 16e9 * 0.9
    # Sharding W2 + moments is what saves it: the replicated layout's
    # W2+moments alone exceed the whole sharded footprint.
    bd_rep = per_chip_bytes(
        8192, 16384, 20, 256, data_axis=1, model_axis=4, layout="replicated_w2"
    )
    assert bd_rep.total > 16e9
    with pytest.raises(MemoryError):
        audit_or_raise(
            8192, 16384, 20, 256,
            data_axis=1, model_axis=4, layout="replicated_w2",
        )


def test_memory_audit_tp_large_bf16_preset():
    """tp_large_bf16 (acceptance shape + the persistent bf16 copy) fits
    at its preset TP=8 and is correctly rejected at TP=4 (the extra
    copy/activation bytes push fp32-at-T=4's 13.2 GB over budget)."""
    from dladmm_tpu.parallel.memory import audit_or_raise
    from dladmm_tpu.utils.config import get_config

    cfg = get_config("tp_large_bf16")
    p, t, s = cfg.problem, cfg.train, cfg.sharding
    assert t.compute_dtype == "bfloat16" and s.model_axis == 8
    bd = audit_or_raise(
        p.m, p.n, p.K, t.batch,
        s.data_axis, s.model_axis, s.layout,
        compute_dtype_bytes=2,
    )
    assert bd.total <= 16e9 * 0.9
    with pytest.raises(MemoryError):
        audit_or_raise(
            p.m, p.n, p.K, t.batch, 1, 4, s.layout, compute_dtype_bytes=2
        )


@pytest.mark.slow
def test_sharded_training_improves_nmse():
    """Short sharded training run actually learns (DP=4, TP=2)."""
    mesh = pmesh.make_mesh(data=4, model=2)
    A, data, _ = _setup(S=32)
    params = init_dladmm_params(A, K=6)
    optimizer = optax.adam(3e-3)
    params_s, A_s, _ = _put(mesh, data, params, A, "sharded_w2")
    state = TrainState(params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(optimizer, mesh)

    key = jax.random.PRNGKey(1)
    first = last = None
    for i in range(60):
        key, sub = jax.random.split(key)
        d = _put_batch(mesh, make_batch(sub, A, 32))
        state, loss = step(state, A_s, d)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first


@pytest.mark.slow
def test_fit_sharded_end_to_end():
    """fit_sharded composes bf16 + deep supervision + sharded_w2 layout
    end-to-end on the virtual mesh, improves NMSE, and emits the
    per-layer curve (paper's signature artifact) for the sharded run."""
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
        train=TrainConfig(
            batch=16,
            steps=40,
            lr=1e-3,
            eval_every=10,
            eval_batch=32,
            compute_dtype="bfloat16",
            layer_loss="uniform",
        ),
        sharding=ShardingConfig(data_axis=4, model_axis=2),
    )
    params, history = fit_sharded(cfg)
    assert history[-1]["mesh"] == "4x2"
    assert all(jnp.isfinite(h["loss"]) for h in history)
    assert history[-1]["nmse_db"] < history[0]["nmse_db"], history
    curves = history[-1]["curves"]
    assert len(curves["nmse_curve_db"]) == 4
    assert len(curves["ladmm_curve_db"]) == 4
    # Trained net beats the classical-LADMM curve at the final layer.
    assert curves["nmse_curve_db"][-1] < curves["ladmm_curve_db"][-1]


def test_fit_sharded_rejects_kernel_with_tp():
    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="bad",
        problem=ProblemConfig(m=16, n=32, K=4),
        train=TrainConfig(batch=16, steps=2, kernel="megakernel"),
        sharding=ShardingConfig(data_axis=2, model_axis=2),
    )
    with pytest.raises(ValueError, match="model_axis"):
        fit_sharded(cfg)


def test_dp_fused_adam_matches_single_device():
    """DP fused-Adam step (per-layer grad psum inside the reverse scan,
    Adam applied in-body) == the single-device fused step on the same
    global batch, fp32 and with a binding delayed clip."""
    from dladmm_tpu.parallel.collectives import make_dp_fused_adam_step
    from dladmm_tpu.train.fused_adam import (
        make_fused_adam_state,
        make_fused_adam_step,
    )

    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    clip = 1e-3  # binds, so the prev_norm carry is exercised too

    ref_step = make_fused_adam_step(
        A, lr=1e-3, clip_norm=clip, donate=False, from_batch=True
    )
    ref_state = make_fused_adam_state(params, clip)
    for _ in range(3):
        ref_state, ref_loss = ref_step(ref_state, data)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    dp_state = make_fused_adam_state(params_s, clip)
    dp_step = make_dp_fused_adam_step(mesh, lr=1e-3, clip_norm=clip,
                                      donate=False)
    for _ in range(3):
        dp_state, dp_loss = dp_step(dp_state, A_s, batch_s)

    assert float(dp_state.opt_state.prev_norm) > clip
    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-5)
    for name, got, want in zip(
        params._fields, dp_state.params, ref_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6,
            err_msg=name,
        )


def test_dp_fused_adam_bf16_deep_supervision():
    """The DP fused step composes with bf16 mixed precision and the
    trajectory loss; parity with the single-device fused step."""
    from dladmm_tpu.parallel.collectives import make_dp_fused_adam_step
    from dladmm_tpu.train.fused_adam import (
        make_fused_adam_state,
        make_fused_adam_step,
    )

    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup(K=4)
    bf = jnp.bfloat16
    lw = jnp.full((4,), 0.25, jnp.float32)

    ref_step = make_fused_adam_step(
        A, layer_weights=lw, lr=1e-3, compute_dtype=bf, donate=False,
        from_batch=True,
    )
    ref_state = make_fused_adam_state(params, None, bf)
    for _ in range(2):
        ref_state, ref_loss = ref_step(ref_state, data)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    dp_state = make_fused_adam_state(params_s, None, bf)
    dp_step = make_dp_fused_adam_step(
        mesh, layer_weights=lw, lr=1e-3, compute_dtype=bf, donate=False
    )
    for _ in range(2):
        dp_state, dp_loss = dp_step(dp_state, A_s, batch_s)

    np.testing.assert_allclose(float(dp_loss), float(ref_loss),
                               rtol=2e-2)
    # bf16 grads near zero are sign-unstable under the psum/D reorder,
    # and Adam's first updates are ~lr*sign(g) — so individual params
    # can differ by up to ~2*lr*steps; the bound here is that, not a
    # tolerance guess.
    for name, got, want in zip(
        params._fields, dp_state.params, ref_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-3,
            err_msg=name,
        )
    assert dp_state.compute_params.W1.dtype == bf


def test_fit_sharded_fused_adam_end_to_end():
    """fit_sharded routes optimizer='fused_adam' to the DP fused step on
    a data-only mesh; TP meshes and non-delayed clip are rejected."""
    import dataclasses

    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="dp_fused",
        problem=ProblemConfig(m=16, n=64, K=4),
        train=TrainConfig(
            batch=16,
            steps=4,
            eval_every=4,
            eval_batch=16,
            lr=1e-3,
            clip_norm=1.0,
            clip_mode="delayed",
            optimizer="fused_adam",
        ),
        sharding=ShardingConfig(data_axis=8, model_axis=1),
    )
    _, history = fit_sharded(cfg)
    assert history and np.isfinite(history[-1]["nmse_db"])

    tp = dataclasses.replace(
        cfg, sharding=ShardingConfig(data_axis=4, model_axis=2)
    )
    with pytest.raises(ValueError, match="data"):
        fit_sharded(tp)

    bad_clip = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, clip_mode="global")
    )
    with pytest.raises(ValueError, match="delayed"):
        fit_sharded(bad_clip)


def _setup_general_b(m=16, n=48, d=24, K=5, S=16, seed=0):
    key = jax.random.PRNGKey(seed)
    kA, kB, kd, kp = jax.random.split(key, 4)
    A = make_dictionary(kA, m, n)
    Bd = make_dictionary(kB, m, d)
    data = make_batch(kd, A, S, B=Bd)
    params = init_dladmm_params(A, Bd, K=K)
    leaves = list(params)
    keys = jax.random.split(kp, len(leaves))
    params = type(params)(
        *(p + 0.05 * jax.random.normal(k, p.shape) for k, p in zip(keys, leaves))
    )
    return A, Bd, data, params


def test_dp_general_b_matches_single_device():
    """General-B DP step: the per-shard loss routes through loss_fn's
    general-B manual reverse-scan VJP inside shard_map and matches the
    single-device global-batch step (the z stream lives in R^d != R^m)."""
    mesh = pmesh.make_mesh(data=8, model=1)
    A, Bd, data, params = _setup_general_b()
    optimizer = optax.adam(1e-3)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star, Bd
    )
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    state = TrainState(
        params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32)
    )
    step = make_dp_train_step(optimizer, mesh, donate=False, B=Bd)
    state2, loss = step(state, A_s, batch_s)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for name, got, want in zip(params._fields, state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6,
            err_msg=name,
        )


def test_dp_general_b_deep_supervision_fused_adam():
    """General-B DP fused-Adam step (per-layer grad psum inside the
    general reverse scan) matches the single-device fused step, with the
    trajectory loss."""
    from dladmm_tpu.parallel.collectives import make_dp_fused_adam_step
    from dladmm_tpu.train.fused_adam import (
        make_fused_adam_state,
        make_fused_adam_step,
    )

    mesh = pmesh.make_mesh(data=4, model=1)
    A, Bd, data, params = _setup_general_b(K=4)
    lw = jnp.full((4,), 0.25, jnp.float32)

    ref_step = make_fused_adam_step(
        A, layer_weights=lw, lr=1e-3, clip_norm=1e-3, donate=False,
        from_batch=True, B=Bd,
    )
    ref_state = make_fused_adam_state(params, 1e-3)
    for _ in range(3):
        ref_state, ref_loss = ref_step(ref_state, data)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    dp_state = make_fused_adam_state(params_s, 1e-3)
    dp_step = make_dp_fused_adam_step(
        mesh, layer_weights=lw, lr=1e-3, clip_norm=1e-3, donate=False,
        B=Bd,
    )
    for _ in range(3):
        dp_state, dp_loss = dp_step(dp_state, A_s, batch_s)

    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-5)
    for name, got, want in zip(
        params._fields, dp_state.params, ref_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6,
            err_msg=name,
        )


def test_dp_eval_general_b_matches_single_device():
    """make_dp_eval's psum-of-local-sums general-B metrics == the
    single-device evaluate() (same degenerate-support guard, same
    residual semantics)."""
    from dladmm_tpu.parallel.collectives import make_dp_eval
    from dladmm_tpu.train.loop import evaluate

    mesh = pmesh.make_mesh(data=8, model=1)
    A, Bd, data, params = _setup_general_b()
    ref = evaluate(params, A, data, Bd)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    got = jax.device_get(make_dp_eval(mesh, Bd)(params_s, A_s, batch_s))
    np.testing.assert_allclose(got["nmse_db"], ref["nmse_db"], rtol=1e-5)
    np.testing.assert_allclose(
        got["nmse_db_z"], ref["nmse_db_z"], rtol=1e-5
    )
    np.testing.assert_allclose(
        got["residual"], ref["residual"], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["nmse_curve_db"]),
        np.asarray(ref["nmse_curve_db"]),
        rtol=1e-4, atol=1e-5,
    )


def test_fit_sharded_general_b_end_to_end():
    """fit_sharded trains a general-B config on a data-only mesh end to
    end (preset general_b_dp's path) and still rejects general-B TP."""
    import dataclasses

    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="gb_dp",
        problem=ProblemConfig(m=16, n=48, K=4, identity_B=False, d=24),
        train=TrainConfig(
            batch=16, steps=4, eval_every=4, eval_batch=16, lr=1e-3,
            layer_loss="uniform",
        ),
        sharding=ShardingConfig(data_axis=4, model_axis=1),
    )
    _, history = fit_sharded(cfg)
    assert history and np.isfinite(history[-1]["nmse_db"])

    tp = dataclasses.replace(
        cfg, sharding=ShardingConfig(data_axis=2, model_axis=2)
    )
    with pytest.raises(ValueError, match="identity_B"):
        fit_sharded(tp)

    kern = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, kernel="megakernel")
    )
    with pytest.raises(ValueError, match="kernel"):
        fit_sharded(kern)


def test_dp_zero1_matches_single_device_exact_clip():
    """ZeRO-1 step (reduce-scatter grads, Adam on the 1/D flat shard,
    all-gather params — PAPERS.md cross-replica weight-update sharding)
    == single-device exact-global-clip optax chain, multiple steps."""
    from dladmm_tpu.parallel.collectives import (
        make_dp_zero1_state,
        make_dp_zero1_train_step,
    )

    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    clip = 0.05  # small enough to BIND at this loss scale
    opt_ref = optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3))
    params_ref, opt_ref_state = params, opt_ref.init(params)

    def ref_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, A, data.b, data.x_star, data.e_star
        )
        upd, opt_state = opt_ref.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    opt_z = optax.adam(1e-3)
    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    state = make_dp_zero1_state(params_s, opt_z, mesh)
    step = make_dp_zero1_train_step(
        opt_z, mesh, clip_norm=clip, donate=False
    )
    for _ in range(3):
        params_ref, opt_ref_state, loss_ref = ref_step(
            params_ref, opt_ref_state
        )
        state, loss = step(state, A_s, batch_s)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for name, got, want in zip(params._fields, state.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6,
            err_msg=name,
        )
    # The point of ZeRO-1: moment vectors live SHARDED over 'data'.
    from jax.sharding import PartitionSpec

    for leaf in jax.tree.leaves(state.opt_state):
        if getattr(leaf, "ndim", 0) == 1:
            assert leaf.sharding.spec == PartitionSpec("data"), leaf.sharding


def test_dp_zero1_audit_and_validation():
    """The memory audit reflects the 1/D moment shard, and fit_sharded
    rejects the non-composing flag combinations."""
    import dataclasses

    from dladmm_tpu.parallel.memory import per_chip_bytes
    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    rep = per_chip_bytes(1000, 2000, 20, 1024, data_axis=8)
    z1 = per_chip_bytes(1000, 2000, 20, 1024, data_axis=8, opt_shard_degree=8)
    assert z1.opt_moments == pytest.approx(rep.opt_moments / 8)

    base = Config(
        name="z1",
        problem=ProblemConfig(m=16, n=32, K=3),
        train=TrainConfig(batch=16, steps=2, eval_every=2),
        sharding=ShardingConfig(data_axis=2, zero1=True),
    )
    with pytest.raises(ValueError, match="zero1"):
        fit_sharded(
            dataclasses.replace(
                base, sharding=ShardingConfig(data_axis=2, model_axis=2, zero1=True)
            )
        )
    with pytest.raises(ValueError, match="fused_adam"):
        fit_sharded(
            dataclasses.replace(
                base,
                train=dataclasses.replace(
                    base.train, optimizer="fused_adam", clip_mode="delayed"
                ),
            )
        )
    with pytest.raises(ValueError, match="delayed"):
        fit_sharded(
            dataclasses.replace(
                base,
                train=dataclasses.replace(
                    base.train, clip_norm=1.0, clip_mode="delayed"
                ),
            )
        )


@pytest.mark.slow
def test_fit_sharded_zero1_end_to_end_matches_replicated():
    """fit_sharded with zero1 reproduces the replicated-optimizer DP
    run exactly (same exact-clip semantics) at a tiny config."""
    import dataclasses

    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    base = Config(
        name="z1e2e",
        problem=ProblemConfig(m=16, n=32, K=4),
        train=TrainConfig(
            batch=32, steps=20, lr=1e-3, clip_norm=1.0, eval_every=10,
            eval_batch=64,
        ),
        sharding=ShardingConfig(data_axis=4),
    )
    _, hist_rep = fit_sharded(base)
    _, hist_z1 = fit_sharded(
        dataclasses.replace(
            base, sharding=ShardingConfig(data_axis=4, zero1=True)
        )
    )
    assert hist_z1[-1]["nmse_db"] == pytest.approx(
        hist_rep[-1]["nmse_db"], abs=1e-3
    )
    assert hist_z1[-1]["loss"] == pytest.approx(
        hist_rep[-1]["loss"], rel=1e-4
    )


@pytest.mark.parametrize("md", ["bfloat16", "int8"])
def test_dp_fast_path_qmoments_matches_single_device(md):
    """moment_dtype composes with DP sharding: the reduced-precision
    Adam transform (train/qmoments.py) is deterministic, so the DP step
    (grads psum'd, optimizer replicated) matches single-device."""
    from dladmm_tpu.train.qmoments import adam_qmoments

    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    optimizer = adam_qmoments(1e-3, moment_dtype=md)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star
    )
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    params_s, A_s, batch_s = _put(mesh, data, params, A, "sharded_w2")
    state = TrainState(
        params_s, optimizer.init(params_s), jnp.zeros((), jnp.int32)
    )
    step = make_dp_train_step(optimizer, mesh, donate=False)
    state2, loss = step(state, A_s, batch_s)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for got, want in zip(state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=1e-6
        )
