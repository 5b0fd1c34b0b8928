"""Convergence/parity integration test (SURVEY.md §6.2-3), CPU-runnable:

Train a scaled-down synthetic config for a short fixed-seed budget and
assert (a) the loss decreases, (b) trained NMSE at layer K beats both the
untrained (= classical LADMM) net and the LADMM curve at equal iteration
count. A short-budget proxy of the BASELINE.json:7 config keeps CI fast;
the full config runs via ``python -m dladmm_tpu.run``.
"""

import dataclasses

import numpy as np
import pytest

from dladmm_tpu.utils.config import Config, ProblemConfig, TrainConfig, get_config


@pytest.fixture(scope="module")
def trained():
    cfg = Config(
        name="ci_small",
        problem=ProblemConfig(m=50, n=100, K=10),
        train=TrainConfig(batch=32, steps=1000, lr=3e-3, eval_every=250,
                          eval_batch=128, seed=0),
    )
    from dladmm_tpu.train.loop import fit

    params, history = fit(cfg)
    return cfg, params, history


def test_eval_nmse_improves_over_training(trained):
    _, _, history = trained
    # Per-batch loss is noisy; the held-out eval NMSE is the stable signal.
    assert history[-1]["nmse_db"] < history[0]["nmse_db"]


def test_beats_ladmm_at_equal_depth(trained):
    _, _, history = trained
    curves = history[-1]["curves"]
    dladmm_final = float(curves["nmse_curve_db"][-1])
    ladmm_final = float(curves["ladmm_curve_db"][-1])
    # The trained unroll must beat classical LADMM at equal layer count
    # (the paper's core claim, SURVEY.md §2 point 7 / §8).
    assert dladmm_final < ladmm_final - 1.0, (dladmm_final, ladmm_final)


def test_nmse_improves_with_depth(trained):
    _, _, history = trained
    curve = np.asarray(history[-1]["curves"]["nmse_curve_db"])
    assert curve[-1] < curve[0]


@pytest.mark.slow
def test_deep_supervision_runs():
    cfg = Config(
        name="ci_deep",
        problem=ProblemConfig(m=30, n=60, K=6),
        train=TrainConfig(batch=16, steps=20, lr=1e-3, eval_every=20,
                          eval_batch=32, seed=1, layer_loss="uniform"),
    )
    from dladmm_tpu.train.loop import fit

    _, history = trained_ok = fit(cfg)
    assert np.isfinite(history[-1]["loss"])


def test_presets_exist():
    for name in ("synthetic_small", "synthetic_large", "tp_large", "multihost"):
        cfg = get_config(name)
        assert cfg.problem.K >= 15


def test_vjp_manual_rejected_with_deep_supervision():
    """vjp='manual' must raise with layer_weights set, not silently fall
    back to XLA autodiff (the manual path has no trajectory loss)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import loss_fn

    A = make_dictionary(jax.random.PRNGKey(0), 16, 32)
    params = init_dladmm_params(A, K=4)
    data = make_batch(jax.random.PRNGKey(1), A, 8)
    lw = jnp.full((4,), 0.25)
    with pytest.raises(ValueError, match="manual"):
        loss_fn(params, A, data.b, data.x_star, data.e_star,
                layer_weights=lw, vjp="manual")


@pytest.mark.slow
def test_dual_copy_mixed_precision_matches_cast_path():
    """The persistent compute-params copy must produce the same training
    trajectory as casting inside the loss every step (same math, less
    traffic)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dladmm_tpu.data.synthetic import make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import (
        TrainState,
        make_train_state,
        make_train_step,
    )

    A = make_dictionary(jax.random.PRNGKey(0), 16, 32)
    params = init_dladmm_params(A, K=4)
    opt = optax.adam(1e-3)
    step = make_train_step(
        opt, A, batch=8, compute_dtype=jnp.bfloat16, donate=False
    )

    # Dual-copy state vs legacy 3-field state (compute_params=None →
    # per-step cast fallback): same math, but XLA schedules the bf16
    # roundings differently (pre-cast A constant vs cast-in-jit), so
    # parity is to bf16 accumulation noise, not bitwise.
    s_dual = make_train_state(params, opt, jnp.bfloat16)
    s_cast = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    for i in range(5):
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        s_dual, loss_d = step(s_dual, key)
        s_cast, loss_c = step(s_cast, key)
    for name, a, b in zip(params._fields, s_dual.params, s_cast.params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.05, atol=2e-3,
            err_msg=name,
        )
    np.testing.assert_allclose(float(loss_d), float(loss_c), rtol=1e-2)
    assert s_dual.compute_params is not None
    assert s_dual.compute_params.W1.dtype == jnp.bfloat16


def test_training_with_general_B():
    """End-to-end training with a non-identity B (the general Ax+Bz=b
    API, SURVEY.md §2 point 4): grads flow and the loss decreases
    (vjp='auto' routes through the manual general-B reverse scan —
    parity pinned in tests/test_unroll_vjp.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dladmm_tpu.data.synthetic import make_dictionary
    from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
    from dladmm_tpu.train.loop import TrainState, make_train_step_from_batch

    key = jax.random.PRNGKey(0)
    kA, kB, kb = jax.random.split(key, 3)
    m, n, d, K, S = 12, 24, 10, 4, 8
    A = make_dictionary(kA, m, n)
    B = make_dictionary(kB, m, d)
    params = init_dladmm_params(A, B=B, K=K)

    # Synthesize a consistent problem: b = A x* + B z*.
    kx, kz = jax.random.split(kb)
    x_star = jax.random.normal(kx, (S, n)) * (
        jax.random.bernoulli(kx, 0.2, (S, n)))
    z_star = jax.random.normal(kz, (S, d)) * (
        jax.random.bernoulli(kz, 0.2, (S, d)))
    b = x_star @ A.T + z_star @ B.T

    from dladmm_tpu.data.synthetic import SyntheticBatch

    batch = SyntheticBatch(b=b, x_star=x_star, e_star=z_star)
    opt = optax.adam(1e-2)
    step = make_train_step_from_batch(opt, A, B=B, donate=False)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    _, loss0 = step(state, batch)
    for _ in range(30):
        state, loss = step(state, batch)
    assert float(loss) < float(loss0), (float(loss0), float(loss))
    x, z, _ = dladmm_forward(state.params, A, b, B=B)
    assert jnp.isfinite(x).all() and jnp.isfinite(z).all()


@pytest.mark.slow
def test_greedy_layerwise_training():
    """fit_greedy (SURVEY.md §10 Q5 alternative schedule): stages train
    prefixes warm-started from the previous stage, later layers keep
    their LADMM init until their stage, and the result learns."""
    from dladmm_tpu.train.loop import fit, fit_greedy

    cfg = Config(
        name="greedy_test",
        problem=ProblemConfig(m=16, n=32, K=4),
        train=TrainConfig(
            batch=16, steps=80, lr=3e-3, eval_every=40, eval_batch=64
        ),
    )
    params, history = fit_greedy(cfg)
    stages = [h for h in history if "stage" in h]
    assert [h["stage"] for h in stages] == [1, 2, 3, 4]
    assert all(np.isfinite(h["loss"]) for h in stages)
    final = history[-1]
    assert np.isfinite(final["nmse_db"])
    # Learns: beats the untrained (classical-LADMM) curve at layer K.
    assert final["nmse_db"] < float(
        final["curves"]["ladmm_curve_db"][-1]
    )
    assert params.W1.shape[0] == 4  # full-K params returned


@pytest.mark.slow
def test_greedy_bf16_runs():
    """fit_greedy honors compute_dtype (advisor r2: stages previously
    trained fp32 regardless of config)."""
    from dladmm_tpu.train.loop import fit_greedy

    cfg = Config(
        name="greedy_bf16",
        problem=ProblemConfig(m=16, n=32, K=3),
        train=TrainConfig(
            batch=16, steps=30, lr=3e-3, eval_every=30, eval_batch=32,
            compute_dtype="bfloat16",
        ),
    )
    params, history = fit_greedy(cfg)
    assert np.isfinite(history[-1]["nmse_db"])
    import jax.numpy as jnp

    assert params.W1.dtype == jnp.float32  # masters stay fp32


def test_weighted_trajectory_mse_is_the_single_loss_impl():
    """The shared deep-supervision objective (train/loop.py
    weighted_trajectory_mse — also used by run_denoise.py's
    reconstruction loss, VERDICT r2 #7) must equal the literal
    per-layer-MSE x gamma_k formula, including (S, .)-target
    broadcasting over K."""
    import jax
    import jax.numpy as jnp

    from dladmm_tpu.train.loop import _layer_weights, weighted_trajectory_mse

    key = jax.random.PRNGKey(0)
    K, S, n, m = 4, 6, 10, 8
    ks = jax.random.split(key, 4)
    tx = jax.random.normal(ks[0], (K, S, n))
    tz = jax.random.normal(ks[1], (K, S, m))
    x_tgt = jax.random.normal(ks[2], (S, n))
    z_tgt = jax.random.normal(ks[3], (S, m))
    for schedule in ("uniform", "linear"):
        lw = _layer_weights(schedule, K, jnp.float32)
        got = weighted_trajectory_mse(tx, tz, x_tgt, z_tgt, lw)
        want = sum(
            float(lw[k])
            * (
                float(jnp.mean((tx[k] - x_tgt) ** 2))
                + float(jnp.mean((tz[k] - z_tgt) ** 2))
            )
            for k in range(K)
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_delayed_clip_uses_previous_step_norm():
    """delayed_clip_by_global_norm (VERDICT r2 #4): step i is scaled by
    min(1, c / ||g_{i-1}||) — step 0 unclipped, the current norm only
    feeds the NEXT step."""
    import jax.numpy as jnp
    import optax

    from dladmm_tpu.train.loop import delayed_clip_by_global_norm

    c = 1.0
    tx = delayed_clip_by_global_norm(c)
    g0 = {"w": jnp.full((4,), 2.0)}  # ||g0|| = 4
    g1 = {"w": jnp.full((4,), 0.1)}  # ||g1|| = 0.2
    state = tx.init(g0)

    u0, state = tx.update(g0, state)
    np.testing.assert_allclose(np.asarray(u0["w"]), 2.0)  # step 0: no clip
    np.testing.assert_allclose(float(state.prev_norm), 4.0)

    # Step 1 is scaled by c/||g0|| = 1/4, NOT by its own (tiny) norm.
    u1, state = tx.update(g1, state)
    np.testing.assert_allclose(np.asarray(u1["w"]), 0.1 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(float(state.prev_norm), 0.2, rtol=1e-6)

    # Step 2: prev norm 0.2 < c => scale capped at 1 (no inflation).
    u2, _ = tx.update(g1, state)
    np.testing.assert_allclose(np.asarray(u2["w"]), 0.1, rtol=1e-6)

    # And _build_optimizer wires it from the config.
    from types import SimpleNamespace

    from dladmm_tpu.train.loop import _build_optimizer

    t = SimpleNamespace(
        lr_schedule=None, lr=1e-3, steps=10, clip_norm=1.0,
        clip_mode="delayed",
    )
    opt = _build_optimizer(t)
    s = opt.init(g0)
    _, s = opt.update(g0, s, g0)
    import pytest as _pytest

    t_bad = SimpleNamespace(
        lr_schedule=None, lr=1e-3, steps=10, clip_norm=1.0,
        clip_mode="typo",
    )
    with _pytest.raises(ValueError, match="clip_mode"):
        _build_optimizer(t_bad)


@pytest.mark.slow
def test_fit_general_B_config_beats_ladmm():
    """The synthetic_general_b preset path end-to-end through fit():
    config-driven B construction (identity_B=False, d != m), general-B
    data gen (b = A x* + B z*), deep-supervised training via the manual
    general-B trajectory VJP, and eval against the general-B LADMM
    baseline — the trained net must beat classical LADMM at depth K."""
    import dataclasses

    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.config import PRESETS

    cfg = PRESETS["synthetic_general_b"]
    cfg = dataclasses.replace(
        cfg,
        problem=dataclasses.replace(cfg.problem, m=40, n=80, d=60, K=6),
        train=dataclasses.replace(
            cfg.train, batch=32, steps=400, eval_every=400
        ),
    )
    assert not cfg.problem.identity_B
    _, history = fit(cfg)
    last = history[-1]
    curves = last["curves"]
    assert float(last["nmse_db"]) < float(curves["ladmm_curve_db"][-1]), (
        last["nmse_db"],
        curves["ladmm_curve_db"][-1],
    )
    import numpy as np

    assert np.isfinite(last["residual"])


def test_greedy_and_tp_reject_general_B():
    """fit_greedy stays identity-B-only; fit_sharded now accepts
    general-B on DATA-only meshes (tests/test_distributed.py) but still
    rejects general-B tensor parallelism (the TP collective algebra
    assumes z in R^m)."""
    import dataclasses

    import pytest

    from dladmm_tpu.train.loop import fit_greedy, fit_sharded
    from dladmm_tpu.utils.config import PRESETS, ShardingConfig

    cfg = PRESETS["synthetic_general_b"]
    with pytest.raises(ValueError, match="identity-B"):
        fit_greedy(cfg)
    cfg2 = dataclasses.replace(
        cfg, sharding=ShardingConfig(data_axis=2, model_axis=2)
    )
    with pytest.raises(ValueError, match="identity_B"):
        fit_sharded(cfg2)


def test_run_cli_rejects_bad_general_B_flags():
    """run.py argparse guards: fused kernels and --greedy require
    identity B."""
    from dladmm_tpu import run

    with pytest.raises(SystemExit):
        run.main(["--config=synthetic_general_b", "--kernel=megakernel"])
    with pytest.raises(SystemExit):
        run.main(["--config=synthetic_general_b", "--greedy"])


def test_run_cli_elastic_net_requires_rho():
    """ADVICE r3: elastic_net with the default rho=0 IS l1 (is_l1()),
    so the prox flag would silently have no effect — run.py must
    reject it. Cheap (no training) so it stays in the fast tier; the
    accept-with-rho training half is the slow test below."""
    from dladmm_tpu import run

    with pytest.raises(SystemExit):
        run.main(["--config=smoke", "--prox-x=elastic_net"])


@pytest.mark.slow
def test_run_cli_elastic_net_accepts_rho():
    """With rho > 0 the config routes to the general-prox path (the
    guard passes and training runs the XLA scan)."""
    from dladmm_tpu import run

    rc = run.main(
        ["--config=smoke", "--prox-x=elastic_net", "--prox-rho=0.3"]
    )
    assert rc == 0


@pytest.mark.slow
def test_general_B_bf16_mixed_precision_trains():
    """General B composes with the persistent-bf16 mixed-precision path
    for both loss modes (final-layer and deep supervision) — the manual
    general-B VJPs run in the compute dtype."""
    import jax
    import jax.numpy as jnp
    import optax

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import (
        make_train_state,
        make_train_step_from_batch,
    )

    key = jax.random.PRNGKey(0)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, 12, 24)
    B = make_dictionary(kB, 12, 10)
    params = init_dladmm_params(A, B, K=4)
    data = make_batch(kb, A, 8, B=B)
    opt = optax.adam(1e-2)
    for lw in (None, jnp.full((4,), 0.25)):
        step = make_train_step_from_batch(
            opt, A, B=B, layer_weights=lw,
            compute_dtype=jnp.bfloat16, donate=False,
        )
        st = make_train_state(params, opt, jnp.bfloat16)
        _, loss0 = step(st, data)
        for _ in range(30):
            st, loss = step(st, data)
        assert float(loss) < float(loss0), (lw, float(loss0), float(loss))


def test_grad_accumulation_matches_full_batch_exactly():
    """accum_steps on the explicit-batch step computes the EXACT
    global-mean gradient: equal microbatch chunks -> mean of chunk
    means == full-batch mean (fp reassociation only), so one update
    step lands on the same params."""
    import jax
    import jax.numpy as jnp
    import optax

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import (
        make_train_state,
        make_train_step_from_batch,
    )

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 16, 32)
    params = init_dladmm_params(A, K=4)
    data = make_batch(kb, A, 32)
    opt = optax.adam(1e-3)

    step1 = make_train_step_from_batch(opt, A, donate=False)
    step4 = make_train_step_from_batch(opt, A, donate=False, accum_steps=4)
    s1, l1 = step1(make_train_state(params, opt), data)
    s4, l4 = step4(make_train_state(params, opt), data)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-6)
    for name, a, b in zip(params._fields, s1.params, s4.params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=name
        )

    # Deep supervision composes (trajectory loss per microbatch).
    lw = jnp.full((4,), 0.25)
    ds1 = make_train_step_from_batch(opt, A, layer_weights=lw, donate=False)
    ds4 = make_train_step_from_batch(
        opt, A, layer_weights=lw, donate=False, accum_steps=4
    )
    d1, dl1 = ds1(make_train_state(params, opt), data)
    d4, dl4 = ds4(make_train_state(params, opt), data)
    np.testing.assert_allclose(float(dl1), float(dl4), rtol=1e-6)
    for name, a, b in zip(params._fields, d1.params, d4.params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=name
        )

    # Non-dividing chunk counts are rejected at trace time.
    bad = make_train_step_from_batch(opt, A, donate=False, accum_steps=5)
    with pytest.raises(ValueError, match="divide"):
        bad(make_train_state(params, opt), data)


def test_grad_accumulation_config_surface():
    """fit honors accum_steps (key-based microbatch generation), and the
    non-composing paths reject it with a reason."""
    from dladmm_tpu.train.loop import fit, fit_greedy, fit_sharded
    from dladmm_tpu.utils.config import ShardingConfig, get_config

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=6, accum_steps=4)
    )
    params, history = fit(cfg)
    assert np.isfinite(history[-1]["nmse_db"])

    with pytest.raises(ValueError, match="accum"):
        fit(
            dataclasses.replace(
                cfg,
                train=dataclasses.replace(
                    cfg.train, optimizer="fused_adam", clip_mode="delayed"
                ),
            )
        )
    with pytest.raises(ValueError, match="data_axis"):
        fit_sharded(
            dataclasses.replace(cfg, sharding=ShardingConfig(data_axis=2))
        )
    with pytest.raises(ValueError, match="accum"):
        fit_greedy(cfg)
    with pytest.raises(ValueError, match="divide"):
        fit(
            dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, accum_steps=7)
            )
        )
