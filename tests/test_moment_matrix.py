"""moment_dtype x training-path composition matrix (VERDICT r4 #2/#3).

Every (path, moment_dtype) cell either works — pinned here by a parity
or smoke test — or raises at fit_sharded validation with a reason:

  path \ md      f32  bf16  bf16_sr  int8  *_pallas (f32/bf16/bf16_sr/int8)
  fit            yes  yes   yes      yes   yes (fused_apply kernel)
  fit_greedy     yes  yes   yes      yes   yes (make_train_step routes fused_apply)
  DP fast path   yes  yes   yes      yes   yes (fused_apply under GSPMD, replicated)
  DP + zero1     yes  yes   yes      yes   yes (fused kernel on the 1/D (rows,256) shard)
  TP (model>1)   yes  yes   yes      REJECT (QTensor not param-shaped) / REJECT (kernel
                                     cannot partition across model shards)

The SR semantics hold on EVERY path since round 5: the optax-compatible
QAdamFusedPallas.update applies XLA-side stochastic rounding instead of
silently downgrading to round-to-nearest (ADVICE r4 #1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.parallel import mesh as pmesh
from dladmm_tpu.parallel.collectives import (
    make_dp_train_step,
    make_dp_zero1_state,
    make_dp_zero1_train_step,
    make_sharded_train_step,
)
from dladmm_tpu.train.loop import make_train_state, make_train_step_from_batch
from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas
from dladmm_tpu.train.qmoments import adam_qmoments

FUSED_FMTS = (
    "float32",
    "bfloat16",
    "bfloat16_sr",
    "bfloat16_sr_mu",  # round-5 mixed: SR-bf16 mu + fp32 nu
    "int8",
)


def _setup(m=16, n=64, K=4, S=16, seed=3):
    key = jax.random.PRNGKey(seed)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    data = make_batch(kd, A, S)
    params = init_dladmm_params(A, K=K)
    return A, data, params


def _put_batch(mesh, data):
    from jax.sharding import NamedSharding

    from dladmm_tpu.parallel.collectives import B_SPEC, X_SPEC, Z_SPEC

    put = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))
    return type(data)(
        b=put(data.b, B_SPEC),
        x_star=put(data.x_star, X_SPEC),
        e_star=put(data.e_star, Z_SPEC),
    )


@pytest.mark.parametrize("fmt", FUSED_FMTS)
def test_dp_fast_path_fused_qadam_matches_single_device(fmt):
    """The DP fast path routes QAdamFusedPallas.fused_apply (one-pass
    kernel) exactly like the single-chip step — replicated params under
    GSPMD, so one step matches the single-device fused step near-exactly
    (fp32 compute; the only noise is the psum'd-grad reduction order)."""
    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    opt = QAdamFusedPallas(1e-3, moment_fmt=fmt, clip_norm=1.0)

    rstep = make_train_step_from_batch(opt, A, donate=False)
    rstate, rloss = rstep(make_train_state(params, opt), data)

    state = make_train_state(params, opt)
    step = make_dp_train_step(opt, mesh, donate=False)
    state2, loss = step(state, A, _put_batch(mesh, data))
    np.testing.assert_allclose(float(loss), float(rloss), rtol=1e-5)
    for name, got, want in zip(params._fields, state2.params, rstate.params):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=2e-6,
            err_msg=name,
        )


@pytest.mark.parametrize("fmt", FUSED_FMTS)
def test_zero1_fused_qadam_matches_single_device(fmt):
    """ZeRO-1 x fused qadam (VERDICT r4 #3): each chip's 1/D flat slice
    runs the one-HBM-pass kernel on its (rows, 256) view. Step-1 params
    match the single-device fused run near-exactly; int8 diverges only
    by its different quantization-block geometry afterwards (flat
    256-rows vs per-leaf rows), so step 2 is tolerance-checked."""
    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    clip = 0.05  # binds at this loss scale — exercises the exact clip
    opt_z = QAdamFusedPallas(1e-3, moment_fmt=fmt)  # step owns the clip
    opt_ref = QAdamFusedPallas(1e-3, moment_fmt=fmt, clip_norm=clip)

    rstep = make_train_step_from_batch(opt_ref, A, donate=False)
    rstate = make_train_state(params, opt_ref)

    state = make_dp_zero1_state(params, opt_z, mesh)
    step = make_dp_zero1_train_step(opt_z, mesh, clip_norm=clip, donate=False)
    batch_s = _put_batch(mesh, data)
    for _ in range(2):
        rstate, rloss = rstep(rstate, data)
        state, loss = step(state, A, batch_s)
        np.testing.assert_allclose(float(loss), float(rloss), rtol=1e-5)
    tol = 5e-3 if fmt == "int8" else 1e-4
    for name, got, want in zip(params._fields, state.params, rstate.params):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=tol, atol=tol * 1e-1,
            err_msg=name,
        )
    # The point: >=2-D fused moment state lives SHARDED over 'data'.
    from jax.sharding import PartitionSpec as P

    sharded = [
        leaf
        for leaf in jax.tree.leaves(state.opt_state)
        if getattr(leaf, "ndim", 0) >= 2
    ]
    assert sharded, "fused zero1 state must carry (rows, 256) leaves"
    for leaf in sharded:
        assert leaf.sharding.spec == P("data"), leaf.sharding


@pytest.mark.parametrize("md", ["bfloat16", "bfloat16_sr", "int8"])
def test_zero1_qmoments_runs_and_shards(md):
    """ZeRO-1 x the optax-surface reduced-precision moments: the flat
    padded vector's q-moment state (bf16 (padded,), SR key, int8 flat
    QTensor codes/scales) shards/replicates per _zero1_opt_specs —
    round 4 sharded the (2,) SR PRNG key and replicated int8 codes,
    which broke both cells."""
    mesh = pmesh.make_mesh(data=8, model=1)
    A, data, params = _setup()
    opt = adam_qmoments(1e-3, moment_dtype=md)
    state = make_dp_zero1_state(params, opt, mesh)
    step = make_dp_zero1_train_step(opt, mesh, clip_norm=1.0, donate=False)
    batch_s = _put_batch(mesh, data)
    before = jax.tree.map(np.asarray, params)
    for _ in range(2):
        state, loss = step(state, A, batch_s)
    assert np.isfinite(float(loss))
    changed = any(
        not np.allclose(np.asarray(g), b)
        for g, b in zip(state.params, before)
    )
    assert changed, "params must move"
    from jax.sharding import PartitionSpec as P

    total = sum(v.size for v in jax.tree.leaves(params))
    from dladmm_tpu.parallel.collectives import (
        _zero1_block_align,
        _zero1_padded,
    )

    padded = _zero1_padded(
        total, 8, fused=False, block_align=_zero1_block_align(opt)
    )
    for leaf in jax.tree.leaves(state.opt_state):
        nd = getattr(leaf, "ndim", 0)
        if nd >= 1 and leaf.shape[0] in (padded, padded // 256):
            assert leaf.sharding.spec == P("data"), (leaf.shape, leaf.sharding)
        elif nd >= 1:
            # e.g. the (2,) SR PRNG key — must stay replicated.
            assert leaf.sharding.spec == P(), (leaf.shape, leaf.sharding)


def test_zero1_rejects_clip_bearing_fused_optimizer():
    """ZeRO-1 owns the exact global clip; a fused optimizer built with
    its own clip_norm would ADDITIONALLY clip by each chip's local
    shard norm — rejected at build (round-5 review)."""
    mesh = pmesh.make_mesh(data=8, model=1)
    opt = QAdamFusedPallas(1e-3, moment_fmt="int8", clip_norm=1.0)
    with pytest.raises(ValueError, match="clip_norm=None"):
        make_dp_zero1_train_step(opt, mesh, clip_norm=1.0, donate=False)


def test_zero1_opt_specs_never_shard_prng_keys():
    """A toy model's padded//BLOCK can collide with the (2,) SR PRNG
    key's leading dim; uint32 leaves must stay replicated regardless
    (round-5 review)."""
    from jax.sharding import PartitionSpec as P

    from dladmm_tpu.parallel.collectives import _zero1_opt_specs

    state = {
        "mu": jnp.zeros((512,), jnp.bfloat16),
        "key": jnp.zeros((2,), jnp.uint32),  # collides: 512 // 256 == 2
        "count": jnp.zeros((), jnp.int32),
    }
    specs = _zero1_opt_specs(state, padded=512, fused=False)
    assert specs["mu"] == P("data")
    assert specs["key"] == P()
    assert specs["count"] == P()


def test_zero1_padding_preserves_plain_adam_template():
    """Plain fp32/bf16 flat states keep the round-3 D-multiple padding
    (pre-round-5 ZeRO-1 checkpoints stay resumable); only QTensor-
    bearing states block-align to D*256 (round-5 review)."""
    import optax

    from dladmm_tpu.parallel.collectives import (
        _zero1_block_align,
        _zero1_padded,
    )

    assert not _zero1_block_align(optax.adam(1e-3))
    assert not _zero1_block_align(adam_qmoments(1e-3, moment_dtype="bfloat16"))
    assert _zero1_block_align(adam_qmoments(1e-3, moment_dtype="int8"))
    assert _zero1_padded(1001, 8, fused=False, block_align=False) == 1008
    assert _zero1_padded(1001, 8, fused=False, block_align=True) == 2048


def test_fit_sharded_zero1_mixed_sr_moments_smoke():
    """The round-5 mixed format through fit_sharded + zero1: exercises
    the audit's moment_bytes entry for 'bfloat16_sr_mu' (a missing key
    crashed the sharded path — round-5 review) and the fused kernel on
    the 1/D shard."""
    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="z1mix",
        problem=ProblemConfig(m=16, n=32, K=3),
        train=TrainConfig(
            batch=16, steps=4, eval_every=2, eval_batch=32, clip_norm=1.0,
            moment_dtype="bfloat16_sr_mu_pallas",
        ),
        sharding=ShardingConfig(data_axis=4, zero1=True),
    )
    params, hist = fit_sharded(cfg)
    assert np.isfinite(hist[-1]["nmse_db"])


def test_solver_megakernel_general_prox_inference_only():
    """kernel='megakernel' + a general prox covers solve() only; fit()
    and trajectory() must raise instead of silently running the XLA
    scan (round-5 review)."""
    key = jax.random.PRNGKey(4)
    from dladmm_tpu.models.solver import DLADMMSolver

    A = make_dictionary(key, 16, 32)
    solver = DLADMMSolver.create(
        A, K=3, kernel="megakernel", prox_x="nonneg_l1"
    )
    with pytest.raises(ValueError, match="solve\\(\\) only"):
        solver.fit(key, steps=1, batch=8)
    with pytest.raises(ValueError, match="solve\\(\\) only"):
        solver.trajectory(jnp.zeros((8, 16)))


@pytest.mark.parametrize("md", ["int8", "int8_pallas", "bfloat16_sr_pallas"])
def test_fit_sharded_rejects_tp_with_nonparam_moments(md):
    """TP's GSPMD optimizer update needs param-shaped moment leaves;
    int8 QTensor state and the fused pallas sweep are rejected at
    validation with the reason (VERDICT r4 #2c)."""
    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="tpmd",
        problem=ProblemConfig(m=16, n=32, K=3),
        train=TrainConfig(batch=16, steps=2, eval_every=2, moment_dtype=md),
        sharding=ShardingConfig(data_axis=2, model_axis=2),
    )
    with pytest.raises(ValueError, match="moment_dtype"):
        fit_sharded(cfg)


def test_tp_bf16_sr_moments_match_single_device():
    """TP x bfloat16_sr moments: param-shaped bf16 state inherits the
    W1/W2 shards under GSPMD; the SR transform is deterministic given
    its key, so the sharded step matches single-device."""
    mesh = pmesh.make_mesh(data=2, model=4)
    A, data, params = _setup()
    opt = adam_qmoments(1e-3, moment_dtype="bfloat16_sr")

    from dladmm_tpu.train.loop import TrainState, loss_fn

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, A, data.b, data.x_star, data.e_star
    )
    upd_ref, _ = opt.update(grads_ref, opt.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    sh = pmesh.param_shardings_tp(mesh, "sharded_w2")
    params_s = jax.device_put(params, sh["params"])
    A_s = jax.device_put(A, sh["A"])
    state = TrainState(
        params_s, opt.init(params_s), jnp.zeros((), jnp.int32)
    )
    step = make_sharded_train_step(opt, mesh, donate=False)
    state2, loss = step(state, A_s, _put_batch(mesh, data))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for name, got, want in zip(params._fields, state2.params, params_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-5, atol=2e-6,
            err_msg=name,
        )


def test_qadam_update_bfloat16_sr_is_stochastic_not_rtn():
    """The optax-compatible .update path must honor SR semantics (ADVICE
    r4 #1): over many elements whose EMA lands strictly between two bf16
    values, stochastic rounding produces BOTH neighbors (RTN produces
    exactly one), and the mean stays near the true fp32 value."""
    opt = QAdamFusedPallas(1e-3, moment_fmt="bfloat16_sr")
    g = jnp.full((256, 256), 0.3333333, jnp.float32)  # not bf16-exact
    p = jnp.zeros_like(g)
    state = opt.init(p)
    _, state = opt.update(g, state, p)
    mu = np.asarray(state.mu, np.float32)
    true = 0.1 * 0.3333333  # (1-b1) * g with zero init
    rtn = np.asarray(jnp.asarray(true, jnp.bfloat16), np.float32)
    assert len(np.unique(mu)) >= 2, "SR must hit both bf16 neighbors"
    assert not np.allclose(mu, rtn), "must not be plain round-to-nearest"
    # Unbiasedness: the SR mean reconstructs the fp32 value far better
    # than one bf16 ULP (~0.4% here).
    assert abs(float(mu.mean()) - true) < 0.001 * abs(true)


@pytest.mark.slow
def test_fit_sharded_zero1_int8_pallas_resume(tmp_path):
    """ZeRO-1 x fused-int8 sharded checkpointing: the row-sharded
    QTensor optimizer state round-trips through orbax's sharding-
    carrying templates and the resumed run reproduces the cold run."""
    from dladmm_tpu.train.loop import fit_sharded
    from dladmm_tpu.utils.config import (
        Config,
        ProblemConfig,
        ShardingConfig,
        TrainConfig,
    )

    cfg = Config(
        name="z1q",
        problem=ProblemConfig(m=16, n=32, K=3),
        train=TrainConfig(
            batch=32, steps=20, lr=1e-3, clip_norm=1.0, eval_every=10,
            eval_batch=32, moment_dtype="int8_pallas",
        ),
        sharding=ShardingConfig(data_axis=4, zero1=True),
    )
    ck = str(tmp_path / "ck")
    params_cold, hist_cold = fit_sharded(cfg, ckpt_dir=ck)
    params_res, hist_res = fit_sharded(cfg, ckpt_dir=ck, resume=True)
    assert hist_res[-1]["nmse_db"] == pytest.approx(
        hist_cold[-1]["nmse_db"], abs=1e-6
    )
    for a, b in zip(params_cold, params_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fit_greedy_with_fused_qadam_smoke():
    """fit_greedy routes through make_train_step, which calls
    .fused_apply — the greedy path runs the kernel (stage prefixes below
    MIN_PALLAS_ELEMS take the jnp fallback with identical math)."""
    from dladmm_tpu.train.loop import fit_greedy
    from dladmm_tpu.utils.config import Config, ProblemConfig, TrainConfig

    cfg = Config(
        name="gq",
        problem=ProblemConfig(m=16, n=32, K=3),
        train=TrainConfig(
            batch=16, steps=12, eval_every=6, eval_batch=32,
            moment_dtype="int8_pallas",
        ),
    )
    params, hist = fit_greedy(cfg)
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_fit_general_b_with_fused_qadam_smoke():
    """General-B x moment_dtype='int8_pallas' (VERDICT r4 stretch #9):
    leaf shapes are generic, so the fused sweep composes with the
    general-constraint recurrence's manual VJP."""
    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.config import Config, ProblemConfig, TrainConfig

    cfg = Config(
        name="gbq",
        problem=ProblemConfig(m=16, n=32, K=3, identity_B=False, d=12),
        train=TrainConfig(
            batch=16, steps=6, eval_every=3, eval_batch=32,
            moment_dtype="int8_pallas",
        ),
    )
    params, hist = fit(cfg)
    assert np.isfinite(hist[-1]["nmse_db"])
    assert np.isfinite(hist[-1]["loss"])
