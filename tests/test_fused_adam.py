"""Fused Adam-in-backward (train/fused_adam.py) vs the optax chain.

The fused step must replicate optax.chain(delayed_clip_by_global_norm,
adam) exactly while the clip is not binding (both scales are the
constant 1.0), and to fp tolerance when it binds (the two paths
accumulate the global norm in different association orders / dtypes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.train.fused_adam import (
    make_fused_adam_state,
    make_fused_adam_step,
)
from dladmm_tpu.train.loop import (
    delayed_clip_by_global_norm,
    make_train_state,
    make_train_step_from_batch,
)

M, N, K, S = 24, 48, 5, 16
LR = 1e-3


def _setup(dtype=jnp.float32):
    key = jax.random.PRNGKey(3)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, M, N, dtype)
    params = init_dladmm_params(A, K=K, dtype=dtype)
    data = make_batch(kb, A, S, dtype=dtype)
    return A, params, data


def _opt(clip):
    return optax.chain(delayed_clip_by_global_norm(clip), optax.adam(LR))


def _run(step, state, data, steps=5):
    for _ in range(steps):
        state, loss = step(state, data)
    return state, loss


def test_fused_matches_optax_fp32_nonbinding_clip():
    """While the clip never binds both paths scale by exactly 1.0 and
    the optimizer math is op-for-op identical — params and moments
    match the optax chain to within compiler reassociation ulps (XLA
    fuses/FMAs the two differently-shaped programs differently; the
    first ~2 steps are typically bit-equal, then ulp noise compounds)."""
    A, params, data = _setup()
    clip = 1e9
    ref_step = make_train_step_from_batch(
        _opt(clip), A, vjp="manual", donate=False
    )
    ref_state, ref_loss = _run(
        ref_step, make_train_state(params, _opt(clip)), data
    )
    fused_step = make_fused_adam_step(
        A, lr=LR, clip_norm=clip, donate=False, from_batch=True
    )
    fused_state, fused_loss = _run(
        fused_step, make_fused_adam_state(params, clip), data
    )
    np.testing.assert_allclose(
        float(ref_loss), float(fused_loss), rtol=1e-6
    )
    for name, r, f in zip(
        ref_state.params._fields, ref_state.params, fused_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=2e-6, atol=3e-8,
            err_msg=name,
        )
    # Moments too (same grads -> same Adam state). optax.adam is itself
    # a chain (scale_by_adam, scale_by_learning_rate).
    ref_mu = ref_state.opt_state[1][0].mu
    for r, f in zip(ref_mu, fused_state.opt_state.mu):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=2e-6, atol=3e-9
        )


def test_fused_matches_optax_when_clip_binds():
    """With a binding clip the two norms differ only by accumulation
    order (fp32 reverse-per-layer vs optax leaf-order) — parity to fp
    tolerance."""
    A, params, data = _setup()
    clip = 1e-4
    ref_step = make_train_step_from_batch(
        _opt(clip), A, vjp="manual", donate=False
    )
    ref_state, _ = _run(ref_step, make_train_state(params, _opt(clip)), data)
    fused_step = make_fused_adam_step(
        A, lr=LR, clip_norm=clip, donate=False, from_batch=True
    )
    fused_state, _ = _run(
        fused_step, make_fused_adam_state(params, clip), data
    )
    # The clip actually bound (else this test is vacuous).
    assert float(fused_state.opt_state.prev_norm) > clip
    for name, r, f in zip(
        ref_state.params._fields, ref_state.params, fused_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=1e-5, atol=1e-8,
            err_msg=name,
        )


def test_fused_bf16_matches_optax():
    """Mixed precision: bf16 compute grads feed fp32 masters in both
    paths; the fp32 masters must agree tightly (the only deviation is
    the fp32-vs-bf16 norm accumulation, inert while the clip scale is
    1)."""
    A, params, data = _setup()
    clip = 1e9
    bf = jnp.bfloat16
    ref_step = make_train_step_from_batch(
        _opt(clip), A, vjp="manual", donate=False, compute_dtype=bf
    )
    ref_state, _ = _run(
        ref_step, make_train_state(params, _opt(clip), bf), data
    )
    fused_step = make_fused_adam_step(
        A, lr=LR, clip_norm=clip, donate=False, from_batch=True,
        compute_dtype=bf,
    )
    fused_state, _ = _run(
        fused_step, make_fused_adam_state(params, clip, bf), data
    )
    for name, r, f in zip(
        ref_state.params._fields, ref_state.params, fused_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=1e-5, atol=1e-7,
            err_msg=name,
        )
    assert fused_state.compute_params.W1.dtype == bf


def test_fused_deep_supervision_matches_xla_autodiff():
    """Trajectory loss: fused in-body cotangent folding vs XLA autodiff
    through the capture_trajectory scan (the unfused comparator)."""
    A, params, data = _setup()
    lw = jnp.full((K,), 1.0 / K, jnp.float32)
    ref_step = make_train_step_from_batch(
        optax.adam(LR), A, layer_weights=lw, vjp="xla", donate=False
    )
    ref_state, ref_loss = _run(
        ref_step, make_train_state(params, optax.adam(LR)), data, steps=3
    )
    fused_step = make_fused_adam_step(
        A, layer_weights=lw, lr=LR, donate=False, from_batch=True
    )
    fused_state, fused_loss = _run(
        fused_step, make_fused_adam_state(params), data, steps=3
    )
    np.testing.assert_allclose(
        float(ref_loss), float(fused_loss), rtol=1e-6
    )
    for name, r, f in zip(
        ref_state.params._fields, ref_state.params, fused_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=1e-5, atol=1e-8,
            err_msg=name,
        )


def test_fused_freeze_and_schedule():
    """freeze keeps fields at init exactly; a callable lr schedule is
    honored (step sizes shrink as the cosine decays)."""
    A, params, data = _setup()
    sched = optax.warmup_cosine_decay_schedule(0.0, LR, 2, 10)
    fused_step = make_fused_adam_step(
        A, lr=sched, freeze=("beta",), donate=False, from_batch=True
    )
    state, _ = _run(fused_step, make_fused_adam_state(params), data, steps=4)
    np.testing.assert_array_equal(
        np.asarray(state.params.beta), np.asarray(params.beta)
    )
    assert not np.allclose(np.asarray(state.params.W1), np.asarray(params.W1))
    assert int(state.opt_state.count) == 4


@pytest.mark.slow
def test_fit_fused_integration_and_validation():
    """fit(optimizer='fused_adam') trains end-to-end; invalid combos
    raise with actionable messages."""
    import dataclasses

    from dladmm_tpu.train.loop import fit
    from dladmm_tpu.utils.config import Config, ProblemConfig, TrainConfig

    cfg = Config(
        name="t",
        problem=ProblemConfig(m=M, n=N, K=K),
        train=TrainConfig(
            batch=S,
            steps=6,
            eval_every=6,
            eval_batch=S,
            lr=LR,
            clip_norm=1.0,
            clip_mode="delayed",
            optimizer="fused_adam",
            layer_loss="uniform",
        ),
    )
    params, history = fit(cfg)
    assert history and np.isfinite(history[-1]["nmse_db"])

    bad_clip = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, clip_mode="global")
    )
    with pytest.raises(ValueError, match="delayed"):
        fit(bad_clip)

    # General B composes with the fused optimizer (the core swaps in
    # the (x,z,lam,Ax,Bz) forward + B^T backward).
    gen_b = dataclasses.replace(
        cfg,
        problem=dataclasses.replace(
            cfg.problem, identity_B=False, d=M + 4
        ),
    )
    _, gh = fit(gen_b)
    assert gh and np.isfinite(gh[-1]["nmse_db"])


def test_fused_general_b_matches_optax():
    """General-B fused step vs the optax chain over the manual
    general-B VJP (dladmm_unroll_manual_general): same grads, same
    Adam math — parity to fp tolerance, d != m, final-layer loss."""
    d = M + 8
    key = jax.random.PRNGKey(7)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, M, N)
    B = make_dictionary(kB, M, d)
    params = init_dladmm_params(A, B, K=K)
    data = make_batch(kb, A, S, B=B)
    clip = 1e9

    ref_step = make_train_step_from_batch(
        _opt(clip), A, B=B, vjp="manual", donate=False
    )
    ref_state, ref_loss = _run(
        ref_step, make_train_state(params, _opt(clip)), data, steps=4
    )
    fused_step = make_fused_adam_step(
        A, lr=LR, clip_norm=clip, donate=False, from_batch=True, B=B
    )
    fused_state, fused_loss = _run(
        fused_step, make_fused_adam_state(params, clip), data, steps=4
    )
    np.testing.assert_allclose(
        float(ref_loss), float(fused_loss), rtol=1e-6
    )
    for name, r, f in zip(
        ref_state.params._fields, ref_state.params, fused_state.params
    ):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=2e-6, atol=3e-8,
            err_msg=name,
        )
    assert fused_state.params.W2.shape == (K, d, M)


def test_bwd_layer_skips_data_cotangents_without_acc():
    """The fused path calls bwd_layer with acc=None — the gA outer
    product (the only extra contraction on the identity-B path) must
    not be traced at all, not merely DCE'd later."""
    from dladmm_tpu.ops.reference import LayerParams
    from dladmm_tpu.ops.unroll_vjp import bwd_layer

    m, n, S_ = 8, 16, 4
    p = LayerParams(
        jnp.ones((n, m)), jnp.ones((m, m)), jnp.ones((n,)),
        jnp.ones((m,)), jnp.ones(()),
    )
    r = tuple(
        jnp.ones(s)
        for s in [(S_, m), (S_, m), (S_, m), (S_, n), (S_, m), (S_, m)]
    )
    cts = (
        jnp.ones((S_, n)), jnp.ones((S_, m)), jnp.ones((S_, m)),
        jnp.ones((S_, m)),
    )
    A = jnp.ones((m, n))
    b = jnp.ones((S_, m))
    acc = (jnp.zeros((m, n)), jnp.zeros((S_, m)))
    n_with = repr(
        jax.make_jaxpr(lambda: bwd_layer(p, r, cts, A, b, None, acc))()
    ).count("dot_general")
    n_without = repr(
        jax.make_jaxpr(lambda: bwd_layer(p, r, cts, A, b, None, None))()
    ).count("dot_general")
    assert n_with == 6 and n_without == 5, (n_with, n_without)


def test_clip_norm_zero_means_disabled():
    """clip_norm=0.0 is 'clipping disabled' everywhere else in the
    package; the fused path must match (not scale every update to 0,
    which would silently freeze training)."""
    A, params, data = _setup()
    step = make_fused_adam_step(
        A, S, lr=LR, clip_norm=0.0, from_batch=True, donate=False
    )
    state = make_fused_adam_state(params, clip_norm=0.0)
    state2, _ = step(state, data)
    deltas = [
        float(jnp.max(jnp.abs(p1 - p0)))
        for p0, p1 in zip(params, state2.params)
    ]
    assert max(deltas) > 0.0, "clip_norm=0.0 froze the parameters"

    # And it matches clip_norm=None bit-for-bit.
    step_none = make_fused_adam_step(
        A, S, lr=LR, clip_norm=None, from_batch=True, donate=False
    )
    state_none, _ = step_none(make_fused_adam_state(params), data)
    for pa, pb in zip(state2.params, state_none.params):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
