"""jit+optax training loop (SURVEY.md R2/N4).

Replaces the reference's DataLoader + torch.optim epoch loop (SURVEY.md
§3.1 "Training loop" row, §5.1): the entire per-batch body — on-device
synthetic data generation, K-layer scan forward, loss, backprop through the
unroll, and the Adam update — is ONE jit-compiled step with donated
params/opt-state, so the host only feeds a PRNG key per step.

Loss (SURVEY.md §2 point 6): supervised regression to ground truth,
final-layer MSE by default, optional deep supervision
sum_k gamma_k (||x_k - x*||^2 + ||z_k - e*||^2).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array

from dladmm_tpu.baselines.ladmm import ladmm_run
from dladmm_tpu.data.synthetic import make_batch
from dladmm_tpu.metrics.core import (
    constraint_residual,
    nmse_db,
    per_layer_nmse_db,
)
from dladmm_tpu.models.unroll import DLADMMParams, dladmm_forward


class TrainState(NamedTuple):
    params: DLADMMParams  # fp32 master parameters
    opt_state: Any
    step: Array
    # Persistent low-precision copy of params (mixed-precision training):
    # the loss/backward run on this, Adam updates the fp32 masters and
    # refreshes the copy in the same fused pass — avoiding the ~720 MB/
    # step fp32<->bf16 cast churn of re-casting inside the loss. None in
    # full-precision runs (and in old 3-field checkpoints).
    compute_params: Optional[DLADMMParams] = None


def resolve_prox(p):
    """ProblemConfig -> (prox_x, prox_z) callables, or None for the
    reference l1/l1 instantiation (which keeps the Pallas / manual-VJP
    fast paths). The single place config prox names become functions —
    fit() builds the general step_fn from it and evaluate() hands the
    same pair to the classical LADMM comparison curve."""
    from dladmm_tpu.ops.prox import get_prox, is_l1

    px = getattr(p, "prox_x", "l1")
    pz = getattr(p, "prox_z", "l1")
    rho = getattr(p, "prox_rho", 0.0)
    if is_l1(px, pz, rho):
        return None
    return get_prox(px, rho), get_prox(pz, rho)


def make_train_state(
    params: DLADMMParams,
    optimizer: optax.GradientTransformation,
    compute_dtype=None,
) -> TrainState:
    """Fresh TrainState; materializes the compute-precision param copy
    when compute_dtype is set (see TrainState.compute_params)."""
    cp = (
        None
        if compute_dtype is None
        else jax.tree.map(lambda v: v.astype(compute_dtype), params)
    )
    return TrainState(
        params, optimizer.init(params), jnp.zeros((), jnp.int32), cp
    )


def loss_fn(
    params: DLADMMParams,
    A: Array,
    b: Array,
    x_star: Array,
    z_star: Array,
    B: Optional[Array] = None,
    layer_weights: Optional[Array] = None,
    step_fn=None,
    forward_fn=None,
    compute_dtype=None,
    vjp: str = "auto",
) -> Array:
    """MSE to ground truth; final layer only, or gamma-weighted per layer.

    forward_fn (selected by models.api) replaces the scan entirely. Its
    CONTRACT DEPENDS ON THE LOSS: for the final-layer loss it returns the
    final state (x, z, lam); with layer_weights (deep supervision) it
    must return the STACKED per-layer trajectory (tx, tz, tlam) of shape
    (K, S, ·) — models.api.select_forward(need_trajectory=True) returns
    the trajectory megakernel, whose custom_vjp folds the per-layer
    cotangents into the shared reverse-scan backward
    (ops/unroll_vjp.py bwd_from_carries traj_cts).

    compute_dtype=jnp.bfloat16 runs the entire unroll in bf16 (master
    params stay fp32 in the optimizer; loss/grads accumulate fp32) —
    halves HBM state traffic on TPU. Quality impact measured in
    BASELINE.md.

    vjp: "auto" (default) uses the hand-written reverse-scan backward
    (ops/unroll_vjp.py — recomputes u/v/masks from the carry trajectory
    instead of storing them) whenever it applies: B = I, final-layer
    loss, default step. "xla" forces autodiff; "manual" asserts the
    manual path applies. Gradient parity is pinned by
    tests/test_unroll_vjp.py.
    """
    if compute_dtype is not None:
        cast = lambda t: jax.tree.map(
            lambda v: v.astype(compute_dtype)
            if jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            t,
        )
        params, A, b = cast(params), cast(A), cast(b)
        B = None if B is None else cast(B)
    manual_ok = (
        forward_fn is None and step_fn is None and layer_weights is None
    )
    if vjp == "manual" and not manual_ok:
        raise ValueError(
            "vjp='manual' needs the default step, no forward_fn, and the "
            "final-layer loss (no layer_weights)"
        )
    if vjp == "xla" and (forward_fn is not None or step_fn is not None):
        raise ValueError(
            "vjp='xla' with a custom forward_fn/step_fn would not give XLA "
            "autodiff: the megakernel/fused-step forwards carry custom_vjps "
            "that route to the manual backward anyway. Pass forward_fn="
            "step_fn=None (the pure-XLA scan) to force XLA autodiff."
        )
    if layer_weights is None:
        if forward_fn is not None:
            x, z, _ = forward_fn(params, A, b)
        elif manual_ok and vjp in ("auto", "manual"):
            from dladmm_tpu.ops.unroll_vjp import (
                dladmm_unroll_manual,
                dladmm_unroll_manual_general,
            )

            if B is None:
                x, z, _ = dladmm_unroll_manual(params, A, b)
            else:
                x, z, _ = dladmm_unroll_manual_general(params, A, B, b)
        else:
            x, z, _ = dladmm_forward(params, A, b, B=B, step_fn=step_fn)
        return jnp.mean((x - x_star) ** 2) + jnp.mean((z - z_star) ** 2)
    if forward_fn is not None:
        tx, tz, _ = forward_fn(params, A, b)
    elif B is not None and step_fn is None and vjp == "auto":
        # General-B deep supervision gets the manual reverse-scan
        # backward too (parity pinned in tests/test_unroll_vjp.py).
        from dladmm_tpu.ops.unroll_vjp import dladmm_traj_manual_general

        tx, tz, _ = dladmm_traj_manual_general(params, A, B, b)
    else:
        _, (tx, tz, _) = dladmm_forward(
            params, A, b, B=B, capture_trajectory=True, step_fn=step_fn
        )
    return weighted_trajectory_mse(tx, tz, x_star, z_star, layer_weights)


def weighted_trajectory_mse(tx, tz, x_tgt, z_tgt, layer_weights):
    """THE deep-supervision objective on stacked (K, S, ·) trajectories:
    per-layer MSE of both streams, gamma_k-weighted sum. The single
    implementation of the trajectory-loss semantics — loss_fn above and
    run_denoise.py's reconstruction loss both route here (VERDICT r2
    #7), so the contract the parity tests pin cannot drift. Targets of
    shape (S, ·) broadcast over the K axis."""
    per_layer = jnp.mean((tx - x_tgt) ** 2, axis=(1, 2)) + jnp.mean(
        (tz - z_tgt) ** 2, axis=(1, 2)
    )
    return jnp.sum(layer_weights * per_layer)


def make_train_step(
    optimizer: optax.GradientTransformation,
    A: Array,
    batch: int,
    sparsity_x: float = 0.1,
    sparsity_e: float = 0.1,
    B: Optional[Array] = None,
    layer_weights: Optional[Array] = None,
    step_fn=None,
    forward_fn=None,
    donate: bool = True,
    compute_dtype=None,
    freeze: tuple = (),
    vjp: str = "auto",
    accum_steps: int = 1,
    nonneg_x: bool = False,
) -> Callable[[TrainState, jax.Array], tuple]:
    """Build the fully fused train step: key -> data -> grad -> update.

    With donate=True (default) params and optimizer state are updated in
    place on device — callers must not reuse the passed-in state's
    buffers afterwards.

    freeze: field names of DLADMMParams to keep at init (e.g. ("beta",)
    for the paper's fixed-penalty variant — SURVEY.md §10 Q4).

    With compute_dtype set, build the state via make_train_state(...,
    compute_dtype=...) so the persistent low-precision param copy exists:
    the loss/backward then run on state.compute_params directly (no
    per-step fp32->bf16 re-cast of the stacked weights), the low-
    precision grads feed Adam's fp32 masters through per-op promotion,
    and the copy is refreshed in the same fused pass.

    accum_steps > 1: gradient accumulation — `batch` stays the EFFECTIVE
    per-update batch; each update scans accum_steps microbatches of
    batch/accum_steps rows (fresh PRNG fold each), accumulating fp32
    grads. Activations/trajectory stacks exist for ONE microbatch at a
    time, so effective batches that exceed HBM become trainable; the
    update math is the same global-mean gradient.
    """
    if accum_steps < 1 or batch % accum_steps:
        raise ValueError(
            f"accum_steps={accum_steps} must divide batch={batch}"
        )
    micro = batch // accum_steps
    A_c = A if compute_dtype is None else A.astype(compute_dtype)
    B_c = (
        B if B is None or compute_dtype is None else B.astype(compute_dtype)
    )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, key: jax.Array):
        if compute_dtype is None and state.compute_params is not None:
            raise ValueError(
                "state carries compute_params but the step was built "
                "without compute_dtype — build both from the same config "
                "(make_train_state(..., compute_dtype=...) pairs with "
                "make_train_step(..., compute_dtype=...))"
            )

        def micro_grad(k):
            data = make_batch(
                k, A, micro, sparsity_x, sparsity_e, A.dtype, B, nonneg_x
            )
            if compute_dtype is not None and state.compute_params is not None:
                return jax.value_and_grad(loss_fn)(
                    state.compute_params,
                    A_c,
                    data.b.astype(compute_dtype),
                    data.x_star,
                    data.e_star,
                    B_c,
                    layer_weights,
                    step_fn,
                    forward_fn,
                    None,  # inputs already in compute dtype
                    vjp,
                )
            return jax.value_and_grad(loss_fn)(
                state.params,
                A,
                data.b,
                data.x_star,
                data.e_star,
                B,
                layer_weights,
                step_fn,
                forward_fn,
                compute_dtype,
                vjp,
            )

        if accum_steps == 1:
            loss, grads = micro_grad(key)
        else:
            # fp32 accumulators (bf16 microbatch grads promote on add).
            def body(carry, k):
                l, g = micro_grad(k)
                cl, cg = carry
                return (
                    cl + l.astype(jnp.float32),
                    jax.tree.map(
                        lambda a, b_: a + b_.astype(a.dtype), cg, g
                    ),
                ), None

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree.map(jnp.zeros_like, state.params),
            )
            (ls, gs), _ = jax.lax.scan(
                body, init, jax.random.split(key, accum_steps)
            )
            loss = ls / accum_steps
            grads = jax.tree.map(lambda v: v / accum_steps, gs)
        if freeze:
            grads = type(grads)(
                *(
                    jnp.zeros_like(g) if name in freeze else g
                    for name, g in zip(grads._fields, grads)
                )
            )
        if hasattr(optimizer, "fused_apply"):
            params, opt_state, cp = optimizer.fused_apply(
                grads,
                state.opt_state,
                state.params,
                compute_dtype
                if state.compute_params is not None
                else None,
            )
        else:
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            cp = (
                None
                if state.compute_params is None
                else jax.tree.map(
                    lambda v: v.astype(compute_dtype), params
                )
            )
        return TrainState(params, opt_state, state.step + 1, cp), loss

    return train_step


def make_train_step_from_batch(
    optimizer: optax.GradientTransformation,
    A: Array,
    B: Optional[Array] = None,
    layer_weights: Optional[Array] = None,
    step_fn=None,
    forward_fn=None,
    donate: bool = True,
    vjp: str = "auto",
    compute_dtype=None,
    accum_steps: int = 1,
) -> Callable[[TrainState, Any], tuple]:
    """Train step fed an explicit SyntheticBatch (for sharded/multi-host
    runs where the batch is built host-locally and device_put with a
    'data'-axis sharding — SURVEY.md §5.5; also the step bench.py and
    bench/profile_step.py measure, so the benchmarked step IS the
    shipped one).

    compute_dtype follows make_train_step's mixed-precision design:
    build the state with make_train_state(..., compute_dtype=...) and
    the loss/backward run on the persistent low-precision copy.

    accum_steps > 1 splits the provided batch's rows into accum_steps
    equal microbatches and accumulates fp32 grads over a scan — the
    EXACT global-mean gradient of the full batch (equal chunks: mean of
    chunk means = global mean), with activations for one microbatch at
    a time. Parity is pinned by tests/test_training.py.
    """
    A_c = A if compute_dtype is None else A.astype(compute_dtype)
    B_c = (
        B if B is None or compute_dtype is None else B.astype(compute_dtype)
    )

    def _grad(state: TrainState, data):
        if compute_dtype is not None and state.compute_params is not None:
            return jax.value_and_grad(loss_fn)(
                state.compute_params,
                A_c,
                data.b.astype(compute_dtype),
                data.x_star,
                data.e_star,
                B_c,
                layer_weights,
                step_fn,
                forward_fn,
                None,
                vjp,
            )
        return jax.value_and_grad(loss_fn)(
            state.params,
            A,
            data.b,
            data.x_star,
            data.e_star,
            B,
            layer_weights,
            step_fn,
            forward_fn,
            compute_dtype,
            vjp,
        )

    def _step(state: TrainState, data):
        if compute_dtype is None and state.compute_params is not None:
            raise ValueError(
                "state carries compute_params but the step was built "
                "without compute_dtype (see make_train_step)"
            )
        if accum_steps == 1:
            loss, grads = _grad(state, data)
        else:
            S = data.b.shape[0]
            if S % accum_steps:
                raise ValueError(
                    f"accum_steps={accum_steps} must divide the batch "
                    f"rows ({S})"
                )
            chunks = jax.tree.map(
                lambda v: v.reshape(
                    accum_steps, S // accum_steps, *v.shape[1:]
                ),
                data,
            )

            def body(carry, chunk):
                l, g = _grad(state, chunk)
                cl, cg = carry
                return (
                    cl + l.astype(jnp.float32),
                    jax.tree.map(
                        lambda a, b_: a + b_.astype(a.dtype), cg, g
                    ),
                ), None

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree.map(jnp.zeros_like, state.params),
            )
            (ls, gs), _ = jax.lax.scan(body, init, chunks)
            loss = ls / accum_steps
            grads = jax.tree.map(lambda v: v / accum_steps, gs)
        if hasattr(optimizer, "fused_apply"):
            params, opt_state, cp = optimizer.fused_apply(
                grads,
                state.opt_state,
                state.params,
                compute_dtype
                if state.compute_params is not None
                else None,
            )
        else:
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            cp = (
                None
                if state.compute_params is None
                else jax.tree.map(
                    lambda v: v.astype(compute_dtype), params
                )
            )
        return TrainState(params, opt_state, state.step + 1, cp), loss

    return jax.jit(_step, donate_argnums=(0,) if donate else ())


@functools.partial(
    jax.jit,
    static_argnames=("ladmm_iters", "step_fn", "prox_x", "prox_z"),
)
def _eval_jit(
    params, A, b, x_star, z_star, B, ladmm_iters, step_fn, prox_x, prox_z
):
    (x, z, _), (tx, tz, _) = dladmm_forward(
        params, A, b, B=B, capture_trajectory=True, step_fn=step_fn
    )
    curve = per_layer_nmse_db(tx, x_star)
    # The classical comparison curve runs the SAME prox pair as the net
    # (ops/prox.py), so general-prox configs are judged like-for-like.
    (_, _, _), (lx, _, _) = ladmm_run(
        A,
        b,
        B=B,
        iters=ladmm_iters,
        capture_trajectory=True,
        prox_x=prox_x,
        prox_z=prox_z,
    )
    ladmm_curve = per_layer_nmse_db(lx, x_star)
    return {
        "nmse_db": nmse_db(x, x_star),
        "nmse_db_z": nmse_db(z, z_star),
        "residual": constraint_residual(A, b, x, z, B),
        "nmse_curve_db": curve,
        "ladmm_curve_db": ladmm_curve,
    }


def evaluate(
    params: DLADMMParams,
    A: Array,
    data,
    B: Optional[Array] = None,
    ladmm_iters: Optional[int] = None,
    step_fn=None,
    prox_x=None,
    prox_z=None,
):
    """NMSE(dB)/residual at the final layer + NMSE-vs-layer curves for the
    learned net and the classical LADMM baseline (SURVEY.md §5.3).

    prox_x/prox_z (None = l1) select the classical baseline's proximal
    operators; pass the same pair whose step_fn drives the net so the
    comparison curve solves the same problem."""
    K = params.W1.shape[0]
    out = _eval_jit(
        params,
        A,
        data.b,
        data.x_star,
        data.e_star,
        B,
        ladmm_iters or K,
        step_fn,
        prox_x,
        prox_z,
    )
    return jax.tree.map(lambda v: jax.device_get(v), out)


def _layer_weights(layer_loss, K: int, dtype):
    """Deep-supervision weight schedules (SURVEY.md §2 pt 6 gamma_k):
    "uniform" = 1/K each; "linear" = gamma_k ∝ k (final-heavy ramp —
    later layers' errors weighted more, the final layer K/Σk). None =
    final-layer-only loss. Measured comparison in BASELINE.md."""
    if layer_loss is None:
        return None
    if layer_loss == "uniform":
        return jnp.full((K,), 1.0 / K, dtype)
    if layer_loss == "linear":
        w = jnp.arange(1, K + 1, dtype=dtype)
        return w / jnp.sum(w)
    raise ValueError(
        f"layer_loss must be None|'uniform'|'linear', got {layer_loss!r}"
    )


class DelayedClipState(NamedTuple):
    prev_norm: Array  # fp32 scalar; = max_norm before the first step


def delayed_clip_by_global_norm(
    max_norm: float,
) -> optax.GradientTransformation:
    """Global-norm clipping with a one-step-delayed norm (VERDICT r2 #4).

    optax.clip_by_global_norm makes the optimizer two-pass over the
    gradient tree: the scale depends on the full norm, so XLA must
    materialize every grad leaf, reduce, THEN re-read every leaf to
    scale before Adam. Scaling step i by step i-1's norm breaks that
    dependency: the norm reduction and the (scale + Adam) sweep touch
    each leaf once in the same fused pass — the norm only feeds the
    NEXT step's scale, carried as optimizer state. Gradient norms drift
    slowly between adjacent steps, so the clip still bounds the same
    explosions; step 0 is unclipped (prev norm initialized to max_norm,
    so its scale is exactly 1), which composes harmlessly with the
    presets' warmup-from-0 lr schedules. Quality parity at both
    synthetic shapes is measured in BASELINE.md."""

    def init_fn(params):
        del params
        return DelayedClipState(jnp.asarray(max_norm, jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        cur = optax.global_norm(updates).astype(jnp.float32)
        scale = jnp.minimum(
            1.0, max_norm / jnp.maximum(state.prev_norm, 1e-16)
        )
        updates = jax.tree.map(
            lambda g: g * scale.astype(g.dtype), updates
        )
        return updates, DelayedClipState(cur)

    return optax.GradientTransformation(init_fn, update_fn)


def _lr_of(t):
    """The TrainConfig's learning rate: a float, or the warmup+cosine
    optax schedule — shared by _build_optimizer and the fused-Adam step
    (train/fused_adam.py) so both optimizers see identical lr(step)."""
    if t.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, t.lr, max(1, t.steps // 20), t.steps
        )
    return t.lr


def _build_optimizer(t) -> optax.GradientTransformation:
    """Adam + the TrainConfig's lr schedule and gradient clipping —
    shared by fit and fit_sharded so sharded runs get the same
    stability treatment (clip_norm exists because long runs can go
    spectrally unstable — utils/config.py). clip_mode selects exact
    ("global") vs one-step-delayed ("delayed") norm clipping.
    moment_dtype shrinks the STORED Adam moments (train/qmoments.py) —
    update math stays fp32 either way."""
    md = getattr(t, "moment_dtype", "float32")
    if md.endswith("_pallas"):
        # Fused one-HBM-pass Adam sweep kernel (train/qadam_pallas.py):
        # owns its (exact, scalar-pass) global clip, so no optax clip
        # transform is chained around it.
        from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

        if (
            getattr(t, "clip_norm", None)
            and getattr(t, "clip_mode", "global") != "global"
        ):
            # Only when clipping is actually requested: a leftover
            # clip_mode with clip_norm=None is a no-op, not an error
            # (ADVICE r4 #3).
            raise ValueError(
                "moment_dtype='*_pallas' implements exact global "
                "clipping inside the fused sweep; clip_mode must be "
                "'global'"
            )
        return QAdamFusedPallas(
            _lr_of(t),
            moment_fmt=md[: -len("_pallas")],
            clip_norm=getattr(t, "clip_norm", None),
        )
    if md == "float32":
        optimizer = optax.adam(_lr_of(t))
    else:
        from dladmm_tpu.train.qmoments import adam_qmoments

        optimizer = adam_qmoments(_lr_of(t), moment_dtype=md)
    clip = getattr(t, "clip_norm", None)
    if clip:
        mode = getattr(t, "clip_mode", "global")
        if mode == "delayed":
            clipper = delayed_clip_by_global_norm(clip)
        elif mode == "global":
            clipper = optax.clip_by_global_norm(clip)
        else:
            raise ValueError(
                f"clip_mode must be 'global' or 'delayed', got {mode!r}"
            )
        optimizer = optax.chain(clipper, optimizer)
    return optimizer


def fit(
    config,
    A: Optional[Array] = None,
    log_fn=None,
    step_fn=None,
    forward_fn=None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    init_params: Optional[DLADMMParams] = None,
):
    """Train a D-LADMM net per config; returns (params, history).

    Equivalent of the reference synthetic experiment script's main
    (SURVEY.md §5.1) — one call trains and periodically evaluates.
    With ckpt_dir, checkpoints params+opt_state+step at every eval;
    resume=True continues from the latest step_N found there.
    init_params warm-starts from an existing net instead of the LADMM
    init (fit_greedy's fine-tune pass uses this).
    """
    from dladmm_tpu.models.unroll import init_dladmm_params

    p, t = config.problem, config.train
    from dladmm_tpu.data.synthetic import seed_keys

    _, k_eval, k_train = seed_keys(config)
    dtype = jnp.dtype(t.dtype)
    # One shared derivation of the fixed matrices (identity_B fast path:
    # B is None — SURVEY.md §2 point 4; general B: b = A x* + B z* and
    # the whole train/eval path runs the general recurrence).
    from dladmm_tpu.data.synthetic import problem_matrices

    A, B = problem_matrices(config, A)

    params = (
        init_params
        if init_params is not None
        else init_dladmm_params(A, B, K=p.K, beta=p.beta, dtype=dtype)
    )
    layer_weights = _layer_weights(t.layer_loss, p.K, dtype)

    # General proximal operators (ops/prox.py): swap the layer step's
    # nonlinearity, keep everything else — the LADMM-exact init, loss,
    # optimizer, and eval are prox-agnostic. Routes through the XLA scan
    # + autodiff (loss_fn treats any custom step_fn that way).
    prox = resolve_prox(p)
    nonneg_x = getattr(p, "nonneg_x", False)
    prox_x_fn = prox_z_fn = None
    if prox is not None:
        if step_fn is not None or forward_fn is not None:
            raise ValueError(
                "general-prox configs own the layer step (ops/reference."
                "make_cached_step); pass step_fn=forward_fn=None"
            )
        if getattr(t, "optimizer", "adam") == "fused_adam":
            raise ValueError(
                "optimizer='fused_adam' hand-writes the l1 backward; "
                "general-prox configs use optimizer='adam'"
            )
        if getattr(t, "vjp", "auto") != "auto":
            raise ValueError(
                "general-prox configs route through XLA autodiff "
                "automatically; leave vjp='auto'"
            )
        from dladmm_tpu.ops.reference import make_cached_step

        prox_x_fn, prox_z_fn = prox
        step_fn = make_cached_step(prox_x_fn, prox_z_fn)

    compute_dtype = (
        jnp.bfloat16 if t.compute_dtype == "bfloat16" else None
    )
    if getattr(t, "optimizer", "adam") == "fused_adam":
        # Adam applied per layer inside the reverse-scan backward
        # (train/fused_adam.py); same lr schedule/clip semantics as the
        # optax chain with clip_mode="delayed". General B composes (the
        # core swaps in the (x,z,lam,Ax,Bz) forward + Bᵀ backward).
        if step_fn is not None or forward_fn is not None:
            raise ValueError(
                "optimizer='fused_adam' owns the forward (XLA scan) — "
                "pass step_fn=forward_fn=None"
            )
        if t.clip_norm and getattr(t, "clip_mode", "global") != "delayed":
            raise ValueError(
                "optimizer='fused_adam' needs clip_mode='delayed' (or "
                "clip_norm=None): exact global clipping is two-pass and "
                "cannot run inside the backward sweep"
            )
        if getattr(t, "vjp", "auto") == "xla":
            raise ValueError(
                "optimizer='fused_adam' IS a manual-backward step; "
                "vjp='xla' contradicts it (use optimizer='adam')"
            )
        if getattr(t, "accum_steps", 1) != 1:
            raise ValueError(
                "optimizer='fused_adam' applies the update INSIDE the "
                "backward of one batch — gradient accumulation does not "
                "compose; use optimizer='adam' with accum_steps"
            )
        if getattr(t, "moment_dtype", "float32") != "float32":
            raise ValueError(
                "optimizer='fused_adam' owns its (fp32) moment buffers; "
                "moment_dtype applies to optimizer='adam'"
            )
        if nonneg_x:
            raise ValueError(
                "nonneg_x pairs with prox_x='nonneg_l1', which "
                "optimizer='fused_adam' does not cover (l1-only manual "
                "backward); use optimizer='adam'"
            )
        from dladmm_tpu.train.fused_adam import (
            make_fused_adam_state,
            make_fused_adam_step,
        )

        train_step = make_fused_adam_step(
            A,
            t.batch,
            p.sparsity_x,
            p.sparsity_e,
            layer_weights,
            _lr_of(t),
            clip_norm=t.clip_norm,
            compute_dtype=compute_dtype,
            freeze=tuple(t.freeze),
            B=B,
        )
        state = make_fused_adam_state(params, t.clip_norm, compute_dtype)
    else:
        optimizer = _build_optimizer(t)
        train_step = make_train_step(
            optimizer,
            A,
            t.batch,
            p.sparsity_x,
            p.sparsity_e,
            B,
            layer_weights,
            step_fn,
            forward_fn,
            compute_dtype=compute_dtype,
            freeze=tuple(t.freeze),
            vjp=getattr(t, "vjp", "auto"),
            accum_steps=getattr(t, "accum_steps", 1),
            nonneg_x=nonneg_x,
        )
        state = make_train_state(params, optimizer, compute_dtype)
    eval_data = make_batch(
        k_eval, A, t.eval_batch, p.sparsity_x, p.sparsity_e, dtype, B,
        nonneg_x,
    )

    start = 0
    if ckpt_dir:
        from dladmm_tpu.utils.checkpoint import (
            latest_step_dir,
            restore_checkpoint,
            save_checkpoint,
        )

        if resume:
            latest = latest_step_dir(ckpt_dir)
            if latest is not None:
                # Checkpoints hold the 3 canonical fields only (the
                # compute-precision copy is derivable; stripping it also
                # keeps old 3-field checkpoints restorable).
                restored = restore_checkpoint(
                    latest, state._replace(compute_params=None)
                )
                cp = (
                    None
                    if compute_dtype is None
                    else jax.tree.map(
                        lambda v: v.astype(compute_dtype), restored.params
                    )
                )
                state = restored._replace(compute_params=cp)
                start = int(state.step)

    history = []
    for i in range(start, t.steps):
        # Deterministic per-step key: resume reproduces the cold run.
        sub = jax.random.fold_in(k_train, i)
        state, loss = train_step(state, sub)
        if (i + 1) % t.eval_every == 0 or i + 1 == t.steps:
            ev = evaluate(
                state.params,
                A,
                eval_data,
                B,
                step_fn=step_fn,
                prox_x=prox_x_fn,
                prox_z=prox_z_fn,
            )
            rec = {
                "step": i + 1,
                "loss": float(loss),
                "nmse_db": float(ev["nmse_db"]),
                "residual": float(ev["residual"]),
            }
            history.append({**rec, "curves": ev})
            if log_fn:
                log_fn(rec)
            if ckpt_dir:
                save_checkpoint(
                    ckpt_dir,
                    state._replace(compute_params=None),
                    step=i + 1,
                )
    if not history:
        # Resumed at (or past) the final step: report the restored
        # model's metrics instead of returning an empty history.
        ev = evaluate(
            state.params,
            A,
            eval_data,
            B,
            step_fn=step_fn,
            prox_x=prox_x_fn,
            prox_z=prox_z_fn,
        )
        rec = {
            "step": int(state.step),
            "loss": float("nan"),
            "nmse_db": float(ev["nmse_db"]),
            "residual": float(ev["residual"]),
        }
        history.append({**rec, "curves": ev})
        if log_fn:
            log_fn(rec)
    return state.params, history


def fit_greedy(
    config,
    A: Optional[Array] = None,
    log_fn=None,
    steps_per_stage: Optional[int] = None,
    finetune_steps: Optional[int] = None,
):
    """GREEDY layer-wise training — the alternative answer to
    SURVEY.md §10 Q5 ("does the reference train per-layer greedily or
    end-to-end only?"; the mount stayed empty, so both schedules are
    provided — end-to-end is fit()).

    Stage k trains the k-layer PREFIX end-to-end with the loss at layer
    k, warm-starting from stage k-1's trained prefix; layers > k keep
    their LADMM init (untied stacked params make prefix slicing exact).
    An optional end-to-end fine-tune follows. Defaults split the
    config's step budget half into K stages, half into the fine-tune, so
    fit_greedy(cfg) and fit(cfg) consume comparable compute.

    Measured comparison at the benchmark shapes is in BASELINE.md —
    end-to-end with deep supervision remains the default recipe.
    """
    from dladmm_tpu.models.unroll import init_dladmm_params

    p, t = config.problem, config.train
    if not getattr(p, "identity_B", True):
        raise ValueError(
            "fit_greedy supports the identity-B benchmarks only; train "
            "general-B configs end-to-end via fit() (run.py without "
            "--greedy)"
        )
    if getattr(t, "accum_steps", 1) != 1:
        raise ValueError(
            "fit_greedy does not support gradient accumulation; use the "
            "end-to-end fit()"
        )
    if resolve_prox(p) is not None or getattr(p, "nonneg_x", False):
        raise ValueError(
            "fit_greedy supports the l1/l1 reference instantiation only "
            "(its stage losses use the l1 fast paths); train general-prox "
            "configs end-to-end via fit()"
        )
    from dladmm_tpu.data.synthetic import seed_keys

    _, k_eval, k_train = seed_keys(config)
    dtype = jnp.dtype(t.dtype)
    from dladmm_tpu.data.synthetic import problem_matrices

    A, _ = problem_matrices(config, A)

    params = init_dladmm_params(A, K=p.K, beta=p.beta, dtype=dtype)
    per_stage = steps_per_stage or max(1, t.steps // (2 * p.K))
    ft_steps = (
        finetune_steps
        if finetune_steps is not None
        else max(0, t.steps - per_stage * p.K)
    )
    import dataclasses

    # Each stage is short; use a constant lr (the cosine schedule's
    # horizon is meaningless per-stage) and keep clipping.
    optimizer = _build_optimizer(dataclasses.replace(t, lr_schedule=None))

    # Honor the config's kernel/vjp/precision the same way run.py + fit
    # do (greedy previously trained fp32 XLA regardless — advisor r2):
    # stages use the FINAL-STATE selection (each stage's loss is at its
    # last layer); the fine-tune pass re-selects with the trajectory
    # contract iff t.layer_loss is set.
    from dladmm_tpu.models.api import select_forward

    vjp = getattr(t, "vjp", "auto")
    compute_dtype = jnp.bfloat16 if t.compute_dtype == "bfloat16" else None
    if vjp in ("manual", "xla"):
        stage_fwd = stage_step = None
    else:
        stage_fwd, stage_step, _ = select_forward(
            p.m, p.n, p.m, t.batch, kernel=t.kernel
        )

    history = []
    for k in range(1, p.K + 1):
        prefix = jax.tree.map(lambda v: v[:k], params)
        step_fn = make_train_step(
            optimizer,
            A,
            t.batch,
            p.sparsity_x,
            p.sparsity_e,
            step_fn=stage_step,
            forward_fn=stage_fwd,
            compute_dtype=compute_dtype,
            freeze=tuple(t.freeze),
            vjp=vjp,
            # donate=False: the k=K prefix ALIASES the full param
            # buffers (v[:K] is the whole array) — donating the state
            # would delete the stack we write the stage back into.
            donate=False,
        )
        state = make_train_state(prefix, optimizer, compute_dtype)
        for i in range(per_stage):
            sub = jax.random.fold_in(k_train, k * 1_000_000 + i)
            state, loss = step_fn(state, sub)
        params = jax.tree.map(
            lambda full, pre: full.at[: pre.shape[0]].set(pre),
            params,
            state.params,
        )
        rec = {"stage": k, "loss": float(loss), "steps": per_stage}
        history.append(rec)
        if log_fn:
            log_fn(rec)

    if ft_steps:
        ft_fwd = ft_step = None
        if vjp not in ("manual", "xla"):
            ft_fwd, ft_step, _ = select_forward(
                p.m, p.n, p.m, t.batch,
                kernel=t.kernel,
                need_trajectory=t.layer_loss is not None,
            )
        ft_cfg = dataclasses.replace(
            config,
            train=dataclasses.replace(t, steps=ft_steps),
        )
        params, ft_hist = fit(
            ft_cfg,
            A=A,
            log_fn=log_fn,
            step_fn=ft_step,
            forward_fn=ft_fwd,
            init_params=params,
        )
        history.extend(ft_hist)
    else:
        eval_data = make_batch(
            k_eval, A, t.eval_batch, p.sparsity_x, p.sparsity_e, dtype
        )
        ev = evaluate(params, A, eval_data)
        rec = {
            "step": per_stage * p.K,
            "loss": float("nan"),
            "nmse_db": float(ev["nmse_db"]),
            "residual": float(ev["residual"]),
            "curves": ev,
        }
        history.append(rec)
        if log_fn:
            log_fn({k_: v for k_, v in rec.items() if k_ != "curves"})
    return params, history


def fit_sharded(
    config,
    A: Optional[Array] = None,
    log_fn=None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    hbm_bytes: Optional[float] = None,
):
    """Sharded training per config.sharding on a DP x TP ('data','model')
    mesh. Multi-host when config.sharding.multihost (SURVEY.md §5.5).

    Two step implementations (parallel/collectives.py):
      * model_axis == 1 — DP fast path: the full single-chip perf stack
        (manual VJP, Pallas kernels, persistent-bf16 mixed precision)
        runs per-shard inside shard_map; only collective is the
        loss/grad psum over 'data'. General-B configs (identity_B=False)
        shard this way too — the per-shard loss routes through the
        general-B manual reverse-scan VJP and eval uses make_dp_eval's
        general forward (TP layouts remain identity-B-only).
      * model_axis > 1 — explicit-collective TP step; the weight layout
        is config.sharding.layout ("sharded_w2" default — fits the
        tp_large acceptance shape; see parallel/memory.py, which audits
        the per-chip footprint BEFORE anything is allocated).

    Composes the TrainConfig feature set (VERDICT r1 #2): bf16 compute
    with fp32 masters + persistent sharded copy, deep supervision
    (layer_loss), freeze, lr schedule + clipping; kernel/vjp selection
    applies on the DP fast path (TP forwards are the explicit-collective
    scan — kernel/vjp must stay "auto" there).

    Evaluation emits the full per-layer NMSE curve (gather-free
    psum-of-local-sums — VERDICT r1 #6) plus the classical-LADMM curve
    (= the untrained LADMM-init net, tests/test_ladmm_equivalence.py).

    With ckpt_dir, checkpoints sharded params+opt_state+step at every
    eval via orbax (single writer per shard); resume=True continues from
    the latest step_N, restoring directly into the sharded layout.

    Returns (params, history) with params left sharded on the mesh.
    """
    from jax.sharding import NamedSharding

    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.parallel import mesh as pmesh
    from dladmm_tpu.parallel.collectives import (
        B_SPEC,
        X_SPEC,
        Z_SPEC,
        make_dp_eval,
        make_dp_train_step,
        make_sharded_eval,
        make_sharded_train_step,
    )
    from dladmm_tpu.parallel.memory import audit_or_raise, detect_hbm_bytes
    from dladmm_tpu.parallel.multihost import (
        host_local_batch,
        initialize_distributed,
        make_multihost_mesh,
    )

    p, t, s = config.problem, config.train, config.sharding
    if resolve_prox(p) is not None or getattr(p, "nonneg_x", False):
        raise ValueError(
            "fit_sharded covers the l1/l1 instantiation only (the "
            "per-shard fast paths and TP collective algebra are "
            "l1-specialized); train general-prox configs single-device "
            "via fit()"
        )
    general_b = not getattr(p, "identity_B", True)
    if general_b and s.model_axis > 1:
        raise ValueError(
            "general-B configs shard over 'data' only (the TP collective "
            "layouts assume the z stream lives in R^m — "
            "parallel/collectives.py); use model_axis=1, or identity_B "
            "for tensor parallelism"
        )
    if general_b and t.kernel != "auto":
        raise ValueError(
            "general-B training runs the XLA-scan forward + manual "
            f"general-B reverse-scan VJP; kernel={t.kernel!r} does not "
            "apply (the Pallas kernels specialize to the benchmark "
            "B = I). Leave kernel='auto'."
        )
    layout = getattr(s, "layout", "sharded_w2")
    vjp = getattr(t, "vjp", "auto")
    compute_dtype = jnp.bfloat16 if t.compute_dtype == "bfloat16" else None
    fused = getattr(t, "optimizer", "adam") == "fused_adam"
    if fused:
        if s.model_axis > 1:
            raise ValueError(
                "optimizer='fused_adam' shards over 'data' only: the TP "
                "step's weights live sharded over 'model', but the fused "
                "reverse scan applies Adam to the full layer slice. Use "
                "optimizer='adam' with model_axis > 1."
            )
        if t.clip_norm and getattr(t, "clip_mode", "global") != "delayed":
            raise ValueError(
                "optimizer='fused_adam' needs clip_mode='delayed' (or "
                "clip_norm=None): exact global clipping is two-pass and "
                "cannot run inside the backward sweep"
            )
        if t.kernel != "auto":
            raise ValueError(
                "optimizer='fused_adam' uses the XLA-scan forward; "
                f"kernel={t.kernel!r} does not apply (leave it 'auto')"
            )
        if vjp == "xla":
            raise ValueError(
                "optimizer='fused_adam' IS a manual-backward step; "
                "vjp='xla' contradicts it (use optimizer='adam')"
            )
    if getattr(t, "accum_steps", 1) != 1:
        raise ValueError(
            "accum_steps > 1 is the single-device fit()'s HBM lever; on "
            "a mesh, raise data_axis (more batch shards) instead"
        )
    zero1 = getattr(s, "zero1", False)
    if zero1:
        if s.model_axis > 1:
            raise ValueError(
                "zero1 (cross-replica weight-update sharding) shards the "
                "optimizer over 'data'; with model_axis > 1 the TP layout "
                "already shards weights AND moments over 'model' "
                "(layout='sharded_w2') — use that instead"
            )
        if fused:
            raise ValueError(
                "zero1 and optimizer='fused_adam' both restructure the "
                "update and do not compose: fused applies Adam inside "
                "the reverse scan (replicated moments), zero1 shards the "
                "post-backward update. Pick one."
            )
        if t.clip_norm and getattr(t, "clip_mode", "global") == "delayed":
            raise ValueError(
                "zero1's reduce-scatter makes the EXACT global-norm clip "
                "single-pass — clip_mode='delayed' would be a strictly "
                "worse approximation here; use clip_mode='global'"
            )
    if s.model_axis > 1:
        bad = {
            k: v
            for k, v in {"kernel": t.kernel, "vjp": vjp}.items()
            if v != "auto"
        }
        if bad:
            raise ValueError(
                f"TrainConfig fields {sorted(bad)} have no effect with "
                f"model_axis={s.model_axis}: the TP forward is the "
                "explicit-collective scan (parallel/collectives.py), not "
                "a kernel/vjp-selectable single-chip path. Leave them "
                '"auto" (they apply on DP-only meshes).'
            )
        md = getattr(t, "moment_dtype", "float32")
        if md.endswith("_pallas") or md == "int8":
            # TP's optimizer update runs under GSPMD with the Adam
            # moments inheriting the W1/W2 shards — which requires
            # PARAM-SHAPED moment leaves. int8's QTensor state is
            # (nblocks, 256)+(nblocks,) shaped (no W2 axis for GSPMD to
            # shard along), and the fused pallas sweep cannot partition
            # a pallas_call across model shards. float32/bfloat16/
            # bfloat16_sr moments are param-shaped and compose
            # (tests/test_distributed.py pins TP x bfloat16_sr parity).
            raise ValueError(
                f"moment_dtype={md!r} does not compose with "
                f"model_axis={s.model_axis}: int8 QTensor moment state "
                "is not param-shaped (GSPMD cannot shard it along the "
                "W2 'model' axis) and the fused pallas sweep cannot "
                "partition across model shards. Use moment_dtype in "
                "{'float32', 'bfloat16', 'bfloat16_sr'} with TP."
            )
    if s.multihost:
        initialize_distributed()
    n_needed = s.data_axis * s.model_axis
    if n_needed > jax.device_count():
        raise RuntimeError(
            f"config {config.name!r} wants a {s.data_axis}x{s.model_axis} "
            f"mesh but only {jax.device_count()} device(s) are visible. "
            "On a single chip, test with a virtual mesh: "
            "XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_needed} JAX_PLATFORMS=cpu (tests/conftest.py does this)."
        )
    is_primary = jax.process_index() == 0
    audit_or_raise(
        p.m,
        p.n,
        p.K,
        t.batch,
        s.data_axis,
        s.model_axis,
        layout,
        dtype_bytes=jnp.dtype(t.dtype).itemsize,
        compute_dtype_bytes=2 if compute_dtype is not None else None,
        hbm_bytes=hbm_bytes or detect_hbm_bytes(),
        print_fn=print if is_primary else None,
        d=(p.d or p.m) if general_b else None,
        opt_shard_degree=s.data_axis if zero1 else 1,
        # Reduced-precision moment storage shrinks the audit's optimizer
        # rows (int8: codes + ~0.4% fp32 block scales); composes
        # multiplicatively with the ZeRO-1 /D above.
        moment_bytes={
            "float32": 4.0,
            "bfloat16": 2.0,
            "bfloat16_sr": 2.0,
            "bfloat16_sr_mu": 3.0,  # bf16 mu + fp32 nu
            "int8": 1.02,
        }[getattr(t, "moment_dtype", "float32").removesuffix("_pallas")],
    )
    if s.multihost and jax.process_count() > 1:
        mesh = make_multihost_mesh(model=s.model_axis)
    else:
        mesh = pmesh.make_mesh(data=s.data_axis, model=s.model_axis)

    from dladmm_tpu.data.synthetic import seed_keys

    _, k_eval, k_train = seed_keys(config)
    dtype = jnp.dtype(t.dtype)
    # Same derivation as fit() (shared helper): a sharded run sees the
    # identical problem instance as the single-device run at the same
    # seed (parity tests rely on this). B is replicated — DP shards
    # only the batch.
    from dladmm_tpu.data.synthetic import problem_matrices

    A, B = problem_matrices(config, A)

    sh = pmesh.param_shardings_tp(mesh, layout)
    A = jax.device_put(A, sh["A"])
    params = jax.device_put(
        init_dladmm_params(A, B, K=p.K, beta=p.beta, dtype=dtype),
        sh["params"],
    )
    layer_weights = _layer_weights(t.layer_loss, p.K, jnp.float32)
    A_c = A if compute_dtype is None else A.astype(compute_dtype)
    B_c = (
        B if B is None or compute_dtype is None else B.astype(compute_dtype)
    )

    n_data_chips = mesh.shape[pmesh.DATA_AXIS]
    if fused:
        from dladmm_tpu.parallel.collectives import (
            make_dp_fused_adam_step,
        )
        from dladmm_tpu.train.fused_adam import make_fused_adam_state

        state = make_fused_adam_state(params, t.clip_norm, compute_dtype)
        train_step = make_dp_fused_adam_step(
            mesh,
            layer_weights,
            _lr_of(t),
            clip_norm=t.clip_norm,
            compute_dtype=compute_dtype,
            freeze=tuple(t.freeze),
            B=B_c,
        )
    elif s.model_axis == 1:
        forward_fn = step_fn = None
        if not general_b and (vjp == "auto" or vjp not in ("manual", "xla")):
            # General B keeps forward_fn=step_fn=None: loss_fn then
            # routes to the general-B manual reverse-scan VJP (the
            # Pallas kernels specialize to B = I).
            from dladmm_tpu.models.api import select_forward

            forward_fn, step_fn, _ = select_forward(
                p.m,
                p.n,
                p.m,
                max(1, t.batch // n_data_chips),  # per-chip batch shard
                kernel=t.kernel,
                need_trajectory=t.layer_loss is not None,
            )
        if zero1:
            # ZeRO-1: the step owns the (exact, single-pass) clip, so
            # the optax chain is built WITHOUT a clip transform; the
            # optimizer state is the flat padded vector sharded over
            # 'data' (collectives.make_dp_zero1_state).
            import dataclasses as _dc

            from dladmm_tpu.parallel.collectives import (
                make_dp_zero1_state,
                make_dp_zero1_train_step,
            )

            optimizer = _build_optimizer(_dc.replace(t, clip_norm=None))
            state = make_dp_zero1_state(
                params, optimizer, mesh, compute_dtype
            )
            train_step = make_dp_zero1_train_step(
                optimizer,
                mesh,
                clip_norm=t.clip_norm,
                compute_dtype=compute_dtype,
                freeze=tuple(t.freeze),
                layer_weights=layer_weights,
                step_fn=step_fn,
                forward_fn=forward_fn,
                vjp=vjp,
                B=B_c,
            )
        else:
            optimizer = _build_optimizer(t)  # honors lr_schedule + clip
            state = make_train_state(params, optimizer, compute_dtype)
            train_step = make_dp_train_step(
                optimizer,
                mesh,
                compute_dtype,
                tuple(t.freeze),
                layer_weights,
                step_fn,
                forward_fn,
                vjp,
                B=B_c,
            )
    else:
        optimizer = _build_optimizer(t)  # honors lr_schedule + clip_norm
        state = make_train_state(params, optimizer, compute_dtype)
        train_step = make_sharded_train_step(
            optimizer,
            mesh,
            layout,
            compute_dtype,
            tuple(t.freeze),
            layer_weights,
        )

    def put_batch(key, batch_size):
        if jax.process_count() > 1:
            return host_local_batch(
                key, A, batch_size, mesh, p.sparsity_x, p.sparsity_e,
                dtype, B,
            )
        d = make_batch(
            key, A, batch_size, p.sparsity_x, p.sparsity_e, dtype, B
        )
        put = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))
        return type(d)(
            b=put(d.b, B_SPEC),
            x_star=put(d.x_star, X_SPEC),
            e_star=put(d.e_star, Z_SPEC),
        )

    eval_data = put_batch(k_eval, t.eval_batch)
    # The TP eval's gather-free collective algebra hardcodes the B = I
    # recurrence; general-B DP runs evaluate the general forward
    # per-shard with psum-of-local-sums instead (make_dp_eval).
    eval_fn = (
        make_dp_eval(mesh, B) if general_b else make_sharded_eval(mesh, layout)
    )
    # Classical-LADMM comparison curve = the untrained LADMM-init net
    # (exact equivalence pinned by tests/test_ladmm_equivalence.py);
    # computed before any restore so resumed runs keep the baseline.
    ladmm_curve = [
        float(v)
        for v in jax.device_get(
            eval_fn(params, A, eval_data)["nmse_curve_db"]
        )
    ]

    start = 0
    if ckpt_dir:
        from dladmm_tpu.utils.checkpoint import (
            latest_step_dir,
            restore_checkpoint,
            save_checkpoint,
        )

        if resume:
            latest = latest_step_dir(ckpt_dir)
            if latest is not None:
                restored = restore_checkpoint(
                    latest, state._replace(compute_params=None)
                )
                cp = (
                    None
                    if compute_dtype is None
                    else jax.tree.map(
                        lambda v: v.astype(compute_dtype), restored.params
                    )
                )
                state = restored._replace(compute_params=cp)
                start = int(state.step)

    mesh_desc = (
        f"{mesh.shape[pmesh.DATA_AXIS]}x{mesh.shape[pmesh.MODEL_AXIS]}"
    )

    def eval_record(i, loss):
        ev = jax.device_get(eval_fn(state.params, A, eval_data))
        return {
            "step": i,
            "loss": float(loss),
            "nmse_db": float(ev["nmse_db"]),
            "residual": float(ev["residual"]),
            "mesh": mesh_desc,
            "curves": {
                "nmse_curve_db": [float(v) for v in ev["nmse_curve_db"]],
                "ladmm_curve_db": ladmm_curve,
            },
        }

    history = []
    for i in range(start, t.steps):
        # Deterministic per-step key: resume reproduces the cold run.
        sub = jax.random.fold_in(k_train, i)
        state, loss = train_step(state, A_c, put_batch(sub, t.batch))
        if (i + 1) % t.eval_every == 0 or i + 1 == t.steps:
            rec = eval_record(i + 1, loss)
            history.append(rec)
            if log_fn and is_primary:
                log_fn({k: v for k, v in rec.items() if k != "curves"})
            if ckpt_dir:
                save_checkpoint(
                    ckpt_dir,
                    state._replace(compute_params=None),
                    step=i + 1,
                )
    if not history:
        # Resumed at (or past) the final step.
        rec = eval_record(int(state.step), float("nan"))
        history.append(rec)
        if log_fn and is_primary:
            log_fn({k: v for k, v in rec.items() if k != "curves"})
    return state.params, history
