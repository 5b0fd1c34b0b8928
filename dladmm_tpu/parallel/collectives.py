"""Explicit-collective sharded forward/training (SURVEY.md N7, §5.5,
§9.2-3).

New TPU-first scope (the reference is single-GPU, SURVEY.md §4.1): the
K-layer unroll runs under shard_map on a ('data','model') mesh.

Two TP layouts (docs/DESIGN.md §4 records the measured trade):

layout="sharded_w2" (default — the one that fits the tp_large acceptance
shape, BASELINE.json:10):

  sharded along 'model':   x, W1 (rows over n), theta1, A (columns),
                           W2 (rows over d), theta2  — and therefore
                           every Adam moment of every weight.
  replicated across it:    z, lam, b, beta, and the m-sized residual
                           state (activations only — O(S*m), not O(K*m*m)).

  per layer (B = I, d = m):
    u   = Ax + (z - b + lam/beta)                 replicated elementwise
    x1_t = shrink(x_t - u @ W1_t^T, th1_t)        LOCAL (1/T of FLOPs)
    Ax1 = psum_model(x1_t @ A_t^T)                collective 1 (S, m)
    v   = Ax1 + base                              replicated elementwise
    z1_t = shrink(z[:, slice_t] - v @ W2_t^T)     LOCAL (1/T of FLOPs)
    z1  = all_gather_model(z1_t)                  collective 2 (S, m/T each)
    lam1 = lam + beta (Ax1 + z1 - b)              replicated elementwise

  Two collectives/layer, but ALL three matmuls are 1/T per chip and no
  weight (or moment) is replicated — the round-1 layout's ~16.1 GB/chip
  of replicated W2+moments at tp_large becomes ~4 GB sharded
  (parallel/memory.py audits this at startup).

layout="replicated_w2" (round-1 layout, kept for the trade measurement
and for small-m shapes where W2 is tiny): W2/theta2 replicated, z-side
compute duplicated on every chip, ONE collective per layer (the Ax1
psum). Infeasible at tp_large (VERDICT r1 what's-missing #1).

DP: batch sharded along 'data'; the only cross-data communication is the
loss/metric psum, whose transpose gives the gradient allreduce.
Gradient correctness across replicated params relies on shard_map's
replication tracking inserting the transposition psums — pinned against
single-device autodiff by tests/test_distributed.py for both layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from dladmm_tpu.models.unroll import DLADMMParams
from dladmm_tpu.ops.reference import LayerParams, shrink
from dladmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

LAYOUTS = ("sharded_w2", "replicated_w2")


def param_specs(layout: str = "sharded_w2") -> DLADMMParams:
    if layout not in LAYOUTS:
        raise ValueError(f"layout must be one of {LAYOUTS}, got {layout!r}")
    w2_ax = MODEL_AXIS if layout == "sharded_w2" else None
    return DLADMMParams(
        W1=P(None, MODEL_AXIS, None),
        W2=P(None, w2_ax, None),
        theta1=P(None, MODEL_AXIS),
        theta2=P(None, w2_ax),
        beta=P(None),
    )


# Round-1 compat name (replicated-W2 specs).
PARAM_SPECS = param_specs("replicated_w2")
A_SPEC = P(None, MODEL_AXIS)
B_SPEC = P(DATA_AXIS, None)  # observations (S, m)
X_SPEC = P(DATA_AXIS, MODEL_AXIS)  # codes (S, n)
Z_SPEC = P(DATA_AXIS, None)  # corruption (S, m)

_vary = functools.partial(jax.lax.pcast, to="varying")


def _tp_layer_step(A_t, b, x_t, z, lam, Ax, p: LayerParams, layout):
    """One D-LADMM layer on local shards (B = I). Names suffixed _t are
    'model'-sharded; the rest are replicated across 'model' and sharded
    along 'data' on the batch."""
    beta = jnp.maximum(p.beta, 1e-6)
    base = z - b + lam / beta
    u = Ax + base
    x1_t = shrink(
        x_t - jax.lax.dot_general(u, p.W1, (((1,), (1,)), ((), ()))),
        p.theta1,
    )
    partial = jax.lax.dot_general(x1_t, A_t, (((1,), (1,)), ((), ())))
    Ax1 = jax.lax.psum(partial, MODEL_AXIS)
    v = Ax1 + base
    if layout == "sharded_w2":
        # psum output is model-invariant; restore the carry's vma type.
        Ax1 = _vary(Ax1, (MODEL_AXIS,))
        m_t = p.W2.shape[0]
        idx = jax.lax.axis_index(MODEL_AXIS)
        z_t = jax.lax.dynamic_slice_in_dim(z, idx * m_t, m_t, axis=1)
        z1_t = shrink(
            z_t - jax.lax.dot_general(v, p.W2, (((1,), (1,)), ((), ()))),
            p.theta2,
        )
        z1 = jax.lax.all_gather(z1_t, MODEL_AXIS, axis=1, tiled=True)
    else:
        z1 = shrink(
            z - jax.lax.dot_general(v, p.W2, (((1,), (1,)), ((), ()))),
            p.theta2,
        )
    lam1 = lam + beta * (Ax1 + z1 - b)
    return x1_t, z1, lam1, Ax1


def _tp_forward_local(
    params,
    A_t,
    b,
    layout: str = "sharded_w2",
    x_star_t=None,
    e_star=None,
    capture: bool = False,
):
    """Local (inside-shard_map) scan over layers from zero state.

    Returns (x_t, z, lam, ys) where ys is None unless capture=True, in
    which case ys = (num_x, num_z): per-layer per-sample LOCAL squared
    errors, shapes (K, S). num_x sums over the local n-shard (psum over
    'data' AND 'model' to globalize); num_z is over the full (replicated)
    m (psum over 'data' only). This is the gather-free path to both the
    deep-supervision loss and the per-layer NMSE curve for sharded runs
    (VERDICT r1 #6) — nothing K x S x n ever materializes.
    """
    S = b.shape[0]
    m = b.shape[1]
    n_t = A_t.shape[1]
    # Zero carries must carry the same varying-axes (vma) types as the
    # step outputs: x varies over both mesh axes; the m-sized state
    # varies over 'data' only in the replicated_w2 layout (psum output
    # is model-invariant) but over both axes in sharded_w2 (z comes back
    # through an all_gather).
    both = (DATA_AXIS, MODEL_AXIS)
    m_axes = both if layout == "sharded_w2" else (DATA_AXIS,)
    x = _vary(jnp.zeros((S, n_t), b.dtype), both)
    z = _vary(jnp.zeros((S, m), b.dtype), m_axes)
    lam = _vary(jnp.zeros((S, m), b.dtype), m_axes)
    Ax = _vary(jnp.zeros((S, m), b.dtype), m_axes)

    def body(carry, p):
        x, z, lam, Ax = carry
        x, z, lam, Ax = _tp_layer_step(A_t, b, x, z, lam, Ax, p, layout)
        ys = None
        if capture:
            num_x = jnp.sum(
                (x.astype(jnp.float32) - x_star_t) ** 2, axis=-1
            )
            num_z = jnp.sum(
                (z.astype(jnp.float32) - e_star) ** 2, axis=-1
            )
            ys = (num_x, num_z)
        return (x, z, lam, Ax), ys

    (x, z, lam, _), ys = jax.lax.scan(
        body, (x, z, lam, Ax), LayerParams(*params)
    )
    return x, z, lam, ys


def _model_slice(val, T):
    """This chip's contiguous 'model'-axis slice of a (numerically)
    model-replicated (S, m) value — used to emit gathered z/lam through a
    P('data','model') out_spec (the vma type system correctly refuses to
    call an all_gather output replicated)."""
    m_t = val.shape[1] // T
    idx = jax.lax.axis_index(MODEL_AXIS)
    return jax.lax.dynamic_slice_in_dim(val, idx * m_t, m_t, axis=1)


def sharded_forward(mesh, params, A, b, layout: str = "sharded_w2"):
    """Sharded inference: returns (x, z, lam) as global arrays (x always
    sharded over data x model; z/lam over data, and additionally over
    model in the sharded_w2 layout). Global values are identical across
    layouts (pinned by tests/test_distributed.py)."""
    T = mesh.shape[MODEL_AXIS]

    def fwd(params, A_t, b):
        x, z, lam, _ = _tp_forward_local(params, A_t, b, layout)
        if layout == "sharded_w2":
            return x, _model_slice(z, T), _model_slice(lam, T)
        return x, z, lam

    zspec = X_SPEC if layout == "sharded_w2" else Z_SPEC
    fn = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(param_specs(layout), A_SPEC, B_SPEC),
        out_specs=(X_SPEC, zspec, zspec),
    )
    return jax.jit(fn)(params, A, b)


_EPS = 1e-12


def make_sharded_eval(mesh, layout: str = "sharded_w2"):
    """jitted (params, A, batch) -> metrics dict with the per-layer NMSE
    curve, computed WITHOUT gathering any trajectory (psum of local sums
    per layer — the TP-sharded K x S x n trajectory never exists).

    Semantics match metrics.core exactly: NMSE(dB) is the batch-mean of
    per-sample ratios with degenerate-support samples excluded, and the
    residual is the batch-mean relative norm (pinned by
    tests/test_distributed.py::test_sharded_eval_curve_matches_single).
    """

    def zsum(val):
        """psum over 'data' of a z-side (numerically model-replicated)
        value. In the sharded_w2 layout the gathered z is vma-VARYING
        over 'model' (all_gather output), so an invariant result needs
        the psum to cover 'model' too; keeping only model-rank 0's value
        before the psum recovers it EXACTLY for any T (the earlier
        psum/T trick was bit-exact only for power-of-two T — ADVICE r2)."""
        if layout == "sharded_w2":
            keep = jnp.where(
                jax.lax.axis_index(MODEL_AXIS) == 0, val, jnp.zeros_like(val)
            )
            return jax.lax.psum(keep, (DATA_AXIS, MODEL_AXIS))
        return jax.lax.psum(val, DATA_AXIS)

    def local_eval(params, A_t, b, x_star_t, e_star):
        x_t, z, lam, ys = _tp_forward_local(
            params, A_t, b, layout, x_star_t, e_star, capture=True
        )
        num_x, num_z = ys  # (K, S) local sums
        # Per-sample globals.
        num_x = jax.lax.psum(num_x, MODEL_AXIS)  # (K, S)
        den_x = jax.lax.psum(
            jnp.sum(x_star_t.astype(jnp.float32) ** 2, axis=-1), MODEL_AXIS
        )  # (S,)
        valid = den_x > _EPS
        ratio = jnp.where(valid, num_x / jnp.maximum(den_x, _EPS), 0.0)
        sum_ratio = jax.lax.psum(jnp.sum(ratio, axis=-1), DATA_AXIS)  # (K,)
        n_valid = jax.lax.psum(jnp.sum(valid), DATA_AXIS)
        curve = jnp.where(
            n_valid > 0,
            10.0 * jnp.log10(sum_ratio / jnp.maximum(n_valid, 1) + _EPS),
            jnp.nan,
        )
        # z-side final NMSE (den over full replicated m).
        den_z = jnp.sum(e_star.astype(jnp.float32) ** 2, axis=-1)
        valid_z = den_z > _EPS
        ratio_z = jnp.where(
            valid_z, num_z[-1] / jnp.maximum(den_z, _EPS), 0.0
        )
        sum_rz = zsum(jnp.sum(ratio_z))
        n_valid_z = jax.lax.psum(jnp.sum(valid_z), DATA_AXIS)
        nmse_z = jnp.where(
            n_valid_z > 0,
            10.0 * jnp.log10(sum_rz / jnp.maximum(n_valid_z, 1) + _EPS),
            jnp.nan,
        )
        # Relative constraint residual at the final layer: r = Ax+z-b.
        Ax = jax.lax.psum(
            jax.lax.dot_general(
                x_t, A_t, (((1,), (1,)), ((), ()))
            ).astype(jnp.float32),
            MODEL_AXIS,
        )
        r = jnp.linalg.norm(Ax + z.astype(jnp.float32) - b, axis=-1)
        rel = r / jnp.maximum(jnp.linalg.norm(b, axis=-1), _EPS)
        S_total = jax.lax.psum(jnp.asarray(b.shape[0], jnp.float32), DATA_AXIS)
        residual = zsum(jnp.sum(rel)) / S_total
        return {
            "nmse_db": curve[-1],
            "nmse_db_z": nmse_z,
            "residual": residual,
            "nmse_curve_db": curve,
        }

    fn = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(param_specs(layout), A_SPEC, B_SPEC, X_SPEC, Z_SPEC),
        out_specs={
            "nmse_db": P(),
            "nmse_db_z": P(),
            "residual": P(),
            "nmse_curve_db": P(),
        },
    )

    @jax.jit
    def evaluate(params, A, batch):
        return fn(params, A, batch.b, batch.x_star, batch.e_star)

    return evaluate


def make_dp_eval(mesh, B=None):
    """jitted (params, A, batch) -> metrics dict (same keys as
    make_sharded_eval) for DATA-PARALLEL-ONLY meshes, supporting the
    general z-dictionary B that the TP eval's collective algebra cannot
    (its identity-B recurrence hardcodes z in R^m).

    Each data shard runs the full single-device forward (XLA scan,
    general B) on its local batch and emits per-sample sums; the psum
    over 'data' assembles the exact metrics.core semantics — batch-mean
    of per-sample NMSE ratios with degenerate-support samples excluded,
    batch-mean relative residual ||Ax + Bz - b|| / ||b||. Parity with
    train.loop.evaluate is pinned by tests/test_distributed.py.
    """
    from dladmm_tpu.models.unroll import dladmm_forward

    def local_eval(params, A, b, x_star, z_star):
        (x, z, _), (tx, tz, _) = dladmm_forward(
            params, A, b, B=B, capture_trajectory=True
        )
        # Per-layer x-side NMSE curve: (K, S_local) local ratio sums.
        f32 = lambda v: v.astype(jnp.float32)
        num_x = jnp.sum((f32(tx) - f32(x_star)) ** 2, axis=-1)  # (K, S)
        den_x = jnp.sum(f32(x_star) ** 2, axis=-1)  # (S,)
        valid = den_x > _EPS
        ratio = jnp.where(valid, num_x / jnp.maximum(den_x, _EPS), 0.0)
        sum_ratio = jax.lax.psum(jnp.sum(ratio, axis=-1), DATA_AXIS)  # (K,)
        n_valid = jax.lax.psum(jnp.sum(valid), DATA_AXIS)
        curve = jnp.where(
            n_valid > 0,
            10.0 * jnp.log10(sum_ratio / jnp.maximum(n_valid, 1) + _EPS),
            jnp.nan,
        )
        # z-side final-layer NMSE (z_star is (S, d) under general B).
        num_z = jnp.sum((f32(z) - f32(z_star)) ** 2, axis=-1)
        den_z = jnp.sum(f32(z_star) ** 2, axis=-1)
        valid_z = den_z > _EPS
        ratio_z = jnp.where(valid_z, num_z / jnp.maximum(den_z, _EPS), 0.0)
        sum_rz = jax.lax.psum(jnp.sum(ratio_z), DATA_AXIS)
        n_valid_z = jax.lax.psum(jnp.sum(valid_z), DATA_AXIS)
        nmse_z = jnp.where(
            n_valid_z > 0,
            10.0 * jnp.log10(sum_rz / jnp.maximum(n_valid_z, 1) + _EPS),
            jnp.nan,
        )
        # Relative constraint residual at the final layer.
        Bz = f32(z) if B is None else f32(z) @ f32(B).T
        r = jnp.linalg.norm(f32(x) @ f32(A).T + Bz - f32(b), axis=-1)
        rel = r / jnp.maximum(jnp.linalg.norm(f32(b), axis=-1), _EPS)
        S_total = jax.lax.psum(
            jnp.asarray(b.shape[0], jnp.float32), DATA_AXIS
        )
        residual = jax.lax.psum(jnp.sum(rel), DATA_AXIS) / S_total
        return {
            "nmse_db": curve[-1],
            "nmse_db_z": nmse_z,
            "residual": residual,
            "nmse_curve_db": curve,
        }

    rep = jax.tree.map(lambda _: P(), param_specs("replicated_w2"))
    # check_vma=False for the same reason as make_dp_train_step: the
    # body is the single-chip scan; outputs are made replicated by the
    # explicit psums (parity with evaluate() pins correctness).
    fn = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(rep, P(), B_SPEC, X_SPEC, Z_SPEC),
        out_specs={
            "nmse_db": P(),
            "nmse_db_z": P(),
            "residual": P(),
            "nmse_curve_db": P(),
        },
        check_vma=False,
    )

    @jax.jit
    def evaluate(params, A, batch):
        return fn(params, A, batch.b, batch.x_star, batch.e_star)

    return evaluate


def _mixed_precision_inputs(state, batch, compute_dtype):
    """(loss params, observations) for the step: the persistent sharded
    compute-dtype copy + cast batch under mixed precision, the fp32
    masters otherwise."""
    if compute_dtype is not None:
        return state.compute_params, batch.b.astype(compute_dtype)
    return state.params, batch.b


def _apply_update(state, loss, grads, optimizer, compute_dtype, freeze):
    """Shared optimizer tail of both sharded steps: recast (possibly
    bf16) grads onto the fp32 masters, zero frozen fields, optimizer
    update (GSPMD partitions it along the existing param shardings),
    refresh the compute-dtype copy in the same fused pass.

    A fused-sweep optimizer (QAdamFusedPallas — duck-typed by
    .fused_apply) routes through its one-HBM-pass kernel here exactly
    like the single-chip step builders do, so the `*_pallas`
    moment_dtype perf path applies to the DP fast path too (VERDICT r4
    weak #2b). Safe under GSPMD on the DP meshes because params/moments
    are fully REPLICATED there — every chip runs the identical kernel
    on its replica. (The TP step never constructs a fused optimizer —
    fit_sharded rejects `*_pallas` with model_axis > 1: the pallas_call
    cannot partition along the W2 shards.)"""
    grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, state.params)
    if freeze:
        grads = type(grads)(
            *(
                jnp.zeros_like(g) if name in freeze else g
                for name, g in zip(grads._fields, grads)
            )
        )
    if hasattr(optimizer, "fused_apply"):
        params, opt_state, cp = optimizer.fused_apply(
            grads, state.opt_state, state.params, compute_dtype
        )
        new = state._replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        if compute_dtype is not None:
            new = new._replace(compute_params=cp)
        return new, loss
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    new = state._replace(
        params=params, opt_state=opt_state, step=state.step + 1
    )
    if compute_dtype is not None:
        new = new._replace(
            compute_params=jax.tree.map(
                lambda v: v.astype(compute_dtype), params
            )
        )
    return new, loss


def make_dp_train_step(
    optimizer: optax.GradientTransformation,
    mesh,
    compute_dtype=None,
    freeze: tuple = (),
    layer_weights=None,
    step_fn=None,
    forward_fn=None,
    vjp: str = "auto",
    donate: bool = True,
    B=None,
):
    """Data-parallel-only train step (model_axis == 1) that composes the
    ENTIRE single-chip perf stack inside shard_map (VERDICT r1 #2): the
    local forward/backward on each chip's batch shard is literally
    train.loop.loss_fn — manual reverse-scan VJP, Pallas megakernel /
    fused-layer forwards, persistent-bf16-copy mixed precision, deep
    supervision — and the only collective is the loss psum over 'data'
    (whose transpose is the gradient allreduce, inserted by shard_map's
    replication tracking for the replicated params).

    B: the general z-dictionary (m, d), pre-cast to the compute dtype,
    or None for the B = I benchmark fast path. Since DP shards only the
    batch, the general recurrence is embarrassingly parallel here: the
    per-shard loss routes through loss_fn's general-B manual VJP and
    the same loss psum is the only collective. (The TP layouts remain
    identity-B-only — their collective algebra assumes z lives in R^m.)

    Parity with the single-device global-batch step is pinned by
    tests/test_distributed.py::test_dp_fast_path_matches_single_device
    (identity B) and ::test_dp_general_b_matches_single_device.
    """
    from dladmm_tpu.train.loop import loss_fn

    D = mesh.shape[DATA_AXIS]
    rep = jax.tree.map(lambda _: P(), param_specs("replicated_w2"))

    def local_loss_and_grad(params, A, b, x_star, e_star):
        def local_loss(params):
            return loss_fn(
                params,
                A,
                b,
                x_star,
                e_star,
                B,  # closed-over, replicated (data-parallel only)
                layer_weights,
                step_fn,
                forward_fn,
                None,  # params/A/b/B arrive pre-cast for mixed precision
                vjp,
            )

        # Grad/loss of the LOCAL batch mean, then one explicit allreduce:
        # global loss = (1/D) sum_i local_mean_i, so global grads =
        # psum(local grads)/D. (With check_vma=False there is no vma
        # machinery to insert the transposition psum for us — the
        # collective must be explicit, pinned by the parity tests.)
        l, g = jax.value_and_grad(local_loss)(params)
        l = jax.lax.psum(l, DATA_AXIS) / D
        g = jax.tree.map(lambda v: jax.lax.psum(v, DATA_AXIS) / D, g)
        return l, g

    # check_vma=False (classic replication inference): the local body is
    # the user-selected single-chip path — Pallas megakernel/fused-step
    # pallas_calls and the manual VJP's scans cannot declare varying-axis
    # types generically (pallas_call requires an explicit `vma` on every
    # out_shape when the checker is on). The explicit-collective TP step
    # keeps the checker; this path's collectives are all inserted by the
    # autodiff transpose machinery, pinned by the parity tests.
    grad_fn = jax.shard_map(
        local_loss_and_grad,
        mesh=mesh,
        in_specs=(rep, P(), B_SPEC, X_SPEC, Z_SPEC),
        out_specs=(P(), rep),
        check_vma=False,
    )

    def step(state, A, batch):
        loss_params, b = _mixed_precision_inputs(state, batch, compute_dtype)
        loss, grads = grad_fn(
            loss_params, A, b, batch.x_star, batch.e_star
        )
        return _apply_update(
            state, loss, grads, optimizer, compute_dtype, freeze
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_dp_fused_adam_step(
    mesh,
    layer_weights=None,
    lr=1e-3,
    clip_norm=None,
    compute_dtype=None,
    freeze: tuple = (),
    donate: bool = True,
    B=None,
):
    """Data-parallel fused-Adam step (optimizer='fused_adam' on a
    model_axis==1 mesh): the per-shard body is EXACTLY the single-chip
    fused step's update core (train/fused_adam.py — Adam applied per
    layer inside the reverse-scan backward), with each layer's
    gradients allreduced over 'data' as the reverse scan produces them.
    That turns the DP gradient sync from one bulk allreduce after the
    backward into K per-layer psums, each free to overlap the NEXT
    layer's backward matmuls — and the grad stacks still never
    round-trip HBM.

    Step signature matches the other sharded steps: (state, A, batch)
    with state from train.fused_adam.make_fused_adam_state. B: general
    z-dictionary (m, d) pre-cast to the compute dtype, or None for the
    B = I fast path (the core swaps in the general forward/backward —
    see train/fused_adam.py). Parity with the single-device fused step
    is pinned by tests/test_distributed.py.
    """
    from dladmm_tpu.train.fused_adam import (
        FusedAdamState,
        make_fused_update_core,
    )
    from dladmm_tpu.train.loop import TrainState

    D = mesh.shape[DATA_AXIS]
    core = make_fused_update_core(
        layer_weights,
        lr,
        clip_norm=clip_norm,
        compute_dtype=compute_dtype,
        freeze=freeze,
        # Global loss/grads of the mean over the global batch: psum of
        # the local-shard means / D (same algebra as make_dp_train_step).
        grad_reduce=lambda v: jax.lax.psum(v, DATA_AXIS) / D,
        loss_reduce=lambda l: jax.lax.psum(l, DATA_AXIS) / D,
        B=B,  # closed-over, replicated (data-parallel only)
    )

    rep = jax.tree.map(lambda _: P(), param_specs("replicated_w2"))
    # The compute-copy output is None in fp32 runs — its out_spec must
    # then be a bare prefix (an empty subtree has no leaves to spec).
    cp_spec = P() if compute_dtype is None else rep
    # check_vma=False for the same reason as make_dp_train_step: the
    # body is the single-chip scan; all values are either replicated
    # (params/moments) or made replicated by the explicit psums.
    body = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, P(), P(), P(), B_SPEC, X_SPEC,
                  Z_SPEC),
        out_specs=(P(), rep, rep, rep, cp_spec, P()),
        check_vma=False,
    )

    def step(state, A, batch):
        params_c = (
            state.compute_params
            if state.compute_params is not None
            else state.params
        )
        b = (
            batch.b
            if compute_dtype is None
            else batch.b.astype(compute_dtype)
        )
        A_c = A if compute_dtype is None else A.astype(compute_dtype)
        opt = state.opt_state
        loss, new_p, new_mu, new_nu, new_cp, new_norm = body(
            state.params,
            params_c,
            opt.mu,
            opt.nu,
            opt.count,
            opt.prev_norm,
            A_c,
            b,
            batch.x_star,
            batch.e_star,
        )
        new_opt = FusedAdamState(new_mu, new_nu, opt.count + 1, new_norm)
        return (
            TrainState(new_p, new_opt, state.step + 1, new_cp),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_train_step(
    optimizer: optax.GradientTransformation,
    mesh,
    layout: str = "sharded_w2",
    compute_dtype=None,
    freeze: tuple = (),
    layer_weights=None,
    donate: bool = True,
):
    """jitted (state, A, batch) -> (state, loss) over the DP x TP mesh.

    Loss/grad runs inside shard_map with explicit psums; the optax update
    runs outside under GSPMD (elementwise, partitions trivially along the
    existing param shardings — Adam moments inherit the W1/W2 shards).

    The single-chip perf/feature stack composes here (VERDICT r1 #2):
      * compute_dtype=bf16 — forward/backward on state.compute_params
        (persistent sharded bf16 copy, refreshed in the same fused pass;
        fp32 masters in the optimizer; loss accumulated fp32).
      * layer_weights — deep supervision via the capture path's per-layer
        psum-of-local-sums (no trajectory gather).
      * freeze — zero the named fields' grads before the update.
    """
    specs = param_specs(layout)
    lw = None if layer_weights is None else jnp.asarray(layer_weights)

    T = mesh.shape[MODEL_AXIS]

    def zsum(val):
        # See make_sharded_eval.zsum: z-side values are vma-varying over
        # 'model' in the sharded_w2 layout (bit-identical replicas).
        if layout == "sharded_w2":
            return jax.lax.psum(val, (DATA_AXIS, MODEL_AXIS)) / T
        return jax.lax.psum(val, DATA_AXIS)

    def local_loss_and_grad(params, A_t, b, x_star_t, e_star):
        S = b.shape[0] * mesh.shape[DATA_AXIS]
        n = A_t.shape[1] * mesh.shape[MODEL_AXIS]
        m = b.shape[1]

        def local_loss(params):
            if lw is None:
                x_t, z, _, _ = _tp_forward_local(params, A_t, b, layout)
                sse_x = jnp.sum((x_t.astype(jnp.float32) - x_star_t) ** 2)
                sse_z = jnp.sum((z.astype(jnp.float32) - e_star) ** 2)
                lx = jax.lax.psum(sse_x, (DATA_AXIS, MODEL_AXIS)) / (S * n)
                lz = zsum(sse_z) / (S * m)
                return lx + lz
            _, _, _, ys = _tp_forward_local(
                params, A_t, b, layout, x_star_t, e_star, capture=True
            )
            num_x, num_z = ys  # (K, S) local sums
            lx = jax.lax.psum(
                jnp.sum(num_x, axis=-1), (DATA_AXIS, MODEL_AXIS)
            ) / (S * n)
            lz = zsum(jnp.sum(num_z, axis=-1)) / (S * m)
            return jnp.sum(lw * (lx + lz))

        return jax.value_and_grad(local_loss)(params)

    grad_fn = jax.shard_map(
        local_loss_and_grad,
        mesh=mesh,
        in_specs=(specs, A_SPEC, B_SPEC, X_SPEC, Z_SPEC),
        out_specs=(P(), specs),
    )

    def step(state, A, batch):
        loss_params, b = _mixed_precision_inputs(state, batch, compute_dtype)
        loss, grads = grad_fn(
            loss_params, A, b, batch.x_star, batch.e_star
        )
        return _apply_update(
            state, loss, grads, optimizer, compute_dtype, freeze
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _zero1_block_align(optimizer) -> bool:
    """True when the (non-fused) optimizer's flat state carries QTensor
    leaves (moment_dtype='int8'), whose (nblocks, 256) codes require the
    padded vector to be a multiple of D*BLOCK so blocks never straddle a
    shard boundary. Probed with a tiny init so plain fp32/bf16 states
    keep the round-3 D-multiple padding (pre-round-5 ZeRO-1 checkpoints
    stay resumable — their template lengths are unchanged)."""
    from dladmm_tpu.train.qmoments import BLOCK, QTensor

    probe = optimizer.init(jnp.zeros((BLOCK,), jnp.float32))
    return any(
        isinstance(leaf, QTensor)
        for leaf in jax.tree.leaves(
            probe, is_leaf=lambda x: isinstance(x, QTensor)
        )
    )


def _zero1_padded(
    total: int, D: int, fused: bool, block_align: bool = False
) -> int:
    """Flat-vector padding for the ZeRO-1 update.

    Non-fused: multiple of D (the round-3 contract; existing fp32/bf16
    checkpoints keep their template length) — raised to D*BLOCK when the
    state carries flat int8 QTensor codecs (_zero1_block_align), so the
    (nblocks, 256) codes and (nblocks,) scales slice along 'data'
    exactly.

    Fused (QAdamFusedPallas): each shard is viewed as (rows, BLOCK) for
    the one-HBM-pass kernel; rows must be a multiple of 128 (lane-packed
    scale geometry) and >= 256 so the view passes leaf_eligible
    (MIN_PALLAS_ELEMS) — tiny models just pad more (int8 moment state,
    bytes are cheap)."""
    from dladmm_tpu.train.qmoments import BLOCK

    if not fused:
        unit = D * BLOCK if block_align else D
        return -(-total // unit) * unit
    per_shard_rows = -(-total // (BLOCK * D))
    rows = max(256, -(-per_shard_rows // 128) * 128)
    return D * rows * BLOCK


def _zero1_opt_specs(opt_state, padded: int, fused: bool):
    """Partition specs for the ZeRO-1 optimizer state pytree.

    Fused geometry: every >=2-D leaf is row-sharded over 'data' (codes
    (D*rows, BLOCK), lane-packed scales (D*rows/128, 128), dense moments
    (D*rows, BLOCK)); scalars (count) replicated.

    Non-fused geometry (flat (padded,) vector): shard leaves whose
    leading dim is the padded length (fp32/bf16 moments) or
    padded/BLOCK (flat int8 QTensor codes (nblocks, 256) and scales
    (nblocks,)); everything else — step counts, the (2,) SR PRNG key —
    stays replicated (the old ndim==1 rule wrongly sharded the key).
    uint32 leaves are excluded outright: the SR PRNG key is (2,) uint32
    and a toy model's padded//BLOCK can collide with 2, while no moment
    leaf is ever uint32."""
    from dladmm_tpu.train.qmoments import BLOCK

    def spec(v):
        nd = getattr(v, "ndim", 0)
        if fused:
            return P(DATA_AXIS) if nd >= 2 else P()
        if getattr(v, "dtype", None) == jnp.uint32:
            return P()  # PRNG key material stays replicated
        if nd >= 1 and v.shape[0] in (padded, padded // BLOCK):
            return P(DATA_AXIS)
        return P()

    return jax.tree.map(spec, opt_state)


def make_dp_zero1_state(params, optimizer, mesh, compute_dtype=None):
    """TrainState for the ZeRO-1 DP step: params replicated, optimizer
    state over the FLAT padded parameter vector, sharded over 'data'.

    Cross-replica weight-update sharding (ZeRO-1; see Xu et al.,
    "Automatic Cross-Replica Sharding of Weight Update in Data-Parallel
    Training", PAPERS.md): each chip keeps 1/D of the Adam moments
    instead of a full replica, cutting per-chip optimizer HBM and the
    optimizer-update traffic by the data-axis size D.

    Composes with moment_dtype (train/qmoments.py): reduced-precision
    moments stack multiplicatively with the /D shard — flagship 480 MB
    fp32 replicated moments -> 15 MB/chip at D=8 with int8 storage. A
    fused-sweep optimizer (QAdamFusedPallas) stores its state on the
    per-shard (rows, 256) view so each chip's slice runs the
    one-HBM-pass kernel (VERDICT r4 #3)."""
    from jax.flatten_util import ravel_pytree
    from jax.sharding import NamedSharding

    from dladmm_tpu.train.loop import TrainState
    from dladmm_tpu.train.qmoments import BLOCK

    flat, _ = ravel_pytree(params)
    D = mesh.shape[DATA_AXIS]
    fused = hasattr(optimizer, "fused_apply")
    block_align = False if fused else _zero1_block_align(optimizer)
    padded = _zero1_padded(flat.size, D, fused, block_align)
    if fused:
        template = jnp.zeros((padded // BLOCK, BLOCK), flat.dtype)
    else:
        template = jnp.zeros((padded,), flat.dtype)
    opt_state = optimizer.init(template)
    specs = _zero1_opt_specs(opt_state, padded, fused)
    opt_state = jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        opt_state,
        specs,
    )
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    cp = (
        None
        if compute_dtype is None
        else jax.device_put(
            jax.tree.map(lambda v: v.astype(compute_dtype), params), rep
        )
    )
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32), cp)


def make_dp_zero1_train_step(
    optimizer: optax.GradientTransformation,
    mesh,
    clip_norm=None,
    compute_dtype=None,
    freeze: tuple = (),
    layer_weights=None,
    step_fn=None,
    forward_fn=None,
    vjp: str = "auto",
    donate: bool = True,
    B=None,
):
    """Data-parallel step with the weight update SHARDED over 'data'
    (ZeRO-1 / XLA's cross-replica weight-update sharding — PAPERS.md).

    make_dp_train_step allreduces the gradients and then runs the FULL
    optimizer redundantly on every chip (moments replicated). Here the
    bulk allreduce becomes a reduce-scatter (psum_scatter): each chip
    receives the fully-summed gradients for its 1/D slice of the flat
    parameter vector, applies Adam to just that slice against its
    moment shard, and an all-gather of the updated slices rebuilds the
    replicated parameters. A ring allreduce IS reduce-scatter +
    all-gather, so total collective bytes are unchanged — but per-chip
    optimizer FLOPs/HBM traffic and moment storage drop by D.

    Bonus: because the scatter fully reduces before the update, the
    TRUE global gradient norm is one scalar psum of per-shard partial
    sums — so clip_norm here is the EXACT single-pass global-norm clip
    (no delayed approximation). Pass an optimizer built WITHOUT a clip
    transform.

    Same (state, A, batch) signature as the other sharded steps; state
    from make_dp_zero1_state. Parity with the replicated-optimizer DP
    step and the single-device exact-clip run is pinned by
    tests/test_distributed.py.
    """
    from jax.flatten_util import ravel_pytree

    from dladmm_tpu.train.loop import loss_fn
    from dladmm_tpu.train.qmoments import BLOCK

    D = mesh.shape[DATA_AXIS]
    fused = hasattr(optimizer, "fused_apply")
    block_align = False if fused else _zero1_block_align(optimizer)
    if fused and getattr(optimizer, "clip_norm", None):
        # The step owns the EXACT global clip (psum of per-shard partial
        # norms, applied to g_shard below). A fused optimizer built with
        # its own clip_norm would ADDITIONALLY clip by each chip's LOCAL
        # shard norm — a different, wrong factor per chip — silently.
        # fit_sharded rebuilds with clip_norm=None; raw-API callers must
        # do the same (pass clip_norm to THIS function instead).
        raise ValueError(
            "ZeRO-1 owns the global-norm clip; build the fused "
            "optimizer with clip_norm=None and pass clip_norm to "
            "make_dp_zero1_train_step"
        )
    rep = jax.tree.map(lambda _: P(), param_specs("replicated_w2"))

    def body(masters, loss_params, opt_state, A, b, x_star, e_star):
        def local_loss(p):
            return loss_fn(
                p,
                A,
                b,
                x_star,
                e_star,
                B,
                layer_weights,
                step_fn,
                forward_fn,
                None,
                vjp,
            )

        l, g = jax.value_and_grad(local_loss)(loss_params)
        l = jax.lax.psum(l, DATA_AXIS) / D
        # Recast (possibly bf16) grads onto the fp32 masters and zero
        # frozen fields BEFORE flattening.
        g = jax.tree.map(lambda gv, pv: gv.astype(pv.dtype), g, masters)
        if freeze:
            g = type(g)(
                *(
                    jnp.zeros_like(gv) if name in freeze else gv
                    for name, gv in zip(g._fields, g)
                )
            )
        flat_g, _ = ravel_pytree(g)
        flat_p, unravel = ravel_pytree(masters)
        total = flat_p.size
        padded = _zero1_padded(total, D, fused, block_align)
        pad = padded - total
        if pad:
            flat_g = jnp.concatenate([flat_g, jnp.zeros(pad, flat_g.dtype)])
            flat_p = jnp.concatenate([flat_p, jnp.zeros(pad, flat_p.dtype)])
        # Reduce-scatter: fully-summed gradient slice per chip.
        g_shard = (
            jax.lax.psum_scatter(
                flat_g, DATA_AXIS, scatter_dimension=0, tiled=True
            )
            / D
        )
        if clip_norm:
            # Shards partition the reduced vector, so the psum of the
            # per-shard partial sums IS the exact global norm^2.
            gn = jnp.sqrt(
                jax.lax.psum(jnp.sum(g_shard * g_shard), DATA_AXIS)
            )
            g_shard = g_shard * jnp.minimum(1.0, clip_norm / jnp.maximum(gn, 1e-12))
        idx = jax.lax.axis_index(DATA_AXIS)
        p_shard = jax.lax.dynamic_slice(
            flat_p, (idx * (padded // D),), (padded // D,)
        )
        if fused:
            # One-HBM-pass fused sweep on the LOCAL shard, viewed as
            # (rows, 256) so the kernel's row codec/tiling applies
            # (train/qadam_pallas.leaf_eligible; _zero1_padded
            # guarantees eligibility). The exact global clip was
            # already applied to g_shard above, and the optimizer was
            # built with clip_norm=None (fit_sharded) — the kernel's
            # own clip pass stays off.
            rows = (padded // D) // BLOCK
            new_p2, new_opt, _ = optimizer.fused_apply(
                g_shard.reshape(rows, BLOCK),
                opt_state,
                p_shard.reshape(rows, BLOCK),
                None,
            )
            new_p_shard = new_p2.reshape(-1)
        else:
            updates, new_opt = optimizer.update(
                g_shard, opt_state, p_shard
            )
            new_p_shard = optax.apply_updates(p_shard, updates)
        flat_new = jax.lax.all_gather(
            new_p_shard, DATA_AXIS, tiled=True
        )[:total]
        return unravel(flat_new), new_opt, l

    def step(state, A, batch):
        loss_params, b = _mixed_precision_inputs(state, batch, compute_dtype)
        total = sum(v.size for v in jax.tree.leaves(state.params))
        opt_specs = _zero1_opt_specs(
            state.opt_state,
            _zero1_padded(total, D, fused, block_align),
            fused,
        )
        new_params, new_opt, loss = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(rep, rep, opt_specs, P(), B_SPEC, X_SPEC, Z_SPEC),
            out_specs=(rep, opt_specs, P()),
            check_vma=False,  # same rationale as make_dp_train_step
        )(
            state.params,
            loss_params,
            state.opt_state,
            A,
            b,
            batch.x_star,
            batch.e_star,
        )
        new = state._replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        if compute_dtype is not None:
            new = new._replace(
                compute_params=jax.tree.map(
                    lambda v: v.astype(compute_dtype), new_params
                )
            )
        return new, loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
