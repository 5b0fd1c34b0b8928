"""Adam fused into the manual reverse-scan backward (round 3).

DESIGN.md §9's step decomposition pins the flagship optimizer phase at
~1.6 ms: Adam + global-norm clipping moves ~1.3 GB of fp32 masters and
moments at ~80% of HBM bandwidth, and EXACT global clipping makes it
two-pass (every grad leaf must be materialized, reduced, then re-read).
Round 3's delayed clip (train/loop.delayed_clip_by_global_norm) removes
the two-pass constraint: the clip scale for step i is known BEFORE the
backward sweep (it is step i-1's norm, carried as optimizer state).
That unlocks this module: run the Adam update for layer k INSIDE the
reverse-scan body, right where layer k's gradients are produced —

  * the param-grad outer products' outputs feed the moment updates
    directly, so the (K,·)-stacked gradient tree is never written to or
    re-read from HBM (~2× grad-stack traffic eliminated), and
  * the moment/master traffic streams concurrently with the backward's
    MXU contractions instead of as a serial optimizer tail.

The per-layer backward algebra is ops/unroll_vjp.bwd_layer — the same
function bwd_from_carries scans over, called WITHOUT data-cotangent
accumulators so the gA/gb outer products are never traced. Optimizer
semantics replicate optax.chain(delayed_clip_by_global_norm(c),
adam(lr)) op-for-op (same moment/bias-correction/update expressions, in
the same dtypes), with one deliberate deviation: the global norm fed to
the NEXT step's scale is accumulated in fp32 even under bf16 compute
(optax.global_norm reduces in leaf dtype; a bf16 norm of a 60 M-param
tree is needlessly imprecise). While the clip is not binding both paths
scale by exactly 1.0, so they agree to within compiler-reassociation
ulps (XLA fuses the two program shapes differently) — pinned by
tests/test_fused_adam.py.

Scope: the XLA-scan forward (the flagship regime, where the Pallas
backward is VMEM-infeasible), B = I or a general z-dictionary B,
final-layer or deep-supervision loss, bf16 or fp32, freeze. The body
is factored as ``make_fused_update_core`` so the DP fast path can
shard_map the identical step with a per-layer gradient psum
(parallel/collectives.make_dp_fused_adam_step — identity-B, like all
sharded paths). Step-time A/B vs the unfused optimizer:
scripts/ab_clip.py.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from jax import Array

from dladmm_tpu.data.synthetic import make_batch
from dladmm_tpu.models.unroll import DLADMMParams
from dladmm_tpu.ops.unroll_vjp import (
    _fwd_scan,
    _fwd_scan_general,
    bwd_layer,
)
from dladmm_tpu.train.loop import (
    TrainState,
    weighted_trajectory_mse,
)


class FusedAdamState(NamedTuple):
    """Optimizer state: Adam moments (same [K,...] stacks as the params)
    plus the delayed-clip carry (last step's global grad norm)."""

    mu: Any  # DLADMMParams pytree, fp32
    nu: Any  # DLADMMParams pytree, fp32
    count: Array  # int32 scalar — number of updates applied
    prev_norm: Array  # fp32 scalar; = clip_norm before the first step


def make_fused_adam_state(
    params: DLADMMParams,
    clip_norm: Optional[float] = None,
    compute_dtype=None,
) -> TrainState:
    """TrainState whose opt_state is FusedAdamState (mirrors
    make_train_state + optimizer.init for the fused step)."""
    # clip_norm=0.0 means "clipping disabled" everywhere else in the
    # package (_build_optimizer's `if clip:`); honor that here rather
    # than clip-to-zero, which would silently freeze training.
    clip_norm = clip_norm or None
    opt = FusedAdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
        # Matches DelayedClipState init: step 0's scale is exactly 1.
        prev_norm=jnp.asarray(
            clip_norm if clip_norm is not None else 0.0, jnp.float32
        ),
    )
    cp = (
        None
        if compute_dtype is None
        else jax.tree.map(lambda v: v.astype(compute_dtype), params)
    )
    return TrainState(params, opt, jnp.zeros((), jnp.int32), cp)


def make_fused_update_core(
    layer_weights: Optional[Array] = None,
    lr: Union[float, Callable] = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip_norm: Optional[float] = None,
    compute_dtype=None,
    freeze: tuple = (),
    grad_reduce: Optional[Callable] = None,
    loss_reduce: Optional[Callable] = None,
    B: Optional[Array] = None,
):
    """The fused step body, free of jit/state packing so it can run
    either directly (make_fused_adam_step) or per-shard inside a
    shard_map (the DP fast path, where ``grad_reduce`` psums each
    layer's gradients over the data axis before the Adam update and
    ``loss_reduce`` psums the local-batch loss). B: the general
    z-dictionary (pre-cast to compute_dtype), or None for the B = I
    fast path — the general branch carries (x, z, lam, Ax, Bz) and the
    backward gains bwd_layer's two Bᵀ contractions per layer.

    Returns core(params32, params_c, mu, nu, count, prev_norm, A_c,
    b_c, x_star, e_star) -> (loss, new_p, new_mu, new_nu, new_cp,
    new_norm) with new_cp=None when compute_dtype is None.
    """
    clip_norm = clip_norm or None  # 0.0 == disabled (package convention)

    def core(params32, params_c, mu, nu, count, prev_norm, A_c, b_c,
             x_star, e_star):
        if B is None:
            (xK, zK, lamK, AxK), resid = _fwd_scan(params_c, A_c, b_c)
        else:
            (xK, zK, lamK, AxK, _), resid = _fwd_scan_general(
                params_c, A_c, B, b_c
            )

        # Loss cotangents via jax.vjp of the tiny output->loss closure:
        # identical ops to what value_and_grad(loss_fn) seeds into the
        # custom_vjp backward on the unfused path (targets stay in data
        # dtype — under bf16 compute the diffs promote to fp32 exactly
        # as in loss_fn).
        if layer_weights is None:

            def out_loss(x, z):
                return jnp.mean((x - x_star) ** 2) + jnp.mean(
                    (z - e_star) ** 2
                )

            loss, pull = jax.vjp(out_loss, xK, zK)
            gx, gz = pull(jnp.ones_like(loss))
            traj_ct = None
        else:
            # Per-layer x/z output stacks (resid layouts differ: the
            # general tuple carries Bz stacks too).
            tx, tz = (
                (resid[3], resid[4]) if B is None else (resid[4], resid[5])
            )

            def out_loss(tx_, tz_):
                return weighted_trajectory_mse(
                    tx_, tz_, x_star, e_star, layer_weights
                )

            loss, pull = jax.vjp(out_loss, tx, tz)
            traj_ct = pull(jnp.ones_like(loss))
            gx = jnp.zeros_like(xK)
            gz = jnp.zeros_like(zK)
        if loss_reduce is not None:
            loss = loss_reduce(loss)

        count_inc = count + 1
        # Same expressions as optax.scale_by_adam's bias_correction
        # (python-float ** int32 -> f32) and scale_by_learning_rate.
        bc1 = 1.0 - b1**count_inc
        bc2 = 1.0 - b2**count_inc
        lr_t = lr(count) if callable(lr) else lr
        step_size = -1.0 * lr_t
        if clip_norm is None:
            scale = jnp.float32(1.0)
        else:
            scale = jnp.minimum(
                1.0, clip_norm / jnp.maximum(prev_norm, 1e-16)
            )

        frozen = tuple(
            i
            for i, name in enumerate(DLADMMParams._fields)
            if name in freeze
        )

        def adam_leaf(g, m, v, p):
            # optax op order: clip scale, then update_moment(s), then
            # bias-corrected update, then -lr scale + apply_updates.
            g = g * scale.astype(g.dtype)
            m1 = (1.0 - b1) * g + b1 * m
            v1 = (1.0 - b2) * (g * g) + b2 * v
            u = (m1 / bc1) / (jnp.sqrt(v1 / bc2) + eps)
            p1 = p + (step_size * u).astype(p.dtype)
            return p1, m1, v1

        def body(carry, xs):
            gx, gz, glam, gAx = carry
            if traj_ct is None:
                r, pc, p32, m, v = xs
            else:
                r, pc, p32, m, v, (ctx, ctz) = xs
                gx = gx + ctx
                gz = gz + ctz
            cts, gp, _ = bwd_layer(
                pc, r, (gx, gz, glam, gAx), A_c, b_c, B, None
            )
            if frozen:
                gp = type(gp)(
                    *(
                        jnp.zeros_like(g) if i in frozen else g
                        for i, g in enumerate(gp)
                    )
                )
            if grad_reduce is not None:
                # DP: allreduce this layer's grads over the data axis
                # so every shard applies the identical update.
                gp = jax.tree.map(grad_reduce, gp)
            new = [
                adam_leaf(g, m_, v_, p_)
                for g, m_, v_, p_ in zip(gp, m, v, p32)
            ]
            p1 = type(p32)(*(t[0] for t in new))
            m1 = type(p32)(*(t[1] for t in new))
            v1 = type(p32)(*(t[2] for t in new))
            ys = (p1, m1, v1)
            if compute_dtype is not None:
                ys = ys + (
                    jax.tree.map(lambda t: t.astype(compute_dtype), p1),
                )
            if clip_norm is not None:
                # Per-layer fp32 sum-of-squares for NEXT step's delayed
                # clip scale — emitted as a ys OUTPUT, not a carry: the
                # scan's loop-carried chain stays free of the (possibly
                # psum'd) grads, so nothing optimizer-side sits on the
                # next iteration's critical path and XLA's while-loop
                # collective pipeliner is free to overlap the DP psums.
                # Skipped entirely when there is no clip to feed.
                ys = ys + (
                    sum(
                        jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in gp
                    ),
                )
            return cts, ys

        init = (
            gx,
            gz,
            jnp.zeros_like(lamK),
            jnp.zeros_like(AxK),
        )
        # Per-layer xs: residuals, compute-dtype params (backward
        # algebra), fp32 masters + moments (optimizer).
        xs = (resid, params_c, params32, mu, nu)
        if traj_ct is not None:
            xs = xs + (traj_ct,)
        _, ys = jax.lax.scan(body, init, xs, reverse=True)
        if clip_norm is not None:
            new_norm = jnp.sqrt(jnp.sum(ys[-1]))
            ys = ys[:-1]
        else:
            new_norm = prev_norm
        if compute_dtype is None:
            new_p, new_mu, new_nu = ys
            new_cp = None
        else:
            new_p, new_mu, new_nu, new_cp = ys
        return loss, new_p, new_mu, new_nu, new_cp, new_norm

    return core


def make_fused_adam_step(
    A: Array,
    batch: Optional[int] = None,
    sparsity_x: float = 0.1,
    sparsity_e: float = 0.1,
    layer_weights: Optional[Array] = None,
    lr: Union[float, Callable] = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip_norm: Optional[float] = None,
    compute_dtype=None,
    freeze: tuple = (),
    donate: bool = True,
    from_batch: bool = False,
    B: Optional[Array] = None,
):
    """Build the fused train step: data -> forward scan -> reverse scan
    with per-layer (grads -> delayed clip -> Adam) applied in-body.

    lr: float or an optax schedule (called with the update count, like
    optax.scale_by_learning_rate). clip_norm=None disables clipping
    (scale is the constant 1). With from_batch=True the step signature
    is (state, SyntheticBatch) instead of (state, key) — the benching
    variant (scripts/ab_clip.py). B: general z-dictionary (m, d), or
    None for the identity-B fast path.
    """
    A_c = A if compute_dtype is None else A.astype(compute_dtype)
    B_c = (
        B if B is None or compute_dtype is None else B.astype(compute_dtype)
    )
    core = make_fused_update_core(
        layer_weights, lr, b1, b2, eps, clip_norm, compute_dtype, freeze,
        B=B_c,
    )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, key_or_data):
        if from_batch:
            data = key_or_data
        else:
            data = make_batch(
                key_or_data, A, batch, sparsity_x, sparsity_e, A.dtype, B
            )
        params_c = (
            state.compute_params
            if state.compute_params is not None
            else state.params
        )
        b_c = (
            data.b
            if compute_dtype is None
            else data.b.astype(compute_dtype)
        )
        opt = state.opt_state
        loss, new_p, new_mu, new_nu, new_cp, new_norm = core(
            state.params,
            params_c,
            opt.mu,
            opt.nu,
            opt.count,
            opt.prev_norm,
            A_c,
            b_c,
            data.x_star,
            data.e_star,
        )
        new_opt = FusedAdamState(new_mu, new_nu, opt.count + 1, new_norm)
        return (
            TrainState(new_p, new_opt, state.step + 1, new_cp),
            loss,
        )

    return step


__all__ = [
    "FusedAdamState",
    "make_fused_adam_state",
    "make_fused_update_core",
    "make_fused_adam_step",
]
