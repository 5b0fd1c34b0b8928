"""Explicit-collective sharded forward/training (SURVEY.md N7, §5.5, §9.2-3).

New TPU-first scope (the reference is single-GPU, SURVEY.md §4.1): the
K-layer unroll runs under shard_map on a ('data','model') mesh.

TP sharding algebra (SURVEY.md §9.3, worked out so each layer needs ONE
collective):

  sharded along 'model' (the code dimension n):   x, W1 (rows), theta1,
                                                  A (columns)
  replicated across 'model' (the m dimension):    z, lam, b, W2, theta2,
                                                  beta

  per layer:  u = Ax + (z - b + lam/beta)      Ax carried, replicated
              x1_t = shrink(x_t - u @ W1_t^T)  LOCAL (W1 row-shard -> its
                                               own slice of x1; u is
                                               replicated so the m-
                                               contraction is local)
              Ax1 = psum_model(x1_t @ A_t^T)   <-- the ONE collective:
                                               Schur-style summation of
                                               partial matvecs over ICI
              z1, lam1                         replicated compute (m << n
                                               in the TP regime; cheaper
                                               to duplicate than to
                                               gather)

DP: batch sharded along 'data'; the only cross-data communication is the
loss/metric psum, whose transpose gives the gradient allreduce.
Gradient correctness across replicated params relies on shard_map's
replication tracking inserting the transposition psums — pinned against
single-device autodiff by tests/test_distributed.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.sharding import PartitionSpec as P

from dladmm_tpu.models.unroll import DLADMMParams
from dladmm_tpu.ops.reference import LayerParams, shrink
from dladmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# shard_map specs (match parallel.mesh.param_shardings_tp).
PARAM_SPECS = DLADMMParams(
    W1=P(None, MODEL_AXIS, None),
    W2=P(None, None, None),
    theta1=P(None, MODEL_AXIS),
    theta2=P(None, None),
    beta=P(None),
)
A_SPEC = P(None, MODEL_AXIS)
B_SPEC = P(DATA_AXIS, None)  # observations (S, m)
X_SPEC = P(DATA_AXIS, MODEL_AXIS)  # codes (S, n)
Z_SPEC = P(DATA_AXIS, None)  # corruption (S, m)


def _tp_layer_step(A_t, b, x_t, z, lam, Ax, p: LayerParams):
    """One D-LADMM layer on local shards (B = I). All names suffixed _t
    are 'model'-sharded along n; the rest are replicated across 'model'
    and sharded along 'data' on the batch."""
    beta = jnp.maximum(p.beta, 1e-6)
    base = z - b + lam / beta
    u = Ax + base
    x1_t = shrink(
        x_t
        - jax.lax.dot_general(u, p.W1, (((1,), (1,)), ((), ()))),
        p.theta1,
    )
    partial = jax.lax.dot_general(x1_t, A_t, (((1,), (1,)), ((), ())))
    Ax1 = jax.lax.psum(partial, MODEL_AXIS)
    v = Ax1 + base
    z1 = shrink(
        z - jax.lax.dot_general(v, p.W2, (((1,), (1,)), ((), ()))),
        p.theta2,
    )
    lam1 = lam + beta * (Ax1 + z1 - b)
    return x1_t, z1, lam1, Ax1


def _tp_forward_local(params, A_t, b):
    """Local (inside-shard_map) scan over layers from zero state."""
    S = b.shape[0]
    m = b.shape[1]
    n_t = A_t.shape[1]
    # Zero carries must carry the same varying-axes (vma) types as the
    # step outputs: x varies over both mesh axes, the m-sized state over
    # 'data' only (Ax is psum'd over 'model' each layer).
    def vary(val, axes):
        return jax.lax.pcast(val, axes, to="varying")

    x = vary(jnp.zeros((S, n_t), b.dtype), (DATA_AXIS, MODEL_AXIS))
    z = vary(jnp.zeros((S, m), b.dtype), (DATA_AXIS,))
    lam = vary(jnp.zeros((S, m), b.dtype), (DATA_AXIS,))
    Ax = vary(jnp.zeros((S, m), b.dtype), (DATA_AXIS,))

    def body(carry, p):
        x, z, lam, Ax = carry
        x, z, lam, Ax = _tp_layer_step(A_t, b, x, z, lam, Ax, p)
        return (x, z, lam, Ax), None

    (x, z, lam, _), _ = jax.lax.scan(
        body, (x, z, lam, Ax), LayerParams(*params)
    )
    return x, z, lam


def sharded_forward(mesh, params, A, b):
    """Sharded inference: returns (x, z, lam) as global arrays
    (x sharded over data x model, z/lam over data)."""
    fn = jax.shard_map(
        _tp_forward_local,
        mesh=mesh,
        in_specs=(PARAM_SPECS, A_SPEC, B_SPEC),
        out_specs=(X_SPEC, Z_SPEC, Z_SPEC),
    )
    return jax.jit(fn)(params, A, b)


def make_sharded_train_step(
    optimizer: optax.GradientTransformation, mesh
):
    """jitted (state, batch) -> (state, loss) over the DP x TP mesh.

    Loss/grad runs inside shard_map with explicit psums; the optax update
    runs outside under GSPMD (elementwise, partitions trivially along the
    existing param shardings). Final-layer MSE loss (SURVEY.md §2 pt 6).
    """

    def local_loss_and_grad(params, A_t, b, x_star_t, e_star):
        S_local = b.shape[0]
        S = S_local * mesh.shape[DATA_AXIS]
        n = A_t.shape[1] * mesh.shape[MODEL_AXIS]
        m = b.shape[1]

        def local_loss(params):
            x_t, z, _ = _tp_forward_local(params, A_t, b)
            sse_x = jnp.sum((x_t - x_star_t) ** 2)
            sse_z = jnp.sum((z - e_star) ** 2)
            lx = jax.lax.psum(sse_x, (DATA_AXIS, MODEL_AXIS)) / (S * n)
            lz = jax.lax.psum(sse_z, DATA_AXIS) / (S * m)
            return lx + lz

        return jax.value_and_grad(local_loss)(params)

    grad_fn = jax.shard_map(
        local_loss_and_grad,
        mesh=mesh,
        in_specs=(PARAM_SPECS, A_SPEC, B_SPEC, X_SPEC, Z_SPEC),
        out_specs=(P(), PARAM_SPECS),
    )

    @jax.jit
    def step(state, A, batch):
        loss, grads = grad_fn(
            state.params, A, batch.b, batch.x_star, batch.e_star
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return type(state)(params, opt_state, state.step + 1), loss

    return step
