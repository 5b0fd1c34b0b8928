"""Pallas-vs-reference-op tests (SURVEY.md §6.2-4): kernel output equals
the pure-JAX golden op to fp32 tolerance over randomized shapes including
non-multiple-of-128 edges, and jax.grad through both paths agrees
(custom_vjp correctness). Runs in interpret mode on the CPU backend; the
compiled-TPU parity check lives in the verify flow (real chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.ops.pallas_layer import make_fused_step, weights_fit_vmem


def _setup(m, n, S, K=4, seed=0):
    key = jax.random.PRNGKey(seed)
    kA, kd, kp = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    data = make_batch(kd, A, S)
    params = init_dladmm_params(A, K=K)
    leaves = list(params)
    keys = jax.random.split(kp, len(leaves))
    params = type(params)(
        *(p + 0.05 * jax.random.normal(k, p.shape) for k, p in zip(keys, leaves))
    )
    return A, data, params


# Shapes chosen to hit unaligned m/n/S and batch tiles that don't divide.
# The big shapes are slow-tier; the unaligned edges stay default. The
# fast tier keeps one exactly-lane-aligned (multiple-of-128) shape at a
# small batch so the no-padding full-lane-tile branch stays pinned by
# default — the S=32 variant of the same alignment moved to slow in
# late r5 (8.6 s of interpret-mode runtime for the same branch).
SHAPES = [
    (16, 32, 8),
    pytest.param(250, 500, 64, marks=pytest.mark.slow),
    (33, 77, 13),
    (128, 256, 8),
    pytest.param(128, 256, 32, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("m,n,S", SHAPES)
def test_fused_forward_matches_reference(m, n, S):
    A, data, params = _setup(m, n, S)
    step = make_fused_step(block_s=16)
    out_p = dladmm_forward(params, A, data.b, step_fn=step)
    out_r = dladmm_forward(params, A, data.b)
    for g, w in zip(out_p, out_r):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
        )


def test_fused_grad_matches_reference():
    A, data, params = _setup(24, 48, 16)
    step = make_fused_step(block_s=8)

    def loss(params, step_fn):
        x, z, _ = dladmm_forward(params, A, data.b, step_fn=step_fn)
        return jnp.mean((x - data.x_star) ** 2) + jnp.mean(
            (z - data.e_star) ** 2
        )

    gp = jax.grad(loss)(params, step)
    gr = jax.grad(loss)(params, None)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_bf16_matmul_mode_close_to_fp32():
    A, data, params = _setup(64, 128, 32)
    step = make_fused_step(block_s=16, matmul_dtype=jnp.bfloat16)
    out_p = dladmm_forward(params, A, data.b, step_fn=step)
    out_r = dladmm_forward(params, A, data.b)
    for g, w in zip(out_p, out_r):
        rel = np.linalg.norm(np.asarray(g) - np.asarray(w)) / (
            np.linalg.norm(np.asarray(w)) + 1e-9
        )
        assert rel < 0.05, rel  # bf16 operand rounding, fp32 accumulation


def test_general_B_falls_back_to_reference():
    key = jax.random.PRNGKey(0)
    kA, kB, kd = jax.random.split(key, 3)
    A = make_dictionary(kA, 16, 32)
    B = make_dictionary(kB, 16, 24)
    data = make_batch(kd, A, 8)
    params = init_dladmm_params(A, B, K=3)
    step = make_fused_step(block_s=8)
    out_p = dladmm_forward(params, A, data.b, B=B, step_fn=step)
    out_r = dladmm_forward(params, A, data.b, B=B)
    for g, w in zip(out_p, out_r):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_weights_fit_vmem_budget():
    assert weights_fit_vmem(250, 500, 250, 256)
    assert not weights_fit_vmem(8192, 16384, 8192, 256)
    # flagship fits only with bf16 operands and a modest batch tile
    assert not weights_fit_vmem(1000, 2000, 1000, 256)


def test_fused_step_bf16_grads():
    """Regression: the per-layer fused kernel's custom_vjp must work
    under bf16 inputs (fp32 SMEM beta promotes the rematerialized ref
    outputs; the backward aligns cotangent dtypes)."""
    import jax
    import jax.numpy as jnp

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
    from dladmm_tpu.ops.pallas_layer import make_fused_step

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 16, 32)
    params = init_dladmm_params(A, K=3)
    b = make_batch(kb, A, 8).b
    cast = lambda t: jax.tree.map(lambda v: v.astype(jnp.bfloat16), t)
    p16, A16, b16 = cast(params), cast(A), cast(b)
    step = make_fused_step(block_s=8)

    def loss(p):
        x, z, _ = dladmm_forward(p, A16, b16, step_fn=step)
        return jnp.mean(x.astype(jnp.float32) ** 2) + jnp.mean(
            z.astype(jnp.float32) ** 2
        )

    g = jax.grad(loss)(p16)
    assert g.W1.dtype == jnp.bfloat16
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))
