"""Backward megakernel parity (ops/pallas_bwd.py): the whole-unroll
Pallas backward must reproduce jax.grad of the golden op — every param
leaf plus the gA/gb data cotangents — in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.ops.pallas_bwd import bwd_fits_vmem, unroll_bwd_pallas
from dladmm_tpu.ops.pallas_unroll import make_unrolled_forward


def _setup(m, n, K, S, per_coordinate=True, seed=0):
    key = jax.random.PRNGKey(seed)
    kA, kb, kp = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K, per_coordinate=per_coordinate)
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(kp, len(leaves))
    leaves = [
        l + 0.1 * jnp.abs(l).mean() * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, ks)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    b = make_batch(kb, A, S).b
    return params, A, b


def _loss(fwd, params, A, b):
    x, z, lam = fwd(params, A, b)
    return jnp.sum(x * x) + jnp.sum(z * jnp.cos(z)) + 0.1 * jnp.sum(lam)


@pytest.mark.parametrize("per_coordinate", [True, False])
@pytest.mark.parametrize(
    "shape",
    [
        (16, 32, 5, 8),
        pytest.param((40, 80, 8, 16), marks=pytest.mark.slow),
    ],
)
def test_pallas_bwd_matches_autodiff(shape, per_coordinate):
    m, n, K, S = shape
    params, A, b = _setup(m, n, K, S, per_coordinate)
    fwd = make_unrolled_forward()  # interpret mode on CPU

    ga = jax.jit(
        jax.grad(
            lambda p, A, b: _loss(
                lambda *a: dladmm_forward(*a), p, A, b
            ),
            argnums=(0, 1, 2),
        )
    )(params, A, b)
    gm = jax.jit(jax.grad(lambda p, A, b: _loss(fwd, p, A, b), argnums=(0, 1, 2)))(
        params, A, b
    )
    for name, a_leaf, m_leaf in zip(
        list(params._fields) + ["A", "b"],
        list(ga[0]) + [ga[1], ga[2]],
        list(gm[0]) + [gm[1], gm[2]],
    ):
        scale = np.abs(np.asarray(a_leaf)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(m_leaf),
            np.asarray(a_leaf),
            rtol=3e-5,
            atol=3e-5 * scale,
            err_msg=f"grad mismatch in {name}",
        )


@pytest.mark.slow
def test_pallas_bwd_direct_call_parity():
    """Calling unroll_bwd_pallas directly on a scan-produced trajectory
    matches the reverse-scan backward bit-for-bit semantics."""
    from dladmm_tpu.ops.unroll_vjp import (
        _fwd_scan,
        bwd_from_carries,
        shifted_residuals,
    )

    params, A, b = _setup(24, 48, 6, 8)
    (x, z, lam, Ax), traj6 = _fwd_scan(params, A, b)
    lam_in, Ax_in, z_in, x1, z1, Ax1 = traj6
    cts = (jnp.ones_like(x), 0.5 * jnp.ones_like(z), 0.1 * jnp.ones_like(lam))
    gp_ref, gA_ref, gb_ref = bwd_from_carries(params, A, b, traj6, cts)
    gp_pl, gA_pl, gb_pl = unroll_bwd_pallas(
        params, A, b, (x1, z1, jnp.concatenate([lam_in[1:], lam[None]]), Ax1),
        cts,
    )
    for name, r, p in zip(params._fields, gp_ref, gp_pl):
        scale = np.abs(np.asarray(r)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-5, atol=2e-5 * scale,
            err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(gA_pl), np.asarray(gA_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_pl), np.asarray(gb_ref),
                               rtol=2e-5, atol=2e-5)


def test_bwd_fits_vmem_eligibility():
    assert bwd_fits_vmem(250, 500, 250, 64)
    assert bwd_fits_vmem(250, 500, 250, 512, itemsize=2)
    # bf16 batch-1024 trajectory + fp32 cotangent scratch exceeds VMEM
    # (the reverse-scan manual VJP is faster there anyway — BASELINE.md).
    assert not bwd_fits_vmem(250, 500, 250, 1024, itemsize=2)
    assert not bwd_fits_vmem(1000, 2000, 1000, 1024)


def test_bwd_chunk_batch_eligibility():
    """The batch-chunked kernel covers the paper-shape batch-1024 case
    the whole-batch kernel cannot (VERDICT r1 #4)."""
    from dladmm_tpu.ops.pallas_bwd import bwd_chunk_batch

    bs = bwd_chunk_batch(250, 500, 250, 1024)
    assert bs is not None and 1024 % bs == 0
    assert bwd_chunk_batch(250, 500, 250, 1024, itemsize=2) is not None
    # Flagship stays infeasible (weights alone ~12 MB bf16 — BASELINE.md);
    # the reverse-scan manual VJP remains the flagship backward.
    assert bwd_chunk_batch(1000, 2000, 1000, 1024, itemsize=2) is None


@pytest.mark.parametrize("bs", [4, 8])
def test_pallas_bwd_chunked_matches_reverse_scan(bs):
    """Batch-chunked backward megakernel (grid (K, S/bs), k outer,
    cross-tile fp32 param-grad accumulation) == reverse-scan backward."""
    from dladmm_tpu.ops.pallas_bwd import unroll_bwd_pallas_chunked
    from dladmm_tpu.ops.unroll_vjp import _fwd_scan, bwd_from_carries

    params, A, b = _setup(24, 48, 6, 16)
    (x, z, lam, Ax), traj6 = _fwd_scan(params, A, b)
    lam_in, Ax_in, z_in, x1, z1, Ax1 = traj6
    cts = (jnp.ones_like(x), 0.5 * jnp.ones_like(z), 0.1 * jnp.ones_like(lam))
    gp_ref, gA_ref, gb_ref = bwd_from_carries(params, A, b, traj6, cts)
    gp_pl, gA_pl, gb_pl = unroll_bwd_pallas_chunked(
        params,
        A,
        b,
        (x1, z1, jnp.concatenate([lam_in[1:], lam[None]]), Ax1),
        cts,
        bs=bs,
    )
    for name, r, p in zip(params._fields, gp_ref, gp_pl):
        scale = np.abs(np.asarray(r)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-5, atol=2e-5 * scale,
            err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(gA_pl), np.asarray(gA_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_pl), np.asarray(gb_ref),
                               rtol=2e-5, atol=2e-5)


def test_training_step_full_pallas_matches_xla():
    """One Adam step through megakernel fwd + Pallas bwd equals the pure
    XLA step."""
    import optax

    params, A, b = _setup(16, 32, 4, 8)
    data = make_batch(jax.random.PRNGKey(5), A, 8)
    opt = optax.adam(1e-3)

    def step(fwd):
        def loss(p):
            x, z, _ = fwd(p, A, data.b)
            return jnp.mean((x - data.x_star) ** 2) + jnp.mean(
                (z - data.e_star) ** 2
            )

        g = jax.grad(loss)(params)
        u, _ = opt.update(g, opt.init(params), params)
        return optax.apply_updates(params, u)

    pa = step(lambda p, A, b: dladmm_forward(p, A, b))
    pm = step(make_unrolled_forward())
    for name, a_leaf, m_leaf in zip(params._fields, pa, pm):
        np.testing.assert_allclose(
            np.asarray(m_leaf), np.asarray(a_leaf), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )
