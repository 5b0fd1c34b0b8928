"""Whole-unroll megakernel parity tests (SURVEY.md N3): forward and grads
equal the scan-of-golden-op path, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.ops.pallas_unroll import make_unrolled_forward, unroll_fits_vmem


def _setup(m, n, K, S, seed=0):
    key = jax.random.PRNGKey(seed)
    kA, kd, kp = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    data = make_batch(kd, A, S)
    params = init_dladmm_params(A, K=K)
    leaves = list(params)
    params = type(params)(
        *(p + 0.05 * jax.random.normal(k, p.shape)
          for k, p in zip(jax.random.split(kp, len(leaves)), leaves))
    )
    return A, data, params


@pytest.mark.parametrize(
    "m,n,K,S",
    [
        (16, 32, 4, 8),
        # The real paper shape is the slow tier's job; the odd-shape
        # param below covers the same tiling edge cases fast.
        pytest.param(250, 500, 15, 64, marks=pytest.mark.slow),
        (33, 77, 5, 13),
    ],
)
def test_megakernel_forward_parity(m, n, K, S):
    A, data, params = _setup(m, n, K, S)
    fwd = make_unrolled_forward()
    out_p = fwd(params, A, data.b)
    out_r = dladmm_forward(params, A, data.b)
    for g, w in zip(out_p, out_r):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize(
    "prox_name", ["nonneg_l1", "box", "group_l2", "elastic_net"]
)
def test_prox_megakernel_matches_scan(prox_name):
    """Round 5: the prox-templated inference megakernel == the XLA-scan
    forward with the same prox pair baked into the layer step, for every
    ops/prox.py operator (prox_x = named op, prox_z = l1 — the
    synthetic_nonneg pairing; group_l2 exercises an in-kernel row
    reduction)."""
    from dladmm_tpu.ops.pallas_unroll import make_unrolled_inference_prox
    from dladmm_tpu.ops.prox import get_prox, prox_l1
    from dladmm_tpu.ops.reference import make_cached_step

    m, n, K, S = 16, 32, 4, 8
    A, data, params = _setup(m, n, K, S)
    px = get_prox(prox_name, rho=0.3)
    step_fn = make_cached_step(px, prox_l1)
    fwd = make_unrolled_inference_prox(px, prox_l1)
    out_p = fwd(params, A, data.b)
    out_r = dladmm_forward(params, A, data.b, step_fn=step_fn)
    for g, w in zip(out_p, out_r):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
        )


def test_prox_megakernel_available_reasons():
    """The consolidated routing decision (round-5 review: four
    hand-copies had drifted): availability and the reason strings the
    callers surface in their error messages."""
    from dladmm_tpu.ops.pallas_unroll import prox_megakernel_available
    from dladmm_tpu.ops.prox import get_prox

    nn, l1 = get_prox("nonneg_l1"), get_prox("l1")
    ok, why = prox_megakernel_available((nn, l1), 16, 32, 16, 8)
    assert ok and why == ""
    ok, why = prox_megakernel_available(None, 16, 32, 16, 8)
    assert not ok and "prox_pair" in why
    ok, why = prox_megakernel_available(
        (get_prox("group_l2"), l1), 16, 32, 16, 8
    )
    assert not ok and "kernel-exact" in why
    # The flagship shape exceeds the megakernel's VMEM tile.
    ok, why = prox_megakernel_available((nn, l1), 1000, 2000, 1000, 64)
    assert not ok and "VMEM" in why


def test_megakernel_grad_parity():
    A, data, params = _setup(24, 48, 5, 16)
    fwd = make_unrolled_forward()

    def loss(p, f):
        x, z, _ = f(p, A, data.b)
        return jnp.mean((x - data.x_star) ** 2) + jnp.mean((z - data.e_star) ** 2)

    gp = jax.grad(loss)(params, fwd)
    gr = jax.grad(loss)(params, lambda p, A, b: dladmm_forward(p, A, b))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_unroll_fits_vmem():
    assert unroll_fits_vmem(250, 500, 250, 64)
    assert unroll_fits_vmem(250, 500, 250, 1024)
    assert not unroll_fits_vmem(8192, 16384, 8192, 1024)


def test_trajectory_megakernel_parity():
    from dladmm_tpu.ops.pallas_unroll import make_unrolled_trajectory

    A, data, params = _setup(24, 48, 5, 16)
    traj_fn = make_unrolled_trajectory()
    got = traj_fn(params, A, data.b)
    _, want = dladmm_forward(params, A, data.b, capture_trajectory=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
        )


def test_trajectory_megakernel_grads():
    from dladmm_tpu.ops.pallas_unroll import make_unrolled_trajectory

    A, data, params = _setup(16, 32, 4, 8)
    traj_fn = make_unrolled_trajectory()

    def loss(p, f):
        tx, tz, _ = f(p, A, data.b)
        return jnp.mean((tx - data.x_star[None]) ** 2) + jnp.mean(
            (tz - data.e_star[None]) ** 2
        )

    gp = jax.grad(loss)(params, traj_fn)
    gr = jax.grad(loss)(
        params,
        lambda p, A_, b_: dladmm_forward(p, A_, b_, capture_trajectory=True)[1],
    )
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_traj_fits_vmem_gates_vjp_forward():
    """The trajectory (VJP-forward) variant needs more VMEM than the
    inference kernel; shapes like 64x256 patches at S~4k must fall back
    (regression for a real-TPU scoped-vmem OOM)."""
    from dladmm_tpu.ops.pallas_unroll import traj_fits_vmem, unroll_fits_vmem

    # Inference kernel fits but the trajectory variant must not.
    assert unroll_fits_vmem(64, 256, 64, 3844)
    assert not traj_fits_vmem(64, 256, 64, 3844)
    # Reference config fits both.
    assert unroll_fits_vmem(250, 500, 250, 64)
    assert traj_fits_vmem(250, 500, 250, 64)


def test_tile_batch_eligibility():
    """Tile-outer kernels cover the serving/VJP shapes the whole-batch
    kernels cannot (round 2): reference shape at bucket 4096 (inference)
    and batch 1024 (trajectory)."""
    from dladmm_tpu.ops.pallas_unroll import (
        traj_fits_vmem,
        traj_tile_batch,
        unroll_tile_batch,
    )

    assert unroll_tile_batch(250, 500, 250, 64) == 64  # whole batch
    bs = unroll_tile_batch(250, 500, 250, 4096)
    assert bs is not None and bs < 4096 and 4096 % bs == 0
    assert not traj_fits_vmem(250, 500, 250, 1024)
    bt = traj_tile_batch(250, 500, 250, 1024)
    assert bt is not None and bt < 1024 and 1024 % bt == 0


def test_tiled_forward_parity(monkeypatch):
    """Tile-outer inference megakernel (grid (S/bs, K)) == scan path.
    The tiny test shape fits whole-batch, so force bs < S to exercise
    the 2-D grid in interpret mode."""
    import dladmm_tpu.ops.pallas_unroll as pu

    m, n, K, S = 24, 48, 5, 16
    A, data, params = _setup(m, n, K, S)
    x_ref, z_ref, lam_ref = dladmm_forward(params, A, data.b)
    monkeypatch.setattr(pu, "unroll_tile_batch", lambda *a, **k: 4)
    x, z, lam = pu._unrolled_forward_pallas(
        params, A, data.b, matmul_dtype=None, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref), rtol=2e-5, atol=1e-6)


def test_tiled_trajectory_parity(monkeypatch):
    """Tile-outer trajectory megakernel == scan trajectory (stacked
    (K, S, ·) layout assembled from (layer, tile)-indexed blocks)."""
    import dladmm_tpu.ops.pallas_unroll as pu

    m, n, K, S = 24, 48, 5, 16
    A, data, params = _setup(m, n, K, S)
    traj_ref = pu._traj_xla(params, A, data.b)
    monkeypatch.setattr(pu, "traj_tile_batch", lambda *a, **k: 4)
    traj = pu._traj_pallas(
        params, A, data.b, matmul_dtype=None, interpret=True, with_tax=True
    )
    for name, got, want in zip(("tx", "tz", "tlam", "tax"), traj, traj_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6,
            err_msg=name,
        )


def test_deep_supervision_trajectory_megakernel_grads():
    """select_forward(need_trajectory=True) now returns the trajectory
    megakernel; deep-supervision loss + grads through it match the XLA
    reference scan (round-2: the old scan+fused-step selection wedged
    the TPU compiler — models/api.py)."""
    from dladmm_tpu.models.api import select_forward
    from dladmm_tpu.train.loop import loss_fn

    m, n, K, S = 24, 48, 5, 16
    A, data, params = _setup(m, n, K, S)
    lw = jnp.full((K,), 1.0 / K)
    fwd, step, desc = select_forward(m, n, m, S, need_trajectory=True)
    assert desc == "trajectory-megakernel" and step is None

    def loss_ref(p):
        return loss_fn(p, A, data.b, data.x_star, data.e_star, None, lw)

    def loss_mk(p):
        return loss_fn(
            p, A, data.b, data.x_star, data.e_star, None, lw,
            forward_fn=fwd,
        )

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_mk, g_mk = jax.value_and_grad(loss_mk)(params)
    np.testing.assert_allclose(float(l_mk), float(l_ref), rtol=1e-5)
    for name, r, got in zip(params._fields, g_ref, g_mk):
        scale = np.abs(np.asarray(r)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(r), rtol=3e-5, atol=3e-5 * scale,
            err_msg=name,
        )


@pytest.mark.slow
def test_trajectory_forward_over_vmem_falls_back_to_xla():
    """make_unrolled_trajectory at a shape whose trajectory tile does
    NOT fit VMEM must fall back to the XLA-scan trajectory (same math)
    rather than raise — on every backend (the flagship deep-supervision
    config hits this path; previously CPU raised)."""
    from dladmm_tpu.ops.pallas_unroll import (
        make_unrolled_trajectory,
        traj_tile_batch,
    )

    m, n, K, S = 1000, 2000, 2, 1024
    assert traj_tile_batch(m, n, m, S) is None  # shape is over-VMEM
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    b = make_batch(kb, A, S).b
    tx, tz, tlam = make_unrolled_trajectory()(params, A, b)
    assert tx.shape == (K, S, n)
    (ex, ez, el), (etx, etz, etlam) = dladmm_forward(
        params, A, b, capture_trajectory=True
    )
    np.testing.assert_allclose(
        np.asarray(tx), np.asarray(etx), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tlam), np.asarray(etlam), rtol=2e-5, atol=2e-5
    )
