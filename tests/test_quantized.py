"""int8 quantized serving path (ops/quantized.py): scan/megakernel
parity, eligibility math, server integration. Kernels run in interpret
mode on CPU — the Mosaic compile is gated by scripts/verify_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.ops import quantized as q


def _setup(m=32, n=64, K=5, S=16):
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)
    qp, qd = q.quantize_params(params, A)
    return qp, qd, data


@pytest.mark.slow
def test_int8_megakernel_matches_scan_whole_batch():
    """Same quantization decisions + exact int32 dots + same fp32
    elementwise chain => the Pallas kernel reproduces the XLA scan to
    fp32 roundoff."""
    qp, qd, data = _setup()
    xs, zs, lams = q.dladmm_forward_int8(qp, qd, data.b)
    xp, zp, lamp = q.dladmm_forward_int8_pallas(qp, qd, data.b)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xs), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zs), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lamp), np.asarray(lams), rtol=1e-6, atol=1e-7)


def test_int8_megakernel_matches_scan_tiled(monkeypatch):
    """Tile-outer 2-D grid branch (grid (S/bs, K)): per-tile k==0 init
    and VMEM-resident state per tile."""
    monkeypatch.setattr(q, "int8_tile_batch", lambda *a, **k: 4)
    qp, qd, data = _setup(S=16)
    xs, zs, _ = q.dladmm_forward_int8(qp, qd, data.b)
    xp, zp, _ = q.dladmm_forward_int8_pallas(qp, qd, data.b)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xs), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zs), rtol=1e-6, atol=1e-7)


def test_int8_tile_eligibility_beats_fp32():
    """1-byte weights widen the tile budget: at the reference serving
    shape the int8 kernel fits at least as large a batch tile as the
    fp32 kernel, and the whole batch at buckets the fp32 kernel must
    tile."""
    from dladmm_tpu.ops.pallas_unroll import unroll_tile_batch

    bs8 = q.int8_tile_batch(250, 500, 250, 4096)
    bs32 = unroll_tile_batch(250, 500, 250, 4096)
    assert bs8 is not None and bs32 is not None and bs8 >= bs32
    # Infeasible shapes still refuse.
    assert q.int8_tile_batch(8192, 16384, 8192, 64) is None


@pytest.mark.slow
def test_int8_server_megakernel_matches_auto():
    """InferenceServer(dtype='int8', kernel='megakernel') == the int8
    XLA-scan server on every bucket (same quantized math)."""
    from dladmm_tpu.serve import InferenceServer

    key = jax.random.PRNGKey(1)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 32, 64)
    params = init_dladmm_params(A, K=4)
    data = make_batch(kb, A, 16)
    s_auto = InferenceServer(params, A, max_batch=16, dtype="int8")
    s_mega = InferenceServer(
        params, A, max_batch=16, dtype="int8", kernel="megakernel"
    )
    for S in (1, 7, 16):
        xa, za = s_auto.solve(data.b[:S])
        xm, zm = s_mega.solve(data.b[:S])
        np.testing.assert_allclose(
            np.asarray(xm), np.asarray(xa), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(zm), np.asarray(za), rtol=1e-6, atol=1e-7
        )
    with pytest.raises(ValueError, match="int8"):
        InferenceServer(params, A, max_batch=16, dtype="int8",
                        kernel="fused")
