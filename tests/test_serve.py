"""Serving-path tests: AOT buckets, padding exactness, validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.serve import InferenceServer


@pytest.fixture(scope="module")
def server_and_data():
    key = jax.random.PRNGKey(0)
    kA, kd = jax.random.split(key)
    A = make_dictionary(kA, 20, 40)
    params = init_dladmm_params(A, K=5)
    data = make_batch(kd, A, 40)
    return InferenceServer(params, A, max_batch=64), params, A, data


def test_bucketed_solve_matches_direct(server_and_data):
    server, params, A, data = server_and_data
    for S in (1, 3, 17, 40):  # all off-bucket sizes
        b = data.b[:S]
        x, z = server.solve(b)
        xr, zr, _ = dladmm_forward(params, A, b)
        assert x.shape == (S, 40) and z.shape == (S, 20)
        np.testing.assert_allclose(np.asarray(x), np.asarray(xr), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(z), np.asarray(zr), rtol=1e-5, atol=1e-6)


def test_no_compile_at_request_time(server_and_data):
    server, *_ = server_and_data
    # All buckets compiled up-front.
    assert set(server.buckets) == set(server._compiled)


def test_validation(server_and_data):
    server, _, _, data = server_and_data
    with pytest.raises(ValueError, match="exceeds max bucket"):
        server.solve(jnp.zeros((100, 20)))
    with pytest.raises(ValueError, match="expected"):
        server.solve(jnp.zeros((4, 21)))


def test_bf16_server_close_to_fp32():
    import jax
    import jax.numpy as jnp

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.serve import InferenceServer

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 32, 64)
    params = init_dladmm_params(A, K=6)
    data = make_batch(kb, A, 16)
    b = data.b

    s32 = InferenceServer(params, A, max_batch=16)
    s16 = InferenceServer(params, A, max_batch=16, dtype=jnp.bfloat16)
    x32, z32 = s32.solve(b)
    x16, z16 = s16.solve(b)  # fp32 request cast internally
    assert x16.dtype == jnp.bfloat16
    scale = float(jnp.abs(x32).max()) + 1e-9
    assert float(jnp.abs(x16.astype(jnp.float32) - x32).max()) < 0.05 * scale
    # Pin the advertised solution-quality delta (serve.py: "~0.1 dB NMSE
    # [impact] at the benchmark shapes"): NMSE(dB) vs ground truth must
    # agree between the bf16 and fp32 servers to a small fraction of a dB.
    from dladmm_tpu.metrics.core import nmse_db

    d32 = float(nmse_db(x32, data.x_star))
    d16 = float(nmse_db(x16.astype(jnp.float32), data.x_star))
    assert abs(d16 - d32) < 0.25, (d16, d32)


def test_early_exit_layer_slicing(server_and_data):
    """layers=k serving == running the trained net's k-layer prefix
    (untied per-layer params make the slice exact)."""
    _, params, A, data = server_and_data
    k = 3
    s3 = InferenceServer(params, A, max_batch=16, layers=k)
    x3, z3 = s3.solve(data.b[:16])
    prefix = jax.tree.map(lambda v: v[:k], params)
    xr, zr, _ = dladmm_forward(prefix, A, data.b[:16])
    np.testing.assert_allclose(np.asarray(x3), np.asarray(xr), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z3), np.asarray(zr), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="layers"):
        InferenceServer(params, A, max_batch=16, layers=0)


def test_serve_general_B():
    """InferenceServer(B=...) serves general-constraint solvers: results
    match dladmm_forward with B exactly, including bucket padding and
    the early-exit prefix."""
    import numpy as np

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
    from dladmm_tpu.serve import InferenceServer

    m, n, d, K = 12, 24, 18, 5
    key = jax.random.PRNGKey(0)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    B = make_dictionary(kB, m, d)
    params = init_dladmm_params(A, B, K=K)
    b = make_batch(kb, A, 5, B=B).b  # 5 pads into the 8 bucket

    server = InferenceServer(params, A, max_batch=16, B=B)
    x, z = server.solve(b)
    assert x.shape == (5, n) and z.shape == (5, d)
    ex, ez, _ = dladmm_forward(params, A, b, B=B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ex), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ez), rtol=1e-6)

    early = InferenceServer(params, A, max_batch=16, B=B, layers=2)
    x2, _ = early.solve(b)
    p2 = jax.tree.map(lambda v: v[:2], params)
    ex2, _, _ = dladmm_forward(p2, A, b, B=B)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ex2), rtol=1e-6)

    with pytest.raises(ValueError, match="identity B"):
        InferenceServer(params, A, max_batch=16, B=B, kernel="megakernel")
