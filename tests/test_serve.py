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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_serve_general_prox_matches_forward():
    """InferenceServer(step_fn=...) serves general-prox solvers with the
    TRAINED prox pair (ADVICE r3: serving silently ran the l1 shrink):
    results match dladmm_forward with the same step_fn, differ from l1
    serving, and respect the prox's constraint."""
    import numpy as np

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
    from dladmm_tpu.ops.prox import get_prox
    from dladmm_tpu.ops.reference import make_cached_step
    from dladmm_tpu.serve import InferenceServer

    m, n, K = 14, 28, 5
    key = jax.random.PRNGKey(3)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    b = make_batch(kb, A, 5, nonneg_x=True).b  # pads into the 8 bucket
    step_fn = make_cached_step(get_prox("nonneg_l1"), get_prox("l1"))

    server = InferenceServer(params, A, max_batch=16, step_fn=step_fn)
    x, z = server.solve(b)
    ex, ez, _ = dladmm_forward(params, A, b, step_fn=step_fn)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ex), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ez), rtol=1e-6)
    assert np.asarray(x).min() >= 0.0  # the nonneg prox was applied
    # ... and the l1 server would have returned something else.
    l1x, _ = InferenceServer(params, A, max_batch=16).solve(b)
    assert not np.allclose(np.asarray(l1x), np.asarray(x))

    # step_fn ALONE (opaque callable) cannot drive the megakernel — the
    # kernel needs the prox callables (prox_pair, round 5).
    with pytest.raises(ValueError, match="prox_pair"):
        InferenceServer(
            params, A, max_batch=16, step_fn=step_fn, kernel="megakernel"
        )
    with pytest.raises(ValueError, match="l1/l1"):
        InferenceServer(
            params, A, max_batch=16, step_fn=step_fn, dtype="int8"
        )


def test_serve_prox_pair_megakernel_matches_scan():
    """Round 5: InferenceServer(prox_pair=...) serves through the
    prox-templated whole-unroll megakernel where the tile fits — exact
    match with the scan-path step_fn server, and the explicit
    kernel='megakernel' request is honored."""
    import numpy as np

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.ops.prox import get_prox
    from dladmm_tpu.ops.reference import make_cached_step
    from dladmm_tpu.serve import InferenceServer

    m, n, K = 14, 28, 5
    key = jax.random.PRNGKey(3)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    b = make_batch(kb, A, 5, nonneg_x=True).b
    pair = (get_prox("nonneg_l1"), get_prox("l1"))
    step_fn = make_cached_step(*pair)

    mega_server = InferenceServer(
        params, A, max_batch=16, prox_pair=pair, kernel="megakernel"
    )
    scan_server = InferenceServer(
        params, A, max_batch=16, step_fn=step_fn, kernel="reference"
    )
    x_m, z_m = mega_server.solve(b)
    x_s, z_s = scan_server.solve(b)
    np.testing.assert_allclose(
        np.asarray(x_m), np.asarray(x_s), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(z_m), np.asarray(z_s), rtol=1e-5, atol=1e-6
    )
    assert np.asarray(x_m).min() >= 0.0
    # prox_pair composes with general B only via step_fn.
    with pytest.raises(ValueError, match="identity B"):
        InferenceServer(
            params,
            A,
            max_batch=16,
            prox_pair=pair,
            B=jnp.ones((m, 4), jnp.float32),
        )


@pytest.mark.slow
def test_sharded_server_general_prox_matches_single_device():
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.ops.prox import get_prox
    from dladmm_tpu.ops.reference import make_cached_step
    from dladmm_tpu.parallel.mesh import make_mesh
    from dladmm_tpu.serve import InferenceServer, ShardedInferenceServer

    m, n, K = 14, 28, 4
    key = jax.random.PRNGKey(4)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    b = make_batch(kb, A, 24, nonneg_x=True).b
    step_fn = make_cached_step(get_prox("nonneg_l1"), get_prox("l1"))

    sharded = ShardedInferenceServer(
        params, A, make_mesh(), max_batch=32, step_fn=step_fn
    )
    single = InferenceServer(params, A, max_batch=32, step_fn=step_fn)
    xs, zs = sharded.solve(b)
    x1, z1 = single.solve(b)
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(x1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(z1), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_int8_server_quality_and_exactness():
    """dtype='int8' serving: per-row weight scales + per-sample dynamic
    activation quantization (ops/quantized.py). Pins (a) the quantized
    forward == the server's bucketed/padded path bit-for-bit, (b) NMSE
    vs ground truth within a small fraction of a dB of the fp32 server
    (the quality contract advertised in serve.py/BASELINE.md), and
    (c) validation: general B and explicit kernels are rejected."""
    from dladmm_tpu.metrics.core import nmse_db
    from dladmm_tpu.ops.quantized import (
        dladmm_forward_int8,
        quantize_params,
    )

    key = jax.random.PRNGKey(0)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, 32, 64)
    params = init_dladmm_params(A, K=6)
    data = make_batch(kb, A, 16)

    s32 = InferenceServer(params, A, max_batch=16)
    s8 = InferenceServer(params, A, max_batch=16, dtype="int8")
    x32, _ = s32.solve(data.b)
    x8, z8 = s8.solve(data.b[:11])  # off-bucket: exercises padding
    qp, qd = quantize_params(params, A)
    xr, zr, _ = dladmm_forward_int8(qp, qd, data.b[:11])
    np.testing.assert_array_equal(np.asarray(x8), np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(z8), np.asarray(zr))

    d32 = float(nmse_db(x32[:11], data.x_star[:11]))
    d8 = float(nmse_db(x8, data.x_star[:11]))
    assert abs(d8 - d32) < 0.3, (d8, d32)

    with pytest.raises(ValueError, match="identity B"):
        InferenceServer(
            params, A, max_batch=16, dtype="int8",
            B=make_dictionary(kB, 32, 20),
        )
    # kernel='megakernel' is the int8 Pallas path (tests/test_quantized.py);
    # anything else is rejected.
    with pytest.raises(ValueError, match="kernel"):
        InferenceServer(params, A, max_batch=16, dtype="int8",
                        kernel="fused")


def test_int8_quantize_roundtrip():
    """quantize_rows: per-row symmetric int8 with exact zero-row
    handling and <= 1/254 relative row error at the row max."""
    from dladmm_tpu.ops.quantized import quantize_rows

    w = jnp.array(
        [[1.0, -0.5, 0.25], [0.0, 0.0, 0.0], [100.0, 1.0, -100.0]]
    )
    q, s = quantize_rows(w)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    np.testing.assert_array_equal(back[1], 0.0)  # zero row exact
    err = np.abs(back - np.asarray(w))
    amax = np.abs(np.asarray(w)).max(axis=1, keepdims=True)
    assert (err <= amax / 254 + 1e-7).all()


@pytest.mark.slow
def test_batching_server_aggregates_and_matches_direct():
    """BatchingServer: concurrent small requests are aggregated into
    shared device dispatches, and every client gets exactly the rows a
    direct solve would produce."""
    from concurrent.futures import ThreadPoolExecutor

    from dladmm_tpu.serve import BatchingServer

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 20, 40)
    params = init_dladmm_params(A, K=4)
    data = make_batch(kb, A, 64)
    server = InferenceServer(params, A, max_batch=64)

    calls = {"n": 0}
    direct_solve = server.solve

    def counting_solve(b):
        calls["n"] += 1
        return direct_solve(b)

    server.solve = counting_solve
    bs = BatchingServer(server, max_delay_ms=25.0)
    try:
        sizes = [1, 3, 2, 5, 1, 4, 2, 6]
        offs = np.cumsum([0] + sizes)
        with ThreadPoolExecutor(8) as pool:
            futs = list(
                pool.map(
                    lambda i: bs.submit(data.b[offs[i] : offs[i + 1]]),
                    range(len(sizes)),
                )
            )
        results = [f.result(timeout=60) for f in futs]
    finally:
        bs.close()

    xr, zr, _ = dladmm_forward(params, A, data.b[: offs[-1]])
    for i, (x, z) in enumerate(results):
        assert x.shape == (sizes[i], 40) and z.shape == (sizes[i], 20)
        np.testing.assert_allclose(
            x, np.asarray(xr[offs[i] : offs[i + 1]]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            z, np.asarray(zr[offs[i] : offs[i + 1]]), rtol=1e-5, atol=1e-6
        )
    # Aggregation happened: strictly fewer dispatches than requests.
    assert calls["n"] < len(sizes), calls


def test_batching_server_validation_and_close():
    from dladmm_tpu.serve import BatchingServer

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 20, 40)
    params = init_dladmm_params(A, K=3)
    data = make_batch(kb, A, 8)
    bs = BatchingServer(InferenceServer(params, A, max_batch=8))
    with pytest.raises(ValueError, match="exceed"):
        bs.submit(np.zeros((9, 20), np.float32))
    with pytest.raises(ValueError, match="expected"):
        bs.submit(np.zeros((2, 21), np.float32))
    x, z = bs.solve(data.b[:2])  # blocking wrapper
    assert x.shape == (2, 40)
    bs.close()
    bs.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        bs.submit(data.b[:1])


def test_batching_server_cancelled_future_skipped_worker_survives():
    """A future cancelled while queued must be dropped at dispatch time
    (not crash the worker with InvalidStateError), and later requests
    must still be served by the same worker thread."""
    from dladmm_tpu.serve import BatchingServer

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, 20, 40)
    params = init_dladmm_params(A, K=3)
    data = make_batch(kb, A, 8)
    server = InferenceServer(params, A, max_batch=8)

    # Stall the worker's first dispatch so a queued cancel can land.
    import threading

    gate = threading.Event()
    direct_solve = server.solve

    def gated_solve(b):
        gate.wait(timeout=30)
        return direct_solve(b)

    server.solve = gated_solve
    bs = BatchingServer(server, max_delay_ms=1.0)
    try:
        first = bs.submit(data.b[:1])  # worker picks this up, blocks
        import time

        time.sleep(0.1)  # let the worker enter gated_solve
        doomed = bs.submit(data.b[:2])  # queued behind the stall
        assert doomed.cancel()  # still PENDING -> cancellable
        gate.set()
        first.result(timeout=30)
        # Worker must still be alive and serving after the cancel.
        x, z = bs.solve(data.b[:3])
        assert x.shape == (3, 40) and z.shape == (3, 20)
        assert doomed.cancelled()
    finally:
        gate.set()
        bs.close()


def _sharded_setup(m=20, n=40, K=4, S=64, d=None, general_b=False):
    from dladmm_tpu.parallel.mesh import make_mesh

    key = jax.random.PRNGKey(7)
    kA, kB, kb = jax.random.split(key, 3)
    A = make_dictionary(kA, m, n)
    if general_b:
        d = d or m + 4
        B = make_dictionary(kB, m, d)
        params = init_dladmm_params(A, K=K, B=B)
        data = make_batch(kb, A, S, B=B)
    else:
        B = None
        params = init_dladmm_params(A, K=K)
        data = make_batch(kb, A, S)
    mesh = make_mesh(data=4)
    return mesh, A, B, params, data


@pytest.mark.slow
def test_sharded_server_matches_single_device():
    """ShardedInferenceServer over a 4-device data mesh returns exactly
    what the single-chip InferenceServer returns, at bucket sizes and
    ragged row counts alike."""
    from dladmm_tpu.serve import ShardedInferenceServer

    mesh, A, B, params, data = _sharded_setup()
    single = InferenceServer(params, A, max_batch=64)
    shard = ShardedInferenceServer(params, A, mesh, max_batch=64)
    assert all(b % 4 == 0 for b in shard.buckets)
    for S in (4, 7, 33, 64):
        xs, zs = shard.solve(data.b[:S])
        x1, z1 = single.solve(data.b[:S])
        assert xs.shape == (S, 40) and zs.shape == (S, 20)
        np.testing.assert_allclose(
            np.asarray(xs), np.asarray(x1), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(zs), np.asarray(z1), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_sharded_server_general_b_and_int8():
    from dladmm_tpu.serve import ShardedInferenceServer

    mesh, A, B, params, data = _sharded_setup(general_b=True)
    single = InferenceServer(params, A, max_batch=32, B=B)
    shard = ShardedInferenceServer(params, A, mesh, max_batch=32, B=B)
    xs, zs = shard.solve(data.b[:13])
    x1, z1 = single.solve(data.b[:13])
    assert zs.shape == (13, 24)  # d = m + 4
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(x1), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(z1), rtol=1e-6, atol=1e-7
    )

    mesh, A, _, params, data = _sharded_setup()
    qsingle = InferenceServer(params, A, max_batch=32, dtype="int8")
    qshard = ShardedInferenceServer(
        params, A, mesh, max_batch=32, dtype="int8"
    )
    xs, zs = qshard.solve(data.b[:9])
    x1, z1 = qsingle.solve(data.b[:9])
    # Same quantized weights, same math per row -> identical results.
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(x1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(z1), rtol=1e-5, atol=1e-6
    )


def test_sharded_server_validation_and_batching_front_end():
    from dladmm_tpu.parallel.mesh import make_mesh
    from dladmm_tpu.serve import BatchingServer, ShardedInferenceServer

    mesh, A, _, params, data = _sharded_setup()
    # Non-multiple max_batch rounds UP to the data-axis size (solve()
    # pads rows exactly), and solving the original count is exact.
    T = mesh.shape["data"]
    rounded = ShardedInferenceServer(params, A, mesh, max_batch=T * 2 - 2)
    assert rounded.buckets[-1] == T * 2
    x30, _ = rounded.solve(data.b[: T * 2 - 2])
    xr30, _, _ = dladmm_forward(params, A, data.b[: T * 2 - 2])
    np.testing.assert_allclose(
        np.asarray(x30), np.asarray(xr30), rtol=1e-5, atol=1e-6
    )
    # EXPLICIT buckets stay strictly validated.
    with pytest.raises(ValueError, match="divisible|multiple"):
        ShardedInferenceServer(params, A, mesh, buckets=[T + 1])
    with pytest.raises(ValueError, match="data-parallel only"):
        ShardedInferenceServer(
            params, A, make_mesh(data=2, model=2), max_batch=32
        )

    # The micro-batching front end composes with the sharded back end.
    shard = ShardedInferenceServer(params, A, mesh, max_batch=64)
    bs = BatchingServer(shard, max_delay_ms=5.0)
    try:
        futs = [bs.submit(data.b[i : i + 3]) for i in range(0, 12, 3)]
        xr, zr, _ = dladmm_forward(params, A, data.b[:12])
        for i, fut in enumerate(futs):
            x, z = fut.result(timeout=60)
            np.testing.assert_allclose(
                np.asarray(x),
                np.asarray(xr[3 * i : 3 * i + 3]),
                rtol=1e-5,
                atol=1e-6,
            )
    finally:
        bs.close()


class TestServeCLI:
    """dladmm-serve front door: checkpoint reattach + demo/input modes."""

    @pytest.fixture(scope="class")
    def smoke_ckpt(self, tmp_path_factory):
        from dladmm_tpu.train.loop import fit
        from dladmm_tpu.utils.config import get_config

        ckpt = tmp_path_factory.mktemp("serve_cli") / "ckpt"
        cfg = get_config("smoke")
        params, history = fit(cfg, ckpt_dir=str(ckpt))
        return str(ckpt), cfg, params, history

    def _run(self, argv, capsys):
        import json

        from dladmm_tpu.serve import main

        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    def test_demo_reports_trained_nmse(self, smoke_ckpt, capsys):
        ckpt, cfg, params, history = smoke_ckpt
        out = self._run(
            ["--config=smoke", "--ckpt-dir", ckpt, "--demo", "64"], capsys
        )
        assert out["requests"] == 64
        # The CLI rebuilt the SAME dictionary and restored the SAME
        # params, and its demo batch is fit()'s eval batch (same key):
        # NMSE must match the final training eval, not the LADMM init.
        assert out["nmse_db"] == pytest.approx(
            history[-1]["nmse_db"], abs=0.05
        )

    def test_input_file_matches_library_solve(
        self, smoke_ckpt, tmp_path, capsys
    ):
        ckpt, cfg, params, _ = smoke_ckpt
        from dladmm_tpu.data.synthetic import problem_matrices

        A, _B = problem_matrices(cfg)
        rng = np.random.default_rng(0)
        b = rng.normal(size=(9, A.shape[0])).astype(np.float32)
        req = tmp_path / "req.npz"
        out_npz = tmp_path / "out.npz"
        np.savez(req, b=b)
        summary = self._run(
            [
                "--config=smoke",
                "--ckpt-dir",
                ckpt,
                "--input",
                str(req),
                "--out",
                str(out_npz),
            ],
            capsys,
        )
        assert summary["requests"] == 9
        got = np.load(out_npz)
        server = InferenceServer(params, A, max_batch=16)
        x, z = server.solve(jnp.asarray(b))
        np.testing.assert_allclose(got["x"], np.asarray(x), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["z"], np.asarray(z), rtol=1e-5, atol=1e-6)

    def test_torch_import_and_option_surface(self, smoke_ckpt, tmp_path, capsys):
        ckpt, cfg, params, _ = smoke_ckpt
        from dladmm_tpu.utils.torch_compat import save_torch

        tckpt = tmp_path / "net.pt"
        save_torch(params, tckpt)
        out = self._run(
            [
                "--config=smoke",
                "--import-torch",
                str(tckpt),
                "--demo",
                "32",
                "--dtype=bfloat16",
                "--layers=2",
            ],
            capsys,
        )
        assert out["layers"] == 2 and out["dtype"] == "bfloat16"
        assert np.isfinite(out["nmse_db"])

    def test_fused_adam_checkpoint_reattach(self, tmp_path, capsys):
        """The restore template must mirror fit()'s optimizer selection:
        a fused-Adam checkpoint (FusedAdamState opt_state) reattaches
        through the same config."""
        import dataclasses
        import json

        from dladmm_tpu.serve import main
        from dladmm_tpu.train.loop import fit
        from dladmm_tpu.utils.config import PRESETS, get_config

        cfg = get_config("smoke")
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, optimizer="fused_adam", clip_mode="delayed"
            ),
        )
        ckpt = tmp_path / "ckpt"
        params, history = fit(cfg, ckpt_dir=str(ckpt))
        # Register the modified config under a temp name for the CLI.
        PRESETS["_smoke_fused_test"] = dataclasses.replace(
            cfg, name="_smoke_fused_test"
        )
        try:
            assert (
                main(
                    [
                        "--config=_smoke_fused_test",
                        "--ckpt-dir",
                        str(ckpt),
                        "--demo",
                        "64",
                    ]
                )
                == 0
            )
        finally:
            del PRESETS["_smoke_fused_test"]
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["nmse_db"] == pytest.approx(
            history[-1]["nmse_db"], abs=0.05
        )

    def test_general_prox_checkpoint_serves_trained_prox(
        self, tmp_path, capsys
    ):
        """ADVICE r3 (medium): a model trained under a non-l1 prox must
        serve with that prox — the CLI's demo NMSE must match the final
        training eval. int8 and the l1-only per-layer pallas kernel are
        rejected; --kernel=megakernel serves through the round-5
        prox-templated megakernel and must reproduce the same NMSE."""
        import dataclasses
        import json

        from dladmm_tpu.serve import main
        from dladmm_tpu.train.loop import fit
        from dladmm_tpu.utils.config import PRESETS, get_config

        cfg = get_config("synthetic_nonneg")
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, steps=60, eval_every=60, eval_batch=128
            ),
        )
        ckpt = tmp_path / "ckpt"
        params, history = fit(cfg, ckpt_dir=str(ckpt))
        PRESETS["_nonneg_serve_test"] = dataclasses.replace(
            cfg, name="_nonneg_serve_test"
        )
        try:
            base = ["--config=_nonneg_serve_test", "--ckpt-dir", str(ckpt)]
            assert main(base + ["--demo", "128"]) == 0
            out = json.loads(
                capsys.readouterr().out.strip().splitlines()[-1]
            )
            # eval_batch == demo size and the same eval key: serving the
            # trained prox reproduces the final training eval. (Serving
            # the l1 shrink instead misses by many dB.)
            assert out["nmse_db"] == pytest.approx(
                history[-1]["nmse_db"], abs=0.05
            )
            with pytest.raises(SystemExit):
                main(base + ["--demo", "16", "--dtype=int8"])
            # The l1-only per-layer kernel is not a CLI choice at all —
            # argparse rejects it for any config.
            with pytest.raises(SystemExit):
                main(base + ["--demo", "16", "--kernel=pallas"])
            # Explicit megakernel: the prox-templated kernel serves the
            # TRAINED prox at the same quality as the scan path.
            assert main(base + ["--demo", "128", "--kernel=megakernel"]) == 0
            out_mk = json.loads(
                capsys.readouterr().out.strip().splitlines()[-1]
            )
            assert out_mk["nmse_db"] == pytest.approx(
                history[-1]["nmse_db"], abs=0.05
            )
        finally:
            del PRESETS["_nonneg_serve_test"]
