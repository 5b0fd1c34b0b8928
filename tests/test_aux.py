"""Aux subsystem tests (SURVEY.md §7): checkpoint round-trip + resume
helper, multihost batch assembly (single-process path), profiling hooks."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dladmm_tpu.data.synthetic import make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.train.loop import TrainState
from dladmm_tpu.utils.checkpoint import (
    latest_step_dir,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture
def state():
    A = make_dictionary(jax.random.PRNGKey(0), 10, 20)
    params = init_dladmm_params(A, K=3)
    opt = optax.adam(1e-3)
    return TrainState(params, opt.init(params), jnp.asarray(7, jnp.int32))


def test_checkpoint_roundtrip(tmp_path, state):
    target = save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    assert os.path.exists(target)
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(target, zero)
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_latest_step_dir(tmp_path, state):
    save_checkpoint(str(tmp_path / "c"), state, step=3)
    save_checkpoint(str(tmp_path / "c"), state, step=12)
    latest = latest_step_dir(str(tmp_path / "c"))
    assert latest is not None and latest.endswith("step_12")
    assert latest_step_dir(str(tmp_path / "nope")) is None


def test_multihost_batch_single_process():
    """host_local_batch on 1 process == global batch, correctly sharded."""
    from dladmm_tpu.parallel.mesh import make_mesh
    from dladmm_tpu.parallel.multihost import host_local_batch

    mesh = make_mesh(data=4, model=2)
    A = make_dictionary(jax.random.PRNGKey(0), 16, 32)
    batch = host_local_batch(jax.random.PRNGKey(1), A, 16, mesh)
    assert batch.b.shape == (16, 16)
    assert batch.x_star.shape == (16, 32)
    np.testing.assert_allclose(
        np.asarray(batch.b),
        np.asarray(batch.x_star) @ np.asarray(A).T + np.asarray(batch.e_star),
        rtol=1e-4, atol=1e-6,
    )


def test_profiling_hooks(tmp_path):
    from dladmm_tpu.utils.profiling import StepTimer, trace

    with trace(str(tmp_path / "tr")):
        y = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
        jax.block_until_ready(y)
    # A trace dump directory must exist and be non-empty.
    dumped = list(os.walk(str(tmp_path / "tr")))
    assert any(files for _, _, files in dumped)
    t = StepTimer()
    assert t.lap(sync_on=y) >= 0.0


def test_nan_debug_flag_toggles():
    from dladmm_tpu.utils.profiling import enable_nan_debug

    enable_nan_debug(True)
    with pytest.raises(FloatingPointError):
        jnp.log(-jnp.ones(4)).block_until_ready()
    enable_nan_debug(False)
    jnp.log(-jnp.ones(4)).block_until_ready()  # silent NaN again


def test_traffic_model_sanity():
    """ICI/DCN traffic model invariants (parallel/memory.py): sharded_w2
    adds the z1 all-gather on top of the psum; DP allreduce scales with
    the param shard; DCN flagged only for multi-host."""
    from dladmm_tpu.parallel.memory import per_chip_bytes, step_traffic_bytes

    sh = step_traffic_bytes(256, 512, 8, 128, data_axis=2, model_axis=4)
    rep = step_traffic_bytes(
        256, 512, 8, 128, data_axis=2, model_axis=4, layout="replicated_w2"
    )
    assert sh["tp_detail"]["gather_fwd"] > 0
    assert rep["tp_detail"]["gather_fwd"] == 0
    assert sh["tp_ici_bytes_per_step"] > rep["tp_ici_bytes_per_step"]
    assert not sh["dp_crosses_dcn"]
    mh = step_traffic_bytes(
        1000, 2000, 20, 65536, data_axis=8, model_axis=1, hosts=2
    )
    assert mh["dp_crosses_dcn"] and mh["dcn_bytes_per_step"] > 0
    assert mh["tp_ici_bytes_per_step"] == 0  # no model axis
    # Sharded params shrink the per-chip DP allreduce vs replicated W2.
    p_sh = per_chip_bytes(256, 512, 8, 128, 2, 4).params
    p_rep = per_chip_bytes(256, 512, 8, 128, 2, 4, "replicated_w2").params
    assert p_sh < p_rep


def test_comm_model_cli(tmp_path, capsys):
    from dladmm_tpu.bench.comm_model import main

    out = tmp_path / "cm.json"
    assert main(["--config", "tp_large", "--out", str(out)]) == 0
    import json

    rows = json.loads(out.read_text())
    layouts = {r["layout"]: r for r in rows}
    assert layouts["sharded_w2"]["fits_16gb_chip"]
    assert not layouts["replicated_w2"]["fits_16gb_chip"]


def test_comm_model_fused_dp_fields():
    """DP-only rows carry the fused-optimizer overlap bracket: the
    if-pipelined exposure is one layer's psum when per-layer backward
    compute covers a psum, and the efficiency stays within
    (no_overlap, 1]."""
    import json

    from dladmm_tpu.bench.comm_model import _fused_dp_fields, main

    # Comm-bound arithmetic check: t_dp/K <= t_layer_bwd -> exposed is
    # exactly one layer's psum.
    f = _fused_dp_fields(K=10, t_compute=0.030, t_ici=0.0, t_dp=0.010)
    assert f["dp_fused_exposed_ms_if_pipelined"] == 1.0  # 10ms/10
    # Psum slower than a layer's compute -> the uncovered remainder of
    # all K-1 earlier psums is exposed too.
    g = _fused_dp_fields(K=10, t_compute=0.003, t_ici=0.0, t_dp=0.010)
    assert g["dp_fused_exposed_ms_if_pipelined"] > 1.0
    # Full artifact: fused fields appear exactly on DP-only meshes.
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--config", "multihost"])
    rows = json.loads(buf.getvalue())
    assert all("scaling_efficiency_fused_if_pipelined" in r for r in rows)
    for r in rows:
        assert (
            r["scaling_efficiency_no_overlap"]
            < r["scaling_efficiency_fused_if_pipelined"]
            <= 1.0
        )

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--config", "tp_large"])
    tp_rows = json.loads(buf.getvalue())
    assert all(
        "scaling_efficiency_fused_if_pipelined" not in r for r in tp_rows
    )


def test_time_chained_noise_fallback(monkeypatch):
    """ADVICE r1: a noisy (non-positive-slope) calibration must fall
    back to the uncalibrated long-chain estimate with a warning instead
    of aborting a whole bench sweep; strict=True keeps the raise."""
    import warnings

    import pytest

    from dladmm_tpu.bench import timing

    # Constant wall time regardless of chain length => slope 0 forever.
    monkeypatch.setattr(
        timing, "_run_chained", lambda step, init, iters, repeats: 0.5
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = timing.time_chained(lambda c: c, 0.0, iters=8)
    assert any("UNCALIBRATED" in str(x.message) for x in w)
    # Chains ran at 8,16,32,64 iters; the estimate divides the last
    # measured time by its chain length (iters//2 after the final
    # doubling): 0.5 s / 64.
    assert t == pytest.approx(0.5 / 64)
    with pytest.raises(RuntimeError, match="no positive slope"):
        timing.time_chained(lambda c: c, 0.0, iters=8, strict=True)


def test_timing_runner_cache_evicts_dead_steps():
    """The compiled-runner cache must not pin step closures forever:
    once the caller drops its step function, the cache entry (and the
    compiled executable it holds) must be collectable."""
    import gc
    import weakref

    from dladmm_tpu.bench import timing

    def step(c):
        return c + 1.0

    timing.time_chained(step, jnp.zeros(()), iters=4)
    assert step in timing._RUNNERS
    ref = weakref.ref(step)
    del step
    gc.collect()
    assert ref() is None, "runner cache kept the step function alive"
    assert len(list(timing._RUNNERS.keys())) == 0 or all(
        k is not None for k in timing._RUNNERS.keys()
    )


def test_apply_platform_env(monkeypatch):
    """DLADMM_PLATFORM must drive jax_platforms (the sandbox pins
    JAX_PLATFORMS, so this config path is every CLI's escape hatch)."""
    import jax

    from dladmm_tpu.utils.platform import apply_platform_env

    monkeypatch.delenv("DLADMM_PLATFORM", raising=False)
    assert apply_platform_env() is None  # unset -> no-op
    monkeypatch.setenv("DLADMM_PLATFORM", "cpu")
    assert apply_platform_env() == "cpu"
    assert jax.config.jax_platforms == "cpu"


def test_package_import_initializes_no_backend():
    """Importing ANY module must not initialize a jax backend: the
    sandbox pins an axon TPU backend whose relay can be down for hours,
    so an import-time jax.default_backend()/devices() call would hang
    every CLI and test run (regression: ops/pallas_layer's module-level
    default instance did exactly that). Subprocess so this session's
    initialized CPU backend doesn't mask the check."""
    import subprocess
    import sys

    code = (
        "import pkgutil, importlib, dladmm_tpu, __graft_entry__\n"
        "for m in pkgutil.walk_packages(dladmm_tpu.__path__,"
        " 'dladmm_tpu.'):\n"
        "    importlib.import_module(m.name)\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clean" in out.stdout


def test_comm_model_zero1_fields():
    """zero1 model fields: optimizer HBM streams and moment storage
    shrink by exactly D; collective bytes unchanged (note present)."""
    from dladmm_tpu.bench.comm_model import analyze

    r = analyze("z", 1000, 2000, 20, 1024, 8, 1, "sharded_w2", hosts=2)
    assert r["zero1_optimizer_hbm_mb_per_step"] == pytest.approx(
        r["zero1_optimizer_hbm_mb_replicated"] / 8, rel=0.01
    )
    assert "allreduce = RS+AG" in r["zero1_note"]
    # TP rows don't carry the DP-only fields.
    r_tp = analyze("t", 1000, 2000, 20, 1024, 2, 4, "sharded_w2")
    assert "zero1_note" not in r_tp
