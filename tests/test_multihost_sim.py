"""REAL multi-process multi-host validation (SURVEY.md §5.5, §6.2-5):
two OS processes, Gloo collectives, the actual fit_sharded multihost
path via scripts/multihost_sim.py — beyond the mocked process tests."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_sim.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(port, extra):
    env = dict(os.environ)
    # The workers configure their own platform/devices; scrub conftest's.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                SCRIPT,
                f"--process-id={i}",
                "--num-processes=2",
                f"--coordinator=127.0.0.1:{port}",
            ]
            + extra,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]
    # Process 0 prints the verdict line.
    line = [
        ln for ln in outs[0][0].decode().splitlines() if ln.startswith("{")
    ][-1]
    return json.loads(line)


@pytest.mark.slow
def test_two_process_multihost_training():
    result = _run_pair(_free_port(), ["--steps=40"])
    assert result["processes"] == 2
    assert result["global_devices"] == 8
    assert result["mesh"] == "4x2"
    assert result["improved"], result


@pytest.mark.slow
def test_two_process_multihost_checkpoint_restore(tmp_path):
    """Multi-host sharded checkpointing in the REAL 2-process sim
    (VERDICT r1 #3): a cold bf16 run saves at its evals; a second
    2-process run restores the final sharded state (each process reads
    its own shards) and reproduces the params checksum exactly."""
    ck = str(tmp_path / "mh_ck")
    cold = _run_pair(
        _free_port(),
        ["--steps=20", f"--ckpt-dir={ck}", "--compute-dtype=bfloat16"],
    )
    resumed = _run_pair(
        _free_port(),
        [
            "--steps=20",
            f"--ckpt-dir={ck}",
            "--resume",
            "--compute-dtype=bfloat16",
        ],
    )
    assert resumed["param_checksum"] == cold["param_checksum"]
    assert resumed["nmse_db_last"] == cold["nmse_db_last"]


@pytest.mark.slow
def test_two_process_multihost_fused_adam():
    """The round-3 fused optimizer cross-process: the per-layer grad
    psums inside the reverse scan run over the real 2-process (DCN-like
    Gloo) mesh, bf16, data-only 8x1; training improves NMSE."""
    result = _run_pair(
        _free_port(),
        ["--steps=40", "--optimizer=fused_adam",
         "--compute-dtype=bfloat16"],
    )
    assert result["processes"] == 2
    assert result["mesh"] == "8x1"
    assert result["improved"], result


@pytest.mark.slow
def test_two_process_multihost_zero1():
    """ZeRO-1 cross-process: the reduce-scatter/all-gather pair and the
    flat moment shards span the real 2-process Gloo mesh (data-only
    8x1), exact global clip on; training improves NMSE."""
    result = _run_pair(
        _free_port(), ["--steps=40", "--zero1", "--compute-dtype=bfloat16"]
    )
    assert result["processes"] == 2
    assert result["mesh"] == "8x1"
    assert result["improved"], result


@pytest.mark.slow
def test_two_process_multihost_zero1_fused_qadam():
    """Round 5: ZeRO-1 x the fused int8 optimizer sweep cross-process —
    each host's 1/D flat moment slice runs the one-HBM-pass kernel on
    its (rows, 256) view (interpret mode on CPU), reduce-scatter and
    all-gather spanning the real 2-process Gloo mesh."""
    result = _run_pair(
        _free_port(),
        [
            "--steps=40",
            "--zero1",
            "--compute-dtype=bfloat16",
            "--moment-dtype=int8_pallas",
        ],
    )
    assert result["processes"] == 2
    assert result["mesh"] == "8x1"
    assert result["improved"], result
