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


def test_two_process_multihost_training():
    port = _free_port()
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
                "--steps=40",
            ],
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
        ln
        for ln in outs[0][0].decode().splitlines()
        if ln.startswith("{")
    ][-1]
    result = json.loads(line)
    assert result["processes"] == 2
    assert result["global_devices"] == 8
    assert result["mesh"] == "4x2"
    assert result["improved"], result
