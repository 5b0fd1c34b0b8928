"""The examples are user-facing documentation — keep them executable.
Slow tier: each is a full end-to-end subprocess run on CPU."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize(
    "script,expect",
    [
        ("examples/quickstart.py", "served 10 solves"),
        ("examples/distributed.py", "sharded serving: 200 solves"),
    ],
)
def test_example_runs_clean(script, expect):
    env = dict(os.environ, DLADMM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert expect in out.stdout
