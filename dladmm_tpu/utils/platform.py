"""Backend selection for the CLIs.

The sandbox's sitecustomize pins ``JAX_PLATFORMS`` before user code
runs, so the standard env var cannot redirect a CLI to another backend;
``jax.config.update("jax_platforms", ...)`` is the only override that
works (tests/conftest.py uses it). ``DLADMM_PLATFORM=cpu`` gives every
CLI the same escape hatch — for CPU smoke runs, and for working through
TPU-relay outages (the relay can wedge for hours; see BASELINE.md).
"""

from __future__ import annotations

import os


def apply_platform_env() -> str | None:
    """Honor ``DLADMM_PLATFORM`` if set; returns the applied platform.

    Must run before the first jax backend touch (call it at the top of
    each CLI ``main``)."""
    platform = os.environ.get("DLADMM_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform or None
