"""Test environment: CPU backend with 8 virtual devices (SURVEY.md §6.2-5).

Must run before any jax import, so this lives in conftest at collection
time. Distributed tests run the full DP/TP shard_map paths on a virtual
mesh and compare against single-device runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CI deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent XLA compilation cache: most of the suite's wall time is CPU
# XLA compiles, and re-runs (or sharded CI runs in separate processes)
# hit the same programs — the cache cuts repeat wall time substantially.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/dladmm_jax_test_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (real TPU) before
# conftest runs, so the env var alone is not enough — force via config.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
