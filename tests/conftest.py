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

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (real TPU) before
# conftest runs, so the env var alone is not enough — force via config.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache: most of the suite's wall time is CPU
# XLA compiles, and re-runs (or sharded CI runs in separate processes)
# hit the same programs — the cache cuts repeat wall time substantially.
# (Must be set via jax.config: the env var is not read on this path.)
jax.config.update("jax_compilation_cache_dir", "/tmp/dladmm_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
