"""Micro-bench of the fused qadam sweep in isolation (round 4 tuning).

The full-step A/B (`scripts/ab_moments.py`) showed the kernel running
at ~1/3 of the expected bandwidth; this times JUST the optimizer apply
on flagship-sized leaves across grid chunk sizes, to separate per-grid-
step overhead from DMA efficiency. Grads are derived from the params so
the chain has a real data dependency (bench/timing.py requirement).

Prints one JSON line: apply-time (ms) per {format x chunk_rows}, plus
the optax fp32 reference apply.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dladmm_tpu.bench.timing import time_chained
from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas


def main():
    smoke = bool(os.environ.get("DLADMM_BENCH_SMOKE"))
    if os.environ.get("DLADMM_BENCH_PLATFORM"):
        jax.config.update(
            "jax_platforms", os.environ["DLADMM_BENCH_PLATFORM"]
        )
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dladmm_jax_bench_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # Flagship-sized optimizer state: 60M params in two matrix stacks.
    K, n, m = (2, 64, 64) if smoke else (20, 2000, 1000)
    key = jax.random.PRNGKey(0)
    params = {
        "W1": jax.random.normal(key, (K, n, m), jnp.float32),
        "W2": jax.random.normal(key, (K, m, m), jnp.float32),
    }
    out = {"params_m": round(sum(v.size for v in params.values()) / 1e6, 1)}

    # optax fp32 reference: update + apply + bf16 copy.
    ref = optax.adam(1e-3)

    def ref_apply(state):
        p, s = state
        g = jax.tree.map(lambda v: v * 1e-3, p)
        u, s2 = ref.update(g, s, p)
        p2 = optax.apply_updates(p, u)
        cp = jax.tree.map(lambda v: v.astype(jnp.bfloat16), p2)
        # Fold the copy into the carried params so it isn't DCE'd.
        p2 = jax.tree.map(lambda a, c: a + 0.0 * c.astype(a.dtype), p2, cp)
        return (p2, s2)

    t = time_chained(ref_apply, (params, ref.init(params)), iters=32)
    out["apply_ms_optax_fp32"] = round(t * 1e3, 3)
    print(f"  optax fp32: {t * 1e3:.3f} ms", flush=True)

    import dataclasses as _dc
    import itertools

    arms = []
    for fmt in ("float32", "bfloat16", "int8"):
        for cr in (None,):
            for dims in (None,):
                arms.append((fmt, cr, dims))
    for fmt, cr, dims in arms:
        opt = QAdamFusedPallas(
            1e-3, moment_fmt=fmt, chunk_rows=cr, dims=dims
        )
        name = f"{fmt}_natural_view"

        def q_apply(state, _opt=opt):
            p, s = state
            g = jax.tree.map(lambda v: v * 1e-3, p)
            p2, s2, cp = _opt.fused_apply(g, s, p, jnp.bfloat16)
            p2 = jax.tree.map(
                lambda a, c: a + 0.0 * c.astype(a.dtype), p2, cp
            )
            return (p2, s2)

        try:
            t = time_chained(q_apply, (params, opt.init(params)), iters=32)
        except Exception as e:
            out[f"apply_ms_{name}"] = f"error: {repr(e)[:120]}"
            print(f"  {name}: ERROR {repr(e)[:120]}", flush=True)
            continue
        out[f"apply_ms_{name}"] = round(t * 1e3, 3)
        print(f"  {name}: {t * 1e3:.3f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
