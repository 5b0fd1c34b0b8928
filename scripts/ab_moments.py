"""A/B the Adam moment storage precision on the real chip (round 4).

DESIGN.md §9's step decomposition pins the flagship optimizer phase
(~1.61 ms of the 6.9 ms step) on the ~1.3 GB fp32 master/moment HBM
sweep; the moments are 2/3 of that state. train/qmoments.py stores them
bf16 (2x less) or blockwise-companded int8 (4x less). This measures the
flagship shipped train step (A 1000x2000, batch 1024, K=20, bf16 manual
VJP) for moment_dtype in {float32, bfloat16, int8}, each with and
without the quality recipe's global-norm clip.

Prints one JSON line with calibrated step times. Quality is measured
separately by running the full presets with --moment-dtype.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import optax

from dladmm_tpu.bench.timing import time_chained
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.train.loop import (
    make_train_state,
    make_train_step_from_batch,
)
from dladmm_tpu.train.qmoments import adam_qmoments

import jax


def main():
    smoke = bool(os.environ.get("DLADMM_BENCH_SMOKE"))
    if os.environ.get("DLADMM_BENCH_PLATFORM"):
        jax.config.update(
            "jax_platforms", os.environ["DLADMM_BENCH_PLATFORM"]
        )
    try:  # shared with bench.py: reruns skip the arm compiles
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dladmm_jax_bench_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    m, n, K, S = (100, 200, 4, 32) if smoke else (1000, 2000, 20, 1024)
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)
    bf = jnp.bfloat16

    from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

    def base(md, clip):
        if md.endswith("_pallas"):
            return QAdamFusedPallas(
                1e-3, moment_fmt=md[: -len("_pallas")], clip_norm=clip
            )
        if md == "float32":
            opt = optax.adam(1e-3)
        else:
            opt = adam_qmoments(1e-3, moment_dtype=md)
        if clip:
            opt = optax.chain(optax.clip_by_global_norm(clip), opt)
        return opt

    out = {
        "shape": f"A {m}x{n} b{S} K{K} bf16 manual-vjp"
        + (" SMOKE (numbers meaningless)" if smoke else "")
    }
    arms = (
        "float32",
        "bfloat16",
        "bfloat16_sr",
        "int8",
        "float32_pallas",
        "bfloat16_pallas",
        "bfloat16_sr_pallas",
        "bfloat16_sr_mu_pallas",
        "int8_pallas",
    )
    # Comma-separated arm filter, e.g. DLADMM_AB_ARMS=int8_pallas,float32
    sel = os.environ.get("DLADMM_AB_ARMS")
    if sel:
        want = set(sel.split(","))
        arms = tuple(a for a in arms if a in want)
    for md in arms:
        for clip in (None, 1.0):
            opt = base(md, clip)
            step = make_train_step_from_batch(
                opt, A, vjp="manual", compute_dtype=bf, donate=False
            )

            def one(state, _step=step):
                new_state, _ = _step(state, data)
                return new_state

            t = time_chained(one, make_train_state(params, opt, bf))
            name = f"{md}{'_clip' if clip else ''}"
            out[f"step_ms_{name}"] = round(t * 1e3, 3)
            print(f"  {name}: {t * 1e3:.3f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
