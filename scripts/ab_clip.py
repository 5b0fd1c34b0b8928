"""A/B the optimizer-phase clipping variants on the real chip
(VERDICT r2 #4: the profiled ~1.6 ms Adam tail is pinned by exact
global-norm clipping being a two-pass optimizer).

Measures the flagship shipped train step (A 1000x2000, batch 1024,
K=20, bf16 manual VJP) under three optimizers:

  * none     — plain Adam (the bench.py headline configuration)
  * global   — optax.clip_by_global_norm(1.0) + Adam (quality recipe)
  * delayed  — delayed_clip_by_global_norm(1.0) + Adam (single-pass:
               step i scales by step i-1's norm, so XLA can fuse the
               norm reduction into the Adam sweep)
  * fused        — Adam applied per layer INSIDE the reverse-scan
                   backward with the delayed clip (train/fused_adam.py):
                   grad stacks never round-trip HBM, optimizer traffic
                   overlaps the backward's MXU work
  * fused_noclip — same without clipping (the headline-comparable arm)
  * delayed_ds / fused_ds — the SHIPPED flagship configuration (deep
                   supervision + clip 1.0), unfused delayed vs fused:
                   the pair that decides the preset default

Prints one JSON line with the calibrated step times. Quality parity is
measured separately via `python -m dladmm_tpu.run --clip-mode=delayed`
/ `--optimizer=fused_adam` at both synthetic presets.
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
    delayed_clip_by_global_norm,
    make_train_state,
    make_train_step_from_batch,
)

import jax


def main():
    import os

    smoke = bool(os.environ.get("DLADMM_BENCH_SMOKE"))
    if os.environ.get("DLADMM_BENCH_PLATFORM"):
        jax.config.update(
            "jax_platforms", os.environ["DLADMM_BENCH_PLATFORM"]
        )
    m, n, K, S = (100, 200, 4, 32) if smoke else (1000, 2000, 20, 1024)
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)
    bf = jnp.bfloat16

    variants = {
        "none": optax.adam(1e-3),
        "global": optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(1e-3)
        ),
        "delayed": optax.chain(
            delayed_clip_by_global_norm(1.0), optax.adam(1e-3)
        ),
    }
    out = {
        "shape": f"A {m}x{n} b{S} K{K} bf16 manual-vjp"
        + (" SMOKE (numbers meaningless)" if smoke else "")
    }
    for name, opt in variants.items():
        step = make_train_step_from_batch(
            opt, A, vjp="manual", compute_dtype=bf, donate=False
        )

        def one(state):
            new_state, _ = step(state, data)
            return new_state

        t = time_chained(one, make_train_state(params, opt, bf))
        out[f"step_ms_{name}"] = round(t * 1e3, 3)
        print(f"  {name}: {t * 1e3:.3f} ms", flush=True)

    from dladmm_tpu.train.fused_adam import (
        make_fused_adam_state,
        make_fused_adam_step,
    )

    lw = jnp.full((K,), 1.0 / K, jnp.float32)
    for name, clip, weights in (
        ("fused", 1.0, None),
        ("fused_noclip", None, None),
        ("fused_ds", 1.0, lw),
    ):
        fstep = make_fused_adam_step(
            A,
            layer_weights=weights,
            lr=1e-3,
            clip_norm=clip,
            compute_dtype=bf,
            donate=False,
            from_batch=True,
        )

        def one_fused(state, _step=fstep):
            new_state, _ = _step(state, data)
            return new_state

        t = time_chained(
            one_fused, make_fused_adam_state(params, clip, bf)
        )
        out[f"step_ms_{name}"] = round(t * 1e3, 3)
        print(f"  {name}: {t * 1e3:.3f} ms", flush=True)

    # The unfused shipped configuration (deep supervision + delayed
    # clip) — the direct comparator for fused_ds.
    ds_opt = optax.chain(
        delayed_clip_by_global_norm(1.0), optax.adam(1e-3)
    )
    ds_step = make_train_step_from_batch(
        ds_opt, A, layer_weights=lw, compute_dtype=bf, donate=False
    )

    def one_ds(state):
        new_state, _ = ds_step(state, data)
        return new_state

    t = time_chained(one_ds, make_train_state(params, ds_opt, bf))
    out["step_ms_delayed_ds"] = round(t * 1e3, 3)
    print(f"  delayed_ds: {t * 1e3:.3f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
