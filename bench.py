"""Benchmark harness (driver contract): prints ONE JSON line.

Metric: layer-iterations/s/chip on the flagship MXU-saturation config
(BASELINE.json:8 — A 1000x2000, batch 1024, K=20): one full jitted
training step (forward + backprop through the unroll + Adam), counted as
K layer-iterations x batch per step.

vs_baseline: no reference-published numbers exist (BASELINE.json:13
"published": {}; empty reference mount — SURVEY.md §0/§8), so the baseline
is this framework's own naive non-scan per-layer Python-loop forward/
backward step on the same hardware — i.e. the speedup of the TPU-native
design (scan + fused step) over a reference-style eager unroll.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax


def _time_step(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import (
        dladmm_forward,
        init_dladmm_params,
    )
    from dladmm_tpu.ops.reference import LayerParams, dladmm_layer_step
    from dladmm_tpu.train.loop import TrainState, make_train_step_from_batch

    m, n, K, S = 1000, 2000, 20, 1024
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)

    optimizer = optax.adam(1e-3)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step_from_batch(optimizer, A, donate=False)
    t_train = _time_step(step, state, data)

    # Baseline: reference-style eager Python-loop unroll (no scan), same
    # jit boundary per layer — what a naive port would do.
    def naive_forward(params, A, b):
        x = jnp.zeros((b.shape[0], n), b.dtype)
        z = jnp.zeros((b.shape[0], m), b.dtype)
        lam = jnp.zeros_like(b)
        for k in range(K):
            p = LayerParams(*(leaf[k] for leaf in params))
            x, z, lam = jax.jit(dladmm_layer_step)(A, None, b, x, z, lam, p)
        return x, z, lam

    t_naive_fwd = _time_step(naive_forward, params, A, data.b, iters=5)

    fused_forward = jax.jit(lambda p, A, b: dladmm_forward(p, A, b))
    t_fused_fwd = _time_step(fused_forward, params, A, data.b)

    layer_iters_per_s = K * S / t_train
    value = layer_iters_per_s
    vs_baseline = t_naive_fwd / t_fused_fwd  # forward speedup vs eager unroll

    print(
        json.dumps(
            {
                "metric": "train layer-iterations/s/chip (A 1000x2000, batch 1024, K=20)",
                "value": round(value, 1),
                "unit": "layer_iter/s",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "train_step_s": round(t_train, 5),
                    "fused_forward_s": round(t_fused_fwd, 5),
                    "naive_forward_s": round(t_naive_fwd, 5),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
