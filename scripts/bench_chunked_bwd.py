"""Measure VERDICT r1 #4's target: paper-config (250x500, K=15) batch-1024
train step — reverse-scan manual VJP vs megakernel-fwd + batch-chunked
Pallas backward, fp32 and bf16. Calibrated timing (bench/timing.py).

    python scripts/bench_chunked_bwd.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dladmm_tpu.bench.timing import time_chained
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.ops.pallas_unroll import make_unrolled_forward
from dladmm_tpu.train.loop import (
    make_train_state,
    make_train_step_from_batch,
)


def bench_variant(name, A, data, params, optimizer, compute_dtype, **kw):
    state = make_train_state(params, optimizer, compute_dtype)
    step = make_train_step_from_batch(
        optimizer, A, donate=False, compute_dtype=compute_dtype, **kw
    )

    def chained(state):
        s, _ = step(state, data)
        return s

    t = time_chained(chained, state, iters=64, repeats=3)
    print(f"{name:48s} {t*1e6:8.1f} us/step")
    return t


def main():
    m, n, K, S = 250, 500, 15, 1024
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)
    optimizer = optax.adam(1e-3)

    results = {}
    results["manual_fp32"] = bench_variant(
        "manual VJP fp32 (round-1 best)", A, data, params, optimizer,
        None, vjp="manual",
    )
    results["chunked_fp32"] = bench_variant(
        "megakernel fwd + chunked Pallas bwd fp32", A, data, params,
        optimizer, None, forward_fn=make_unrolled_forward(),
    )
    results["manual_bf16"] = bench_variant(
        "manual VJP bf16", A, data, params, optimizer, jnp.bfloat16,
        vjp="manual",
    )
    results["chunked_bf16"] = bench_variant(
        "megakernel fwd + chunked Pallas bwd bf16", A, data, params,
        optimizer, jnp.bfloat16, forward_fn=make_unrolled_forward(),
    )
    import json

    print(json.dumps({k: round(v * 1e6, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
