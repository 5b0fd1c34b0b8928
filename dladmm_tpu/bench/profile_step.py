"""Kernel-level profile of the flagship train step (SURVEY.md §7
tracing row): captures a jax.profiler trace on the real chip and
summarizes device-op time by kernel.

``python -m dladmm_tpu.bench.profile_step [--out summary.json]``

Writes the top device ops by total time plus the device-busy total —
the ground truth behind BASELINE.md's step decomposition.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import optax


def capture(steps: int = 12, which: str = "shipped"):
    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import (
        make_train_state,
        make_train_step_from_batch,
    )
    from dladmm_tpu.utils import profiling

    # DLADMM_BENCH_SMOKE validates the trace->summary control flow on
    # tiny CPU shapes (pre-flight for the unattended battery).
    smoke = bool(os.environ.get("DLADMM_BENCH_SMOKE"))
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    m, n, K, S = (100, 200, 4, 32) if smoke else (1000, 2000, 20, 1024)
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)
    opt = optax.adam(1e-3)
    bf = jnp.bfloat16
    if which == "fused":
        # Round-3 fused Adam-in-backward: profiling it shows whether
        # the per-layer moment/master traffic actually overlaps the
        # backward contractions (the claim behind DESIGN.md §3's
        # optimizer paragraph).
        from dladmm_tpu.train.fused_adam import (
            make_fused_adam_state,
            make_fused_adam_step,
        )

        fstep = make_fused_adam_step(
            A, lr=1e-3, compute_dtype=bf, donate=False, from_batch=True
        )

        @jax.jit
        def run(state):
            state = jax.lax.fori_loop(
                0, steps, lambda _, s: fstep(s, data)[0], state
            )
            return jnp.sum(state.params.beta)

        state0 = make_fused_adam_state(params, None, bf)
        float(run(state0))  # compile + warm
        tmpdir = tempfile.mkdtemp(prefix="dladmm_prof_")
        with profiling.trace(tmpdir):
            float(run(state0))
        return tmpdir, steps
    if which == "qadam_int8":
        # Round-4 fused one-pass optimizer sweep with int8 moments
        # (train/qadam_pallas.py) — where does the residual vs the
        # bf16-XLA arm go?
        from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

        opt = QAdamFusedPallas(1e-3, moment_fmt="int8")
    # The SHIPPED mixed-precision step (same as bench.py's fast path).
    shipped = make_train_step_from_batch(
        opt, A, vjp="manual", compute_dtype=bf, donate=False
    )

    @jax.jit
    def run(state):
        state = jax.lax.fori_loop(
            0, steps, lambda _, s: shipped(s, data)[0], state
        )
        return jnp.sum(state.params.beta)

    state0 = make_train_state(params, opt, bf)
    float(run(state0))  # compile + warm

    tmpdir = tempfile.mkdtemp(prefix="dladmm_prof_")
    with profiling.trace(tmpdir):
        float(run(state0))
    return tmpdir, steps


def summarize(trace_dir: str, steps: int, top: int = 20):
    f = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)[0]
    tr = json.load(gzip.open(f))
    # Map pid -> process name; keep only the TPU device lane.
    pnames = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, nm in pnames.items() if "TPU" in nm}
    import re

    per_op = collections.Counter()
    step_total = 0.0
    container = re.compile(r"^(jit_|while[.\d]*$|body|cond|\d+$)")
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids or "dur" not in e:
            continue
        name = e["name"]
        if name.startswith("jit_run"):
            step_total += e["dur"]  # whole chained run (outermost scope)
        if container.match(name):
            continue  # nested container scopes double-count their leaves
        per_op[name] += e["dur"]
    leaf_total = sum(per_op.values())
    rows = [
        {
            "op": name[:90],
            "per_step_us": round(us / steps, 2),
            "pct_of_leaf_time": round(100 * us / max(leaf_total, 1e-9), 1),
        }
        for name, us in per_op.most_common(top)
    ]
    return {
        "step_total_us": round(step_total / steps, 1),
        "leaf_op_us_per_step": round(leaf_total / steps, 1),
        "steps_profiled": steps,
        "top_ops": rows,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--step",
        default="shipped",
        choices=["shipped", "fused", "qadam_int8"],
        help="which flagship step to profile (fused = Adam inside the "
        "reverse scan, train/fused_adam.py; qadam_int8 = the round-4 "
        "one-pass Pallas optimizer sweep, train/qadam_pallas.py)",
    )
    args = ap.parse_args(argv)
    trace_dir, steps = capture(which=args.step)
    result = summarize(trace_dir, steps)
    out = json.dumps(result, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
