"""Benchmark harness (driver contract): prints ONE JSON line.

Metric: training layer-iterations/s/chip on the flagship MXU-saturation
config (BASELINE.json:8 — A 1000x2000, batch 1024, K=20): one fully
fused jitted training step (on-device forward + backprop through the
unroll + Adam), counted as K x batch layer-iterations per step. Since
round 5 the headline step uses the SHIPPED synthetic-preset optimizer —
the fused one-HBM-pass int8-moment Adam sweep (train/qadam_pallas.py,
seed-replicated quality parity in BASELINE.md); the r1–r4 fp32-moment
step continues as the `fp32_moments_step_ms` detail series.

Timing is device-chained (iterations data-dependent inside one jit,
scalar-fetch sync) because the sandbox TPU's RPC relay makes naive
dispatch loops measure the network, not the chip (bench/timing.py).

Capture contract hardening (VERDICT.md r2 #1 — round 2's driver capture
timed out at 9m25s with nothing printed):
  * a BOUNDED subprocess health-check matmul runs first (the relay can
    wedge for 30+ min; a wedge at first dispatch must fail fast, not
    burn the whole budget silently);
  * the flagship pair is measured FIRST and the headline JSON line is
    printed+flushed immediately — a later wedge/timeout can no longer
    null the round;
  * each secondary phase is skipped (with a marker in `detail`) once a
    wall-clock budget is exceeded;
  * bench/timing.py compiles ONE runner per measured path (traced trip
    count), so the whole run is ~5 compiles instead of ~20.
The LAST line printed on success is the enriched JSON (headline +
secondary details); the driver parses the tail either way.

vs_baseline: no reference-published numbers exist (BASELINE.json:13
"published": {}; empty reference mount — SURVEY.md §0/§8). Baseline is
the reference-style STRAIGHT PORT measured in the same harness: same
step in full fp32 matmul precision without the TPU-native kernel
choices. vs_baseline = straight-port time / framework time.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Wall-clock budget (seconds) after which remaining SECONDARY phases are
# skipped. The driver's capture budget is ~10 min; leave headroom.
# Round 5 hardening (VERDICT r4 #1 — the r4 capture overran 390 s and
# dropped the paper_config_b1024 series): tracked round-over-round
# series run FIRST, each phase declares an estimated cost so a late
# cheap phase is not serially starved by an early overrun, and the
# settled-rejection fused_adam arm (measured 11.0/11.2 ms in r3/r4 —
# BASELINE.md) runs as an every-3rd-round regression canary instead of
# burning ~60 s every capture.
# Budget calibration (measured on chip, r5): a COLD-cache capture costs
# ~15 s health + ~175 s headline (shipped-step compile dominates; the
# straight-port arm is amortized out of it) + ~60-70 s per cold phase —
# ~370 s for headline + all three tracked series. 450 s covers that
# with slack while keeping >2 min of headroom inside the driver's
# ~9-10 min window; a degraded-relay capture (health probe burning its
# 420 s recovery budget) degrades tail-first: late phases skip, the
# headline and the paper_config series survive.
SOFT_BUDGET_S = 450.0
# Estimated per-phase costs (seconds, cold-cache; warm persistent-cache
# runs are far cheaper). A phase is skipped UPFRONT when the remaining
# budget cannot cover its estimate — protecting the phases behind it.
PHASE_EST_S = {
    "paper_config": 70.0,
    "deep_supervised": 55.0,
    "fp32_moments": 55.0,
    "straight_port": 95.0,
    "fused_adam": 65.0,
}
FUSED_ADAM_CANARY_EVERY = 3  # rounds

# Smoke-test hook: DLADMM_BENCH_PLATFORM=cpu runs the whole harness on
# CPU (the sandbox sitecustomize pins JAX_PLATFORMS, so the standard env
# var is ignored; jax.config.update is the only override that works).
# DLADMM_BENCH_SMOKE=1 additionally shrinks shapes/chains so the full
# control flow (health check, phases, watchdogs, JSON contract) runs in
# seconds — numbers from smoke mode are meaningless.
_PLATFORM = os.environ.get("DLADMM_BENCH_PLATFORM")
_SMOKE = bool(os.environ.get("DLADMM_BENCH_SMOKE"))

# A successful real-chip run saves its final line here so a later capture
# during a relay outage can cite a THIS-round measurement as context.
_SELF_CAPTURE = "bench_out/bench_self_capture.json"

_HEALTH_CODE = (
    "import os, jax;"
    "p = os.environ.get('DLADMM_BENCH_PLATFORM');"
    "p and jax.config.update('jax_platforms', p);"
    "import jax.numpy as jnp;"
    "x = jnp.ones((256, 256), jnp.bfloat16);"
    "print('OK', float(jnp.sum(jnp.dot(x, x))))"
)


def _relay_health_check(timeout_s: float = 150.0, budget_s: float = 420.0):
    # budget_s raised r5: two real relay wedges this round cleared in
    # ~5-6 min — a health budget that gives up at 300 s turns a
    # recoverable wedge into a NULL capture, while recovering at t=420
    # still leaves time for the measured headline inside the driver's
    # ~10 min window (secondary phases skip via their estimates).
    """Run a trivial matmul in a KILLABLE subprocess (an in-process hung
    dispatch blocks in C and cannot be timed out). Retries until
    budget_s so a relay wedge that clears mid-capture still yields a
    measured round (the flagship pair needs only ~3 min after this);
    the budget counts toward SOFT_BUDGET_S, so secondary phases shrink
    instead of the headline. Returns (ok, note)."""
    import subprocess

    if os.environ.get("DLADMM_BENCH_FORCE_UNHEALTHY"):
        # Test hook: exercise the diagnostic path without a real outage.
        return False, "forced by DLADMM_BENCH_FORCE_UNHEALTHY"
    t0 = time.monotonic()
    note, i = "", 0
    while True:
        i += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _HEALTH_CODE],
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0 and "OK" in r.stdout:
                return True, f"healthy (attempt {i})"
            note = f"rc={r.returncode} stderr={r.stderr[-200:]!r}"
        except subprocess.TimeoutExpired:
            note = f"timeout after {timeout_s}s (attempt {i})"
        if time.monotonic() - t0 + timeout_s + 5.0 > budget_s:
            return False, note
        # 30 s between probes: the observed relay wedges clear after a
        # few minutes of QUIET — rapid reconnect attempts may be what
        # keeps a recovering relay wedged (r5 outage sessions).
        time.sleep(30.0)


def _chained_train_time(step, state0, iters=32):
    """Two-point calibrated: the ~26 ms relay RTT is paid once per
    dispatch regardless of iters, so the slope between a short and a
    long chain is the true per-step device time (bench/timing.py, the
    single shared implementation with a non-positive-slope guard)."""
    from dladmm_tpu.bench.timing import time_chained

    return time_chained(step, state0, iters=iters)


def main() -> int:
    t0 = time.monotonic()
    ok, health_note = _relay_health_check()
    if not ok:
        # Emit a parseable diagnostic line rather than hanging into the
        # driver's timeout: the relay is down, not the framework. Attach
        # the last session-measured number (clearly labeled, NOT the
        # round's measurement) so a capture during an outage still
        # carries context instead of a bare null.
        detail = {"error": f"tpu relay unhealthy: {health_note}"}
        try:
            import glob

            hist = {}
            # Most recent driver capture (per-file try: one corrupt file
            # must not discard context the others provide).
            for p in sorted(glob.glob("BENCH_r*.json")):
                try:
                    with open(p) as f:
                        parsed = json.load(f).get("parsed") or {}
                except Exception:
                    continue
                if parsed.get("value"):
                    hist = {
                        "value": parsed["value"],
                        "vs_baseline": parsed.get("vs_baseline"),
                        "source": p,
                        "note": "most recent driver capture",
                    }
            # A self-capture (written by a successful bench.py run, e.g.
            # the measurement battery) wins only if NEWER than that
            # driver capture — a stale file from an earlier round must
            # not shadow fresher driver data or claim this round.
            try:
                newest_driver = max(
                    (
                        os.path.getmtime(p)
                        for p in glob.glob("BENCH_r*.json")
                    ),
                    default=0.0,
                )
                if os.path.getmtime(_SELF_CAPTURE) > newest_driver:
                    with open(_SELF_CAPTURE) as f:
                        rec = json.load(f)
                    if rec.get("value"):
                        hist = {
                            "value": rec["value"],
                            "vs_baseline": rec.get("vs_baseline"),
                            "source": _SELF_CAPTURE,
                            "measured_at": rec.get("measured_at"),
                            "note": "self-capture from a successful "
                            "bench.py run after the last driver capture",
                        }
            except OSError:
                pass  # no self-capture on disk
            if hist:
                detail["last_known_good"] = hist
                detail["last_known_good_note"] = (
                    "context only, NOT this capture's measurement — the "
                    "relay was down at capture time"
                )
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "metric": "train layer-iterations/s/chip "
                    "(A 1000x2000, batch 1024, K=20)",
                    "value": None,
                    "unit": "layer_iter/s",
                    "vs_baseline": None,
                    "detail": detail,
                }
            ),
            flush=True,
        )
        return 1

    import jax

    if _PLATFORM:
        jax.config.update("jax_platforms", _PLATFORM)
    try:
        # Persistent compile cache: a warm cache (e.g. primed by an
        # earlier bench/battery run at the same shapes) removes most of
        # the compile-bound wall time from the driver's capture. Safe to
        # fail (backend may not support executable serialization).
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dladmm_jax_bench_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from dladmm_tpu.data.synthetic import make_batch, make_dictionary
    from dladmm_tpu.models.unroll import init_dladmm_params
    from dladmm_tpu.train.loop import (
        TrainState,
        loss_fn,
        make_train_state,
        make_train_step_from_batch,
    )

    m, n, K, S = (100, 200, 5, 64) if _SMOKE else (1000, 2000, 20, 1024)
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = make_dictionary(kA, m, n)
    params = init_dladmm_params(A, K=K)
    data = make_batch(kb, A, S)
    optimizer = optax.adam(1e-3)
    bf = jnp.bfloat16

    def make_step(precision, compute_dtype=None, vjp="auto"):
        """Straight-port-style step: loss (optionally casting inside) on
        the fp32 masters."""

        def step(state):
            def wrapped(p):
                with jax.default_matmul_precision(precision):
                    return loss_fn(
                        p,
                        A,
                        data.b,
                        data.x_star,
                        data.e_star,
                        compute_dtype=compute_dtype,
                        vjp=vjp,
                    )

            loss, grads = jax.value_and_grad(wrapped)(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            return TrainState(
                optax.apply_updates(state.params, updates),
                opt_state,
                state.step + 1,
                state.compute_params,
            )

        return step

    # ---- Phase 1 (required): flagship pair -> headline JSON ----------
    # Framework path = the fastest full-quality training step
    # (train/loop.py): mixed-precision manual-VJP FINAL-LAYER loss on
    # the persistent bf16 copy, fp32 masters, and — since round 5 — the
    # SHIPPED synthetic-preset optimizer: the fused one-HBM-pass
    # int8-moment Adam sweep (train/qadam_pallas.py; quality parity
    # with fp32 moments seed-replicated at both shapes, BASELINE.md).
    # The r1–r4 fp32-moment headline step continues round-over-round as
    # fp32_moments_step_ms below. (The synthetic presets also default
    # to deep supervision since r2 — that loss variant is measured
    # below as deep_supervised_step_ms; the headline throughput metric
    # stays the final-layer step for cross-round comparability.)
    from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas

    qopt = QAdamFusedPallas(1e-3, moment_fmt="int8")
    # The headline must NEVER die uncaptured (the capture contract this
    # harness exists for): if the Pallas optimizer kernel fails on this
    # host (e.g. a Mosaic/VMEM regression after a toolchain bump), fall
    # back to the r1–r4 fp32-moment step and LABEL the headline as the
    # fallback rather than printing nothing.
    try:
        if os.environ.get("DLADMM_BENCH_FORCE_QADAM_FAIL"):
            # Test hook (mirrors DLADMM_BENCH_FORCE_UNHEALTHY): exercise
            # the fp32 fallback without a real kernel regression.
            raise RuntimeError("forced by DLADMM_BENCH_FORCE_QADAM_FAIL")
        shipped = make_train_step_from_batch(
            qopt, A, vjp="manual", compute_dtype=bf, donate=False
        )

        def fast_step(state):
            new_state, _ = shipped(state, data)
            return new_state

        t_fast = _chained_train_time(
            fast_step, make_train_state(params, qopt, bf)
        )
        headline_optimizer = (
            f"{type(qopt).__name__}(moment_fmt={qopt.moment_fmt!r}) — "
            "fused one-HBM-pass sweep; shipped synthetic-preset default "
            "since r5 (fp32-parity seed-replicated, BASELINE.md)"
        )
        headline_fallback = None
    except Exception as exc:
        shipped = make_train_step_from_batch(
            optimizer, A, vjp="manual", compute_dtype=bf, donate=False
        )

        def fast_step(state):
            new_state, _ = shipped(state, data)
            return new_state

        t_fast = _chained_train_time(
            fast_step, make_train_state(params, optimizer, bf)
        )
        headline_optimizer = (
            f"{type(optimizer).__name__} fp32 moments — FALLBACK: the "
            "shipped int8-fused optimizer failed on this host"
        )
        headline_fallback = repr(exc)[:300]

    # Straight-port baseline: full fp32 matmuls + XLA autodiff (what a
    # naive port of the reference's fp32 cuBLAS pipeline does on TPU).
    # Its COMPILE is the single most expensive item in a cold-cache
    # capture (the r5 dry-run's headline pair alone ate 280 of 330 s and
    # starved every tracked series), while its VALUE is the stablest
    # number in the project (23.72/23.72/23.75 ms across r1/r3/r4). So:
    # the headline is printed with the most recent measured port value,
    # and the port re-measures as the LOWEST-priority budgeted phase —
    # tracked series never lose their slot to a known constant.
    def _prior_port_ms():
        if _SMOKE or _PLATFORM:
            return None  # prior captures are real-chip numbers
        import glob

        best = None
        for p in sorted(glob.glob("BENCH_r*.json")):
            try:
                with open(p) as f:
                    d = json.load(f).get("parsed") or {}
                v = (d.get("detail") or {}).get(
                    "straight_port_train_step_ms"
                )
            except Exception:
                continue
            if v:
                best = (float(v), p)
        try:
            # The self-capture wins only if NEWER than the newest driver
            # capture — mirroring the outage path's staleness guard: a
            # driver re-measured port must not be shadowed by an older
            # battery run's value.
            newest_driver = max(
                (os.path.getmtime(p) for p in glob.glob("BENCH_r*.json")),
                default=0.0,
            )
            if os.path.getmtime(_SELF_CAPTURE) > newest_driver:
                with open(_SELF_CAPTURE) as f:
                    rec = json.load(f)
                v = (rec.get("detail") or {}).get(
                    "straight_port_train_step_ms"
                )
                if v:
                    best = (float(v), _SELF_CAPTURE)
        except Exception:
            pass
        return best

    prior_port = _prior_port_ms()
    if prior_port is None:
        # First-ever capture (or smoke mode): nothing to amortize.
        t_port = _chained_train_time(
            make_step("float32", None, "xla"),
            make_train_state(params, optimizer),
        )
        port_ms, port_src = t_port * 1e3, "measured this capture"
    else:
        port_ms, src = prior_port
        port_src = (
            f"prior capture ({src}); re-measured below when budget "
            "allows — stable to ~0.2% across rounds"
        )

    value = K * S / t_fast
    headline = {
        "metric": "train layer-iterations/s/chip "
        "(A 1000x2000, batch 1024, K=20)",
        "value": round(value, 1),
        "unit": "layer_iter/s",
        "vs_baseline": round(port_ms / 1e3 / t_fast, 3),
    }
    detail = {
        "train_step_ms": round(t_fast * 1e3, 3),
        "optimizer": headline_optimizer,
        "qadam_int8_step_ms_note": "the int8-fused step IS the "
        "headline train_step_ms since r5 (was a secondary series in "
        "r4); the fp32-moment step continues as fp32_moments_step_ms",
        "straight_port_train_step_ms": round(port_ms, 3),
        "straight_port_source": port_src,
        "device": str(jax.devices()[0]),
        "timing": "device-chained, two-point calibrated, "
        "scalar-fetch synced",
        "relay_health": health_note,
    }
    if headline_fallback is not None:
        detail["headline_fallback_error"] = headline_fallback
    if _SMOKE:
        detail["SMOKE_MODE"] = "tiny shapes — numbers are meaningless"
    # Flush the headline NOW: if a secondary phase wedges, the tail of
    # stdout is still a parseable result line.
    print(json.dumps({**headline, "detail": dict(detail)}), flush=True)

    # ---- Phase 2+ (budgeted): secondary measurements -----------------
    skipped = []

    def run_phase(name, fn):
        est = PHASE_EST_S.get(name, 60.0)
        if time.monotonic() - t0 + est > SOFT_BUDGET_S:
            skipped.append(name)
            return
        p0 = time.monotonic()
        try:
            fn()
        except Exception as exc:  # a failed extra must not null the run
            detail[f"{name}_error"] = repr(exc)[:300]
        detail[f"{name}_phase_s"] = round(time.monotonic() - p0, 1)

    def phase_deep_supervised():
        # The shipped synthetic-preset default since r2: deep supervision
        # (uniform layer weights) via the trajectory forward + manual
        # reverse-scan backward (models/api.select_forward).
        from dladmm_tpu.models.api import select_forward
        from dladmm_tpu.train.loop import _layer_weights

        fwd, step_fn, _desc = select_forward(
            m, n, m, S, need_trajectory=True
        )
        lw = _layer_weights("uniform", K, jnp.float32)
        shipped_ds = make_train_step_from_batch(
            optimizer,
            A,
            layer_weights=lw,
            forward_fn=fwd,
            step_fn=step_fn,
            compute_dtype=bf,
            donate=False,
        )

        def ds_step(state):
            new_state, _ = shipped_ds(state, data)
            return new_state

        t_ds = _chained_train_time(
            ds_step, make_train_state(params, optimizer, bf)
        )
        detail["deep_supervised_step_ms"] = round(t_ds * 1e3, 3)

    def phase_fused_adam():
        # Round-3 fused Adam-in-backward (train/fused_adam.py): the
        # headline-comparable arm (final-layer loss, no clip, bf16) —
        # Adam applied per layer inside the reverse scan, so the driver
        # artifact tracks the fused step round-over-round. Full A/B
        # incl. clip/deep-supervision arms: scripts/ab_clip.py.
        from dladmm_tpu.train.fused_adam import (
            make_fused_adam_state,
            make_fused_adam_step,
        )

        fstep = make_fused_adam_step(
            A, lr=1e-3, compute_dtype=bf, donate=False, from_batch=True
        )

        def fused_step(state):
            new_state, _ = fstep(state, data)
            return new_state

        t_f = _chained_train_time(
            fused_step, make_fused_adam_state(params, None, bf)
        )
        detail["fused_adam_step_ms"] = round(t_f * 1e3, 3)

    def phase_fp32_moments():
        # Continuity series: the r1–r4 headline step — fp32 optax-Adam
        # moments, otherwise identical to the headline path. Equals
        # 'train_step_ms' in BENCH_r01–r04 (6.94–6.96 ms); kept so the
        # round-over-round series survives the r5 headline flip to the
        # shipped int8-fused optimizer. Full A/B: scripts/ab_moments.py.
        fshipped = make_train_step_from_batch(
            optimizer, A, vjp="manual", compute_dtype=bf, donate=False
        )

        def f_step(state):
            new_state, _ = fshipped(state, data)
            return new_state

        t_f = _chained_train_time(
            f_step, make_train_state(params, optimizer, bf)
        )
        detail["fp32_moments_step_ms"] = round(t_f * 1e3, 3)

    def phase_paper_config():
        # The paper's own config (A 250x500, K=15) through the
        # full-Pallas training steps (fwd+bwd megakernels). The batch-
        # 1024 chunked-bf16 series runs FIRST — it is the round-over-
        # round tracked number BENCH_r04 dropped when this phase ran
        # last and hit the old serial budget cutoff.
        from dladmm_tpu.ops.pallas_unroll import make_unrolled_forward

        m2, n2, K2, S2 = (64, 128, 4, 16) if _SMOKE else (250, 500, 15, 64)
        A2 = make_dictionary(kA, m2, n2)
        p2 = init_dladmm_params(A2, K=K2)
        opt2 = optax.adam(1e-3)
        mega = make_unrolled_forward()

        # Batch 1024 via the batch-chunked backward megakernel (round 2
        # — beats the round-1 527 us manual-VJP best).
        d3 = make_batch(kb, A2, 64 if _SMOKE else 1024)
        shipped2 = make_train_step_from_batch(
            opt2,
            A2,
            forward_fn=mega,
            compute_dtype=bf,
            donate=False,
        )

        def big_step(state):
            new_state, _ = shipped2(state, d3)
            return new_state

        t_big = _chained_train_time(
            big_step, make_train_state(p2, opt2, bf), iters=8 if _SMOKE else 128
        )
        detail["paper_config_b1024_chunked_bf16_step_us"] = round(
            t_big * 1e6, 1
        )
        detail["paper_config_b1024_layer_iter_per_s"] = round(
            K2 * 1024 / t_big, 1
        )

        # Batch 64 (the paper's own batch) through the fp32 whole-unroll
        # fwd+bwd megakernel step.
        d2 = make_batch(kb, A2, S2)

        def ref_step(state):
            def loss(p):
                x, z, _ = mega(p, A2, d2.b)
                return jnp.mean((x - d2.x_star) ** 2) + jnp.mean(
                    (z - d2.e_star) ** 2
                )

            loss_v, grads = jax.value_and_grad(loss)(state.params)
            updates, opt_state = opt2.update(
                grads, state.opt_state, state.params
            )
            return TrainState(
                optax.apply_updates(state.params, updates),
                opt_state,
                state.step + 1,
                state.compute_params,
            )

        t_ref = _chained_train_time(
            ref_step, make_train_state(p2, opt2), iters=8 if _SMOKE else 512
        )
        detail["paper_config_full_pallas_step_us"] = round(t_ref * 1e6, 1)
        detail["paper_config_layer_iter_per_s"] = round(K2 * S2 / t_ref, 1)

    def phase_straight_port():
        t_port = _chained_train_time(
            make_step("float32", None, "xla"),
            make_train_state(params, optimizer),
        )
        detail["straight_port_train_step_ms"] = round(t_port * 1e3, 3)
        detail["straight_port_source"] = "measured this capture"
        headline["vs_baseline"] = round(t_port / t_fast, 3)

    # Tracked round-over-round series first (paper_config, the shipped-
    # default deep-supervised step, the fp32-moment continuity arm);
    # then the
    # amortized straight-port re-measurement; the settled fused_adam
    # rejection re-measures only on the canary cadence.
    import glob as _glob

    round_no = len(_glob.glob("BENCH_r*.json")) + 1
    run_phase("paper_config", phase_paper_config)
    run_phase("deep_supervised", phase_deep_supervised)
    run_phase("fp32_moments", phase_fp32_moments)
    if prior_port is not None:
        run_phase("straight_port", phase_straight_port)
        if "straight_port" in skipped:
            # Not a lost series: the headline already carries the prior
            # measured value (straight_port_source says so).
            skipped.remove("straight_port")
            detail["straight_port_amortized"] = True
    if round_no % FUSED_ADAM_CANARY_EVERY == 0:
        run_phase("fused_adam", phase_fused_adam)
    else:
        detail["fused_adam_step_ms_note"] = (
            "settled rejection (11.0/11.2 ms in r3/r4 — BASELINE.md); "
            f"re-measured as a canary every {FUSED_ADAM_CANARY_EVERY} "
            f"rounds (this is round {round_no})"
        )

    if skipped:
        detail["skipped_over_budget"] = skipped
    detail["wall_s"] = round(time.monotonic() - t0, 1)
    # Final (tail) line: headline + full detail. On a clean run the
    # driver parses this; on a wedge it parses the earlier headline.
    final = {**headline, "detail": detail}
    print(json.dumps(final), flush=True)
    if not (_SMOKE or _PLATFORM):
        # Real-chip run: persist as context for outage captures, wall-
        # clock-stamped so staleness is checkable by readers too.
        try:
            os.makedirs("bench_out", exist_ok=True)
            with open(_SELF_CAPTURE, "w") as f:
                json.dump({**final, "measured_at": time.time()}, f)
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
