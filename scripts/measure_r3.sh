#!/bin/bash
# Round-3 TPU measurement battery. Run on a HEALTHY relay (health-check
# first; see memory: the relay wedges for 30+ min — sometimes HOURS —
# at a time). Each phase is individually timeout-bounded so one wedge
# doesn't eat the session, and RESUMABLE: a phase whose artifact is
# already on disk is skipped, so relay_watch.sh can retry the battery
# across flaky recovery windows until every artifact exists.
# Artifacts land in bench_out/*_r3*; console log tells which phase died.
set -x
cd "$(dirname "$0")/.."

done_marker() { [ -s "$1" ]; }

# 0) kernel hygiene: Mosaic-only failures never surface in CPU tests
if ! done_marker bench_out/verify_tpu_r3.ok; then
  timeout 600 python scripts/verify_tpu.py && \
    echo "PASS $(date -u +%FT%TZ)" > bench_out/verify_tpu_r3.ok || exit 1
fi

# 1) optimizer clip A/B (VERDICT r2 #4): none / global / delayed / fused
if ! done_marker bench_out/ab_clip_r3.json; then
  timeout 1500 python scripts/ab_clip.py | tee bench_out/ab_clip_r3.json.tmp \
    && mv bench_out/ab_clip_r3.json.tmp bench_out/ab_clip_r3.json
fi

# 2) driver bench contract: must finish well under the ~10 min capture.
#    bench.py writes bench_out/bench_self_capture.json on success.
if ! done_marker bench_out/bench_self_capture.json; then
  time timeout 600 python bench.py
fi

# 3) serving table, ALL dtypes (fp32/bf16/int8) in ONE session
#    (VERDICT r2 #5; int8 = round-3 quantized serving, ops/quantized.py)
if ! done_marker bench_out/serving_r3.json; then
  timeout 1800 python -m dladmm_tpu.bench.serving --dtype=all \
    --out bench_out/serving_r3.json
fi

# 4) synthetic_large quality with delayed clip (the shape where the
#    clip might actually bind; ~3 min of device time). Checkpointed +
#    --resume, so a wedge mid-run continues instead of restarting.
if ! done_marker bench_out/synthetic_large_delayed_r3.done; then
  timeout 2400 python -m dladmm_tpu.run --config=synthetic_large \
    --clip-mode=delayed --ckpt-dir=bench_out/ckpt_large_r3 --resume \
    --log-jsonl=bench_out/synthetic_large_delayed_r3.jsonl \
    && echo done > bench_out/synthetic_large_delayed_r3.done
fi

# 4b) serving-precision quality ladder (fp32/bf16/int8) on the trained
#     flagship net — the int8 quality claim at the MXU-saturation shape
if ! done_marker bench_out/quality_int8_large_r3.json; then
  timeout 900 python scripts/quality_int8.py --config=synthetic_large \
    --clip-mode=delayed --ckpt-dir=bench_out/ckpt_large_r3 \
    | tee bench_out/quality_int8_large_r3.json.tmp \
    && mv bench_out/quality_int8_large_r3.json.tmp \
         bench_out/quality_int8_large_r3.json
fi

# 5) synthetic_large quality with the fused optimizer (same recipe
#    through train/fused_adam.py — must reproduce phase 4's numbers)
if ! done_marker bench_out/synthetic_large_fused_r3.done; then
  timeout 2400 python -m dladmm_tpu.run --config=synthetic_large \
    --clip-mode=delayed --optimizer=fused_adam \
    --ckpt-dir=bench_out/ckpt_large_fused_r3 --resume \
    --log-jsonl=bench_out/synthetic_large_fused_r3.jsonl \
    && echo done > bench_out/synthetic_large_fused_r3.done
fi

# 6) kernel-level profiles: shipped vs fused flagship step (does the
#    optimizer traffic actually overlap the backward contractions?)
if ! done_marker bench_out/profile_flagship_r3.json; then
  timeout 600 python -m dladmm_tpu.bench.profile_step \
    --out bench_out/profile_flagship_r3.json
fi
if ! done_marker bench_out/profile_fused_r3.json; then
  timeout 600 python -m dladmm_tpu.bench.profile_step --step=fused \
    --out bench_out/profile_fused_r3.json
fi

# Summary: exit 0 only when EVERY artifact exists (the watcher retries
# otherwise).
for f in bench_out/verify_tpu_r3.ok bench_out/ab_clip_r3.json \
         bench_out/bench_self_capture.json bench_out/serving_r3.json \
         bench_out/synthetic_large_delayed_r3.done \
         bench_out/quality_int8_large_r3.json \
         bench_out/synthetic_large_fused_r3.done \
         bench_out/profile_flagship_r3.json bench_out/profile_fused_r3.json; do
  if ! done_marker "$f"; then echo "MISSING: $f"; exit 2; fi
done
echo "BATTERY COMPLETE $(date -u +%FT%TZ)"
