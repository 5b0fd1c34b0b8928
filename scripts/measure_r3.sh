#!/bin/bash
# Round-3 TPU measurement battery. Run on a HEALTHY relay (health-check
# first; see memory: the relay wedges for 30+ min at a time). Each phase
# is individually timeout-bounded so one wedge doesn't eat the session.
# Artifacts land in bench_out/*_r3*; console log tells which phase died.
set -x
cd "$(dirname "$0")/.."

# 0) kernel hygiene: Mosaic-only failures never surface in CPU tests
timeout 600 python scripts/verify_tpu.py || exit 1

# 1) optimizer clip A/B (VERDICT r2 #4): none / global / delayed
timeout 1500 python scripts/ab_clip.py | tee bench_out/ab_clip_r3.json

# 2) driver bench contract: must finish well under the ~10 min capture
time timeout 600 python bench.py

# 3) serving table, ALL dtypes (fp32/bf16/int8) in ONE session
#    (VERDICT r2 #5; int8 = round-3 quantized serving, ops/quantized.py)
timeout 1800 python -m dladmm_tpu.bench.serving --dtype=all \
  --out bench_out/serving_r3.json

# 4) synthetic_large quality with delayed clip (the shape where the
#    clip might actually bind; ~3 min of device time). Checkpointed so
#    phase 4b can evaluate the serving-precision ladder on it.
timeout 2400 python -m dladmm_tpu.run --config=synthetic_large \
  --clip-mode=delayed --ckpt-dir=bench_out/ckpt_large_r3 \
  --log-jsonl=bench_out/synthetic_large_delayed_r3.jsonl

# 4b) serving-precision quality ladder (fp32/bf16/int8) on the trained
#     flagship net — the int8 quality claim at the MXU-saturation shape
timeout 900 python scripts/quality_int8.py --config=synthetic_large \
  --clip-mode=delayed --ckpt-dir=bench_out/ckpt_large_r3 \
  | tee bench_out/quality_int8_large_r3.json

# 5) synthetic_large quality with the fused optimizer (same recipe
#    through train/fused_adam.py — must reproduce phase 4's numbers)
timeout 2400 python -m dladmm_tpu.run --config=synthetic_large \
  --clip-mode=delayed --optimizer=fused_adam \
  --log-jsonl=bench_out/synthetic_large_fused_r3.jsonl

# 6) kernel-level profiles: shipped vs fused flagship step (does the
#    optimizer traffic actually overlap the backward contractions?)
timeout 600 python -m dladmm_tpu.bench.profile_step \
  --out bench_out/profile_flagship_r3.json
timeout 600 python -m dladmm_tpu.bench.profile_step --step=fused \
  --out bench_out/profile_fused_r3.json
