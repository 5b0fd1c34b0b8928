#!/bin/sh
# Round-5 seed-replication battery, third fresh seed (s3): fp32 vs
# int8_pallas vs bfloat16(RTN) Adam moments at both synthetic shapes,
# full preset recipes on the real chip. Extends bench_out/seedrep_r5/
# (seeds 1-2) so the shipped int8_pallas default rests on three seeds.
# Each arm runs under timeout so a relay wedge fails the arm, not the
# battery.
set -u
OUT=bench_out/seedrep_r5
mkdir -p "$OUT"
log() { echo "=== $* $(date +%H:%M:%S)" >> "$OUT/battery_s3.log"; }
arm() { # $1=name $2=config $3=moment_dtype
  name="$1"; cfg="$2"; md="$3"
  log "$name start"
  timeout 2400 python -m dladmm_tpu.run --config="$cfg" --seed=3 \
    --moment-dtype="$md" --log-jsonl="$OUT/${name}.jsonl" \
    > "$OUT/${name}.out" 2>&1
  rc=$?
  [ $rc -eq 0 ] && touch "$OUT/${name}.done"
  log "$name done rc=$rc"
}
arm small_float32_s3     synthetic_small float32
arm small_int8_pallas_s3 synthetic_small int8_pallas
arm small_bfloat16_s3    synthetic_small bfloat16
arm large_float32_s3     synthetic_large float32
arm large_int8_pallas_s3 synthetic_large int8_pallas
arm large_bfloat16_s3    synthetic_large bfloat16
log "ALL DONE"
