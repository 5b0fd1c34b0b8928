#!/bin/bash
# Poll the TPU relay; when it answers a trivial matmul, run the queued
# round-3 measurement battery (scripts/measure_r3.sh). The battery is
# RESUMABLE (phases skip when their artifact exists), so if the relay
# wedges mid-battery we go back to polling and retry the remaining
# phases — up to MAX_ATTEMPTS recovery windows.
# Log: bench_out/relay_watch.log ; battery log: bench_out/measure_r3.log
cd "$(dirname "$0")/.."
mkdir -p bench_out
MAX_ATTEMPTS=8
attempt=0
while true; do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
(x @ x).block_until_ready()
EOF
  then
    attempt=$((attempt + 1))
    echo "$(date -u +%FT%TZ) relay HEALTHY — battery attempt $attempt" >> bench_out/relay_watch.log
    bash scripts/measure_r3.sh >> bench_out/measure_r3.log 2>&1
    rc=$?
    echo "$(date -u +%FT%TZ) measure_r3.sh exited rc=$rc (attempt $attempt)" >> bench_out/relay_watch.log
    if [ "$rc" -eq 0 ]; then
      echo "$(date -u +%FT%TZ) battery COMPLETE" >> bench_out/relay_watch.log
      exit 0
    fi
    if [ "$attempt" -ge "$MAX_ATTEMPTS" ]; then
      echo "$(date -u +%FT%TZ) giving up after $attempt attempts" >> bench_out/relay_watch.log
      exit 1
    fi
  else
    echo "$(date -u +%FT%TZ) relay still down" >> bench_out/relay_watch.log
  fi
  sleep 240
done
