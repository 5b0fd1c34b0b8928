#!/bin/bash
# Poll the TPU relay; when it answers a trivial matmul, run the queued
# round-3 measurement battery (scripts/measure_r3.sh) exactly once.
# Log: bench_out/relay_watch.log ; battery log: bench_out/measure_r3.log
cd "$(dirname "$0")/.."
mkdir -p bench_out
while true; do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
(x @ x).block_until_ready()
EOF
  then
    echo "$(date -u +%FT%TZ) relay HEALTHY — launching measure_r3.sh" >> bench_out/relay_watch.log
    bash scripts/measure_r3.sh > bench_out/measure_r3.log 2>&1
    echo "$(date -u +%FT%TZ) measure_r3.sh exited rc=$?" >> bench_out/relay_watch.log
    exit 0
  fi
  echo "$(date -u +%FT%TZ) relay still down" >> bench_out/relay_watch.log
  sleep 240
done
