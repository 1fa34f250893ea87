#!/bin/bash
# Post-flagship chip chain (round 3). Waits for the flagship launcher to
# exit, then — serialized, healthiest-first per docs/PERF.md rule 5 —
#   1. runs the rewritten bench.py on the chip and commits its output as
#      runs/r3_bench/bench.json (VERDICT r2 items 3/6/7 evidence),
#   2. probes the NEW unrolled chunked dispatch (no lax.scan) on chip,
#   3. probes the lax.scan variants (riskiest last: a kernel fault can
#      wedge the worker for an hour+).
set -u
cd /root/repo
echo $$ > /tmp/r3_chain.pid
log() { echo "$(date +%H:%M:%S) $*"; }

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1
}

# 0. wait for the flagship launcher (by pidfile, never by pattern)
LPID=$(cat /tmp/r3_launch.pid 2>/dev/null || echo "")
while [ -n "$LPID" ] && kill -0 "$LPID" 2>/dev/null; do
  sleep 60
done
log "flagship launcher gone; starting chip chain"

# 1. bench.py (validating the round-3 rewrite on chip before the driver's
# round-end invocation is its first execution there)
if probe; then
  mkdir -p runs/r3_bench
  timeout 3600 python bench.py > runs/r3_bench/bench.json 2>/tmp/r3_bench.err
  log "bench rc=$? -> runs/r3_bench/bench.json"
  tail -1 runs/r3_bench/bench.json
  git add runs/r3_bench/bench.json \
    && git commit -q -m "Chip bench evidence: tracking/mapping/1M-splat sections, fresh-process methodology" \
    && log "bench artifact committed"
else
  log "worker down before bench; skipping chain"
  exit 1
fi

# 2. unrolled chunk probe (new chunk_backend=unroll path; no scan nesting)
if probe; then
  log "unroll chunk probe (chunk=4, 16 frames; ~4x single-step compile, cached for later runs)"
  timeout 5400 python scripts/debug_fused_scan.py 4 16 while auto unroll \
    > /tmp/r3_unroll_probe.log 2>&1
  log "unroll probe rc=$? (see /tmp/r3_unroll_probe.log)"
  tail -3 /tmp/r3_unroll_probe.log
fi

# 3. scan variants, riskiest last
for variant in "8 16 fori jnp" "8 16 fori auto"; do
  probe || { log "worker down before scan probe [$variant]; stopping"; break; }
  log "scan probe [$variant]"
  timeout 5400 python scripts/debug_fused_scan.py $variant \
    > "/tmp/r3_scan_probe_${variant// /_}.log" 2>&1
  log "scan probe [$variant] rc=$? (see /tmp/r3_scan_probe_${variant// /_}.log)"
done
log "chain done"
