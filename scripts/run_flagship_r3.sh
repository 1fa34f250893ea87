#!/bin/bash
# Round-3 flagship chip run (VERDICT r2 item 1): >=100 frames, C>=8,
# fused runtime, bounded backlog, artifacts in runs/r3_flagship_v2/.
#
# Probes chip health first (tiny matmul + readback) and refuses to launch
# on a wedged worker — the axon TPU is a single-client resource with slow
# crash recovery (docs/PERF.md rule 5).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

echo "[flagship] probing chip health..."
if ! timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); print(float((x @ x).sum()))
" >/dev/null 2>&1; then
  echo "[flagship] chip wedged — aborting launch" >&2
  exit 3
fi
echo "[flagship] chip healthy, launching"

exec timeout 7200 python -u main.py \
  --dataset npz --scene runs/r3_flagship/dataset_gentle.npz \
  --seq-len 140 --max-frames 200 \
  --capacity 32768 --kf-capacity 32 \
  --fused --chunk 1 --sync-every 8 --init-ipd 40 \
  --eval-stride 8 \
  --run-name r3_flagship_v2
