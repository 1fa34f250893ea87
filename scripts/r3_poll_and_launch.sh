#!/bin/bash
# Round-3 session: poll the TPU worker until a tiny matmul+readback
# succeeds, then immediately launch the 160-frame fused flagship
# (docs/PERF.md rule 5: single-client worker, slow crash recovery —
# serialize all chip jobs and never launch on a wedged worker).
set -u
cd /root/repo
echo $$ > /tmp/r3_launch.pid
log() { echo "$(date +%H:%M:%S) $*"; }

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1
}

n=0
until probe; do
  n=$((n+1))
  log "probe $n failed; worker still down"
  sleep 90
done
log "worker healthy after $n failed probes; launching flagship"

RESUME_ARGS=""
if [ -f runs/r3_flagship_final/fused_ckpt.npz ]; then
  RESUME_ARGS="--resume runs/r3_flagship_final/fused_ckpt.npz"
  log "resuming from fused_ckpt.npz"
fi
timeout 7200 python -u main.py --dataset npz --scene runs/r3_flagship2/dataset.npz \
  --capacity 32768 --kf-capacity 32 --fused --chunk 1 --sync-every 4 \
  --init-ipd 40 --eval-stride 4 --tracking-max-evals 80 \
  --checkpoint-every 40 $RESUME_ARGS \
  --set mapping.kf_m=0.04 \
  --run-name r3_flagship_final
rc=$?
log "flagship exited rc=$rc"
if [ -f runs/r3_flagship_final/metrics.json ]; then
  git add runs/r3_flagship_final/metrics.json runs/r3_flagship_final/args.txt \
          runs/r3_flagship_final/trajectory.npy
  git commit -q -m "Flagship chip run: 160-frame fused SLAM on realistic-motion synthetic scene" \
    && log "flagship artifact committed"
fi
exit $rc
