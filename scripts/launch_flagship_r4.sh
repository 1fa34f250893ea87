#!/bin/bash
# Round-4 flagship launcher: a quality-gated, health-monitored chip run.
#
# Hard gates, in order (VERDICT r3 items 1, 3, 10 — none may be waived):
#   1. FAST TEST GATE: a < 5-min CPU test subset must be green.
#   2. CPU QUALITY GATE: a completed CPU run of the SAME recipe on the
#      first $GATE_FRAMES frames of the flagship dataset with finite
#      ate < 0.05 and psnr >= 25. No in-flight waivers: this script
#      BLOCKS until the gate run finishes.
#   3. TPU HEALTH: /tmp/tpu_status says HEALTHY (scripts/tpu_poll.sh).
# After the chip run, the artifact is committed ONLY if metrics.json has
# finite ate < 0.05, psnr >= 25, diverged == false and zero non-finite
# trajectory entries; otherwise a commit-refused line is logged.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
echo $$ > /tmp/flagship_r4.pid
LOG=/tmp/flagship_r4.log
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

DATASET=${DATASET:-runs/r4_scene/dataset.npz}
# The CPU gate runs the SAME scene / SAME camera trajectory at quarter
# resolution (160x120): full-res tracking at the reference's 200-eval
# budget costs ~90 s/frame on this 1-core host, so a full-res gate can
# never complete before the chip window closes. The r3 failure mode
# (under-converged tracking -> keyframe-burst explosion -> NaN by frame
# 24) reproduces at 160x120 — motion is world-space and identical.
GATE_DATASET=${GATE_DATASET:-runs/r4_scene/dataset_160.npz}
RUN=${RUN:-r4_flagship}
GATE_RUN=${GATE_RUN:-r4_gate_cpu}
GATE_FRAMES=${GATE_FRAMES:-24}
# Recipe notes (docs/TRACKING_STUDY.md "r4 gate failure"):
#  * plateau_min_loss=0.0 — the reference-parity 0.012 pause freezes
#    mapping right after bootstrap on this scene (E0/E1, runs/r4_e*).
#  * kf_m=0.015 — the scene is translation-dominant (cos_z > 0.997 for
#    15+ frames) so the kf_cos trigger never fires; at kf_m=0.04 the
#    translation trigger fires every ~8 frames, the map is constrained
#    by only 2 viewpoints, and tracking basin-jumps at f16 (E0 == E1,
#    ate 0.153 both). 0.015*median_depth ~ 4.5 cm -> a keyframe every
#    ~2 frames, matching the per-frame motion.
RECIPE=${RECIPE:---use-gt-depths --capacity 32768 --kf-capacity 32 --fused \
  --chunk 1 --sync-every 4 --init-ipd 40 --eval-stride 4 \
  --checkpoint-every 40 --set mapping.kf_m=0.015 \
  --set mapping.plateau_min_loss=0.0}

check_metrics() {  # $1 = metrics.json, $2 = trajectory.npy (optional)
  python - "$1" "${2:-}" <<'EOF'
import json, sys
import numpy as np
try:
    m = json.load(open(sys.argv[1]))
except Exception as e:
    print(f"gate: unreadable metrics ({e})"); sys.exit(1)
ate, psnr = m.get("ate"), m.get("psnr")
ok = (isinstance(ate, (int, float)) and np.isfinite(ate) and ate < 0.05
      and isinstance(psnr, (int, float)) and psnr >= 25.0
      and not m.get("diverged", False)
      and m.get("nonfinite_poses", 0) == 0)
if len(sys.argv) > 2 and sys.argv[2]:
    t = np.load(sys.argv[2])
    if not np.isfinite(t).all():
        print("gate: non-finite trajectory entries"); sys.exit(1)
print(f"gate: ate={ate} psnr={psnr} diverged={m.get('diverged')} -> "
      f"{'PASS' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
EOF
}

# ---- gate 1: fast test subset (CPU) ----
log "gate 1: fast test subset"
if ! timeout 900 python -m pytest tests/test_transforms.py \
    tests/test_opt_losses.py -x -q > /tmp/fast_gate.log 2>&1; then
  log "FAST TEST GATE FAILED — aborting (see /tmp/fast_gate.log)"
  exit 1
fi
log "gate 1 green"

# ---- gate 2: completed CPU quality run on the flagship dataset ----
if ! check_metrics "runs/$GATE_RUN/metrics.json" \
    "runs/$GATE_RUN/trajectory.npy" >> "$LOG" 2>&1; then
  log "gate 2: running CPU quality gate ($GATE_FRAMES frames) to completion"
  timeout 43200 env JAX_PLATFORMS=cpu python -u main.py \
    --dataset npz --scene "$GATE_DATASET" --seq-len "$GATE_FRAMES" \
    --max-frames 200 $RECIPE --checkpoint-every 0 \
    --run-name "$GATE_RUN" > /tmp/gate_cpu.log 2>&1
  rc=$?
  log "gate 2 run exited rc=$rc"
  if ! check_metrics "runs/$GATE_RUN/metrics.json" \
      "runs/$GATE_RUN/trajectory.npy" >> "$LOG" 2>&1; then
    log "CPU QUALITY GATE FAILED — not launching; fix the recipe"
    exit 1
  fi
fi
log "gate 2 PASS"

# ---- gate 3: TPU health (poller-driven; no direct probes from here) ----
while true; do
  st=$(cat /tmp/tpu_status 2>/dev/null || echo UNKNOWN)
  [ "$st" = "HEALTHY" ] && break
  log "gate 3: tpu=$st; waiting"
  sleep 300
done
log "gate 3: TPU healthy; capturing chip bench before the flagship"

# The worker is single-client (docs/PERF.md rule 5): from here on this
# script owns the chip. Stop the health poller and any bench watcher so
# their probes cannot wedge the bench/flagship dispatch stream; the
# poller restarts at the end.
touch /tmp/tpu_poll_stop
[ -f /tmp/bench_watch.pid ] && kill "$(cat /tmp/bench_watch.pid)" 2>/dev/null
sleep 130  # let an in-flight poller probe (timeout 120) finish first

# ---- chip bench (VERDICT r3 item 4). If a valid bench artifact already
# exists (captured manually in an earlier healthy window), do NOT spend
# this window on it — the flagship is the round's one job and needs the
# longest healthy stretch. A full bench (mapping + onemillion sections)
# runs after the flagship instead.
bench_valid() {
  python - <<'EOF'
import json
try:
    m = json.load(open("runs/bench/bench_r4_chip.json"))
except Exception:
    raise SystemExit(1)
v = m.get("value")
raise SystemExit(0 if isinstance(v, (int, float)) and v > 0 else 1)
EOF
}
if bench_valid; then
  log "bench evidence already valid (runs/bench/bench_r4_chip.json); skipping pre-flagship bench"
elif timeout 3600 python -u bench.py > /tmp/bench_r4.json 2>/tmp/bench_r4.err; then
  if python - <<'EOF'
import json
m = json.load(open("/tmp/bench_r4.json"))
ok = isinstance(m.get("value"), (int, float)) and m["value"] > 0
raise SystemExit(0 if ok else 1)
EOF
  then
    mkdir -p runs/bench && cp /tmp/bench_r4.json runs/bench/bench_r4_chip.json
    git add runs/bench/bench_r4_chip.json
    git commit -q -m "Chip bench evidence: non-zero tracking FPS on recovered worker" \
      && log "bench evidence committed"
  else
    log "bench produced no valid measurement (worker flapped); continuing"
  fi
else
  log "bench run failed/timed out; continuing to flagship"
fi

log "launching chip flagship"
rc=1
for attempt in 1 2 3; do
  RESUME_ARGS=""
  if [ -f "runs/$RUN/fused_ckpt.npz" ]; then
    RESUME_ARGS="--resume runs/$RUN/fused_ckpt.npz"
    log "attempt $attempt resumes from fused_ckpt.npz"
  fi
  timeout 9000 python -u main.py --dataset npz --scene "$DATASET" \
    --max-frames 200 $RECIPE $RESUME_ARGS \
    --run-name "$RUN" > /tmp/flagship_r4_run.log 2>&1
  rc=$?
  log "flagship attempt $attempt exited rc=$rc"
  [ -f "runs/$RUN/metrics.json" ] && break
  # crashed mid-run: the poller is stopped (this script owns the chip),
  # so probe directly until the worker recovers (<= 2 h)
  up=""
  for i in $(seq 1 24); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
      up=1; break
    fi
    sleep 300
  done
  [ -n "$up" ] || { log "worker still down; giving up retries"; break; }
done

# ---- commit gate: refuse failure artifacts (VERDICT r3 item 3) ----
if check_metrics "runs/$RUN/metrics.json" "runs/$RUN/trajectory.npy" \
    >> "$LOG" 2>&1; then
  git add "runs/$RUN/metrics.json" "runs/$RUN/args.txt" \
          "runs/$RUN/trajectory.npy" "runs/$RUN/telemetry.npz" 2>/dev/null
  git commit -q -m "Flagship chip run: quality-gated fused SLAM on the raytraced scene" \
    && log "flagship artifact committed"
else
  log "COMMIT REFUSED: chip flagship failed the quality thresholds"
fi

# ---- post-flagship full bench: the pre-flagship artifact may cover only
# the tracking section (mapping/onemillion timed out under CPU contention
# with the gate run). With the CPU idle and the chip warm, try once for
# the full set; keep it only if valid.
if timeout 3600 python -u bench.py > /tmp/bench_r4_full.json 2>/tmp/bench_r4_full.err; then
  if python - <<'EOF'
import json
m = json.load(open("/tmp/bench_r4_full.json"))
ok = isinstance(m.get("value"), (int, float)) and m["value"] > 0
raise SystemExit(0 if ok else 1)
EOF
  then
    cp /tmp/bench_r4_full.json runs/bench/bench_r4_chip_full.json
    git add runs/bench/bench_r4_chip_full.json
    git commit -q -m "Post-flagship full chip bench (all sections, idle host)" \
      && log "full bench evidence committed"
  else
    log "post-flagship bench invalid; keeping earlier artifact"
  fi
else
  log "post-flagship bench failed/timed out; keeping earlier artifact"
fi

# hand the chip back to the health poller
rm -f /tmp/tpu_poll_stop
nohup bash scripts/tpu_poll.sh > /dev/null 2>&1 &
echo $! > /tmp/tpu_poll.pid
log "poller restarted ($(cat /tmp/tpu_poll.pid))"
