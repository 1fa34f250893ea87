#!/bin/bash
# Round-5 flagship launcher: quality-gated, health-monitored CHIP runs.
#
# Differences from r4 (scripts/launch_flagship_r4.sh):
#  * The quality gate runs ON THE CHIP (160x120, 24 frames) — r4 ran it on
#    the 1-core CPU host where it costs ~2.5 h, which twice ended a round
#    with the gate mid-flight (VERDICT r4 weak #3). On a healthy chip the
#    same run is minutes, so gate + flagship fit one healthy window.
#  * Recipe: DEFAULT config (motion-adaptive keyframes kf_adapt=2.5,
#    plateau pause off — VERDICT r4 weak #7 asked for no per-scene
#    hand-tuning) + coarse-to-fine pyramid tracking (100/70/200 evals):
#    the flat 200-eval tracker basin-jumped at f16 of this scene in both
#    the r4 and r5 CPU gates; the coarse levels widen the basin while the
#    fine level keeps the reference-parity 200-eval refinement.
#  * The chip can flap (observed 20-min healthy windows between 60-90 min
#    outages): every run gets checkpoint/resume and up to 3 attempts.
#
# Commit policy: artifacts are committed ONLY if metrics.json has finite
# ate < 0.05, psnr >= 25, diverged == false, zero non-finite poses.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
echo $$ > /tmp/flagship_r5.pid
LOG=/tmp/flagship_r5.log
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

GATE_DATASET=${GATE_DATASET:-runs/r4_scene/dataset_160.npz}
DATASET=${DATASET:-runs/r4_scene/dataset.npz}
RUN=${RUN:-r5_flagship}
GATE_RUN=${GATE_RUN:-r5_gate_chip}
GATE_FRAMES=${GATE_FRAMES:-24}
FLAGSHIP_FRAMES=${FLAGSHIP_FRAMES:-160}
RECIPE=${RECIPE:---use-gt-depths --capacity 32768 --kf-capacity 32 --fused \
  --chunk 1 --sync-every 4 --init-ipd 40 --eval-stride 4 \
  --set tracking.pyramid_levels=3 \
  --set tracking.pyramid_evals=[100,70,200]}

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

wait_healthy() {
  while true; do
    st=$(cat /tmp/tpu_status 2>/dev/null || echo UNKNOWN)
    [ "$st" = "HEALTHY" ] && return 0
    log "tpu=$st; waiting"
    sleep 120
  done
}

run_with_resume() {  # $1=run_name $2=dataset $3=frames $4=timeout_s
  local name=$1 dsfile=$2 frames=$3 tmo=$4 rc=1
  for attempt in 1 2 3; do
    wait_healthy
    # Own the chip exclusively: stop the poller (its probes interleaving
    # with an active client's dispatch stream can wedge the single-client
    # worker, docs/PERF.md rule 5) and let any in-flight probe finish.
    touch /tmp/tpu_poll_stop
    sleep 125
    local resume_args=""
    if [ -f "runs/$name/fused_ckpt.npz" ]; then
      resume_args="--resume runs/$name/fused_ckpt.npz"
      log "$name attempt $attempt resumes from fused_ckpt.npz"
    fi
    log "$name attempt $attempt starting ($frames frames)"
    timeout "$tmo" python -u main.py --dataset npz --scene "$dsfile" \
      --seq-len "$frames" --max-frames 200 $RECIPE \
      --checkpoint-every 20 $resume_args \
      --run-name "$name" > "/tmp/${name}_run.log" 2>&1
    rc=$?
    log "$name attempt $attempt exited rc=$rc"
    # restart the poller for the next wait_healthy
    rm -f /tmp/tpu_poll_stop
    nohup bash scripts/tpu_poll.sh > /dev/null 2>&1 &
    echo $! > /tmp/tpu_poll.pid
    [ $rc -eq 0 ] && break
  done
  return $rc
}

# ---- gate 1: fast CPU test subset ----
log "gate 1: fast test subset"
if ! timeout 1200 env JAX_PLATFORMS=cpu python -m pytest \
    tests/test_transforms.py tests/test_opt_losses.py -x -q \
    > /tmp/fast_gate_r5.log 2>&1; then
  log "FAST TEST GATE FAILED — aborting (see /tmp/fast_gate_r5.log)"
  exit 1
fi
log "gate 1 green"

# ---- gate 2: chip quality gate on the flagship scene ----
# The launcher owns the chip from here: stop the poller so its probes
# cannot interleave with the run's dispatch stream (single-client worker).
if ! check_metrics "runs/$GATE_RUN/metrics.json" \
    "runs/$GATE_RUN/trajectory.npy" >> "$LOG" 2>&1; then
  run_with_resume "$GATE_RUN" "$GATE_DATASET" "$GATE_FRAMES" 5400
  if ! check_metrics "runs/$GATE_RUN/metrics.json" \
      "runs/$GATE_RUN/trajectory.npy" >> "$LOG" 2>&1; then
    log "CHIP QUALITY GATE FAILED — not launching the flagship"
    exit 1
  fi
fi
log "gate 2 PASS — committing gate artifact"
git add "runs/$GATE_RUN" && git commit -q -m \
  "r5 chip gate PASS: 24-frame 160x120 pyramid-tracked run (ate<0.05, psnr>=25)" \
  && log "gate artifact committed"

# ---- flagship ----
run_with_resume "$RUN" "$DATASET" "$FLAGSHIP_FRAMES" 7200
if check_metrics "runs/$RUN/metrics.json" "runs/$RUN/trajectory.npy" \
    >> "$LOG" 2>&1; then
  git add "runs/$RUN" && git commit -q -m \
    "r5 chip flagship: ${FLAGSHIP_FRAMES}-frame SLAM run ($DATASET), quality-gated (ate<0.05, psnr>=25)" \
    && log "flagship artifact committed"
else
  log "flagship metrics FAIL commit gate — artifact left uncommitted"
  exit 1
fi
log "launcher done"
