#!/bin/bash
# Capture the round-5 chip bench artifact (GN device-bound headline).
#
# Run ONLY while no other chip client is active (the worker is
# single-client, docs/PERF.md rule 5). The launcher's idle window right
# after its gate commit — or any time the launcher is stopped — is safe.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
# own the chip: stop the poller and let an in-flight probe drain
touch /tmp/tpu_poll_stop
sleep 125
OUT=runs/bench/bench_r5_chip.json
timeout 1500 python bench.py > /tmp/bench_r5.out 2> /tmp/bench_r5.err
rc=$?
tail -n 1 /tmp/bench_r5.out > "$OUT"
rm -f /tmp/tpu_poll_stop
nohup bash scripts/tpu_poll.sh > /dev/null 2>&1 &
echo $! > /tmp/tpu_poll.pid
echo "bench rc=$rc -> $OUT"
python - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print("headline:", d.get("metric"), d.get("value"), d.get("unit"),
      "vs_baseline:", d.get("vs_baseline"), "stale:", d.get("stale", False))
EOF
