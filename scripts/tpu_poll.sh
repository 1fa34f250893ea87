#!/bin/bash
# TPU health poller: probes the axon worker with a tiny matmul + readback
# every 5 minutes and records the result in /tmp/tpu_status (HEALTHY or
# WEDGED, with a timestamp in /tmp/tpu_status.log). Launch helpers wait on
# this file instead of probing themselves, so only ONE process ever touches
# a possibly-wedged worker (docs/PERF.md rule 5: the worker is effectively
# single-client and probes of a wedged worker can prolong the outage).
set -u
while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo HEALTHY > /tmp/tpu_status
  else
    echo WEDGED > /tmp/tpu_status
  fi
  echo "$(date +%F-%H:%M:%S) $(cat /tmp/tpu_status)" >> /tmp/tpu_status.log
  # Stop condition: a flag file lets any later script end the poller
  # without pattern-killing processes.
  [ -f /tmp/tpu_poll_stop ] && exit 0
  sleep 300
done
