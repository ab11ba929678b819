#!/bin/bash
# Tunnel watchdog: probe the TPU every 5 min; the moment a device
# enumeration succeeds, run the priority-ordered round-3 measurement
# queue (scratch/tpu_session.sh) and exit. Run inside tmux so it
# survives the driver's turn boundaries. Log: scratch/tpu_watch.log.
cd /root/repo
LOG=scratch/tpu_watch.log
echo "=== watchdog start $(date)" >> "$LOG"
while true; do
  if timeout 300 python -c "import jax; assert jax.default_backend() == 'tpu'; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "=== TUNNEL UP $(date) — running tpu_session.sh" >> "$LOG"
    bash scratch/tpu_session.sh
    echo "=== queue done $(date)" >> "$LOG"
    break
  fi
  echo "--- probe failed $(date)" >> "$LOG"
  sleep 300
done
