#!/bin/bash
# Poll until the TPU tunnel answers; log status lines. Exit when up.
LOG=/tmp/tpu_poll.log
echo "poll start $(date +%T)" > "$LOG"
while true; do
  if timeout 90 python -c "import jax; d=jax.devices(); print(d)" >> "$LOG" 2>&1; then
    echo "TPU UP $(date +%T)" >> "$LOG"
    exit 0
  fi
  echo "down $(date +%T)" >> "$LOG"
  sleep 60
done
