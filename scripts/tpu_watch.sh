#!/bin/bash
# Poll the axon TPU tunnel until jax.devices() answers; write status file.
# Usage: scripts/tpu_watch.sh [interval_s] — writes /tmp/tpu_status on success.
interval=${1:-300}
rm -f /tmp/tpu_status
while true; do
    if timeout 120 python -c "import jax; d=jax.devices(); print(d)" \
        > /tmp/tpu_probe.log 2>&1; then
        grep -qi "tpu\|axon" /tmp/tpu_probe.log && {
            echo "UP $(date -u +%FT%TZ)" > /tmp/tpu_status
            cat /tmp/tpu_probe.log >> /tmp/tpu_status
            exit 0
        }
    fi
    sleep "$interval"
done
