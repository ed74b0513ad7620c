#!/bin/bash
# TPU tunnel health monitor.  The remote accelerator tunnel can wedge for
# hours (observed r2/r3); this loop probes cheaply every 5 minutes and
# touches /tmp/tpu_alive with a timestamp when the device answers, so the
# build session can run the real bench at the next opportunity.
PROBE='import jax, numpy as np
x = jax.device_put(np.ones((8,128), np.float32))
assert float(x.sum()) == 1024.0
print("ok", jax.devices()[0])'
for i in $(seq 1 96); do  # up to 8 hours
  if timeout 240 python -c "$PROBE" > /tmp/tpu_probe.out 2>/dev/null; then
    date +%s > /tmp/tpu_alive
    cat /tmp/tpu_probe.out >> /tmp/tpu_alive
    echo "$(date) TPU alive" >> /tmp/tpu_monitor.log
  else
    rm -f /tmp/tpu_alive
    echo "$(date) probe failed" >> /tmp/tpu_monitor.log
  fi
  sleep 300
done
