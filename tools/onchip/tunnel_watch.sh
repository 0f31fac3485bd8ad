#!/bin/bash
# Poll the axon tunnel; the moment it answers, run the on-chip queue.
# Usage: nohup bash tools/onchip/tunnel_watch.sh & echo $! > /tmp/watch.pid
# (kill by pid only — never pkill by pattern.)
# The queue script is read at FIRE time, so it stays editable until then.
cd "$(dirname "$0")/../.." || exit 2
# optional arg: which queue script to fire (default: the round's main one)
QUEUE="${1:-$(dirname "$0")/queue_run.sh}"
echo "queue start $(date)" >> /tmp/tunnel_status.txt
for i in $(seq 1 960); do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != 'cpu', d
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((8, 8)))
assert float(x) == 512.0
" >/tmp/tunnel_probe.out 2>&1; then
    echo "TUNNEL ALIVE at $(date)" >> /tmp/tunnel_status.txt
    bash "$QUEUE"
    echo "QUEUE DONE at $(date)" >> /tmp/tunnel_status.txt
    exit 0
  fi
  echo "$(date +%H:%M:%S) dead" >> /tmp/tunnel_status.txt
  sleep 45
done
echo "TUNNEL STILL DEAD after 12h" >> /tmp/tunnel_status.txt
exit 1
