#!/bin/bash
# Poll the axon tunnel; the moment it answers, run the on-chip queue.
# Usage: nohup bash tools/onchip/tunnel_watch.sh & echo $! > /tmp/watch.pid
# (kill by pid only — never pkill by pattern.)
# The queue script is read at FIRE time, so it stays editable until then.
# resolve the queue path to absolute BEFORE the cd (a relative $0 or $1
# from any other cwd would otherwise point nowhere after it — round-4
# self-review finding)
SELF_DIR="$(cd "$(dirname "$0")" && pwd)" || exit 2
QUEUE="${1:-$SELF_DIR/queue_run.sh}"
QUEUE="$(readlink -f "$QUEUE" 2>/dev/null || echo "$QUEUE")"
[ -f "$QUEUE" ] || { echo "queue script not found: $QUEUE" >> /tmp/tunnel_status.txt; exit 2; }
cd "$SELF_DIR/../.." || exit 2
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
    rc=$?
    echo "QUEUE DONE rc=$rc at $(date)" >> /tmp/tunnel_status.txt
    exit $rc
  fi
  echo "$(date +%H:%M:%S) dead" >> /tmp/tunnel_status.txt
  sleep 45
done
echo "TUNNEL STILL DEAD after 12h" >> /tmp/tunnel_status.txt
exit 1
