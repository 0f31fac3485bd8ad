#!/bin/bash
# Round-4f queue: the wonly-arm latency pair the 529'd session never
# captured (deit_tiny b=1,256 — is weight-only really bf16-speed at both
# ends of the batch range?) plus the deit_small b=1 wonly anchor.
# Each slot: own timeout + log; rc recorded; later slots still run.
cd "$(dirname "$0")/../.." || exit 2
overall=0
run() {
  name="$1"; shift
  echo "== slot $name: $* $(date)" | tee -a /tmp/queue_r4f.log
  timeout 1800 "$@" > "/tmp/r4f_$name.log" 2>&1
  rc=$?
  echo "== slot $name rc=$rc $(date)" | tee -a /tmp/queue_r4f.log
  [ $rc -ne 0 ] && overall=1
}
run wonly_tiny  python tools/latency_ab.py deit_tiny --batches 1,256
run wonly_small python tools/latency_ab.py deit_small --batches 1
exit $overall
