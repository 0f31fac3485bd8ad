#!/bin/bash
# Round-4g queue: re-capture the wstream A/B with the unambiguous
# baseline (the xla arm now receives bf16 weight constants — exactly what
# weight-only serving streams — instead of int8 codes whose convert XLA
# may or may not hoist; self-review finding). Decision rule unchanged:
# best packed arm must win >=10% on the depth-12 chain at M=197 to
# productionize; otherwise the BENCH.md dead-end table is refreshed with
# the corrected-baseline numbers.
cd "$(dirname "$0")/../.." || exit 2
overall=0
run() {
  name="$1"; shift
  echo "== slot $name: $* $(date)" | tee -a /tmp/queue_r4g.log
  timeout 1800 "$@" > "/tmp/r4g_$name.log" 2>&1
  rc=$?
  echo "== slot $name rc=$rc $(date)" | tee -a /tmp/queue_r4g.log
  [ $rc -ne 0 ] && overall=1
}
run wstream python tools/wstream_bench.py
# ledger refresh (insurance: the freshest committed on-chip state if the
# tunnel dies again before the driver's round-end capture)
echo "== slot bench: bench.py $(date)" | tee -a /tmp/queue_r4g.log
P2VIT_BENCH_TUNNEL_WAIT_S=600 timeout 5400 python bench.py \
  > /tmp/r4g_bench.log 2>&1
rc=$?
echo "== slot bench rc=$rc $(date)" | tee -a /tmp/queue_r4g.log
[ $rc -ne 0 ] && overall=1
exit $overall
