#!/bin/bash
# Round-5 queue, part B — the slots queue_r5.sh did NOT reach before the
# tunnel died (~03:30 2026-08-20; completed: ledger_bench, ledger_zoo,
# icept_swinbase, ceiling_swinsmall, icept_swinsmall — logs committed in
# tools/onchip/logs/r5/). ORDERED BY LEVERAGE for the time left in round 5:
#   0. tp_swin — Swin TP kernels just landed; interpret tests cannot catch
#      Mosaic lowering failures (CLAUDE.md), so compile-check on chip FIRST.
#   1. e2e_eval — VERDICT item 4 (disk→logits, host-bound verdict).
#   2. latency_swindeep — VERDICT item 5 (plan.py crossover for deep Swins).
#   3. search_swin — VERDICT item 7 (Swin mixed search timed on chip).
#   4. latency_vitwide — ADVICE (wide-ViT crossover point).
#   5. ledger refresh LAST this time (it was refreshed 01:35 today; a
#      second capture only matters if the earlier slots leave time).
cd "$(dirname "$0")/../.." || exit 2
LOGDIR=tools/onchip/logs/r5
mkdir -p "$LOGDIR"
overall=0

slot() {
  name="$1"; tmo="$2"; shift 2
  log="/tmp/r5_$name.log"
  echo "== slot $name: $* $(date)" | tee -a /tmp/queue_r5.log
  echo "=== $name $* $(date) ===" > "$log"
  timeout "$tmo" "$@" >> "$log" 2>&1
  rc=$?
  echo "$name rc=$rc" >> "$log"
  echo "== slot $name rc=$rc $(date)" | tee -a /tmp/queue_r5.log
  cp "$log" "$LOGDIR/${name}.log"
  git add -A "$LOGDIR" BENCH_LEDGER.json 2>/dev/null
  git commit -q -m "onchip r5: $name log (rc=$rc)" 2>/dev/null
  [ $rc -ne 0 ] && overall=1
}

slot tp_swin 1800 python tools/tp_kernel_check_swin.py
slot e2e_eval 3600 python tools/e2e_eval.py
slot latency_swindeep 3600 python tools/latency_ab.py \
  swin_small_patch4_window7_224 swin_base_patch4_window7_224 --batches 1,4,16
slot search_swin 3600 python tools/search_bench_swin.py
slot latency_vitwide 2400 python tools/latency_ab.py deit_base --batches 64,128
slot ledger_bench2 3600 env P2VIT_BENCH_TUNNEL_WAIT_S=120 python bench.py

exit $overall
