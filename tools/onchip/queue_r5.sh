#!/bin/bash
# Round-5 on-chip work queue — fired by tunnel_watch.sh the moment the
# tunnel answers. Edit THIS file to add work (the watcher parses it at
# fire time). ORDERED BY LEVERAGE (VERDICT r4): slot 0 is the standing
# ledger probe (item 8) so the freshest committed on-chip state survives
# even if the tunnel dies mid-queue; then the deep-Swin ceiling dissection
# (item 1), then the secondary measurements.
#
# Each slot: own log in /tmp, then the log is COPIED INTO THE REPO
# (tools/onchip/logs/r5/) and committed at slot end (VERDICT item 2 —
# provenance must not live only in /tmp).
cd "$(dirname "$0")/../.." || exit 2
LOGDIR=tools/onchip/logs/r5
mkdir -p "$LOGDIR"
overall=0

slot() {
  # slot <name> <timeout_s> <cmd...>
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

# --- slot 0: standing ledger probe (bench.py + zoo) — VERDICT item 8
slot ledger_bench 5400 env P2VIT_BENCH_TUNNEL_WAIT_S=600 python bench.py
slot ledger_zoo 5400 python tools/zoo_bench.py

# --- deep-Swin ceiling dissection — VERDICT item 1
[ -f tools/ceiling_swin_icept.py ] && \
  slot icept_swinbase 7200 python tools/ceiling_swin_icept.py swin_base_patch4_window7_224
slot ceiling_swinsmall 5400 python tools/ceiling_swin.py swin_small_patch4_window7_224
[ -f tools/ceiling_swin_icept.py ] && \
  slot icept_swinsmall 7200 python tools/ceiling_swin_icept.py swin_small_patch4_window7_224

# --- plan.py crossover for deep Swins — VERDICT item 5 (+ADVICE wide-ViT point)
slot latency_swindeep 5400 python tools/latency_ab.py \
  swin_small_patch4_window7_224 swin_base_patch4_window7_224 --batches 1,4,16
slot latency_vitwide 3600 python tools/latency_ab.py deit_base --batches 64,128

# --- Swin mixed search on chip — VERDICT item 7
[ -f tools/search_bench_swin.py ] && \
  slot search_swin 5400 python tools/search_bench_swin.py

# --- e2e eval throughput (disk->logits) — VERDICT item 4
[ -f tools/e2e_eval.py ] && \
  slot e2e_eval 5400 python tools/e2e_eval.py

# --- Swin TP on-chip shard-shape kernel check — VERDICT item 3 (if landed)
[ -f tools/tp_kernel_check_swin.py ] && \
  slot tp_swin 1800 python tools/tp_kernel_check_swin.py

exit $overall
