#!/bin/bash
# Round-4b follow-up queue: the three runs the first queue left open.
#   1. resln_insitu  — the reopened DeiT-S res-LN junction headroom probe
#                      (tool landed after the first queue fired; highest
#                      leverage: decides whether ~8% of DeiT-S model time
#                      is reclaimable junction DMA or attribution error)
#   2. search_bench  — rc=1 on a flaky tunnel probe at 10:45 while the
#                      tunnel answered again at 10:49 (VERDICT r3 item 6)
#   3. ab_tpu swin-opts — the fold_windows/int_stem default decision at
#                      every Swin geometry (rc=1 on the same flaky probe)
# Each slot waits up to 900 s for the tunnel (P2VIT_REQUIRE_TPU_WAIT_S)
# instead of aborting on one cold probe.
cd "$(dirname "$0")/../.." || exit 2
export P2VIT_REQUIRE_TPU_WAIT_S=900

echo "=== resln_insitu $(date) ===" > /tmp/resln_insitu.log
timeout 5400 python tools/resln_insitu.py deit_small deit_base \
  >> /tmp/resln_insitu.log 2>&1
echo "resln_insitu rc=$?" >> /tmp/resln_insitu.log

echo "=== search_bench $(date) ===" > /tmp/search_bench.log
timeout 5400 python tools/search_bench.py >> /tmp/search_bench.log 2>&1
echo "search_bench rc=$?" >> /tmp/search_bench.log

echo "=== ab_tpu swin-opts $(date) ===" > /tmp/ab_swinopts.log
timeout 5400 python tools/ab_tpu.py swin \
  zoo:swin_small_patch4_window7_224 zoo:swin_base_patch4_window7_224 \
  >> /tmp/ab_swinopts.log 2>&1
echo "ab_tpu rc=$?" >> /tmp/ab_swinopts.log
