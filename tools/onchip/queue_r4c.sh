#!/bin/bash
# Round-4c queue: the runs the flaky 2026-08-19 tunnel still owes.
#   1. search_bench — re-run with the FIXED sampler (the 50k-cap empty
#      Pareto front aborted the 11:14 run after its 795 s calibration;
#      p2vit_tpu/search.py now fills 51 configs at deit_base)
#   2. ab_tpu swin-opts — fold_windows / int_stem default decision
#   3. latency_ab — batch-1 fuse_layer hypothesis (int8 currently 0.54x
#      bf16 at batch 1; decision rule in the tool docstring)
cd "$(dirname "$0")/../.." || exit 2
export P2VIT_REQUIRE_TPU_WAIT_S=600

echo "=== search_bench $(date) ===" > /tmp/search_bench.log
timeout 5400 python tools/search_bench.py >> /tmp/search_bench.log 2>&1
echo "search_bench rc=$?" >> /tmp/search_bench.log

echo "=== ab_tpu swin-opts $(date) ===" > /tmp/ab_swinopts.log
timeout 5400 python tools/ab_tpu.py swin \
  zoo:swin_small_patch4_window7_224 zoo:swin_base_patch4_window7_224 \
  >> /tmp/ab_swinopts.log 2>&1
echo "ab_tpu rc=$?" >> /tmp/ab_swinopts.log

echo "=== latency_ab $(date) ===" > /tmp/latency_ab.log
timeout 5400 python tools/latency_ab.py deit_small \
  >> /tmp/latency_ab.log 2>&1
echo "latency_ab rc=$?" >> /tmp/latency_ab.log
