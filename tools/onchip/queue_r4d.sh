#!/bin/bash
# Round-4d queue: the two runs the bouncing 2026-08-19 tunnel still owes.
#   1. ab_tpu swin-opts — re-run with per-arm resilience (the first run
#      died on fold_windows' Mosaic refusal before int_stem / Swin-S/B
#      decisions could be measured)
#   2. latency_ab — batch-1 fuse_layer hypothesis (aborted on a tunnel
#      outage at 12:25)
cd "$(dirname "$0")/../.." || exit 2
export P2VIT_REQUIRE_TPU_WAIT_S=600

echo "=== ab_tpu swin-opts $(date) ===" > /tmp/ab_swinopts.log
timeout 5400 python tools/ab_tpu.py swin \
  zoo:swin_small_patch4_window7_224 zoo:swin_base_patch4_window7_224 \
  >> /tmp/ab_swinopts.log 2>&1
echo "ab_tpu rc=$?" >> /tmp/ab_swinopts.log

echo "=== latency_ab $(date) ===" > /tmp/latency_ab.log
timeout 5400 python tools/latency_ab.py deit_small \
  >> /tmp/latency_ab.log 2>&1
echo "latency_ab rc=$?" >> /tmp/latency_ab.log

echo "=== ceiling_swin swin_base $(date) ===" > /tmp/ceiling_swinbase.log
timeout 5400 python tools/ceiling_swin.py swin_base_patch4_window7_224 \
  >> /tmp/ceiling_swinbase.log 2>&1
echo "ceiling_swin rc=$?" >> /tmp/ceiling_swinbase.log
