#!/bin/bash
# Round-4 on-chip work queue — run by the watcher the moment the tunnel
# answers. Edit THIS file to add work (the watcher only parses it at fire
# time). Each block logs separately; rc recorded per step.
# ORDERED BY LEVERAGE: if the tunnel dies mid-queue, the most important
# evidence (ledger refresh = VERDICT item 1) must already be on disk.
cd "$(dirname "$0")/../.." || exit 2

echo "=== bench.py $(date) ===" > /tmp/bench_r4.log
# 60 s was too tight: ONE probe attempt (fresh process + cold eager compile
# through the tunnel) measures ~50-60 s, so a single slow-but-alive attempt
# consumed the whole window and fell back to CPU while the chip was fine.
P2VIT_BENCH_TUNNEL_WAIT_S=600 timeout 5400 python bench.py >> /tmp/bench_r4.log 2>&1
echo "bench rc=$?" >> /tmp/bench_r4.log

echo "=== dtpack_ab $(date) ===" > /tmp/dtpack_ab.log
timeout 3600 python tools/dtpack_ab.py >> /tmp/dtpack_ab.log 2>&1
echo "dtpack_ab rc=$?" >> /tmp/dtpack_ab.log

echo "=== ab_tpu u8 swin vit calib + swin zoo opts $(date) ===" > /tmp/onchip_queue.log
timeout 5400 python tools/ab_tpu.py u8 swin vit calib \
  zoo:swin_tiny_patch4_window7_224 zoo:swin_small_patch4_window7_224 \
  zoo:swin_base_patch4_window7_224 >> /tmp/onchip_queue.log 2>&1
echo "ab_tpu rc=$?" >> /tmp/onchip_queue.log

echo "=== ceiling_swin $(date) ===" > /tmp/ceiling_swin.log
timeout 5400 python tools/ceiling_swin.py >> /tmp/ceiling_swin.log 2>&1
echo "ceiling_swin rc=$?" >> /tmp/ceiling_swin.log

echo "=== roofline_xcheck $(date) ===" > /tmp/roofline_x.log
timeout 5400 python tools/roofline_xcheck.py deit_small deit_tiny deit_base \
  >> /tmp/roofline_x.log 2>&1
echo "roofline_xcheck rc=$?" >> /tmp/roofline_x.log

echo "=== zoo_bench $(date) ===" > /tmp/zoo_bench.log
timeout 5400 python tools/zoo_bench.py >> /tmp/zoo_bench.log 2>&1
echo "zoo_bench rc=$?" >> /tmp/zoo_bench.log

echo "=== search_bench $(date) ===" > /tmp/search_bench.log
timeout 5400 python tools/search_bench.py >> /tmp/search_bench.log 2>&1
echo "search_bench rc=$?" >> /tmp/search_bench.log

echo "=== tp_kernel_check $(date) ===" > /tmp/tp_kernel_check.log
timeout 1800 python tools/tp_kernel_check.py >> /tmp/tp_kernel_check.log 2>&1
echo "tp_kernel_check rc=$?" >> /tmp/tp_kernel_check.log
