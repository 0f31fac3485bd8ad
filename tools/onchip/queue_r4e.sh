#!/bin/bash
# Round-4e queue: Swin W4A8 zoo rows (the last "—" cells in the RESULTS.md
# zoo table; zoo_bench grew the arm in faf3119). Chained AFTER the r4d
# queue drains: the chaser below waits for ceiling_swinbase's rc marker so
# the two queues never contend for the one chip.
cd "$(dirname "$0")/../.." || exit 2
export P2VIT_REQUIRE_TPU_WAIT_S=600

echo "=== zoo_bench swins w4a8 $(date) ===" > /tmp/zoo_swin_w4.log
timeout 5400 python tools/zoo_bench.py \
  swin_tiny_patch4_window7_224 swin_small_patch4_window7_224 \
  swin_base_patch4_window7_224 \
  >> /tmp/zoo_swin_w4.log 2>&1
echo "zoo_bench rc=$?" >> /tmp/zoo_swin_w4.log

# int8-over-bf16 crossover batch: the 12:52 latency_ab measured 0.55x/0.84x/
# 0.89x at b=1/8/32 vs 1.32x at b=256 — find where the ratio crosses 1.
echo "=== latency_ab crossover $(date) ===" > /tmp/latency_xover.log
timeout 5400 python tools/latency_ab.py deit_small --batches 64,128 \
  >> /tmp/latency_xover.log 2>&1
echo "latency_ab rc=$?" >> /tmp/latency_xover.log
