#!/bin/bash
# Blessed invocations — the TPU-native equivalents of the reference's
# test.sh (/root/reference/test.sh:9-11). The reference pins work to GPUs
# with CUDA_VISIBLE_DEVICES and backgrounds long searches under nohup; on
# TPU the single jax device is implicit and the searches are fast enough
# (one jitted calibration ≈ 0.63 s) that nohup is optional.
mkdir -p logs

# mixed-precision search (Hessian-guided Pareto + evolutionary) on DeiT-B
nohup python -u test_quant.py deit_base /data/imagenet --quant --ptf True \
  --lis True --quant-method minmax --mode 0 --mixed \
  > logs/deit_base_mixed 2>&1 &

# fixed-bit quantized eval (W4A8 PoT default) on DeiT-S — add --serve for
# the int8 Pallas pipeline, --u8-ingest for raw-uint8 ingestion,
# --dp N / --pp S for mesh scale-out
python test_quant.py deit_small /data/imagenet --quant --ptf True \
  --lis True --quant-method minmax --mode 0
