"""Benchmark: quantized DeiT-Small serving throughput vs bf16 XLA baseline.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec (quantized path), "unit": "img/s",
   "vs_baseline": quantized / bf16-fp}

The quantized path is the W8A8-PoT forward (currently the fake-quant
simulation graph; the Pallas int8 shift-requant kernels replace its hot ops
as they land). Baseline is the same model's plain fp forward in bfloat16 —
the "bf16 XLA on v5e" reference of BASELINE.json's north star.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _time_fn(fn, *args, warmup=3, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from p2vit_tpu.config import make_policy
    from p2vit_tpu.models import VIT_ZOO
    from p2vit_tpu.models import vit

    on_accel = jax.devices()[0].platform != "cpu"
    batch = 256 if on_accel else 8
    cfg = VIT_ZOO["deit_small_patch16_224"]
    policy = make_policy(ptf=True, lis=True, quant_method="minmax")

    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    bit_idx = vit.bits_to_idx([8] * cfg.num_matmuls)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224), jnp.float32)

    quant_fn = jax.jit(
        lambda p, q, xx, bi: vit.quant_forward(p, q, cfg, policy, xx, bi)
    )
    t_quant = _time_fn(quant_fn, params, qstate, x, bit_idx)

    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fp_fn = jax.jit(lambda p, xx: vit.fp_forward(p, cfg, xx))
    t_fp = _time_fn(fp_fn, params_bf16, x.astype(jnp.bfloat16))

    ips_quant = batch / t_quant
    ips_fp = batch / t_fp
    print(
        json.dumps(
            {
                "metric": "DeiT-S W8A8-PoT serving throughput (1 chip)",
                "value": round(ips_quant, 2),
                "unit": "img/s",
                "vs_baseline": round(ips_quant / ips_fp, 4),
                "baseline_bf16_img_s": round(ips_fp, 2),
                "batch": batch,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
