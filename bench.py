"""Benchmark: int8 Pallas serving throughput vs bf16 XLA baseline (DeiT-S).

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec (int8 serving path), "unit": "img/s",
   "vs_baseline": int8 / bf16-fp}

Paths measured on the single local chip:
  * value          — the W8A8-PoT int8 serving pipeline (Pallas shift-requant
    matmuls + fused Log-Int-Softmax attention, p2vit_tpu/serving.py)
  * baseline       — the same model, plain fp forward in bfloat16 via XLA
    (BASELINE.json's "bf16 XLA on v5e" target; north star is ≥2×)
  * sim (extra)    — the fake-quant f32 simulation (search/eval path)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _time_fn(step, x, iters=10):
    """Time ``step(x) -> logits`` per iteration, looping ON DEVICE.

    On the axon-tunneled TPU, ``jax.block_until_ready`` does not synchronize
    and every eager dispatch costs a tunnel round trip, so host-side loops
    measure RTT, not compute. The chain runs inside one jit (each
    iteration's input data-depends on the previous logits, forcing serial
    execution) and a single scalar fetch closes the measurement.
    """

    @jax.jit
    def run(x0):
        def body(_, acc):
            y = step(x0 + (0.0 * acc).astype(x0.dtype))
            return y.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters


def main():
    from p2vit_tpu.config import make_policy
    from p2vit_tpu.models import VIT_ZOO
    from p2vit_tpu.models import vit
    from p2vit_tpu import serving

    on_accel = jax.devices()[0].platform != "cpu"
    batch = 256 if on_accel else 8
    cfg = VIT_ZOO["deit_small_patch16_224"]
    policy = make_policy(ptf=True, lis=True, quant_method="minmax")

    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    bit_config = [8] * cfg.num_matmuls
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224), jnp.float32)

    # int8 serving path (Pallas on accelerator, jnp fallback on CPU)
    sstate = serving.convert(params, qstate, cfg, policy, bit_config)
    srv_fn = jax.jit(
        lambda xx: serving.serving_forward(sstate, cfg, xx, use_pallas=on_accel)
    )
    t_srv = _time_fn(srv_fn, x)

    # bf16 fp baseline
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fp_fn = jax.jit(lambda xx: vit.fp_forward(params_bf16, cfg, xx.astype(jnp.bfloat16)))
    t_fp = _time_fn(fp_fn, x)

    # fake-quant simulation (search-time eval path)
    bit_idx = vit.bits_to_idx(bit_config)
    quant_fn = jax.jit(
        lambda xx: vit.quant_forward(params, qstate, cfg, policy, xx, bit_idx)
    )
    t_sim = _time_fn(quant_fn, x)

    # LIS-off serving (Config(lis=False) reference variant: fp softmax over
    # dequantized attention codes) — the faster deployment point
    srv_fp_fn = jax.jit(
        lambda xx: serving.serving_forward(
            sstate, cfg, xx, use_pallas=on_accel, lis=False
        )
    )
    t_srv_fp = _time_fn(srv_fp_fn, x)

    ips = batch / t_srv
    ips_fp = batch / t_fp
    print(
        json.dumps(
            {
                "metric": "DeiT-S W8A8-PoT int8 serving throughput (1 chip)",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / ips_fp, 4),
                "baseline_bf16_img_s": round(ips_fp, 2),
                "sim_img_s": round(batch / t_sim, 2),
                "lis_off_img_s": round(batch / t_srv_fp, 2),
                "batch": batch,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
