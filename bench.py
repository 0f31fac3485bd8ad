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

import jax
import jax.numpy as jnp


def _time_fn(step, x, iters=10, repeats=2):
    """On-device loop timing (see p2vit_tpu.profiling.device_time for why:
    host-side timing through the axon tunnel measures RTT, not compute)."""
    from p2vit_tpu.profiling import device_time

    return device_time(step, x, iters=iters, repeats=repeats)


def _ensure_live_backend():
    """Fall back to CPU if the axon TPU tunnel is unresponsive.

    The axon plugin initializes its tunnel client inside jax.devices(); a
    dead tunnel blocks forever in make_c_api_client, which would hang the
    whole benchmark. Probe in a subprocess with a timeout and drop the
    plugin on failure — a CPU JSON line beats a hung driver."""
    import os
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=150, check=True, capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print("# axon tunnel unresponsive; benchmarking on CPU", flush=True)
        from jax._src import xla_bridge as xb

        if not xb.backends_are_initialized():
            xb._backend_factories.pop("axon", None)
            jax.config.update("jax_platforms", "cpu")
            os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    _ensure_live_backend()
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
        lambda xx: serving.serving_forward(
            sstate, cfg, xx, use_pallas=on_accel, fuse_qkv=False
        )
    )
    t_srv = _time_fn(srv_fn, x)

    # staged kernel variant: qkv projection fused INTO the attention kernel
    # (bit-identical; measured only on the accelerator — the headline takes
    # the best serving variant, each reported as its own field)
    t_srv_fused = None
    if on_accel:
        try:
            fused_fn = jax.jit(
                lambda xx: serving.serving_forward(
                    sstate, cfg, xx, use_pallas=True, fuse_qkv=True
                )
            )
            t_srv_fused = _time_fn(fused_fn, x)
        except Exception as e:  # pragma: no cover - hardware dependent
            print(f"# fuse_qkv variant unavailable: {type(e).__name__}", flush=True)

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
            sstate, cfg, xx, use_pallas=on_accel, lis=False, fuse_qkv=False
        )
    )
    t_srv_fp = _time_fn(srv_fp_fn, x)
    t_srv_fp_fused = None
    if on_accel:
        try:
            fp_fused_fn = jax.jit(
                lambda xx: serving.serving_forward(
                    sstate, cfg, xx, use_pallas=True, lis=False, fuse_qkv=True
                )
            )
            t_srv_fp_fused = _time_fn(fp_fused_fn, x)
        except Exception as e:  # pragma: no cover - hardware dependent
            print(f"# lis-off fuse_qkv variant unavailable: {type(e).__name__}",
                  flush=True)

    # calibration latency (guarded): the full PTQ solve — stats, 4-candidate
    # PoT searches, PTF masks, smoothquant α/per-bit caches — as ONE jitted
    # program on the reference's default 100-image batch. The reference
    # re-runs this eagerly on every invocation; here it is a one-shot cost
    # whose artifact serializes (checkpoints.save_quant_state).
    calib_s = None
    try:
        calib_batch = 100 if on_accel else 4
        xc = jax.random.normal(
            jax.random.PRNGKey(7), (calib_batch, 3, 224, 224), jnp.float32
        )

        def calib_step(xx):
            qs, _ = vit._calibrate_jit(params, cfg, policy, xx, None)
            leaves = jax.tree.leaves(qs)
            return jnp.stack(
                [jnp.asarray(l, jnp.float32).sum() for l in leaves]
            ).sum()[None]

        # best-of-4 single-shot runs: one sample is meaningless under the
        # chip's ±30% multi-tenant noise (BENCH.md methodology)
        calib_s = round(_time_fn(jax.jit(calib_step), xc, iters=1, repeats=4), 3)
    except Exception as e:  # pragma: no cover - hardware dependent
        calib_s = f"unavailable: {type(e).__name__}"

    # Swin-Tiny int8 serving (guarded: secondary metric, never fails bench)
    swin_ips = None
    try:
        from p2vit_tpu.models import SWIN_ZOO
        from p2vit_tpu.models import swin as swin_mod
        from p2vit_tpu import serving_swin

        scfg = SWIN_ZOO["swin_tiny_patch4_window7_224"]
        sbatch = 64 if on_accel else 4
        sparams = swin_mod.init_params(jax.random.PRNGKey(2), scfg)
        sx = jax.random.normal(
            jax.random.PRNGKey(3), (sbatch, 3, 224, 224), jnp.float32
        )
        scalib = swin_mod.calibrate(sparams, scfg, policy, sx[:8])
        ss = serving_swin.convert(sparams, scalib.qstate, scfg, policy, 8)
        swin_fn = jax.jit(
            lambda xx: serving_swin.serving_forward(
                ss, scalib.qstate, scfg, policy, xx, use_pallas=on_accel
            )
        )
        swin_ips = round(sbatch / _time_fn(swin_fn, sx), 2)
        sparams_bf16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), sparams
        )
        swin_fp_fn = jax.jit(
            lambda xx: swin_mod.fp_forward(
                sparams_bf16, scfg, xx.astype(jnp.bfloat16)
            )
        )
        swin_bf16_ips = round(sbatch / _time_fn(swin_fp_fn, sx), 2)
        swin_vs = round(swin_ips / swin_bf16_ips, 4)
    except Exception as e:  # pragma: no cover - hardware dependent
        swin_ips = f"unavailable: {type(e).__name__}"
        swin_bf16_ips = swin_vs = None

    ips_fp = batch / t_fp
    ips_lis_off = batch / t_srv_fp
    # headline = the best LIS-on serving variant (bit-identical paths)
    lis_on_variants = {"two_step": batch / t_srv}
    if t_srv_fused is not None:
        lis_on_variants["fuse_qkv"] = batch / t_srv_fused
    best_variant = max(lis_on_variants, key=lis_on_variants.get)
    ips = lis_on_variants[best_variant]
    print(
        json.dumps(
            {
                "metric": "DeiT-S W8A8-PoT int8 serving throughput (1 chip)",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / ips_fp, 4),
                "baseline_bf16_img_s": round(ips_fp, 2),
                # first-class LIS pair for round-over-round perf tracking:
                # lis_on = the reference default (Config(lis=True)),
                # lis_off = the reference's fp-softmax variant
                "lis_on_img_s": round(ips, 2),
                "lis_on_vs_baseline": round(ips / ips_fp, 4),
                "lis_on_variant": best_variant,
                "lis_on_two_step_img_s": round(batch / t_srv, 2),
                "lis_on_fuse_qkv_img_s": (
                    round(batch / t_srv_fused, 2) if t_srv_fused else None
                ),
                "lis_off_img_s": round(
                    max(ips_lis_off,
                        batch / t_srv_fp_fused if t_srv_fp_fused else 0.0), 2
                ),
                "lis_off_vs_baseline": round(
                    max(ips_lis_off,
                        batch / t_srv_fp_fused if t_srv_fp_fused else 0.0)
                    / ips_fp, 4
                ),
                "lis_off_fuse_qkv_img_s": (
                    round(batch / t_srv_fp_fused, 2) if t_srv_fp_fused else None
                ),
                "sim_img_s": round(batch / t_sim, 2),
                "swin_tiny_img_s": swin_ips,
                "swin_tiny_bf16_img_s": swin_bf16_ips,
                "swin_tiny_vs_baseline": swin_vs,
                "calib_s_100img": calib_s,
                "batch": batch,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
