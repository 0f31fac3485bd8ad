"""Zoo-complete closing bench: vs-own-bf16 ratios for ALL 8 models.

VERDICT r3 item 5: the closing bench covered 5 of 8 zoo models; vit_base,
swin_small, swin_base had parity smoke only. One table, 8 models, img/s +
ratio each (each model vs ITS OWN bf16 XLA forward — the int8 advantage is
architecture-dependent, see bench.py docstring).

Reuses bench.py's _bench_vit for the ViT/DeiT family; Swin goes through
calibrate → convert → serving_swin with per-model batch sizes bounded by
HBM at the bigger geometries.

Usage: python tools/zoo_bench.py [model ...]   (default: all 8)
Repo root, real chip.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

from bench import _bench_vit, _time_fn
from p2vit_tpu.config import make_policy
from p2vit_tpu.models import SWIN_ZOO, VIT_ZOO
from p2vit_tpu.models import swin as swin_mod
from p2vit_tpu import serving_swin

from tools._zoo import BATCH, resolve


def bench_swin(name, batch, policy, on_accel):
    cfg = SWIN_ZOO[name]
    params = swin_mod.init_params(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (batch, 3, cfg.img_size, cfg.img_size),
                          jnp.float32)
    calib = swin_mod.calibrate(params, cfg, policy, x[:8])
    ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    # big state rides as device_time consts, never closures: a closure
    # inlines the weights as HLO constants and a swin_base/vit_large-sized
    # program exceeds the tunnel's remote-compile cap (HTTP 413)
    t_fp = _time_fn(
        lambda xx, p: swin_mod.fp_forward(p, cfg, xx.astype(jnp.bfloat16)),
        x, params_bf16)
    out = {"bf16_img_s": round(batch / t_fp, 2)}
    for key, lis in (("lis_on", True), ("lis_off", False)):
        t = _time_fn(
            lambda xx, s, q, lis=lis: serving_swin.serving_forward(
                s, q, cfg, policy, xx, use_pallas=on_accel, lis=lis),
            x, ss, calib.qstate)
        out[f"{key}_img_s"] = round(batch / t, 2)
        out[f"{key}_vs_baseline"] = round(t_fp / t, 4)
    # W4A8 (uniform weight bit_config=4, LIS on): supported + parity-tested
    # (tests/test_swin_serving.py w_bit=4) but never timed — fills the "—"
    # cells in the RESULTS.md zoo table. Same calibration, new conversion.
    ss4 = serving_swin.convert(params, calib.qstate, cfg, policy, 4)
    t4 = _time_fn(
        lambda xx, s, q: serving_swin.serving_forward(
            s, q, cfg, policy, xx, use_pallas=on_accel, lis=True),
        x, ss4, calib.qstate)
    out["w4a8_img_s"] = round(batch / t4, 2)
    out["w4a8_vs_baseline"] = round(t_fp / t4, 4)
    out["batch"] = batch
    return out


def ledger_rows(res: dict) -> dict:
    """Flatten per-model results to committed-ledger keys.

    'deit_small_patch16_224' → 'zoo_deit_small_<field>'; failed models
    (string values) and non-numeric fields are dropped — the ledger's
    contract is latest corroborated on-chip numbers only."""
    flat = {}
    for name, r in res.items():
        if not isinstance(r, dict):
            continue
        short = name.split("_patch")[0]
        for k, v in r.items():
            if isinstance(v, (int, float, bool)):
                flat[f"zoo_{short}_{k}"] = v
    return flat


def main():
    from p2vit_tpu.profiling import require_tpu

    require_tpu()  # fail fast on a dead tunnel (no-op under JAX_PLATFORMS=cpu)
    names = sys.argv[1:] or (list(VIT_ZOO) + list(SWIN_ZOO))
    policy = make_policy()
    on_accel = jax.devices()[0].platform != "cpu"
    print(f"== zoo_bench platform={jax.devices()[0].platform}")
    res = {}
    for name in map(resolve, names):
        try:
            if name in VIT_ZOO:
                r, _ = _bench_vit(name, BATCH.get(name, 64), policy,
                                  on_accel)
            else:
                r = bench_swin(name, BATCH.get(name, 32), policy,
                               on_accel)
            res[name] = r
            print(f"  {name}: bf16 {r['bf16_img_s']} | int8 "
                  f"{r['lis_on_img_s']} ({r['lis_on_vs_baseline']}x) | "
                  f"lis-off {r['lis_off_img_s']} "
                  f"({r['lis_off_vs_baseline']}x)  b={r['batch']}")
        except Exception as e:  # keep sweeping the rest of the zoo
            res[name] = f"failed: {type(e).__name__}: {e}"
            print(f"  {name}: FAILED {type(e).__name__}: {e}")
    if on_accel:
        # persist the zoo ratios so bench.py's driver artifact (and any
        # CPU fallback) carries the full 8-model headline, date-labeled
        from bench import _update_ledger

        rows = ledger_rows(res)
        if rows:
            _update_ledger(rows, source="tools/zoo_bench.py")
            print(f"# ledger: merged {len(rows)} zoo keys")
    print("\n" + json.dumps(res))


if __name__ == "__main__":
    main()
