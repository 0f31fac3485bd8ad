"""Swin measured-vs-ceiling dissection (the Swin row the per-model ceiling
table in BENCH.md was missing — tools/ceiling_bench.py is ViT-only because
its depth sweep assumes one homogeneous stack).

Swin's stages are heterogeneous (geometry changes at every PatchMerging),
so a whole-model depth sweep has no single slope. Instead this sweeps the
DEEP stage only (index 2 — depth 6 of 12 blocks for Swin-T, 18 of 24 for
S/B): serving time at depths[2] in {2, 4, 6} (even, preserving the
W-MSA/SW-MSA alternation) is linear in d with

  slope     = in-situ per-layer cost at stage-2 geometry
              (res 14, C = 4·embed_dim, the model's dominant block shape),
  intercept = stem + the other stages + patch merges + head.

Mandated-chain isolation mirrors ceiling_bench: lis="bypass" (the Swin
kernels' timing-only probe — softmax/LIS chain replaced by one multiply,
same dots/requants/DMA) gives the LIS chain as a slope difference;
fc1±gelu and fc2±res/LN standalone differentials at stage-2 shapes give
the GELU and mlp-junction chains; the attention-side junction
(ops/intln.int_res_ln_requant, a standalone kernel — no differential
exists) is timed standalone, which OVERSTATES its in-situ cost (loses
Mosaic's DMA overlap), so the ceiling is conservative. The MXU floor is
analytic at the measured 203 int8 Tops/s kernel peak with the kernels'
real padded shapes (49-token windows → 56 chain rows × 64 key columns).

Usage: python tools/ceiling_swin.py [model ...]   (default swin_tiny)
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from p2vit_tpu.config import make_policy
from p2vit_tpu.models import SWIN_ZOO
from p2vit_tpu.models import swin as swin_mod
from p2vit_tpu import serving_swin
from p2vit_tpu.profiling import device_time_ms

MXU_TOPS = 203e12  # measured int8 matmul kernel peak (BENCH.md 2026-08-17)
BATCH = {"swin_tiny_patch4_window7_224": 64,
         "swin_small_patch4_window7_224": 64,
         "swin_base_patch4_window7_224": 32}


def _t(fn, x, *consts, iters=20, repeats=3):
    return device_time_ms(fn, x, *consts, iters=iters, repeats=repeats)


def stage2_mxu_floor_ms(cfg, B):
    """Analytic int8 MXU time of ONE stage-2 block at the kernels' real
    padded shapes."""
    from p2vit_tpu.ops.attention_lis import _chain_rows

    c = cfg.embed_dim * 4            # stage-2 channel width
    hid = int(c * cfg.mlp_ratio)
    res = cfg.img_size // cfg.patch_size // 4   # 14 at 224/4
    ws = cfg.window_size
    n = ws * ws                      # 49
    nk = n + (-n) % 32               # int8 key-column padding: 49 → 64
    nr = _chain_rows(n, nk)          # f32 chain rows: 49 → 56
    heads = cfg.num_heads[2]
    hd = c // heads
    nw = (res // ws) ** 2            # windows per image
    m = B * res * res                # tokens
    # qk^T computes the full nk-row padded panel (the nr chain trim slices
    # AFTER the dot — ops/attention_lis._swin_head_loop); av runs nr rows
    macs = (m * c * 3 * c                         # qkv
            + B * nw * heads * (nk * nk + nr * nk) * hd   # qk^T + av
            + m * c * c                           # proj
            + 2 * m * c * hid)                    # fc1, fc2
    return macs * 2 / MXU_TOPS * 1e3


def sweep(model: str):
    B = BATCH.get(model, 64)
    policy = make_policy()
    cfg0 = SWIN_ZOO[model]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224))
    print(f"\n== {model} batch={B} embed={cfg0.embed_dim} "
          f"platform={jax.devices()[0].platform}")
    r = {"model": model, "batch": B}

    d_full = cfg0.depths[2]
    depths = tuple(sorted({2, d_full // 2 + (d_full // 2) % 2, d_full}))
    # build each depth's calibrated+converted state ONCE (calibrate/convert
    # don't depend on the timing mode; every mode must time the exact same
    # state anyway)
    states = {}
    for d in depths:
        cfg = dataclasses.replace(
            cfg0, depths=cfg0.depths[:2] + (d,) + cfg0.depths[3:])
        params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
        calib = swin_mod.calibrate(params, cfg, policy, x[:8])
        ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
        states[d] = (cfg, ss, calib.qstate)

    # reorder="bypass" isolates the per-block window partition/reverse/roll
    # copies the same way lis="bypass" isolates the LIS chain — attackable
    # glue (fold_windows), NOT part of the mandated ceiling, but itemized so
    # the residual is explained rather than silently absorbing a known cost
    MODES = (("lis_on", {"lis": True}), ("lis_bypass", {"lis": "bypass"}),
             ("lis_off", {"lis": False}),
             ("reorder_bypass", {"lis": True, "reorder": "bypass"}))
    e2e = {}
    for name, kw in MODES:
        times = []
        for d in depths:
            cfg, ss, qstate = states[d]
            ms = _t(lambda xx, s, q, cfg=cfg, kw=kw:
                    serving_swin.serving_forward(
                        s, q, cfg, policy, xx, use_pallas=True,
                        pallas_attn=True, **kw),
                    x, ss, qstate)
            times.append(ms)
            print(f"  {name:14s} d2={d:2d}  {ms:8.3f} ms")
        slope, icept = np.polyfit(depths, times, 1)
        e2e[name] = (slope, icept, times)
        print(f"  {name:14s}: per-layer {slope:.3f} ms, "
              f"other-stages+stem+merges+head {icept:.3f} ms")
    r["layer_ms"] = round(e2e["lis_on"][0], 4)
    r["intercept_ms"] = round(e2e["lis_on"][1], 4)
    r["e2e_ms"] = (round(e2e["lis_on"][2][-1], 3)
                   if depths[-1] == d_full else None)
    r["lis_chain_ms"] = round(e2e["lis_on"][0] - e2e["lis_bypass"][0], 4)
    r["fp_softmax_chain_ms"] = round(
        e2e["lis_off"][0] - e2e["lis_bypass"][0], 4)
    r["reorder_chain_ms"] = round(
        e2e["lis_on"][0] - e2e["reorder_bypass"][0], 4)

    # --- differential/standalone chain probes at stage-2 shapes
    from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant
    from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln
    from p2vit_tpu.ops.intln import int_res_ln_requant

    c = cfg0.embed_dim * 4
    hid = int(c * cfg0.mlp_ratio)
    res = cfg0.img_size // cfg0.patch_size // 4
    m = B * res * res
    key = jax.random.PRNGKey(0)
    x_c = jax.random.randint(key, (m, c), -128, 128, jnp.int8)
    x_h = jax.random.randint(key, (m, hid), -128, 128, jnp.int8)
    resid = jax.random.randint(key, (m, c), -128, 128, jnp.int8)
    w_fc1 = jax.random.randint(key, (hid, c), -128, 128, jnp.int8)
    w_fc2 = jax.random.randint(key, (c, hid), -128, 128, jnp.int8)
    rH = jnp.full((hid,), 2.0**-10, jnp.float32)
    bH = jnp.zeros((hid,), jnp.float32)
    rC = jnp.full((c,), 2.0**-10, jnp.float32)
    bC = jnp.zeros((c,), jnp.float32)
    sC = jnp.full((c,), 0.02, jnp.float32)
    ln_w = jax.random.normal(key, (c,), jnp.float32)
    ln_b = jax.random.normal(key, (c,), jnp.float32) * 0.1
    ones = jnp.ones((c,), jnp.float32)

    t_gelu = _t(lambda xx: int8_matmul_requant(
        xx, w_fc1, rH, bH, out_inv=64.0, gelu=True), x_c, iters=50)
    t_nogelu = _t(lambda xx: int8_matmul_requant(xx, w_fc1, rH, bH),
                  x_c, iters=50)
    r["gelu_chain_ms"] = round(t_gelu - t_nogelu, 4)
    t_resln = _t(lambda xx: int8_matmul_res_ln(
        xx, w_fc2, rC, bC, resid, sC, sC, sC, ln_w, ln_b, sC, ones)[1],
        x_h, iters=50)
    t_plain = _t(lambda xx: int8_matmul_requant(xx, w_fc2, rC, bC),
                 x_h, iters=50)
    r["resln_mlp_ms"] = round(t_resln - t_plain, 4)
    # attention-side junction: standalone (conservative — see module doc)
    t_resln_attn = _t(lambda xx: int_res_ln_requant(
        xx, 0.02, resid, 0.02, sC, ln_w, ln_b, sC, ones)[1], x_c, iters=50)
    r["resln_attn_standalone_ms"] = round(t_resln_attn, 4)

    rq_sum = 0.0
    w_qkv = jax.random.randint(key, (3 * c, c), -128, 128, jnp.int8)
    w_proj = jax.random.randint(key, (c, c), -128, 128, jnp.int8)
    r3C = jnp.full((3 * c,), 2.0**-10, jnp.float32)
    b3C = jnp.zeros((3 * c,), jnp.float32)
    for nm, ww, rr, bb, xx in (("qkv", w_qkv, r3C, b3C, x_c),
                               ("proj", w_proj, rC, bC, x_c),
                               ("fc1", w_fc1, rH, bH, x_c),
                               ("fc2", w_fc2, rC, bC, x_h)):
        t_rq = _t(lambda v, ww=ww, rr=rr, bb=bb: int8_matmul_requant(
            v, ww, rr, bb), xx, iters=50)
        t_raw = _t(lambda v, ww=ww, rr=rr, bb=bb: int8_matmul_requant(
            v, ww, rr, bb, raw_store=True), xx, iters=50)
        rq_sum += t_rq - t_raw
    r["requant_ms"] = round(rq_sum, 4)
    r["mxu_ms"] = round(stage2_mxu_floor_ms(cfg0, B), 4)

    layer_ceiling = (r["mxu_ms"] + r["lis_chain_ms"] + r["gelu_chain_ms"]
                     + r["resln_mlp_ms"] + r["resln_attn_standalone_ms"]
                     + r["requant_ms"])
    r["layer_ceiling_ms"] = round(layer_ceiling, 4)
    r["layer_gap_ms"] = round(r["layer_ms"] - layer_ceiling, 4)
    # the reorder copies are attackable glue (fold_windows), so they stay
    # OUT of the mandated ceiling but explain part of the gap
    r["layer_gap_unexplained_ms"] = round(
        r["layer_gap_ms"] - r["reorder_chain_ms"], 4)
    ceiling = d_full * layer_ceiling + e2e["lis_on"][1]
    r["ceiling_ms"] = round(ceiling, 3)
    r["ceiling_img_s"] = round(B / ceiling * 1e3, 1)
    if r["e2e_ms"]:
        r["gap_pct"] = round(100 * (r["e2e_ms"] - ceiling) / r["e2e_ms"], 2)
        r["e2e_img_s"] = round(B / r["e2e_ms"] * 1e3, 1)
    print(f"  stage-2 layer: measured {r['layer_ms']:.3f} = mxu "
          f"{r['mxu_ms']:.3f} + lis {r['lis_chain_ms']:.3f} + gelu "
          f"{r['gelu_chain_ms']:.3f} + resln_mlp {r['resln_mlp_ms']:.3f} "
          f"+ resln_attn<= {r['resln_attn_standalone_ms']:.3f} + requant "
          f"{r['requant_ms']:.3f} + RESIDUAL {r['layer_gap_ms']:.3f} "
          f"(reorder glue {r['reorder_chain_ms']:.3f} + unexplained "
          f"{r['layer_gap_unexplained_ms']:.3f})")
    print(f"  STAGE-2 CEILING {ceiling:.3f} ms ({r['ceiling_img_s']:.0f} "
          f"img/s)  MEASURED {r['e2e_ms']} ms ({r.get('e2e_img_s')} img/s)  "
          f"gap {r.get('gap_pct')}% (intercept NOT dissected — see module "
          f"doc; stages 0/1/3 + stem + merges + head ride in it)")
    return r


def main():
    from p2vit_tpu.profiling import require_tpu

    require_tpu()  # fail fast on a dead tunnel (no-op under JAX_PLATFORMS=cpu)
    models = sys.argv[1:] or ["swin_tiny_patch4_window7_224"]
    out = [sweep(m) for m in models]
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
