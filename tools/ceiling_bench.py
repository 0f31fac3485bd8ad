"""Per-model measured-vs-ceiling dissection for the int8 serving path.

VERDICT round-2 item 1: "state the additive floor per model (T_mxu_int8 +
mandated-T_vpu + embed + head) in ms and img/s ... a BENCH.md table
'measured vs ceiling' per model with gap <=~10% and the residual itemized".

Methodology (all on the real chip, best-of-3, iters>=20 to amortize the
~30 ms tunnel overhead):

1. DEPTH SWEEP: time end-to-end serving_forward at depth D in {3, 6, 12}
   (same C/heads, synthetic state per depth). The least-squares slope is
   the exact IN-SITU per-layer cost — free of the standalone-timing
   contamination (device_time's data-dependency add costs one extra HBM
   pass of the chained tensor, and standalone kernels lose the inter-kernel
   DMA overlap Mosaic provides in the real pipeline). The intercept is
   embed + head + fixed glue.
2. The same sweep with lis=False gives the in-situ per-layer cost of the
   Log-Int-Softmax chain over the fp-softmax fallback (slope difference).
3. DIFFERENTIAL STANDALONE PAIRS (same shapes, same DMA → contamination
   cancels): fc1+gelu vs fc1 (GELU erf epilogue), mm_res_ln vs mm
   (residual-add + int-LN + requant epilogue).
4. ANALYTIC MXU FLOOR: per-layer int8 MAC count (with the real 224-row
   attention padding) at the measured 203 int8 Tops/s kernel peak.

Per-layer ceiling = T_mxu + mandated VPU chains (LIS + GELU + 2x res/LN
epilogues, measured in 2/3). Model ceiling = D x layer ceiling + embed +
head (intercept). Gap = measured slope - layer ceiling, itemized.

Usage: python tools/ceiling_bench.py [model ...]
  default: deit_small_patch16_224 deit_base_patch16_224
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
from p2vit_tpu.models import VIT_ZOO, vit
from p2vit_tpu import serving
from p2vit_tpu.profiling import device_time_ms

MXU_TOPS = 203e12  # measured int8 matmul kernel peak (BENCH.md 2026-08-17)
BATCH = {"deit_tiny_patch16_224": 256, "deit_small_patch16_224": 256,
         "deit_base_patch16_224": 128, "vit_base_patch16_224": 128,
         "vit_large_patch16_224": 64}
def _depths(depth: int):
    """Sweep points: quarter/half/full depth — the full-depth run doubles
    as the measured e2e."""
    return (max(depth // 4, 1), depth // 2, depth)


def _t(fn, x, *consts, iters=20, repeats=3):
    # big state rides as a runtime arg (device_time docstring: closures
    # inline it as HLO constants → HTTP 413 at ViT-L size)
    return device_time_ms(fn, x, *consts, iters=iters, repeats=repeats)


def mxu_floor_ms(cfg, B):
    """Analytic per-layer int8 MXU time at the measured kernel peak,
    counting the kernels' REAL padded shapes (rows padded to the 224
    attention window; lane dims already multiples of 128)."""
    c, hid, n = cfg.embed_dim, cfg.hidden_dim, cfg.seq_len
    n_pad = 224  # ops/attention_lis.py row padding (A/B'd vs 256)
    m = B * n
    macs = (m * c * 3 * c                                   # qkv
            + B * cfg.num_heads * 2 * n_pad * n_pad * cfg.head_dim  # qk^T, av
            + m * c * c + 2 * m * c * hid)                  # proj, fc1, fc2
    return macs * 2 / MXU_TOPS * 1e3


def sweep(model: str):
    B = BATCH.get(model, 128)
    policy = make_policy()
    cfg0 = VIT_ZOO[model]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224))
    print(f"\n== {model} batch={B} C={cfg0.embed_dim} "
          f"platform={jax.devices()[0].platform}")
    r = {"model": model, "batch": B}

    e2e = {}
    s_last = None
    depths = _depths(cfg0.depth)
    # one program VARIANT for every sweep point: serving_forward flips to
    # lax.scan only above depth 12 by default, which would mix unrolled
    # (quarter/half) with scan (full) points for ViT-L and smear the scan
    # overhead (~2.7%, BENCH.md) into the fitted slope/intercept. Pin the
    # variant the model DEPLOYS with at full depth.
    scan = cfg0.depth > 12
    for lis in (True, "bypass", False):
        times = []
        for D in depths:
            cfg = dataclasses.replace(cfg0, depth=D)
            params = vit.init_params(jax.random.PRNGKey(0), cfg)
            qstate = vit.synthetic_qstate(cfg)
            s = serving.convert(params, qstate, cfg, policy,
                                [8] * cfg.num_matmuls)
            s_last = s
            ms = _t(lambda xx, ss: serving.serving_forward(
                ss, cfg, xx, use_pallas=True, lis=lis,
                scan_layers=scan), x, s)
            times.append(ms)
            print(f"  lis={lis!s:6s} depth={D:2d}  {ms:8.3f} ms")
        slope, icept = np.polyfit(depths, times, 1)
        e2e[lis] = (slope, icept, times)
        print(f"  lis={lis!s:6s}: per-layer {slope:.3f} ms, "
              f"embed+head+glue {icept:.3f} ms")
    r["layer_ms"] = round(e2e[True][0], 4)
    r["intercept_ms"] = round(e2e[True][1], 4)
    r["e2e_ms"] = round(e2e[True][2][-1], 3) if depths[-1] == cfg0.depth \
        else None
    # bypass replaces the whole softmax/LIS chain with one multiply (same
    # dots, same requants, same DMA) → slope deltas are the in-situ chain
    # costs of LIS (mandated, the reference's serving default) and of the
    # lis=False fp-softmax fallback (informational).
    r["lis_chain_ms"] = round(e2e[True][0] - e2e["bypass"][0], 4)
    r["fp_softmax_chain_ms"] = round(e2e[False][0] - e2e["bypass"][0], 4)

    # --- intercept itemization: the embed prologue standalone
    t_embed = _t(lambda xx, ss: serving.embed_codes(
        ss, dataclasses.replace(cfg0, depth=depths[0]), xx,
        use_pallas=True), x, s_last)
    r["embed_ms"] = round(t_embed, 4)

    # --- differential standalone pairs at this geometry
    from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant
    from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln

    c, hid = cfg0.embed_dim, cfg0.hidden_dim
    m = B * cfg0.seq_len
    key = jax.random.PRNGKey(0)
    x_c = jax.random.randint(key, (m, c), -128, 128, jnp.int8)
    x_h = jax.random.randint(key, (m, hid), -128, 128, jnp.int8)
    res = jax.random.randint(key, (m, c), -128, 128, jnp.int8)
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
        xx, w_fc2, rC, bC, res, sC, sC, sC, ln_w, ln_b, sC, ones)[1],
        x_h, iters=50)
    t_plain = _t(lambda xx: int8_matmul_requant(xx, w_fc2, rC, bC),
                 x_h, iters=50)
    r["resln_chain_ms"] = round(t_resln - t_plain, 4)

    # --- requant-epilogue cost: raw_store differential per matmul shape
    # (truncation store of the raw accumulator — same dot, same DMA).
    # The reference's math mandates a requant after every matmul (the
    # paper's ASIC does it as a bit-shift; on this chip it is a serial
    # VPU chain: i32→f32, mul, add, round, clip, →i8).
    w_qkv = jax.random.randint(key, (3 * c, c), -128, 128, jnp.int8)
    w_proj = jax.random.randint(key, (c, c), -128, 128, jnp.int8)
    r3C = jnp.full((3 * c,), 2.0**-10, jnp.float32)
    b3C = jnp.zeros((3 * c,), jnp.float32)
    rq_sum = 0.0
    for nm, ww, rr, bb, xx in (("qkv", w_qkv, r3C, b3C, x_c),
                               ("proj", w_proj, rC, bC, x_c),
                               ("fc1", w_fc1, rH, bH, x_c),
                               ("fc2", w_fc2, rC, bC, x_h)):
        t_rq = _t(lambda v, ww=ww, rr=rr, bb=bb: int8_matmul_requant(
            v, ww, rr, bb), xx, iters=50)
        t_raw = _t(lambda v, ww=ww, rr=rr, bb=bb: int8_matmul_requant(
            v, ww, rr, bb, raw_store=True), xx, iters=50)
        r[f"requant_{nm}_ms"] = round(t_rq - t_raw, 4)
        rq_sum += t_rq - t_raw
    r["requant_ms"] = round(rq_sum, 4)
    r["mxu_ms"] = round(mxu_floor_ms(cfg0, B), 4)

    # --- the ceiling statement
    # Mandated per-layer work on THIS chip = int8 MXU floor (at the
    # measured 203 Tops/s kernel peak, real padded shapes) + the serial
    # VPU chains the reference's integer math requires and Mosaic cannot
    # overlap with the MXU: the LIS chain, the fp GELU on the dequantized
    # fc1 accumulator, the two residual+int-LN epilogues, and the four
    # requant epilogues. Everything above that is attackable residual
    # (unhidden DMA, converts, pad overwork beyond the MXU accounting).
    layer_ceiling = (r["mxu_ms"] + r["lis_chain_ms"] + r["gelu_chain_ms"]
                     + 2 * r["resln_chain_ms"] + r["requant_ms"])
    r["layer_ceiling_ms"] = round(layer_ceiling, 4)
    r["layer_gap_ms"] = round(r["layer_ms"] - layer_ceiling, 4)
    D = cfg0.depth
    ceiling = D * layer_ceiling + e2e[True][1]
    r["ceiling_ms"] = round(ceiling, 3)
    r["ceiling_img_s"] = round(B / ceiling * 1e3, 1)
    if r["e2e_ms"]:
        r["gap_pct"] = round(100 * (r["e2e_ms"] - ceiling) / r["e2e_ms"], 2)
        r["e2e_img_s"] = round(B / r["e2e_ms"] * 1e3, 1)
    print(f"  per-layer: measured {r['layer_ms']:.3f} = mxu {r['mxu_ms']:.3f}"
          f" + lis {r['lis_chain_ms']:.3f} + gelu {r['gelu_chain_ms']:.3f}"
          f" + 2x resln {r['resln_chain_ms']:.3f}"
          f" + requant {r['requant_ms']:.3f} + RESIDUAL "
          f"{r['layer_gap_ms']:.3f}")
    print(f"  intercept {r['intercept_ms']:.3f} ms: embed {r['embed_ms']:.3f}"
          f" + head/glue {r['intercept_ms'] - r['embed_ms']:.3f}")
    print(f"  CEILING {ceiling:.3f} ms ({r['ceiling_img_s']:.0f} img/s)  "
          f"MEASURED {r['e2e_ms']} ms ({r.get('e2e_img_s')} img/s)  "
          f"gap {r.get('gap_pct')}%")
    return r


def main():
    models = sys.argv[1:] or ["deit_small_patch16_224",
                              "deit_base_patch16_224"]
    out = [sweep(m) for m in models]
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
