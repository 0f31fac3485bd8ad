"""Dissect the Swin serving INTERCEPT — stem + all stages + merges + head.

tools/ceiling_swin.py sweeps only the deep stage (index 2), so its
"intercept" (stem + stages 0/1/3 + 3 patch-merges + head) was a single
undissected number — 11.31 ms = 47% of swin_base's 24.24 ms e2e (VERDICT
r4 item 1: nobody knows whether the ~12% distance to the 2.0x north star
hides in there). This tool itemizes it:

  1. **Per-stage depth sweeps**: every stage's depth is swept
     independently (even depths keep the W-MSA/SW-MSA alternation;
     stage 3 never shifts at res == window) → in-situ per-layer slope at
     each stage geometry. Stages 0/1 also sweep reorder="bypass" (the
     timing-only consecutive-token windowing, ceiling_swin.py) to isolate
     the window partition/reverse/roll glue where windows are numerous.
  2. **Standalone probes** on the real converted default state: stem
     (fp patch conv + int-LN, the serving default path), each
     PatchMerging (2x2 concat → int-LN(expand=4) → reduction matmul),
     final int-LN + token-pool + head. Standalone loses Mosaic's
     inter-kernel DMA overlap, so these are conservative (upper bounds).
  3. **Itemization**: e2e = Σ_k depth_k·slope_k + stem + merges + head
     + residual. Per-stage analytic MXU floors and chain differentials
     (gelu, mlp res+LN junction, requant epilogues) at each stage's
     (rows, C, hidden) say what is mandated vs attackable per stage.

Usage: python tools/ceiling_swin_icept.py [model ...] (default swin_base)
Repo root, real chip.
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
from p2vit_tpu.serving_swin import _iln
from p2vit_tpu.models.swin import _merge_patches, _patches
from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant
from p2vit_tpu.profiling import device_time_ms

MXU_TOPS = 203e12  # measured int8 matmul kernel peak (BENCH.md 2026-08-17)
BATCH = {"swin_tiny_patch4_window7_224": 64,
         "swin_small_patch4_window7_224": 64,
         "swin_base_patch4_window7_224": 32}
_I8 = (-128, 127)
# CPU smoke (JAX_PLATFORMS=cpu): interpret-mode kernels, batch 2, 1 iter,
# stages limited via P2VIT_ICEPT_STAGES="0,3" — validates tracing/shapes/
# itemization plumbing only; the timings are meaningless off-chip.
ON_CPU = False  # resolved in main() after backend init
def _t(fn, x, *consts, iters=20):
    return device_time_ms(fn, x, *consts, iters=1 if ON_CPU else iters,
                          repeats=1 if ON_CPU else 3)


def stage_mxu_floor_ms(cfg, B, k):
    """Analytic int8 MXU time of ONE stage-k block at the kernels' real
    padded shapes (generalizes ceiling_swin.stage2_mxu_floor_ms)."""
    from p2vit_tpu.ops.attention_lis import _chain_rows

    c = cfg.embed_dim * (2 ** k)
    hid = int(c * cfg.mlp_ratio)
    res = cfg.img_size // cfg.patch_size // (2 ** k)
    ws = min(cfg.window_size, res)
    n = ws * ws
    nk = n + (-n) % 32
    nr = _chain_rows(n, nk)
    heads = cfg.num_heads[k]
    hd = c // heads
    nw = (res // ws) ** 2
    m = B * res * res
    macs = (m * c * 3 * c
            + B * nw * heads * (nk * nk + nr * nk) * hd
            + m * c * c
            + 2 * m * c * hid)
    return macs * 2 / MXU_TOPS * 1e3


def chain_probes(cfg, B, k):
    """gelu / mlp-junction / requant chain differentials at stage-k shapes
    (same probes as ceiling_swin.py, parameterized by stage geometry)."""
    from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln
    from p2vit_tpu.ops.intln import int_res_ln_requant

    c = cfg.embed_dim * (2 ** k)
    hid = int(c * cfg.mlp_ratio)
    res = cfg.img_size // cfg.patch_size // (2 ** k)
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
    kw = {"interpret": True} if ON_CPU else {}
    r = {}
    t_gelu = _t(lambda xx: int8_matmul_requant(
        xx, w_fc1, rH, bH, out_inv=64.0, gelu=True, **kw), x_c, iters=50)
    t_nogelu = _t(lambda xx: int8_matmul_requant(
        xx, w_fc1, rH, bH, **kw), x_c, iters=50)
    r["gelu_chain_ms"] = round(t_gelu - t_nogelu, 4)
    t_resln = _t(lambda xx: int8_matmul_res_ln(
        xx, w_fc2, rC, bC, resid, sC, sC, sC, ln_w, ln_b, sC, ones,
        **kw)[1], x_h, iters=50)
    t_plain = _t(lambda xx: int8_matmul_requant(
        xx, w_fc2, rC, bC, **kw), x_h, iters=50)
    r["resln_mlp_ms"] = round(t_resln - t_plain, 4)
    t_resln_attn = _t(lambda xx: int_res_ln_requant(
        xx, 0.02, resid, 0.02, sC, ln_w, ln_b, sC, ones, **kw)[1],
        x_c, iters=50)
    r["resln_attn_standalone_ms"] = round(t_resln_attn, 4)
    return r


def sweep(model: str):
    import os

    B = 2 if ON_CPU else BATCH.get(model, 32)
    stage_sel = tuple(
        int(s) for s in
        os.environ.get("P2VIT_ICEPT_STAGES", "0,1,2,3").split(","))
    policy = make_policy()
    cfg0 = SWIN_ZOO[model]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224))
    x8 = x[:min(8, B)]
    print(f"\n== {model} batch={B} depths={cfg0.depths} "
          f"platform={jax.devices()[0].platform}", flush=True)
    r = {"model": model, "batch": B}

    def build(depths):
        cfg = dataclasses.replace(cfg0, depths=tuple(depths))
        params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
        calib = swin_mod.calibrate(params, cfg, policy, x8)
        ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
        return cfg, ss, calib.qstate

    def e2e(cfg, ss, qstate, **kw):
        if ON_CPU:
            kw = {**kw, "interpret": True}
        return _t(
            lambda xx, s, q, cfg=cfg, kw=kw: serving_swin.serving_forward(
                s, q, cfg, policy, xx, use_pallas=True, pallas_attn=True,
                **kw),
            x, ss, qstate, iters=20)

    default = build(cfg0.depths)
    r["e2e_ms"] = round(e2e(*default), 3)
    r["e2e_img_s"] = round(B / r["e2e_ms"] * 1e3, 1)
    print(f"  default e2e {r['e2e_ms']} ms ({r['e2e_img_s']} img/s)",
          flush=True)

    slopes = {}
    for k in stage_sel:
        d0 = cfg0.depths[k]
        if d0 > 2:   # deep stage: sweep DOWN like ceiling_swin
            dset = tuple(sorted({2, d0 // 2 + (d0 // 2) % 2, d0}))
        else:        # shallow stage: synthetically deepen
            dset = (2, 4, 6)
        modes = [("lis_on", {})]
        res_k = cfg0.img_size // cfg0.patch_size // (2 ** k)
        if k < 2:
            modes.append(("reorder_bypass", {"reorder": "bypass"}))
        times = {nm: [] for nm, _ in modes}
        for d in dset:
            depths = cfg0.depths[:k] + (d,) + cfg0.depths[k + 1:]
            st = default if depths == cfg0.depths else build(depths)
            for nm, kw in modes:
                ms = e2e(*st, **kw)
                times[nm].append(ms)
                print(f"  stage{k} {nm:14s} d={d}  {ms:8.3f} ms",
                      flush=True)
            if st is not default:
                del st
        for nm, _ in modes:
            sl, _ic = np.polyfit(dset, times[nm], 1)
            if nm == "lis_on":
                slopes[k] = sl
                r[f"stage{k}_layer_ms"] = round(sl, 4)
            else:
                r[f"stage{k}_reorder_chain_ms"] = round(slopes[k] - sl, 4)
        r[f"stage{k}_mxu_ms"] = round(stage_mxu_floor_ms(cfg0, B, k), 4)
        print(f"  stage{k}: per-layer {slopes[k]:.4f} ms "
              f"(mxu floor {r[f'stage{k}_mxu_ms']} ms, res {res_k})",
              flush=True)

    # --- standalone probes on the default state (conservative: standalone
    # kernels lose Mosaic's inter-kernel DMA overlap)
    cfg, ss, qstate = default

    ikw = {"interpret": True} if ON_CPU else {}

    def stem_fn(xx, s, q):
        q0 = jnp.clip(jnp.round(xx / s["s_input"] + s["zp_input"]), *_I8)
        xv = (q0 - s["zp_input"]) * s["s_input"]
        pw = s["patch"]["w_q"].astype(jnp.float32) * s["patch"]["sw"][:, None]
        px = _patches(xv, cfg.patch_size)
        h = px @ pw.T + s["patch_b"]
        sq_bn = q["patch_qact_bn"]["scale"]
        xc = jnp.clip(jnp.round(h / sq_bn), *_I8).astype(jnp.int8)
        return _iln(xc, sq_bn, s["patch_norm"], q["patch_qact"]["scale"],
                    **ikw)

    r["stem_ms"] = round(_t(stem_fn, x, ss, qstate, iters=20), 4)

    merges_ms = 0.0
    for k in range(3):
        res_k = cfg.img_size // cfg.patch_size // (2 ** k)
        c_k = cfg.embed_dim * (2 ** k)
        xc = jax.random.randint(jax.random.PRNGKey(2),
                                (B, res_k * res_k, c_k), -128, 128, jnp.int8)

        def merge_fn(xm, s, q, k=k, res_k=res_k):
            st = s["stages"][k]
            dq = q["stages"][k]["downsample"]
            s_prev = q["stages"][k]["blocks"][-1]["qact4"]["scale"]
            xm = _merge_patches(xm, res_k)
            xm = _iln(xm, s_prev, st["downsample"]["norm"],
                      dq["qact1"]["scale"], expand=4, **ikw)
            c2 = xm.shape[-1]
            return int8_matmul_requant(
                xm.reshape(-1, c2), st["downsample"]["red"]["w_q"],
                dq["qact1"]["scale"] * st["downsample"]["red"]["sw"]
                / dq["qact2"]["scale"], jnp.zeros((c2 // 2,)), **ikw)

        ms = _t(merge_fn, xc, ss, qstate, iters=20)
        r[f"merge{k}_ms"] = round(ms, 4)
        merges_ms += ms

    res3 = cfg.img_size // cfg.patch_size // 8
    c3 = cfg.embed_dim * 8
    xc3 = jax.random.randint(jax.random.PRNGKey(3),
                             (B, res3 * res3, c3), -128, 128, jnp.int8)

    def head_fn(xm, s, q):
        s_prev = q["stages"][3]["blocks"][-1]["qact4"]["scale"]
        fl = _iln(xm, s_prev, s["norm"], q["qact2"]["scale"], **ikw)
        mean_val = fl.astype(jnp.float32).mean(axis=1) * q["qact2"]["scale"]
        cc = jnp.clip(jnp.round(mean_val / q["qact3"]["scale"]),
                      *_I8).astype(jnp.int8)
        return int8_matmul_requant(
            cc, s["head"]["w_q"],
            q["qact3"]["scale"] * s["head"]["sw"] / q["act_out"]["scale"],
            s["head_b"] / q["act_out"]["scale"], **ikw)

    r["head_ms"] = round(_t(head_fn, xc3, ss, qstate, iters=20), 4)

    # NOTE: the serving default fuses the final LN into the last block's
    # fc2 (mm_res_ln) — head_ms standalone double-counts that LN, another
    # reason the probes are upper bounds.

    # --- itemization (needs all four slopes)
    if len(slopes) == 4:
        blocks = sum(cfg0.depths[k] * slopes[k] for k in range(4))
        explained = blocks + r["stem_ms"] + merges_ms + r["head_ms"]
        r["blocks_ms"] = round(blocks, 3)
        r["merges_ms"] = round(merges_ms, 4)
        r["explained_ms"] = round(explained, 3)
        r["residual_ms"] = round(r["e2e_ms"] - explained, 3)
        r["residual_pct"] = round(100 * r["residual_ms"] / r["e2e_ms"], 2)
        # implied intercept for the stage-2 sweep's frame of reference
        r["implied_s2_intercept_ms"] = round(
            explained - cfg0.depths[2] * slopes[2], 3)
        print(f"  ITEMIZATION: e2e {r['e2e_ms']} = blocks {r['blocks_ms']} "
              f"(s0 {cfg0.depths[0]}x{slopes[0]:.3f} + s1 {cfg0.depths[1]}x"
              f"{slopes[1]:.3f} + s2 {cfg0.depths[2]}x{slopes[2]:.3f} + s3 "
              f"{cfg0.depths[3]}x{slopes[3]:.3f}) + stem {r['stem_ms']} + "
              f"merges {r['merges_ms']} + head<= {r['head_ms']} + RESIDUAL "
              f"{r['residual_ms']} ({r['residual_pct']}%)", flush=True)

    # --- per-stage chain differentials (attackability)
    for k in stage_sel:
        probes = chain_probes(cfg0, B, k)
        for nm, v in probes.items():
            r[f"stage{k}_{nm}"] = v
        print(f"  stage{k} chains: {probes}", flush=True)
    return r


def main():
    global ON_CPU

    from p2vit_tpu.profiling import require_tpu

    require_tpu()
    ON_CPU = jax.devices()[0].platform == "cpu"
    models = sys.argv[1:] or ["swin_base_patch4_window7_224"]
    out = [sweep(m) for m in models]
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
