"""On-chip dissection of the Swin serving glue (stem / LN / residual / reorders).

Swin-T runs 1.45x bf16 but — unlike ViT — its serving path still does the
two per-block residual requant-adds as XLA f32 elementwise passes and every
LN as a standalone kernel, plus window partition/reverse/roll reorders and
an f32 patch stem. This tool times each piece at every stage geometry so
the fusion candidates can be ranked the way glue_bench.py ranked ViT's
(which bought +8% e2e).

Usage: python tools/swin_glue_bench.py [batch]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

from p2vit_tpu.config import make_policy
from p2vit_tpu.models import SWIN_ZOO
from p2vit_tpu.models import swin as swin_mod
from p2vit_tpu.models.swin import window_partition, window_reverse, _patches
from p2vit_tpu import serving_swin
from p2vit_tpu.profiling import device_time_ms

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODEL = "swin_tiny_patch4_window7_224"

RESULTS: dict = {}


def t(name, fn, x, iters=100):
    ms = device_time_ms(jax.jit(fn), x, iters=iters, repeats=3)
    RESULTS[name] = round(ms, 4)
    print(f"{name:44s} {ms:8.3f} ms")
    return ms


def main():
    policy = make_policy()
    cfg = SWIN_ZOO[MODEL]
    params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224))
    calib = swin_mod.calibrate(params, cfg, policy, x[:8])
    qstate = calib.qstate
    s = serving_swin.convert(params, qstate, cfg, policy, 8)
    print(f"model={MODEL} batch={B} platform={jax.devices()[0].platform}")

    t("serving_forward (lis on)",
      lambda xx: serving_swin.serving_forward(
          s, qstate, cfg, policy, xx, use_pallas=True), x, iters=20)

    # --- fp patch stem pieces
    pw = jnp.asarray(s["patch"]["w_q"], jnp.float32) * s["patch"]["sw"][:, None]
    t("stem: extract+f32 matmul+bias",
      lambda xx: _patches(xx, cfg.patch_size) @ pw.T + s["patch_b"], x)
    h0 = jax.jit(lambda xx: _patches(xx, cfg.patch_size) @ pw.T + s["patch_b"])(x)
    sq_bn = qstate["patch_qact_bn"]["scale"]
    t("stem: requant to codes",
      lambda hh: jnp.clip(jnp.round(hh / sq_bn), -128, 127).astype(jnp.int8), h0)
    xc0 = jax.jit(
        lambda hh: jnp.clip(jnp.round(hh / sq_bn), -128, 127).astype(jnp.int8)
    )(h0)
    t("stem: patch-norm int-LN",
      lambda cc: serving_swin._iln(
          cc, sq_bn, s["patch_norm"], qstate["patch_qact"]["scale"]), xc0)

    # --- per-stage glue at each geometry
    for i in range(len(cfg.depths)):
        res = cfg.stage_res(i)
        c = cfg.stage_dim(i)
        l = res * res
        ws = min(cfg.window_size, res)
        sqs = qstate["stages"][i]
        bq = sqs["blocks"][0]
        sb = s["stages"][i]["blocks"][0]
        key = jax.random.PRNGKey(i)
        cc = jax.random.randint(key, (B, l, c), -128, 128, jnp.int8)
        hh = jax.random.randint(key, (B, l, c), -128, 128, jnp.int8)
        tag = f"s{i} {res}x{res}x{c}"

        t(f"{tag}: int-LN (norm1)",
          lambda v, sb=sb, bq=bq: serving_swin._iln(
              v, bq["qact2"]["scale"], sb["norm1"], bq["qact1"]["scale"]), cc)

        def res_requant(a, b, bq=bq):
            val = (a.astype(jnp.float32) * bq["qact2"]["scale"]
                   + b.astype(jnp.float32) * bq["qact4"]["scale"])
            return jnp.clip(jnp.round(val / bq["qact4"]["scale"]),
                            -128, 127).astype(jnp.int8)

        t(f"{tag}: residual requant-add (XLA)",
          lambda v, hh=hh: res_requant(v, hh), cc)

        shift = ws // 2 if res > ws else 0

        def reorder(v, res=res, ws=ws, shift=shift, c=c):
            h = v.reshape(B, res, res, c)
            if shift:
                h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            hw = window_partition(h, ws)
            back = window_reverse(hw, ws, res, res)
            if shift:
                back = jnp.roll(back, (shift, shift), axis=(1, 2))
            return back.reshape(B, l, c)

        t(f"{tag}: partition+reverse (+roll)", reorder, cc)

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
