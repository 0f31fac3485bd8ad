"""On-chip dissection of the serving NON-layer time (embed/head/glue).

The round-2 dissection (BENCH.md 2026-08-17) put the 12 DeiT-S layers at
~31-32 ms/batch-256 against a measured 38.7 ms end to end — ~7 ms of
prologue/epilogue the roofline does not mandate. This tool times each glue
stage so that gap can be itemized and attacked (VERDICT round-2 item 1).

Usage: python tools/glue_bench.py [batch] [model]
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
from p2vit_tpu.models import VIT_ZOO, vit
from p2vit_tpu.models.common import extract_patches
from p2vit_tpu import serving
from p2vit_tpu.profiling import device_time_ms

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
MODEL = sys.argv[2] if len(sys.argv) > 2 else "deit_small_patch16_224"

RESULTS: dict = {}


def t(name, fn, x, iters=100):
    ms = device_time_ms(jax.jit(fn), x, iters=iters, repeats=3)
    RESULTS[name] = round(ms, 4)
    print(f"{name:38s} {ms:8.3f} ms")
    return ms


def main():
    policy = make_policy()
    cfg = VIT_ZOO[MODEL]
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    s = serving.convert(params, qstate, cfg, policy, [8] * cfg.num_matmuls)
    c = cfg.embed_dim
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224))
    print(f"model={MODEL} batch={B} C={c} platform={jax.devices()[0].platform}")

    # --- end-to-end and the two composite glue stages
    t("serving_forward (lis on)",
      lambda xx: serving.serving_forward(s, cfg, xx, use_pallas=True), x,
      iters=20)
    t("embed_codes (prologue)",
      lambda xx: serving.embed_codes(s, cfg, xx)[0], x)
    h_codes = jax.jit(lambda xx: serving.embed_codes(s, cfg, xx)[0])(x)
    t("head_logits (epilogue)",
      lambda hh: serving.head_logits(s, hh), h_codes)

    # --- embed sub-stages
    s_in = s["s_input"]
    t("input quantize (f32->i8 codes)",
      lambda xx: jnp.clip(jnp.round(xx / s_in), -128, 127).astype(jnp.int8), x)
    c0 = jax.jit(
        lambda xx: jnp.clip(jnp.round(xx / s_in), -128, 127).astype(jnp.int8)
    )(x)
    t("extract_patches on int8", lambda cc: extract_patches(cc, cfg.patch_size), c0)
    t("extract_patches on f32", lambda xx: extract_patches(xx, cfg.patch_size), x)
    patches = jax.jit(lambda cc: extract_patches(cc, cfg.patch_size))(c0)
    p = s["patch"]

    def patch_mm(pp):
        from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant

        return int8_matmul_requant(
            pp.reshape(-1, pp.shape[-1]), p["w_q"],
            s_in * p["sw"] / p["s_out"], p["bias"] / p["s_out"],
        )

    t("patch matmul kernel", patch_mm, patches)
    c1 = jax.jit(patch_mm)(patches).reshape(B, -1, c)

    def embed_tail(c1v):
        c_cls = jnp.broadcast_to(s["cls_codes"], (B, 1, c))
        c1b = jnp.clip(
            jnp.round(c1v.astype(jnp.float32) * (p["s_out"] / s["s_embed"])),
            -128, 127,
        )
        xc = jnp.concatenate([c_cls.astype(jnp.float32), c1b], axis=1)
        val = xc * s["s_embed"] + s["pos_codes"] * s["s_pos"]
        return jnp.clip(jnp.round(val / s["s_qact1"]), -128, 127).astype(jnp.int8)

    t("embed tail (requant+cls+pos+requant)", embed_tail, c1)
    xc = jax.jit(embed_tail)(c1)
    qkv0 = s["blocks"][0]["qkv"]
    t("block0 standalone int-LN",
      lambda v: serving._int_ln_codes(
          v, s["s_qact1"], s["blocks"][0]["norm1_w"], s["blocks"][0]["norm1_b"],
          qkv0["s_act"] * qkv0["cs"], 1.0, use_pallas=True), xc)

    # --- one encoder layer for reference (12x this + glue = total)
    sb = s["blocks"][0]

    def one_layer(hh):
        from p2vit_tpu.ops.attention_lis import lis_attention_qkv_fused
        from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln
        from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant

        qkv = sb["qkv"]
        h2 = lis_attention_qkv_fused(
            hh, qkv["w_q"], qkv["s_act"] * qkv["sw"] / sb["s_qact1"],
            qkv["bias"] / sb["s_qact1"], cfg.num_heads,
            sb["s_qact1"] ** 2 * cfg.attn_scale / sb["s_attn1"],
            sb["s_attn1"], sb["s_qact1"] / sb["s_qact2a"],
        )
        pr, fc1 = sb["proj"], sb["mlp_fc1"]
        xc2, h3 = int8_matmul_res_ln(
            h2.reshape(-1, c), pr["w_q"],
            sb["s_qact2a"] * pr["sw"] / sb["s_qact3"], pr["bias"] / sb["s_qact3"],
            hh.reshape(-1, c), sb["s_qact3"], s["s_qact1"], sb["s_res1"],
            sb["norm2_w"], sb["norm2_b"], fc1["s_act"] * sb["norm2_cs"],
            sb["norm2_ratio"],
        )
        h4 = int8_matmul_requant(
            h3, fc1["w_q"], fc1["s_act"] * fc1["sw"], fc1["bias"],
            out_inv=1.0 / sb["s_mq1"], gelu=True,
        )
        fc2 = sb["fc2"]
        _, h5 = int8_matmul_res_ln(
            h4, fc2["w_q"], sb["s_mq1"] * fc2["sw"] / sb["s_mq2"],
            fc2["bias"] / sb["s_mq2"], xc2, sb["s_mq2"], sb["s_res1"],
            sb["s_res2"], sb["norm2_w"], sb["norm2_b"], sb["s_qact3"], 1.0,
        )
        return h5

    t("one encoder layer (4-kernel path)", one_layer, h_codes, iters=50)

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
