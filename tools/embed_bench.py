"""Dissect the serving prologue (embed) cost and A/B the int8-extraction
variant (quantize fused into the patch transpose by XLA, 4x fewer bytes
moved) against the round-2 f32-extraction fused kernel.

The ceiling sweep (tools/ceiling_bench.py) put the whole DeiT-S batch-256
intercept at 3.86 ms — ~10% of e2e — against a ~0.7 ms roofline floor
(154 MB input read at 364 GB/s + 0.15 ms patch-matmul MXU + outputs).

Usage: python tools/embed_bench.py [model] [batch]
"""

from __future__ import annotations

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

_I8 = (-128.0, 127.0)


def _t(fn, x, iters=50, repeats=3):
    return device_time_ms(fn, x, iters=iters, repeats=repeats)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "deit_small_patch16_224"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = VIT_ZOO[model]
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    s = serving.convert(params, qstate, cfg, policy, [8] * cfg.num_matmuls)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224))
    print(f"== {model} batch={B} platform={jax.devices()[0].platform}")

    t = _t(lambda xx: extract_patches(xx, cfg.patch_size), x)
    print(f"extract_patches f32           {t:8.3f} ms")

    s_in = s["s_input"]

    def q_then_extract(xx):
        c0 = jnp.clip(jnp.round(xx / s_in), *_I8).astype(jnp.int8)
        return extract_patches(c0, cfg.patch_size)

    t = _t(q_then_extract, x)
    print(f"quantize+extract int8 (XLA)   {t:8.3f} ms")

    patches_f32 = extract_patches(x, cfg.patch_size)
    from p2vit_tpu.ops.embed_fused import fused_patch_embed

    k = serving._embed_fused_consts(s, cfg)
    t = _t(lambda p: fused_patch_embed(p, s["patch"]["w_q"], **k),
           patches_f32)
    print(f"fused kernel on f32 patches   {t:8.3f} ms")

    patches_i8 = q_then_extract(x)
    t = _t(lambda p: fused_patch_embed(p, s["patch"]["w_q"], **k),
           patches_i8)
    print(f"fused kernel on int8 patches  {t:8.3f} ms")

    def fused_f32_extract(xx):
        p = extract_patches(xx.astype(jnp.float32), cfg.patch_size)
        return fused_patch_embed(p, s["patch"]["w_q"], **k)

    t = _t(fused_f32_extract, x)
    print(f"e2e f32-extract fused (r2)    {t:8.3f} ms")
    t = _t(lambda xx: serving.embed_codes(s, cfg, xx, use_pallas=True,
                                          fuse_embed=True), x)
    print(f"embed_codes fused (current)   {t:8.3f} ms")
    t = _t(lambda xx: serving.embed_codes(s, cfg, xx, use_pallas=True,
                                          fuse_embed=False), x)
    print(f"embed_codes staged            {t:8.3f} ms")


if __name__ == "__main__":
    main()
