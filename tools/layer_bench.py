"""On-chip micro-bench of the non-attention serving kernels (DeiT-S shapes).

Per-layer cost centers outside attention: proj+res+LN, fc1+GELU, fc2+res+LN,
plus the standalone int-LN and the end-to-end serving_forward. Prints one
line per kernel with its speed-of-light estimate for context.

Usage: python tools/layer_bench.py [batch]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant
from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln
from p2vit_tpu.ops.intln import int_ln_requant
from p2vit_tpu.profiling import device_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N, C, HID = 197, 384, 1536
M = B * N

key = jax.random.PRNGKey(0)


def t(name, fn, x):
    ms = device_time(fn, x, iters=100, repeats=3) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/call")
    return ms


def main():
    print(f"batch={B} M={M} C={C} hid={HID} platform={jax.devices()[0].platform}")
    x_c = jax.random.randint(key, (M, C), -128, 128, jnp.int8)
    x_h = jax.random.randint(key, (M, HID), -128, 128, jnp.int8)
    res = jax.random.randint(key, (M, C), -128, 128, jnp.int8)

    w_proj = jax.random.randint(key, (C, C), -128, 128, jnp.int8)
    w_fc1 = jax.random.randint(key, (HID, C), -128, 128, jnp.int8)
    w_fc2 = jax.random.randint(key, (C, HID), -128, 128, jnp.int8)

    rC = jnp.full((C,), 2.0**-10, jnp.float32)
    rH = jnp.full((HID,), 2.0**-10, jnp.float32)
    bC = jnp.zeros((C,), jnp.float32)
    bH = jnp.zeros((HID,), jnp.float32)
    sC = jnp.full((C,), 0.02, jnp.float32)
    ln_w = jax.random.normal(key, (C,), jnp.float32)
    ln_b = jax.random.normal(key, (C,), jnp.float32) * 0.1
    ones = jnp.ones((C,), jnp.float32)

    # proj: M×C×C matmul + residual + LN.  SoL: 7.4 GMAC → 0.04 ms + mem
    t(
        "proj mm_res_ln (C->C)",
        lambda x: int8_matmul_res_ln(
            x, w_proj, rC, bC, res, sC, sC, sC, ln_w, ln_b, sC, ones
        )[1],
        x_c,
    )
    # fc1: M×C×HID + GELU epilogue.  SoL: 29.7 GMAC → 0.15 ms + mem
    t(
        "fc1+gelu (C->4C)",
        lambda x: int8_matmul_requant(x, w_fc1, rC[:1].repeat(HID), bH,
                                      out_inv=64.0, gelu=True),
        x_c,
    )
    t(
        "fc1 no-gelu (C->4C)",
        lambda x: int8_matmul_requant(x, w_fc1, rH, bH),
        x_c,
    )
    # fc2: M×HID×C + residual + LN.  SoL: 29.7 GMAC → 0.15 ms + mem
    t(
        "fc2 mm_res_ln (4C->C)",
        lambda x: int8_matmul_res_ln(
            x, w_fc2, rC, bC, res, sC, sC, sC, ln_w, ln_b, sC, ones
        )[1],
        x_h,
    )
    # standalone int-LN (block0 only).  SoL: 2 HBM passes ≈ 0.05 ms
    mask = jnp.ones((C,), jnp.float32)
    t(
        "int_ln standalone",
        lambda x: int_ln_requant(x, mask, jnp.float32(0.01), ln_w, ln_b, sC,
                                 ones),
        x_c,
    )

    # end-to-end serving (fresh synthetic state)
    from p2vit_tpu.config import make_policy
    from p2vit_tpu.models import VIT_ZOO, vit
    from p2vit_tpu import serving

    cfg = VIT_ZOO["deit_small_patch16_224"]
    policy = make_policy(ptf=True, lis=True, quant_method="minmax")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    ss = serving.convert(params, qstate, cfg, policy, [8] * cfg.num_matmuls)
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224), jnp.float32)
    for lis, fq in ((True, True), (True, False), (False, True)):
        ms = device_time(
            jax.jit(lambda xx, lis=lis, fq=fq: serving.serving_forward(
                ss, cfg, xx, lis=lis, fuse_qkv=fq)),
            img, iters=20, repeats=3,
        ) * 1e3
        print(f"serving_forward lis={int(lis)} fuse={int(fq)}: {ms:8.2f} ms "
              f"-> {B / ms * 1e3:9.1f} img/s")

    xb = img.astype(jnp.bfloat16)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    ms = device_time(jax.jit(lambda xx: vit.fp_forward(pb, cfg, xx)), xb,
                     iters=20, repeats=3) * 1e3
    print(f"bf16 fp_forward: {ms:8.2f} ms -> {B / ms * 1e3:9.1f} img/s")


if __name__ == "__main__":
    main()
