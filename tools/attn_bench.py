"""On-chip micro-bench of the fused attention kernel (DeiT-S geometry).

Dissects where lis_attention_qkv_fused's time goes: images-per-step sweep,
LIS vs fp-softmax vs no-softmax stub (isolates the VPU score chain), the
two-step pipeline, and the bare qkv matmul. Prints one line per variant.

Usage: python tools/attn_bench.py [batch]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from p2vit_tpu.ops import attention_lis as al
from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant
from p2vit_tpu.profiling import device_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N, C, H = 197, 384, 6
D = C // H

key = jax.random.PRNGKey(0)
h_q = jax.random.randint(key, (B, N, C), -128, 128, jnp.int8)
w_q = jax.random.randint(key, (3 * C, C), -128, 128, jnp.int8)
rvec = jnp.full((3 * C,), 1e-4, jnp.float32)
bvec = jnp.zeros((3 * C,), jnp.float32)
rq = jnp.float32(2.0**-8)
sa = jnp.float32(2.0**-4)
ro = jnp.float32(2.0**-1)


def t(name, fn, x):
    # iters=100: the axon tunnel adds ~30 ms fixed overhead per run call
    # (measured via a trivial op), so short loops inflate per-call numbers
    ms = device_time(fn, x, iters=100, repeats=3) * 1e3
    print(f"{name:42s} {ms:8.3f} ms/call")
    return ms


def main():
    print(f"batch={B} N={N} C={C} H={H} platform={jax.devices()[0].platform}")

    for g in (2, 4, 8):
        try:
            t(
                f"qkv_fused lis g={g}",
                lambda x, g=g: al.lis_attention_qkv_fused(
                    x, w_q, rvec, bvec, H, rq, sa, ro, images_per_step=g
                ),
                h_q,
            )
        except Exception as e:
            print(f"qkv_fused lis g={g}: FAILED {type(e).__name__}: {e}")
    for g in (2, 4):
        t(
            f"qkv_fused fp-softmax g={g}",
            lambda x, g=g: al.lis_attention_qkv_fused(
                x, w_q, rvec, bvec, H, rq, sa, ro, lis=False, images_per_step=g
            ),
            h_q,
        )

    # --- no-softmax stub: replace the LIS chain with a single scale, keeping
    # both dots + requants. Uses the unjitted inner builder so the stubbed
    # global is actually traced (the jitted wrapper would hit its cache).
    real = al._lis_from_scores
    try:
        al._lis_from_scores = lambda attn_c, s_attn, col, n_valid, bits: (
            attn_c * (1.0 / 127.0)
        )
        stub = jax.jit(
            lambda x: al.lis_attention_qkv_fused.__wrapped__(
                x, w_q, rvec, bvec, H, rq, sa, ro, images_per_step=2
            )
        )
        t("qkv_fused NO-softmax stub g=2", stub, h_q)
        al._lis_from_scores = lambda attn_c, s_attn, col, n_valid, bits: (
            attn_c * (1.0 / 127.0)
        )
        stub4 = jax.jit(
            lambda x: al.lis_attention_qkv_fused.__wrapped__(
                x, w_q, rvec, bvec, H, rq, sa, ro, images_per_step=4
            )
        )
        t("qkv_fused NO-softmax stub g=4", stub4, h_q)
    finally:
        al._lis_from_scores = real

    # --- two-step pipeline and its parts
    def two_step(x):
        qkv = int8_matmul_requant(
            x.reshape(-1, C), w_q, rvec, bvec
        ).reshape(B, N, 3 * C)
        return al.lis_attention_fused(qkv, H, rq, sa, ro)

    t("two-step qkv-mm + fused-attn", jax.jit(two_step), h_q)
    t(
        "qkv matmul alone",
        jax.jit(
            lambda x: int8_matmul_requant(x.reshape(-1, C), w_q, rvec, bvec)
        ),
        h_q,
    )
    qkv_codes = int8_matmul_requant(
        h_q.reshape(-1, C), w_q, rvec, bvec
    ).reshape(B, N, 3 * C)
    t(
        "fused-attn alone (per-image grid)",
        jax.jit(lambda x: al.lis_attention_fused(x, H, rq, sa, ro)),
        qkv_codes,
    )

    # --- bf16 XLA attention incl. qkv matmul, for reference
    hb = h_q.astype(jnp.bfloat16)
    wb = w_q.astype(jnp.bfloat16).T

    @jax.jit
    def xla_attn(x):
        qkv = (x @ wb).reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, precision=jax.lax.Precision.DEFAULT
        )
        p = jax.nn.softmax(s.astype(jnp.float32) * 0.125, axis=-1).astype(
            jnp.bfloat16
        )
        o = jnp.einsum(
            "bhnm,bhmd->bhnd", p, v, precision=jax.lax.Precision.DEFAULT
        )
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)

    t("bf16 XLA qkv+attention", xla_attn, hb)


if __name__ == "__main__":
    main()
