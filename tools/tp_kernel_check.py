"""On-chip compile-check of the TP-sharded kernel shapes (no mesh needed).

The tensor-parallel serving path (parallel/tensor.py) runs the production
Pallas kernels on SHARD shapes a single-device program never sees:

  * lis_attention_qkv_fused with a rectangular (3C/tp, C) weight and
    heads/tp local heads (the head-aligned column shard),
  * int8_matmul_requant with a (hidden/tp, C) fc1 shard.

Interpret-mode tests pin the math (tests/test_parallel.py), but interpret
mode cannot catch Mosaic lowering failures (the Swin row-trim lesson,
CLAUDE.md) — so this script compiles + runs each kernel AT THE SHARD
SHAPES on the real chip and checks bitwise equality against the jnp twins.
Run from the repo root; exits non-zero on any mismatch.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from p2vit_tpu import profiling  # noqa: E402
from p2vit_tpu.ops.attention_lis import (  # noqa: E402
    lis_attention_qkv_fused,
    lis_attention_fused,
    lis_attention_ref,
)
from p2vit_tpu.ops.matmul_int8 import (  # noqa: E402
    int8_matmul_requant,
    int8_matmul_requant_ref,
)


def _qkv_ref(h_q, w_q, rv, bv, heads, srq, sat, oro, lis=True):
    b, n, c_in = h_q.shape
    c = w_q.shape[0] // 3
    d = c // heads
    acc = jnp.einsum(
        "bnk,ok->bno", h_q.astype(jnp.int32), w_q.astype(jnp.int32)
    ).astype(jnp.float32)
    qkv = jnp.clip(jnp.round(acc * rv + bv), -128, 127)
    qkv = qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    av = lis_attention_ref(
        qkv[0].reshape(b * heads, n, d),
        qkv[1].reshape(b * heads, n, d),
        qkv[2].reshape(b * heads, n, d),
        srq, sat, oro, lis=lis,
    )
    return (
        av.reshape(b, heads, n, d).transpose(0, 2, 1, 3).reshape(b, n, c)
    )


def main():
    interpret = "--interpret" in sys.argv  # CPU smoke of the same program
    if interpret:
        # a dead axon tunnel hangs even CPU-only backend init (the
        # sitecustomize inits the tunnel inside backends(); CLAUDE.md) —
        # drop the factory before anything touches a backend
        from jax._src import xla_bridge as _xb

        if not _xb.backends_are_initialized():
            _xb._backend_factories.pop("axon", None)
            jax.config.update("jax_platforms", "cpu")
    else:
        profiling.require_tpu()
    kw = {"interpret": True} if interpret else {}
    rng = np.random.default_rng(0)
    failures = 0
    # DeiT-S geometry shards: C=384, heads=6 → tp in {2, 3, 6}
    for tp in (2, 3, 6):
        c_in, heads, n, b = 384, 6, 197, 8
        c_out = c_in // tp
        hl = heads // tp
        h_q = jnp.asarray(
            rng.integers(-128, 128, (b, n, c_in)), jnp.int8
        )
        w_q = jnp.asarray(
            rng.integers(-128, 128, (3 * c_out, c_in)), jnp.int8
        )
        rv = jnp.asarray(2.0 ** rng.integers(-12, -8, 3 * c_out), jnp.float32)
        bv = jnp.asarray(rng.normal(0, 4, 3 * c_out), jnp.float32)
        srq, sat, oro = 2.0 ** -14, 2.0 ** -4, 4.0
        got = np.asarray(
            jax.jit(
                lambda h, w, r, bb: lis_attention_qkv_fused(
                    h, w, r, bb, hl, srq, sat, oro, **kw
                )
            )(h_q, w_q, rv, bv)
        )
        want = np.asarray(_qkv_ref(h_q, w_q, rv, bv, hl, srq, sat, oro))
        ok = (got == want).all()
        print(f"qkv_fused shard tp={tp} (w=({3*c_out},{c_in}), heads={hl}): "
              + ("BITWISE OK" if ok else "MISMATCH"))
        failures += not ok

        # fc1 column shard: (hidden/tp, C) with the GELU epilogue
        hid = 4 * c_in // tp
        wf = jnp.asarray(rng.integers(-128, 128, (hid, c_in)), jnp.int8)
        rf = jnp.asarray(2.0 ** rng.integers(-12, -8, hid), jnp.float32)
        bf = jnp.asarray(rng.normal(0, 4, hid), jnp.float32)
        xf = h_q.reshape(-1, c_in)
        got2 = np.asarray(
            jax.jit(
                lambda x, w, r, bb: int8_matmul_requant(
                    x, w, r, bb, out_inv=2.0 ** 6, gelu=True, **kw
                )
            )(xf, wf, rf, bf)
        )
        want2 = np.asarray(
            int8_matmul_requant_ref(xf, wf, rf, bf, out_inv=2.0 ** 6,
                                    gelu=True)
        )
        ok2 = (got2 == want2).all()
        print(f"fc1 shard tp={tp} (w=({hid},{c_in})): "
              + ("BITWISE OK" if ok2 else "MISMATCH"))
        failures += not ok2

        # sharded-channel plain attention (the fuse_qkv=False arm)
        qkv_c = jnp.asarray(
            rng.integers(-128, 128, (b, n, 3 * c_out)), jnp.int8
        )
        got3 = np.asarray(
            jax.jit(
                lambda q: lis_attention_fused(q, hl, srq, sat, oro, **kw)
            )(qkv_c)
        )
        qr = qkv_c.astype(jnp.float32).reshape(b, n, 3, hl, c_out // hl)
        qr = qr.transpose(2, 0, 3, 1, 4).astype(jnp.int8)
        want3 = np.asarray(
            lis_attention_ref(
                qr[0].reshape(b * hl, n, -1),
                qr[1].reshape(b * hl, n, -1),
                qr[2].reshape(b * hl, n, -1),
                srq, sat, oro,
            ).reshape(b, hl, n, -1).transpose(0, 2, 1, 3).reshape(b, n, c_out)
        )
        ok3 = (got3 == want3).all()
        print(f"attention shard tp={tp} (3C={3*c_out}, heads={hl}): "
              + ("BITWISE OK" if ok3 else "MISMATCH"))
        failures += not ok3
    print("tp_kernel_check:", "PASS" if failures == 0 else f"{failures} FAIL")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
