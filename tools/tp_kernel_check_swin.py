"""On-chip compile-check of the Swin-TP sharded kernel shapes.

parallel/tensor_swin.py runs the production kernels on SHARD shapes a
single-device Swin program never sees:

  * int8_matmul_requant with a rectangular (3C_k/tp, C_k) qkv column shard
    and a (4C_k/tp, C_k) fc1 shard (GELU epilogue) at every stage width,
  * swin_lis_attention with heads_k/tp LOCAL heads: (W, N, 3C_k/tp) window
    panels, a (H_k/tp, N, N) bias-value slab, both mask arms.

Interpret-mode tests pin the math (tests/test_parallel.py::test_swin_tp_*),
but interpret mode cannot catch Mosaic lowering failures (the Swin row-trim
lesson, CLAUDE.md) — this script compiles + runs each kernel AT THE SHARD
SHAPES on the real chip and checks bitwise equality against the jnp twins.
Covers swin_base's admissible tp in {2, 4} at its extreme stage geometries
(stage 0: C=128 H=4 res=56, 64 shifted windows; stage 3: C=1024 H=32 res=7,
single unshifted window) and swin_tiny/small's tp=3 (stage 1: C=192 H=6).
Run from the repo root; exits non-zero on any mismatch. --interpret for a
CPU smoke of the same program.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

# The interpret guard must run BEFORE the p2vit_tpu imports below:
# models/vit.py materializes module-level jnp constants, so importing it
# initializes the backend — and with a dead tunnel the axon plugin hangs
# there, before main() would ever run (observed 2026-08-20).
if "--interpret" in sys.argv:
    from jax._src import xla_bridge as _xb

    if not _xb.backends_are_initialized():
        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
from p2vit_tpu import profiling  # noqa: E402
from p2vit_tpu import serving_swin  # noqa: E402
from p2vit_tpu.models.swin import shift_attn_mask  # noqa: E402
from p2vit_tpu.ops.attention_lis import swin_lis_attention  # noqa: E402
from p2vit_tpu.ops.matmul_int8 import (  # noqa: E402
    int8_matmul_requant,
    int8_matmul_requant_ref,
)

# (label, C, heads, res, tp): swin_base stages 0/3 at tp in {2,4} plus the
# tiny/small tp=3 stage-1 shard — the widest and narrowest local widths the
# TP path can produce (3C/tp from 96 to 1536 columns).
CASES = [
    ("base_s0", 128, 4, 56, 2),
    ("base_s0", 128, 4, 56, 4),
    ("base_s3", 1024, 32, 7, 2),
    ("base_s3", 1024, 32, 7, 4),
    ("tiny_s1", 192, 6, 28, 3),
]
# --only label_tp[,label_tp...] reruns a subset (e.g. after a slot timeout:
# --only base_s3_4,tiny_s1_3), matching f"{label}_{tp}".
if "--only" in sys.argv:
    _want = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    CASES = [c for c in CASES if f"{c[0]}_{c[4]}" in _want]


def main():
    interpret = "--interpret" in sys.argv  # CPU smoke (guard at module top)
    if not interpret:
        profiling.require_tpu()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    kw = {"interpret": True} if interpret else {}
    rng = np.random.default_rng(0)
    failures = 0
    b = 2
    ws = 7
    n = ws * ws
    for label, c, heads, res, tp in CASES:
        hl = heads // tp
        cl = c // tp
        nw = (res // ws) ** 2
        w = b * nw
        shift = ws // 2 if res > ws else 0
        # qkv column shard: (3C/tp, C) rectangular weight
        xq = jnp.asarray(rng.integers(-128, 128, (w * n, c)), jnp.int8)
        wq = jnp.asarray(rng.integers(-128, 128, (3 * cl, c)), jnp.int8)
        rv = jnp.asarray(2.0 ** rng.integers(-12, -8, 3 * cl), jnp.float32)
        bv = jnp.asarray(rng.normal(0, 4, 3 * cl), jnp.float32)
        got = np.asarray(
            jax.jit(lambda x, wt, r, bb: int8_matmul_requant(
                x, wt, r, bb, **kw))(xq, wq, rv, bv)
        )
        want = np.asarray(int8_matmul_requant_ref(xq, wq, rv, bv))
        ok = (got == want).all()
        print(f"{label} tp={tp} qkv shard (w=({3*cl},{c})): "
              + ("BITWISE OK" if ok else "MISMATCH"))
        failures += not ok

        # head-parallel window attention: local heads + bias rows, both
        # mask arms at the geometry's actual shift
        hw = jnp.asarray(got.reshape(w, n, 3 * cl), jnp.int8)
        bias = jnp.asarray(rng.normal(0, 2, (hl, n, n)), jnp.float32)
        s1, s_attn1, s2, s3 = 2.0**-4, 2.0**-3, 2.0**-4, 2.0**-4
        hd = c // heads
        mask = (jnp.asarray(shift_attn_mask(res, res, ws, shift))
                if shift else None)
        for lis in (True, False):
            got2 = np.asarray(jax.jit(
                lambda q, bb, m: swin_lis_attention(
                    q, bb, None if mask is None else m / s2, hl, nw,
                    s1**2 * hd**-0.5 / s_attn1, s_attn1, s2, s1 / s3,
                    lis=lis, **kw)
            )(hw, bias, mask if mask is not None else jnp.zeros(())))
            want2 = np.asarray(serving_swin._window_attention_codes_vals(
                hw, bias, mask, lis, hl, s1, s_attn1, s2, s3))
            ok2 = (got2 == want2).all()
            print(f"{label} tp={tp} window attn (heads={hl}, lis={lis}, "
                  f"mask={'y' if shift else 'n'}): "
                  + ("BITWISE OK" if ok2 else "MISMATCH"))
            failures += not ok2

        # fc1 column shard with the fused GELU epilogue
        hid = 4 * c // tp
        wf = jnp.asarray(rng.integers(-128, 128, (hid, c)), jnp.int8)
        rf = jnp.asarray(2.0 ** rng.integers(-12, -8, hid), jnp.float32)
        bf = jnp.asarray(rng.normal(0, 4, hid), jnp.float32)
        got3 = np.asarray(jax.jit(
            lambda x, wt, r, bb: int8_matmul_requant(
                x, wt, r, bb, out_inv=2.0**6, gelu=True, **kw)
        )(xq, wf, rf, bf))
        want3 = np.asarray(int8_matmul_requant_ref(
            xq, wf, rf, bf, out_inv=2.0**6, gelu=True))
        ok3 = (got3 == want3).all()
        print(f"{label} tp={tp} fc1 shard (w=({hid},{c})): "
              + ("BITWISE OK" if ok3 else "MISMATCH"))
        failures += not ok3
    print("tp_kernel_check_swin:",
          "PASS" if failures == 0 else f"{failures} FAIL")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
