"""Packed-int4 weight store at small batch: the latency-regime A/B.

Why: the round-3 A/B (BENCH.md §"int4-packed vs int8 weight store")
rejected the packed store at batch 256 — weight DMA was already hidden
behind compute there, and the nibble unpack added real VPU ops to the
serial in-VMEM chain (−20%) — and found batch 8 a wash. Batch 1 is the
regime the packed store was BUILT for and the one the old A/B never
measured: at M=197 tokens the activation panel is a single tile, weight
streaming dominates the HBM traffic (~22 MB of int8 weight codes per
DeiT-S forward vs ~0.3 MB of activations), and round-2b measured VPU
elementwise hiding under DMA in streaming kernels — so the unpack should
be free exactly where batch 256 made it expensive (compute-bound).

Arms per GEMM at M ∈ {197, 1576} (batch-1 / batch-8 DeiT-S token rows):
  i8  : int8_matmul_requant, plain (N, K) int8 store   (serving today)
  w4p : int4_matmul_requant, pack_int4 (N, K/2) store  (≤half the bytes)

plus a whole-depth arm: lax.scan over 12 stacked layers running the
serving GEMM chain qkv→proj→fc1(gelu)→fc2 per step (data-dependent, like
serving's scan_layers mode) — the model-level weight stream the per-GEMM
micros compose into.

Weights are drawn in [-8, 7] (int4 codes, exactly what W4A8 serving
stores), so the two arms are BIT-IDENTICAL — pinned per run here, and in
interpret mode by tests/test_serving.py.

Packing caveat measured here, not hidden: pack_int4 splits K into two
contiguous halves, and each half pads to a 128-lane multiple inside the
kernel — at K=384 the packed panel is (N, 256) vs (N, 384) plain, a
1.5× (not 2×) byte reduction; K=1536 gets the full 2×.

Decision rule: if w4p wins ≥10% on the whole-depth chain at M=197,
productionize a w_store="int4" serving option (packed variants of the
junction + qkv-fused kernels); otherwise record the measured dead-end
next to the batch-256 one and keep the packed kernel an HBM-capacity
tool.

Usage: python tools/w4pack_latency.py   (repo root, real chip;
       interpret-mode smoke in tests/test_bench_tools_smoke.py)
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from p2vit_tpu.ops.matmul_int8 import (
    int4_matmul_requant,
    int8_matmul_requant,
    pack_int4,
)
from p2vit_tpu.profiling import device_time
from tools._gemm_bench import DEIT_S_GEMMS, DEPTH, make_consts

INTERPRET = False  # tests flip this to run the same arms on CPU

_consts = make_consts  # int4-valued codes: both stores serve the same W


def _arm_fns(gelu):
    kw = {"gelu": gelu, "out_inv": 8.0 if gelu else 1.0,
          "interpret": INTERPRET}
    i8 = lambda x, w, r, b: int8_matmul_requant(x, w, r, b, **kw)
    w4 = lambda x, wp, r, b: int4_matmul_requant(x, wp, r, b, **kw)
    return i8, w4


def run_gemm(name, m, k, n, gelu, rng, iters):
    kx, kc = jax.random.split(rng)
    x = jax.random.randint(kx, (m, k), -128, 128, jnp.int8)
    w, r, b = _consts(kc, k, n)
    wp = pack_int4(w)
    i8_fn, w4_fn = _arm_fns(gelu)
    res = {}
    try:
        # inside the try: a Mosaic lowering refusal at a new shape must
        # hit the per-GEMM FAILED handler, not abort the queue slot
        ok = bool(jnp.array_equal(i8_fn(x, w, r, b), w4_fn(x, wp, r, b)))
        res["bitwise"] = ok
        res["i8_ms"] = device_time(i8_fn, x, w, r, b, iters=iters,
                                   repeats=3) * 1e3
        res["w4p_ms"] = device_time(w4_fn, x, wp, r, b, iters=iters,
                                    repeats=3) * 1e3
        ratio = res["i8_ms"] / res["w4p_ms"]
        print(f"   {name:5s} M={m:5d} K={k:4d} N={n:4d}: "
              f"i8 {res['i8_ms']:8.4f} ms | w4p {res['w4p_ms']:8.4f} ms "
              f"({ratio:.3f}x)  [bitwise={'ok' if ok else 'MISMATCH'}]")
    except Exception as e:
        print(f"   {name:5s} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
    return res


def _chain_step(mm, x, ws, consts):
    """One encoder layer's GEMM chain (shapes only; scales synthetic)."""
    w_qkv, w_proj, w_fc1, w_fc2 = ws
    (rq, bq), (rp, bp), (rf1, bf1), (rf2, bf2) = consts
    c = x.shape[1]
    a = mm[0](x, w_qkv, rq, bq)
    p = mm[0](a[:, :c], w_proj, rp, bp)
    f = mm[1](p, w_fc1, rf1, bf1)
    return mm[0](f, w_fc2, rf2, bf2)


def run_depth_chain(m, rng, iters):
    """12-layer scan over stacked weights: the whole-depth weight stream."""
    kx, *kls = jax.random.split(rng, 1 + DEPTH)
    c = DEIT_S_GEMMS[0][1]
    x = jax.random.randint(kx, (m, c), -128, 128, jnp.int8)
    layers = []
    for kl in kls:
        ks = jax.random.split(kl, len(DEIT_S_GEMMS))
        layers.append([_consts(kg, k, n)
                       for kg, (_, k, n, _) in zip(ks, DEIT_S_GEMMS)])
    stk = lambda f: jnp.stack([f(l) for l in layers])
    ws = tuple(stk(lambda l, i=i: l[i][0]) for i in range(4))
    wps = tuple(stk(lambda l, i=i: pack_int4(l[i][0])) for i in range(4))
    consts = tuple(
        (stk(lambda l, i=i: l[i][1]), stk(lambda l, i=i: l[i][2]))
        for i in range(4)
    )
    plain, gelu_kw = (
        {"interpret": INTERPRET},
        {"gelu": True, "out_inv": 8.0, "interpret": INTERPRET},
    )

    def chain(mm0, mm1):
        def fn(xx, w_stk, cc):
            def body(carry, layer_ws):
                lw, lc = layer_ws  # per-layer slices of the stacked pytrees
                return _chain_step((mm0, mm1), carry, lw, lc), ()

            out, _ = jax.lax.scan(body, xx, (w_stk, cc))
            return out

        return fn

    i8_fn = chain(
        lambda *a: int8_matmul_requant(*a, **plain),
        lambda *a: int8_matmul_requant(*a, **gelu_kw),
    )
    w4_fn = chain(
        lambda *a: int4_matmul_requant(*a, **plain),
        lambda *a: int4_matmul_requant(*a, **gelu_kw),
    )
    res = {}
    try:
        ok = bool(jnp.array_equal(i8_fn(x, ws, consts),
                                  w4_fn(x, wps, consts)))
        res["bitwise"] = ok
        res["i8_ms"] = device_time(i8_fn, x, ws, consts, iters=iters,
                                   repeats=3) * 1e3
        res["w4p_ms"] = device_time(w4_fn, x, wps, consts, iters=iters,
                                    repeats=3) * 1e3
        ratio = res["i8_ms"] / res["w4p_ms"]
        print(f"   depth-{DEPTH} chain M={m}: i8 {res['i8_ms']:8.4f} ms | "
              f"w4p {res['w4p_ms']:8.4f} ms ({ratio:.3f}x)  "
              f"[bitwise={'ok' if ok else 'MISMATCH'}]")
    except Exception as e:
        print(f"   depth-{DEPTH} chain FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
    return res


def main():
    if not INTERPRET:
        from p2vit_tpu.profiling import require_tpu

        require_tpu()
    on_accel = jax.devices()[0].platform != "cpu"
    print(f"== w4pack_latency platform={jax.devices()[0].platform}")
    rng = jax.random.PRNGKey(0)
    res = {}
    ms = (197, 1576) if on_accel else (8,)
    for m in ms:
        # kernels here are ~µs-scale; iterate enough that the on-device
        # loop dwarfs the ~30 ms fixed tunnel overhead (BENCH methodology)
        gemm_iters = (3000 if m == 197 else 800) if on_accel else 1
        chain_iters = (300 if m == 197 else 80) if on_accel else 1
        print(f"-- DeiT-S GEMMs at M={m}")
        ks = jax.random.split(jax.random.fold_in(rng, m), 6)
        for i, (name, k, n, gelu) in enumerate(DEIT_S_GEMMS):
            res[f"{name}@m{m}"] = run_gemm(name, m, k, n, gelu, ks[i],
                                           gemm_iters)
        # big-K control (deit_base fc2 width): full 2x byte reduction
        res[f"fc2_b@m{m}"] = run_gemm("fc2_b", m, 3072, 768, False, ks[4],
                                      gemm_iters)
        res[f"chain@m{m}"] = run_depth_chain(m, ks[5], chain_iters)
    print("\n" + json.dumps(
        {k: {kk: (round(v, 4) if isinstance(v, float) else v)
             for kk, v in d.items()} for k, d in res.items()}))


if __name__ == "__main__":
    main()
