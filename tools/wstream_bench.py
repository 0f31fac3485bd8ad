"""Weight-streaming bf16 matmul at small batch: can fewer weight bytes
beat the XLA bf16 forward below the int8 crossover?

Why: below the measured int8-over-bf16 crossover (batch <128 ViT),
weight-only serving ties bf16 by construction (BENCH.md §"Weight-only
serving arm") — at batch 1 the GEMM chain is weight-DMA-bound (~42 MB of
bf16 weights vs ~0.3 MB of activations per DeiT-S forward), so the only
remaining lever is WEIGHT BYTES. ops/matmul_wstream.py streams the int8
(w8p) or int4 (w4p) weight codes packed 4-or-8-per-int32-word (int32
moves at f32 DMA rate; raw int8 DMA measured ~100 GB/s vs f32 ~224
Pallas — BENCH.md hardware rates) and dequantizes in VMEM before the
bf16 MXU dot.

The bet this tool settles: packed bytes are 1.5-2× fewer than bf16, but
Pallas DMA measured 224 GB/s vs XLA's 364 (round-2b) — if that ratio
still holds at these shapes the win evaporates (1.5 × 224/364 ≈ 0.92).
Arms, per GEMM at M ∈ {197, 1576} and on the depth-12 scanned chain:

  xla    jnp bf16 dot chain (what weight-only serving runs today)
  bf16   Pallas kernel, bf16 weights        (isolates Pallas overhead/DMA)
  i8     Pallas kernel, raw int8 codes      (tests the int8-DMA-rate claim)
  w8p    Pallas kernel, int32-packed int8   (2× fewer bytes; 1.5× at K=384)
  w4p    Pallas kernel, int32-packed int4   (up to 4×; 1.5× at K=384)

All arms serve the SAME int4-valued codes, so outputs agree to ≤1 ulp
bf16 (split-K accumulation order; exactness study in ops/matmul_wstream)
— checked per run as argmax row agreement. The xla arm receives the
weights PRE-CONVERTED to bf16 (wstream_ref's cast is then a no-op), so
its timed loop streams exactly the bf16 weight constants weight-only
serving serves — the baseline does not depend on XLA hoisting a
loop-invariant int8→bf16 convert out of the timing loop.

Decision rule: if the best packed arm wins ≥10% on the depth-12 chain at
M=197 vs the XLA arm, productionize a streamed weight-only serving mode
(`--serve-weight-only` + stream flag); otherwise record the measured
dead-end next to the w4pack one (BENCH.md).

Usage: python tools/wstream_bench.py   (repo root, real chip;
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

from p2vit_tpu.ops.matmul_wstream import (
    pack_w4,
    pack_w8,
    wstream_matmul,
    wstream_ref,
)
from p2vit_tpu.profiling import device_time
from tools._gemm_bench import DEIT_S_GEMMS, DEPTH, make_consts

INTERPRET = False  # tests flip this; main() flips it on a CPU fallback


def _consts(rng, k, n):
    # narrower PoT exponent pool than w4pack's: keeps |out| in bf16's
    # dense range so the argmax-agreement check is meaningful per row
    return make_consts(rng, k, n, rexp=(-9, -5))


ARMS = ("bf16", "i8", "w8p", "w4p")
PACK = {"bf16": lambda w: w.astype(jnp.bfloat16), "i8": lambda w: w,
        "w8p": pack_w8, "w4p": pack_w4}


def run_gemm(name, m, k, n, gelu, rng, iters):
    kx, kc = jax.random.split(rng)
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jnp.bfloat16)
    w, r, b = _consts(kc, k, n)
    res = {}
    bf16_bytes = 2 * w.size
    # the baseline streams bf16 weight constants, exactly like wonly
    wb = w.astype(jnp.bfloat16)
    xla = jax.jit(lambda xx, ww, rr, bb: wstream_ref(xx, ww, rr, bb,
                                                     gelu=gelu))
    try:
        # inside the try: a lowering refusal must hit the per-GEMM FAILED
        # handler, not abort the queue slot
        ok_ref = jnp.argmax(xla(x, wb, r, b), axis=1)
        res["xla_ms"] = device_time(xla, x, wb, r, b, iters=iters,
                                    repeats=3) * 1e3
        line = f"   {name:5s} M={m:5d} K={k:4d} N={n:4d}: " \
               f"xla {res['xla_ms']:8.4f}"
        for fmt in ARMS:
            ws = PACK[fmt](w)
            fn = (lambda xx, ww, rr, bb, fmt=fmt: wstream_matmul(
                xx, ww, rr, bb, w_format=fmt, gelu=gelu,
                interpret=INTERPRET))
            agree = float(jnp.mean(
                (jnp.argmax(fn(x, ws, r, b), axis=1) == ok_ref)
                .astype(jnp.float32)))
            res[f"{fmt}_ms"] = device_time(fn, x, ws, r, b, iters=iters,
                                           repeats=3) * 1e3
            res[f"{fmt}_agree"] = agree
            res[f"{fmt}_bytes_ratio"] = round(
                bf16_bytes / (ws.size * ws.dtype.itemsize), 3)
            line += f" | {fmt} {res[f'{fmt}_ms']:8.4f}" \
                    + ("!" if agree < 0.99 else "")
        best = min(ARMS, key=lambda a: res[a + "_ms"])
        line += f"  ({res['xla_ms'] / res[best + '_ms']:.3f}x best={best})"
        print(line)
    except Exception as e:
        print(f"   {name:5s} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        res["error"] = f"{type(e).__name__}"
    return res


def _chain(mm_plain, mm_gelu):
    """Depth-scan: qkv → proj(on the first C cols) → fc1(gelu) → fc2."""

    def fn(xx, ws, cc):
        def body(carry, layer):
            (wq, wp, w1, w2), ((rq, bq), (rp, bp), (r1, b1), (r2, b2)) = layer
            c = carry.shape[1]
            a = mm_plain(carry, wq, rq, bq)
            p = mm_plain(a[:, :c], wp, rp, bp)
            f = mm_gelu(p, w1, r1, b1)
            return mm_plain(f, w2, r2, b2), ()

        out, _ = jax.lax.scan(body, xx, (ws, cc))
        return out

    return fn


def run_depth_chain(m, rng, iters):
    kx, *kls = jax.random.split(rng, 1 + DEPTH)
    c = DEIT_S_GEMMS[0][1]
    x = jax.random.normal(kx, (m, c), jnp.float32).astype(jnp.bfloat16)
    layers = []
    for kl in kls:
        ks = jax.random.split(kl, len(DEIT_S_GEMMS))
        layers.append([_consts(kg, k, n)
                       for kg, (_, k, n, _) in zip(ks, DEIT_S_GEMMS)])
    stk = lambda f: jnp.stack([f(l) for l in layers])
    consts = tuple(
        (stk(lambda l, i=i: l[i][1]), stk(lambda l, i=i: l[i][2]))
        for i in range(4)
    )
    res = {}
    xla_fn = jax.jit(_chain(
        lambda *a: wstream_ref(*a),
        lambda *a: wstream_ref(*a, gelu=True),
    ))
    # baseline streams bf16 weights (what wonly serves), not int8 codes
    ws_bf16 = tuple(stk(lambda l, i=i: l[i][0].astype(jnp.bfloat16))
                    for i in range(4))
    try:
        ref_arg = jnp.argmax(xla_fn(x, ws_bf16, consts), axis=1)
        res["xla_ms"] = device_time(xla_fn, x, ws_bf16, consts, iters=iters,
                                    repeats=3) * 1e3
        line = f"   depth-{DEPTH} chain M={m}: xla {res['xla_ms']:8.4f}"
        for fmt in ARMS:
            ws = tuple(stk(lambda l, i=i: PACK[fmt](l[i][0]))
                       for i in range(4))
            fn = jax.jit(_chain(
                lambda *a, fmt=fmt: wstream_matmul(
                    *a, w_format=fmt, interpret=INTERPRET),
                lambda *a, fmt=fmt: wstream_matmul(
                    *a, w_format=fmt, gelu=True, interpret=INTERPRET),
            ))
            agree = float(jnp.mean(
                (jnp.argmax(fn(x, ws, consts), axis=1) == ref_arg)
                .astype(jnp.float32)))
            res[f"{fmt}_ms"] = device_time(fn, x, ws, consts, iters=iters,
                                           repeats=3) * 1e3
            res[f"{fmt}_agree"] = agree
            line += f" | {fmt} {res[f'{fmt}_ms']:8.4f}" \
                    + ("!" if agree < 0.99 else "")
        best = min(ARMS, key=lambda a: res[a + "_ms"])
        res["best"] = best
        res["best_vs_xla"] = round(res["xla_ms"] / res[best + "_ms"], 4)
        line += f"  ({res['best_vs_xla']}x best={best})"
        print(line)
    except Exception as e:
        print(f"   depth chain FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        res["error"] = f"{type(e).__name__}"
    return res


def main():
    global INTERPRET
    if not INTERPRET:
        from p2vit_tpu.profiling import require_tpu

        require_tpu()
    on_accel = jax.devices()[0].platform != "cpu"
    if not on_accel:
        INTERPRET = True  # pallas_call can't lower on CPU; smoke via twin
    print(f"== wstream_bench platform={jax.devices()[0].platform}")
    rng = jax.random.PRNGKey(0)
    res = {}
    ms = (197, 1576) if on_accel else (8,)
    for m in ms:
        gemm_iters = (3000 if m == 197 else 800) if on_accel else 1
        chain_iters = (300 if m == 197 else 80) if on_accel else 1
        print(f"-- DeiT-S GEMMs at M={m} (xla = today's weight-only arm)")
        ks = jax.random.split(jax.random.fold_in(rng, m), 6)
        for i, (name, k, n, gelu) in enumerate(DEIT_S_GEMMS):
            res[f"{name}@m{m}"] = run_gemm(name, m, k, n, gelu, ks[i],
                                           gemm_iters)
        # big-K control (deit_base fc2 width): full packing ratios
        res[f"fc2_b@m{m}"] = run_gemm("fc2_b", m, 3072, 768, False, ks[4],
                                      gemm_iters)
        res[f"chain@m{m}"] = run_depth_chain(m, ks[5], chain_iters)
    print("\n" + json.dumps(
        {k: {kk: (round(v, 4) if isinstance(v, float) else v)
             for kk, v in d.items()} for k, d in res.items()}))


if __name__ == "__main__":
    main()
