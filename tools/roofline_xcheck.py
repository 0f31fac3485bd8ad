"""Independent synthetic cross-check of the serving roofline terms.

VERDICT round-3 item 3: the measured-vs-ceiling table (BENCH.md, built by
tools/ceiling_bench.py) derives its MXU and VPU-chain terms from e2e depth
sweeps + differential standalone pairs — both sides of "measured ≈ ceiling"
come from one methodology. This tool measures the same two terms from the
OTHER side, with none of that machinery:

  A. MXU term — marginal in-stream cost of each serving matmul shape: an
     unrolled chain of k raw int8 matmuls (raw_store epilogue: same dot,
     truncation store, no requant chain) inside ONE jit, timed at two chain
     depths and differenced — so fixed dispatch/fetch cost cancels and
     inter-kernel DMA overlaps exactly as in the real pipeline. Attention
     dots use XLA batched int8 dot_general at the kernel's real padded
     shapes (224 rows, head_dim lanes).
  B. LIS chain term — a standalone Pallas kernel whose body applies the
     REAL _lis_from_scores chain (shared verbatim with the serving kernels)
     R times on VMEM-resident scores, chained by a cheap requant-back;
     (t(R=3) − t(R=1))/2 is the pure in-VMEM VPU cost of one application,
     zero DMA in the margin.
  C. res+int-LN chain term — same construction around ln_mn_chain +
     residual add + requant (the matmul_ln epilogue's VPU work).

VERDICT round-3 item 4 (DeiT-T +16.4% residual) — the untested counters,
each as one A/B:

  D1. MXU lane padding at C=192: marginal square-matmul chain at C=192 vs
      C=256 — the padding hypothesis predicts equal times (both run
      256-lane tiles), i.e. the 192-shape achieves ~56% of the 256-shape's
      MAC rate.
  D2. Elementwise lane waste: the requant chain on (M,192) vs the SAME
      element count laid out (1.5M,128) — the win of a row-folded layout
      for pure elementwise work.
  D3. Per-row LN fixed costs: the int-LN chain on (M,192) vs (M/2,384) —
      same elements, half the rows.
  D4. The fold relayout itself: a kernel that just loads (M,192) and
      stores (1.5M,128) — what a real folded serving layout would pay at
      every fold/unfold boundary (if Mosaic lowers it at all).

Usage: python tools/roofline_xcheck.py [deit_small] [deit_tiny] [deit_base]
(default: deit_small deit_tiny). Run from the repo root, on the real chip.
``--smoke`` runs tiny shapes in Pallas interpret mode on CPU (logic/shape
validation only; the timings are meaningless there).
"""

from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p2vit_tpu.models import VIT_ZOO
from p2vit_tpu.ops.attention_lis import _lis_from_scores
from tools import _zoo
from p2vit_tpu.ops.intln import ln_mn_chain
from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant
from p2vit_tpu.profiling import device_time_ms

# the additive-model terms the round-3 table used (BENCH.md §"Measured vs
# ceiling", 2026-08-17) — printed next to the independent measurements
BENCH_R3_TERMS = {
    "deit_tiny": {"mxu": 0.268, "lis": 0.327, "resln2x": 0.450,
                  "layer_meas": 1.578, "batch": 256},
    "deit_small": {"mxu": 0.976, "lis": 0.672, "resln2x": 0.610,
                   "layer_meas": 2.784, "batch": 256},
    "deit_base": {"mxu": 1.856, "lis": 0.691, "resln2x": 0.690,
                  "layer_meas": 3.683, "batch": 128},
}
N_PAD = 224  # the attention kernels' row padding (ops/attention_lis.py)
INTERPRET = False  # set by --smoke: Pallas interpret mode (CPU validation)


def _i8(key, shape):
    return jax.random.randint(key, shape, -128, 128, jnp.int8)


def marginal_ms(make_chain, x, ks=(4, 12), iters=30):
    """(t(k2)−t(k1))/(k2−k1): per-application in-stream cost, fixed costs
    cancelled. make_chain(k) -> jittable fn(x)."""
    ts = [device_time_ms(make_chain(k), x, iters=iters) for k in ks]
    return (ts[1] - ts[0]) / (ks[1] - ks[0]), ts


# --------------------------------------------------------------------------
# A. MXU term: marginal raw-matmul chains at serving shapes
# --------------------------------------------------------------------------


def mxu_probe(name, cfg, batch):
    c, hid, heads, d = (cfg.embed_dim, cfg.hidden_dim, cfg.num_heads,
                        cfg.head_dim)
    m = batch * cfg.seq_len
    key = jax.random.PRNGKey(0)
    w_qkv = _i8(key, (3 * c, c))
    w_proj = _i8(key, (c, c))
    w_fc1 = _i8(key, (hid, c))
    w_fc2 = _i8(key, (c, hid))
    r = {}

    def mm(h, w):
        n = w.shape[0]
        return int8_matmul_requant(h, w, jnp.ones((n,), jnp.float32),
                                   jnp.zeros((n,), jnp.float32),
                                   raw_store=True, interpret=INTERPRET)

    def chain_qkv(k):
        def f(h):
            for _ in range(k):
                h = mm(h, w_qkv)[:, :c]
            return h
        return f

    def chain_proj(k):
        def f(h):
            for _ in range(k):
                h = mm(h, w_proj)
            return h
        return f

    def chain_ffn(k):
        def f(h):
            for _ in range(k):
                h = mm(mm(h, w_fc1), w_fc2)
            return h
        return f

    x = _i8(key, (m, c))
    for nm, mk in (("qkv", chain_qkv), ("proj", chain_proj),
                   ("ffn", chain_ffn)):
        r[nm], _ = marginal_ms(mk, x)
        print(f"  mxu {nm:5s} marginal {r[nm]:.4f} ms")

    # attention dots at the kernel's REAL padded shapes: (B·H, 224, d)
    g = batch * heads
    kq = _i8(jax.random.PRNGKey(1), (g, N_PAD, d))
    vv = _i8(jax.random.PRNGKey(2), (g, N_PAD, d))

    def chain_attn(k):
        def f(q):
            for _ in range(k):
                s = jax.lax.dot_general(
                    q, kq, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                ).astype(jnp.int8)
                q = jax.lax.dot_general(
                    s, vv, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT,
                ).astype(jnp.int8)
            return q
        return f

    r["attn"], _ = marginal_ms(chain_attn, kq, iters=20)
    print(f"  mxu attn  marginal {r['attn']:.4f} ms (qk^T+av, XLA int8)")
    r["sum"] = round(r["qkv"] + r["proj"] + r["ffn"] + r["attn"], 4)
    want = BENCH_R3_TERMS.get(name, {}).get("mxu")
    print(f"  A. MXU per-layer: independent {r['sum']:.3f} ms "
          f"vs additive-model term {want} ms")
    return r


# --------------------------------------------------------------------------
# B. LIS chain: in-VMEM marginal via an R-fold kernel
# --------------------------------------------------------------------------


def _lis_kernel(x_ref, o_ref, *, reps, n_valid, lis_bits):
    scores = x_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    s_attn = jnp.float32(2.0 ** -4)
    for _ in range(reps):
        pot = _lis_from_scores(scores, s_attn, col, n_valid, lis_bits)
        # cheap deterministic requant-back so application R+1 has real,
        # in-range codes to chew on (part of the margin; 4 VPU ops vs the
        # chain's dozens)
        scores = jnp.clip(jnp.round(pot * 255.0) - 128.0, -128.0, 127.0)
    o_ref[:] = scores.astype(jnp.int8)


def lis_probe(name, cfg, batch, gb=8):
    g = batch * cfg.num_heads
    g += (-g) % gb
    x = _i8(jax.random.PRNGKey(3), (g, N_PAD, N_PAD))

    def make(reps):
        call = pl.pallas_call(
            functools.partial(_lis_kernel, reps=reps,
                              n_valid=cfg.seq_len, lis_bits=4),
            grid=(g // gb,),
            in_specs=[pl.BlockSpec((gb, N_PAD, N_PAD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((gb, N_PAD, N_PAD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, N_PAD, N_PAD), jnp.int8),
            interpret=INTERPRET,
        )
        return lambda xx: call(xx)

    per_app, ts = marginal_ms(make, x, ks=(1, 3), iters=30)
    want = BENCH_R3_TERMS.get(name, {}).get("lis")
    print(f"  B. LIS chain: in-VMEM marginal {per_app:.4f} ms/layer "
          f"(R=1 {ts[0]:.3f} → R=3 {ts[1]:.3f}) vs in-situ slope-delta "
          f"{want} ms")
    return {"per_app": round(per_app, 4), "t_r1": round(ts[0], 4),
            "t_r3": round(ts[1], 4)}


# --------------------------------------------------------------------------
# C. residual + int-LN chain: in-VMEM marginal
# --------------------------------------------------------------------------


def _resln_kernel(x_ref, res_ref, o_ref, *, reps, c_true):
    x = x_ref[:].astype(jnp.float32)
    res = res_ref[:].astype(jnp.float32)
    w_os = jnp.ones_like(x[:1]) * 50.0  # ln_w/out_scale, typical magnitude
    b_os = jnp.zeros_like(x[:1])
    for _ in range(reps):
        xr = x + res  # residual add on codes (s_a == s_b fast path)
        sx = jnp.sum(xr, axis=1, keepdims=True)
        sxx = jnp.sum(xr * xr, axis=1, keepdims=True)
        y = ln_mn_chain(xr, sx, sxx, jnp.float32(0.02), c_true, w_os, b_os)
        x = jnp.clip(y, -128.0, 127.0)
    o_ref[:] = x.astype(jnp.int8)


def resln_probe(name, cfg, batch, block_m=512, c_override=None,
                label="C. res+int-LN", quiet=False):
    c = c_override or cfg.embed_dim
    cpad = -(-c // 128) * 128
    m = batch * cfg.seq_len
    m += (-m) % block_m
    x = _i8(jax.random.PRNGKey(4), (m, cpad))
    res = _i8(jax.random.PRNGKey(5), (m, cpad))

    def make(reps):
        call = pl.pallas_call(
            functools.partial(_resln_kernel, reps=reps, c_true=float(c)),
            grid=(m // block_m,),
            in_specs=[pl.BlockSpec((block_m, cpad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((block_m, cpad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, cpad), jnp.int8),
            interpret=INTERPRET,
        )
        return lambda xx: call(xx, res)

    per_app, ts = marginal_ms(make, x, ks=(1, 3), iters=30)
    if not quiet:
        want = BENCH_R3_TERMS.get(name, {}).get("resln2x")
        print(f"  {label}: in-VMEM marginal {per_app:.4f} ms x2 = "
              f"{2 * per_app:.4f} vs differential-pair 2x term {want} ms")
    return {"per_app": round(per_app, 4), "rows": m, "c": c}


# --------------------------------------------------------------------------
# D. DeiT-T (C=192) lane experiments
# --------------------------------------------------------------------------


def _ew_kernel(x_ref, o_ref, *, reps):
    # the requant chain as pure elementwise work: mul, add, round, clip
    x = x_ref[:].astype(jnp.float32)
    for _ in range(reps):
        x = jnp.clip(jnp.round(x * 0.501 + 0.25), -128.0, 127.0)
    o_ref[:] = x.astype(jnp.int8)


def _ew_marginal(shape, block_m, reps_pair=(2, 8)):
    m, c = shape
    x = _i8(jax.random.PRNGKey(6), (m, c))

    def make(reps):
        call = pl.pallas_call(
            functools.partial(_ew_kernel, reps=reps),
            grid=(m // block_m,),
            in_specs=[pl.BlockSpec((block_m, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, c), jnp.int8),
            interpret=INTERPRET,
        )
        return lambda xx: call(xx)

    return marginal_ms(make, x, ks=reps_pair, iters=30)


def _fold_kernel(x_ref, o_ref):
    # (bm, 192) -> (bm*3/2, 128): the relayout a folded serving layout pays
    o_ref[:] = x_ref[:].reshape(o_ref.shape)


def deit_t_probes(cfg, batch):
    out = {}
    m = batch * cfg.seq_len
    m += (-m) % 512
    key = jax.random.PRNGKey(7)

    # D1: MXU lane padding — square-chain marginal at C=192 vs C=256
    def sq_chain(c):
        w = _i8(key, (c, c))

        def make(k):
            def f(h):
                for _ in range(k):
                    h = int8_matmul_requant(h, w, jnp.ones((c,), jnp.float32),
                                            jnp.zeros((c,), jnp.float32),
                                            raw_store=True,
                                            interpret=INTERPRET)
                return h
            return f
        return make, _i8(key, (m, c))

    for c in (192, 256):
        mk, x = sq_chain(c)
        t, _ = marginal_ms(mk, x)
        out[f"d1_mm{c}_ms"] = round(t, 4)
        out[f"d1_mm{c}_tops"] = round(2 * m * c * c / (t * 1e-3) / 1e12, 1)
    print(f"  D1 MXU pad: (m,192)^2 {out['d1_mm192_ms']} ms "
          f"({out['d1_mm192_tops']} Tops) vs (m,256)^2 {out['d1_mm256_ms']} "
          f"ms ({out['d1_mm256_tops']} Tops) — padding predicts equal times")

    # D2: elementwise lane waste — same elements, (M,192) vs (1.5M,128)
    t192, _ = _ew_marginal((m, 192), 512)
    t128, _ = _ew_marginal((3 * m // 2, 128), 768)
    out["d2_ew192_ms"] = round(t192, 4)
    out["d2_ew128_ms"] = round(t128, 4)
    print(f"  D2 elementwise: (M,192) {t192:.4f} ms vs folded (1.5M,128) "
          f"{t128:.4f} ms — {100 * (t192 - t128) / max(t192, 1e-9):.1f}% "
          f"reclaimable on pure elementwise")

    # D3: per-row LN fixed costs — same elements, half the rows
    a = resln_probe("deit_tiny", cfg, batch, c_override=192, quiet=True)
    b = resln_probe("deit_tiny", cfg, batch // 2, c_override=384, quiet=True)
    out["d3_ln192_ms"] = a["per_app"]
    out["d3_ln384_half_rows_ms"] = b["per_app"]
    print(f"  D3 LN rows: (M,192) {a['per_app']} ms vs (M/2,384) "
          f"{b['per_app']} ms — per-row fixed-cost share")

    # D4: the fold relayout cost (or Mosaic refusal — also an answer)
    try:
        bm = 256
        x = _i8(key, (m, 192))
        call = pl.pallas_call(
            _fold_kernel,
            grid=(m // bm,),
            in_specs=[pl.BlockSpec((bm, 192), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3 * bm // 2, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * m // 2, 128), jnp.int8),
            interpret=INTERPRET,
        )
        t = device_time_ms(lambda xx: call(xx), x, iters=50)
        out["d4_fold_ms"] = round(t, 4)
        print(f"  D4 fold relayout (M,192)->(1.5M,128): {t:.4f} ms/pass")
    except Exception as e:
        out["d4_fold_ms"] = f"no-lower: {type(e).__name__}"
        print(f"  D4 fold relayout: Mosaic refused ({type(e).__name__}) — "
              "a folded layout would need XLA-side reshapes")
    return out


def main():
    global INTERPRET
    args = [a for a in sys.argv[1:] if a != "--smoke"]
    if "--smoke" in sys.argv[1:]:
        INTERPRET = True
        for v in BENCH_R3_TERMS.values():
            v["batch"] = 2
    else:
        from p2vit_tpu.profiling import require_tpu

        require_tpu()  # fail fast on a dead tunnel
    names = args or ["deit_small", "deit_tiny"]
    results = {}
    for arg in names:
        # accept both short aliases and full zoo names (the queue scripts
        # pass full names to the sibling tools)
        name = _zoo.resolve(arg)
        short = _zoo.short(name)
        cfg = VIT_ZOO[name]
        batch = BENCH_R3_TERMS.get(short, {}).get("batch", 128)
        print(f"\n== {short} batch={batch} C={cfg.embed_dim} "
              f"platform={jax.devices()[0].platform}")
        r = {"batch": batch}
        r["mxu"] = mxu_probe(short, cfg, batch)
        r["lis"] = lis_probe(short, cfg, batch)
        r["resln"] = resln_probe(short, cfg, batch)
        if short == "deit_tiny":
            r["deit_t"] = deit_t_probes(cfg, batch)
        results[short] = r
    print("\n" + json.dumps(results))


if __name__ == "__main__":
    main()
