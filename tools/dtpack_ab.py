"""DeiT-T lane-padding A/B: contraction-layout variants on chip.

VERDICT r3 item 4: DeiT-T measures +16.4% above its additive ceiling, and
+0.138 ms/layer of that is itemized as lane-padding MACs — C=192 pads to
256 lanes in the projection dots and head_dim 64 pads to 128 in the
attention dots, forced by the int8 (32, 128) tile. The verdict asks for a
real A/B of layouts that fill the lanes before calling it unreclaimable.

Two families of candidate layouts exist:

1. **Head/block packing** (pack 2 heads x 64 = 128 lanes): provably a
   wash BEFORE measuring — packing per-head dots into one dot requires a
   block-diagonal second operand, and the padded-MAC count is *exactly*
   equal: per-head q@kT costs NR x 128pad x Npad each; a 2-head pack costs
   NR x 128 x 2 Npad — identical (ditto attn@v: NR x Npad x 128pad x 2 vs
   NR x 2 Npad x 128). Zero-pad lanes and zero blocks are the same MACs.
   Not benchmarked; recorded here so the dead-end has a reason attached.

2. **Contraction-on-sublanes** (this tool): the MAC waste comes from the
   contraction dim K living in the LANE axis of an operand, where int8
   pads to a 128-multiple (192->256: +33%, 64->128: +100%). If K lives in
   the SUBLANE axis it pads to a 32-multiple (192->192, 64->64: zero pad).
   dot_general can express every placement; whether Mosaic lowers a
   dim-0 contraction natively at full MXU rate — or inserts the very
   relayout transpose we're trying to avoid, or refuses — is empirical.

Arms per GEMM (all inside minimal Pallas kernels, truncation-store int8
epilogue so only the dot varies; operands pre-laid-out, as a transposed
serving dataflow would produce them natively):
  lanes : x (M,K) . w (N,K)   dims ((1,),(1,))   — serving today
  wsub  : x (M,K) . w (K,N)   dims ((1,),(0,))   — weight K on sublanes
  xsub  : x (K,M) . w (K,N)   dims ((0,),(0,))   — both K on sublanes

GEMMs at DeiT-T b=256 serving shapes (M = B*Npad = 256*224):
  qkv   M x 192 x 576    (K=192 pads +33% in `lanes`)
  proj  M x 192 x 192
  fc1   M x 192 x 768
  fc2   M x 768 x 192    (K=768 = 6*128: control, arms should tie)
  qk    (G,224,64)x(G,224,64)->(G,224,224)  per-head, K=64 (+100%)
  av    (G,200,224)x(G,224,64) f32          K=224->256 in `lanes`

Every arm's int8 output checksum must match `lanes` exactly (integer math
is layout-invariant); a mismatch fails the arm. Compile failures are
caught and reported per arm (interpret-mode tests cannot catch Mosaic
lowering refusals — BENCH.md round-2b).

Usage: python tools/dtpack_ab.py [batch]   (repo root, real chip)
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p2vit_tpu.profiling import device_time

INTERPRET = False  # tests flip this to run the same arms on CPU


def _dot_kernel(a_ref, b_ref, o_ref, *, dims, out_dtype):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[:] = acc.astype(out_dtype)  # truncation store: epilogue-constant


def gemm_arm(a, b, dims, block_m=512):
    """(M-blocked) Pallas dot with contraction placement `dims`.

    a carries M on the NON-contracted axis; the grid tiles M so VMEM holds
    one (block_m, K) / (K, block_m) panel plus the full weight.
    """
    (ca,), (cb,) = dims
    m = a.shape[1 - ca]
    n = b.shape[1 - cb]
    k = a.shape[ca]
    assert m % block_m == 0, (m, block_m)
    a_spec = (
        pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if ca == 1
        else pl.BlockSpec((k, block_m), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    )
    b_spec = pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dot_kernel, dims=dims, out_dtype=jnp.int8),
        grid=(m // block_m,),
        in_specs=[a_spec, b_spec],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        interpret=INTERPRET,
    )(a, b)


def _bdot_kernel(a_ref, b_ref, o_ref, *, dims, out_dtype):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(dims, ((0,), (0,))),
        preferred_element_type=jnp.int32 if out_dtype == jnp.int8
        else jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[:] = acc.astype(out_dtype)


def batched_arm(a, b, dims, out_rows, out_cols, g_step=8,
                out_dtype=jnp.int8):
    """Head-shaped batched dot: grid over the G (batch*head) axis."""
    g = a.shape[0]
    assert g % g_step == 0
    spec = lambda arr: pl.BlockSpec((g_step,) + arr.shape[1:],
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bdot_kernel, dims=dims, out_dtype=out_dtype),
        grid=(g // g_step,),
        in_specs=[spec(a), spec(b)],
        out_specs=pl.BlockSpec((g_step, out_rows, out_cols),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, out_rows, out_cols), out_dtype),
        interpret=INTERPRET,
    )(a, b)


def _time(fn, a, b, iters=100):
    return device_time(lambda aa, bb: fn(aa, bb), a, b, iters=iters,
                       repeats=3) * 1e3


def _checksum(out):
    # int8 wraps identically across arms iff the int32 accums are equal.
    # Modulo in PYTHON after the fetch: 2**31 overflows int32 if it gets
    # traced into the jitted mod (caught by the interpret-mode main smoke).
    return int(jnp.sum(out.astype(jnp.int32))) % (2**31)


def run_gemm_family(name, m, k, n, rng):
    kx, kw = jax.random.split(rng)
    x = jax.random.randint(kx, (m, k), -128, 128, jnp.int8)
    w = jax.random.randint(kw, (n, k), -128, 128, jnp.int8)
    x_t = x.T.copy()  # materialize the transposed layouts host-side:
    w_t = w.T.copy()  # a dt-pack dataflow would produce these natively
    arms = {
        "lanes": (lambda a, b: gemm_arm(a, b, ((1,), (1,))), x, w),
        "wsub": (lambda a, b: gemm_arm(a, b, ((1,), (0,))), x, w_t),
        "xsub": (lambda a, b: gemm_arm(a, b, ((0,), (0,))), x_t, w_t),
    }
    print(f"-- {name}: M={m} K={k} N={n}")
    ref_sum = None
    res = {}
    for arm, (fn, a, b) in arms.items():
        try:
            out = fn(a, b)
            # xsub/wsub outputs are (M, N) like lanes — same checksum
            csum = _checksum(out)
            if ref_sum is None:
                ref_sum = csum
            ok = "ok" if csum == ref_sum else f"MISMATCH({csum}!={ref_sum})"
            ms = _time(fn, a, b)
            res[arm] = ms
            print(f"   {arm:6s} {ms:8.4f} ms  [{ok}]")
        except Exception as e:
            print(f"   {arm:6s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
    if "lanes" in res:
        for arm in ("wsub", "xsub"):
            if arm in res:
                print(f"   {arm} vs lanes: {res['lanes'] / res[arm]:.3f}x")
    return res


def run_attention_family(g, nfull, nr, d, rng):
    kq, kk, kv, ka = jax.random.split(rng, 4)
    q = jax.random.randint(kq, (g, nfull, d), -128, 128, jnp.int8)
    k = jax.random.randint(kk, (g, nfull, d), -128, 128, jnp.int8)
    v = jax.random.randint(kv, (g, nfull, d), -128, 128, jnp.int8)
    attn = jnp.round(
        jax.random.uniform(ka, (g, nr, nfull), jnp.float32) * 8
    )  # small ints in f32, like the PoT softmax codes — exact in f32 MACs
    q_t = jnp.transpose(q, (0, 2, 1)).copy()
    k_t = jnp.transpose(k, (0, 2, 1)).copy()
    attn_t = jnp.transpose(attn, (0, 2, 1)).copy()

    print(f"-- qk^T: G={g} N={nfull} d={d}  (per-head scores)")
    arms = {
        "lanes": (lambda a, b: batched_arm(a, b, ((2,), (2,)), nfull, nfull),
                  q, k),
        # ksub: the standard untransposed A@B form — only k needs the
        # transposed store, not the whole dataflow
        "ksub": (lambda a, b: batched_arm(a, b, ((2,), (1,)), nfull, nfull),
                 q, k_t),
        "xsub": (lambda a, b: batched_arm(a, b, ((1,), (1,)), nfull, nfull),
                 q_t, k_t),
    }
    res = {}
    ref_sum = None
    for arm, (fn, a, b) in arms.items():
        try:
            out = fn(a, b)
            csum = _checksum(out)
            if ref_sum is None:
                ref_sum = csum
            ok = "ok" if csum == ref_sum else f"MISMATCH({csum}!={ref_sum})"
            ms = _time(fn, a, b)
            res[arm] = ms
            print(f"   {arm:6s} {ms:8.4f} ms  [{ok}]")
        except Exception as e:
            print(f"   {arm:6s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
    if "lanes" in res:
        for arm in ("ksub", "xsub"):
            if arm in res:
                print(f"   {arm} vs lanes: {res['lanes'] / res[arm]:.3f}x")

    print(f"-- attn@v: G={g} NR={nr} N={nfull} d={d}  (f32 MACs, as served)")
    vf = v.astype(jnp.float32)
    arms2 = {
        "lanes": (lambda a, b: batched_arm(a, b, ((2,), (1,)), nr, d,
                                           out_dtype=jnp.float32),
                  attn, vf),
        "xsub": (lambda a, b: batched_arm(a, b, ((1,), (1,)), nr, d,
                                          out_dtype=jnp.float32),
                 attn_t, vf),
    }
    res2 = {}
    ref_sum = None
    for arm, (fn, a, b) in arms2.items():
        try:
            out = fn(a, b)
            # MACs are exact small integers in f32; checksum in int32 so
            # float summation order can't differ across layouts (modulo in
            # Python — see _checksum)
            csum = int(jnp.sum(out.astype(jnp.int32))) % (2**31)
            if ref_sum is None:
                ref_sum = csum
            ok = "ok" if csum == ref_sum else f"MISMATCH({csum}!={ref_sum})"
            ms = _time(fn, a, b)
            res2[arm] = ms
            print(f"   {arm:6s} {ms:8.4f} ms  [{ok}]")
        except Exception as e:
            print(f"   {arm:6s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
    if len(res2) == 2:
        print(f"   xsub vs lanes: {res2['lanes'] / res2['xsub']:.3f}x")
    return res, res2


def _folded_ln_kernel(s1_ref, codes_ref, vec_ref, o_ref, *, c_true):
    """int-LN on 2-token folded rows: (rows, 2C) where lanes [0:C) are
    token 2i and [C:2C) token 2i+1. Same ln_mn_chain math per token,
    bitwise (test_dtpack_ab pins it): the per-row stats become two
    masked segment reductions, and the (rows, 1) mean/std broadcast
    becomes a seg-mask combine. At C=192 the fold fills 384 = 3 full
    lane tiles instead of running 192-of-256 (25% dead lanes) — the
    folded arm measures the reclaimable share of DeiT-T's per-row VPU
    residual (BENCH.md measured-vs-ceiling)."""
    from p2vit_tpu.ops.fastmath import exp2i, floor_log2i

    s1 = s1_ref[0, 0]
    mask2 = vec_ref[0, :][None, :]
    w_os2 = vec_ref[1, :][None, :]
    b_os2 = vec_ref[2, :][None, :]
    ratio2 = vec_ref[3, :][None, :]
    seg_a = vec_ref[4, :][None, :]  # 1.0 on lanes [0:C), else 0
    seg_b = 1.0 - seg_a

    x = codes_ref[:].astype(jnp.float32) * mask2
    sx_a = jnp.sum(x * seg_a, axis=1, keepdims=True)
    sx_b = jnp.sum(x * seg_b, axis=1, keepdims=True)
    sxx_a = jnp.sum(x * x * seg_a, axis=1, keepdims=True)
    sxx_b = jnp.sum(x * x * seg_b, axis=1, keepdims=True)
    mean_a = (sx_a / c_true) * s1
    mean_b = (sx_b / c_true) * s1
    std_a = (s1 / c_true) * jnp.sqrt(c_true * sxx_a - sx_a * sx_a)
    std_b = (s1 / c_true) * jnp.sqrt(c_true * sxx_b - sx_b * sx_b)
    meanv = mean_a * seg_a + mean_b * seg_b
    stdv = std_a * seg_a + std_b * seg_b
    a = (s1 / stdv) * w_os2
    a_sign = jnp.sign(a)
    a_abs = jnp.abs(a)
    n = jnp.clip(7 - floor_log2i(a_abs), 0, 31)
    p2n = exp2i(n)
    mm = jnp.clip(jnp.floor(a_abs * p2n), 0.0, 255.0)
    bb = jnp.round((b_os2 - (meanv / stdv) * w_os2) * p2n)
    y = jnp.round((a_sign * mm * x + bb) * exp2i(-n))
    o_ref[:] = jnp.clip(jnp.round(y * ratio2), -128, 127).astype(jnp.int8)


def folded_int_ln(codes2, ptf_mask, s1, ln_w, ln_b, out_scale, ratio,
                  c_true, block_m=256):
    """codes2: (M/2, 2C) int8, the 2-token row-fold of a (M, C) panel."""
    m2, c2 = codes2.shape
    assert c2 == 2 * c_true and c2 % 128 == 0 and m2 % block_m == 0
    osc = jnp.maximum(jnp.asarray(out_scale, jnp.float32), 1e-30)
    tile2 = lambda v: jnp.tile(
        jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c_true,)), 2)
    seg_a = jnp.concatenate([jnp.ones(c_true), jnp.zeros(c_true)]
                            ).astype(jnp.float32)
    vecs = jnp.stack([
        tile2(ptf_mask),
        tile2(jnp.asarray(ln_w, jnp.float32) / osc),
        tile2(jnp.asarray(ln_b, jnp.float32) / osc),
        tile2(ratio),
        seg_a,
    ])
    s1a = jnp.asarray(s1, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_folded_ln_kernel, c_true=float(c_true)),
        grid=(m2 // block_m,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, c2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m2, c2), jnp.int8),
        interpret=INTERPRET,
    )(s1a, codes2, vecs)


def run_ln_fold(m, c, rng):
    """Standalone folded-LN A/B + the relayout tax that integration pays.

    The folded arm's win is an UPPER bound: a (M, C) int8 array is
    (32, 128)-tiled in HBM, so the (M/2, 2C) view is a real relayout,
    measured separately as `fold_tax` (XLA reshape round trip). Integrated
    win ≈ fold gain − fold_tax (unless Mosaic hides the DMA)."""
    from p2vit_tpu.ops.intln import int_ln_requant

    kc, kw, kb = jax.random.split(rng, 3)
    codes = jax.random.randint(kc, (m, c), -128, 128, jnp.int8)
    ptf_mask = jnp.ones((c,), jnp.float32)
    s1 = jnp.float32(0.01)
    ln_w = jax.random.normal(kw, (c,), jnp.float32)
    ln_b = jax.random.normal(kb, (c,), jnp.float32) * 0.1
    out_scale = jnp.full((c,), 0.02, jnp.float32)
    ratio = jnp.ones((c,), jnp.float32)

    print(f"-- int-LN row-fold: M={m} C={c} (folded: {m // 2} x {2 * c})")
    std_fn = lambda cd: int_ln_requant(cd, ptf_mask, s1, ln_w, ln_b,
                                       out_scale, ratio,
                                       interpret=INTERPRET)
    codes2 = codes.reshape(m // 2, 2 * c)
    fold_fn = lambda cd2: folded_int_ln(cd2, ptf_mask, s1, ln_w, ln_b,
                                        out_scale, ratio, c)
    ref = std_fn(codes)
    fold = fold_fn(codes2).reshape(m, c)
    ok = bool(jnp.array_equal(ref, fold))
    print(f"   parity (folded == standard, bitwise): {ok}")
    t_std = device_time(std_fn, codes, iters=100, repeats=3) * 1e3
    t_fold = device_time(fold_fn, codes2, iters=100, repeats=3) * 1e3
    # integrated arm: the (M, C) -> (M/2, 2C) relayout INSIDE the jit,
    # feeding the Pallas call — forces the physical retiling a consumer
    # of the standard (M, C) producer layout would pay
    t_int = device_time(
        lambda cd: fold_fn(cd.reshape(m // 2, 2 * c)), codes,
        iters=100, repeats=3) * 1e3
    print(f"   standard {t_std:8.4f} ms   folded {t_fold:8.4f} ms "
          f"({t_std / t_fold:.3f}x)   folded+relayout {t_int:8.4f} ms "
          f"({t_std / t_int:.3f}x integrated)")
    return t_std, t_fold, t_int


def run_prod_kernel_ab(name, m, k, n, rng, gelu=False):
    """Production-kernel pair: ops/matmul_int8.int8_matmul_requant with
    w_layout="nk" vs "kn" — the REAL requant epilogue included, so this
    times the shippable end state of a wsub win directly (the dot-level
    arms above isolate the cause). Bitwise equality enforced (the layouts
    are integer-identical; tests/test_serving.py pins it in interpret)."""
    from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant

    kx, kw, kr, kb = jax.random.split(rng, 4)
    x = jax.random.randint(kx, (m, k), -128, 128, jnp.int8)
    w = jax.random.randint(kw, (n, k), -128, 128, jnp.int8)
    w_t = w.T.copy()
    r = 2.0 ** jax.random.randint(kr, (n,), -12, -4).astype(jnp.float32)
    b = jax.random.normal(kb, (n,), jnp.float32)
    kw_args = {"gelu": gelu, "out_inv": 8.0 if gelu else 1.0,
               "interpret": INTERPRET}
    nk_fn = lambda a, ww: int8_matmul_requant(a, ww, r, b, **kw_args)
    kn_fn = lambda a, ww: int8_matmul_requant(a, ww, r, b, w_layout="kn",
                                              **kw_args)
    print(f"-- {name} [production kernel, requant epilogue]: "
          f"M={m} K={k} N={n} gelu={gelu}")
    try:
        ok = bool(jnp.array_equal(nk_fn(x, w), kn_fn(x, w_t)))
        print(f"   parity (kn == nk, bitwise): {ok}")
        t_nk = _time(nk_fn, x, w)
        t_kn = _time(kn_fn, x, w_t)
        print(f"   nk {t_nk:8.4f} ms   kn {t_kn:8.4f} ms "
              f"({t_nk / t_kn:.3f}x)")
        return t_nk, t_kn
    except Exception as e:
        print(f"   FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        return None


def main(batch=256):
    if not INTERPRET:
        from p2vit_tpu.profiling import require_tpu

        require_tpu()  # fail fast on a dead tunnel
    # shape contract of the fixed block sizes below (gemm block_m 512 with
    # m = batch*224; attention g_step 8 with g = batch*3; LN fold block 256
    # with m2 = batch*112) — all satisfied iff batch % 16 == 0
    if batch % 16:
        sys.exit(f"batch must be a multiple of 16 (got {batch}): the fixed "
                 "Pallas block sizes require it (see main docstring comment)")
    print(f"== dtpack_ab platform={jax.devices()[0].platform} batch={batch}")
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    m = batch * 224  # DeiT-T padded token rows as served
    run_gemm_family("qkv proj (K=192)", m, 192, 576, ks[0])
    run_gemm_family("attn out (K=192)", m, 192, 192, ks[1])
    run_gemm_family("fc1 (K=192)", m, 192, 768, ks[2])
    run_gemm_family("fc2 (K=768, control)", m, 768, 192, ks[3])
    # attention shapes: G = batch*heads at g=8 images/step equivalent
    run_attention_family(batch * 3, 224, 200, 64, ks[4])
    run_ln_fold(batch * 224, 192, ks[5])
    # shippable end state: the production kernel pair (real epilogue)
    run_prod_kernel_ab("prod qkv", m, 192, 576, ks[6])
    run_prod_kernel_ab("prod fc1", m, 192, 768, ks[7], gelu=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
