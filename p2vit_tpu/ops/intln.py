"""Pallas TPU kernel: integer LayerNorm on codes, fused end to end.

The serving pipeline's glue cost is dominated by the M·2⁻ᴺ integer LayerNorm
(quant/intops.py int_layernorm → serving.py _int_ln_codes): expressed in
jnp, XLA materializes several (tokens, C) f32 intermediates per LN — ~25
LNs per ViT forward. This kernel reads the int8 codes once, does the whole
row-statistics + M·2⁻ᴺ epilogue in VMEM, and writes int8 codes once:
HBM traffic drops from ~15 passes to 2.

Math is the code-domain QIntLayerNorm
(/root/reference/models/ptq/layers.py:294-337); the serving-side op order
(THE parity spec — every serving twin runs this exact chain, ln_mn_chain):

  w_os = w/out_scale ; b_os = b/out_scale     (hoisted constant vectors)
  x    = codes · ptf_mask                      (PTF shift alignment)
  mean = Σx/C · s1 ;  std = (s1/C)·√(C·Σx² − (Σx)²)
  A    = (s1/std)·w_os → sign; N = clip(7−⌊log2|A|⌋,0,31) via exponent
         field (exact); M = ⌊|A|·2^N⌋ clipped to 8 bit
  B    = round((b_os − (mean/std)·w_os) · 2^N)
  y    = round((sign·M·x + B) · 2^−N)          (exact PoT reciprocal)
  out  = clip(round(y·ratio))                  (int8 codes)

This deliberately differs from the simulation chain (quant/intops.py,
which keeps the torch-parallel per-element divides and jnp.log2) at
1-ulp knife edges for non-PoT scales; serving vs simulation is compared
statistically, serving twins bitwise.

Channel padding: inputs are zero-padded to a 128 multiple; padded lanes have
mask=0 so they contribute nothing to the row sums (the true channel count is
baked in statically), and their outputs are sliced off by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fastmath import exp2i, floor_log2i


def ln_mn_chain(x, sx, sxx, s1, c_true, w_os, b_os):
    """Shared M·2⁻ᴺ LN chain on PTF-aligned codes ``x`` with row sums given.

    One definition serves the Pallas kernels (here + ops/matmul_ln.py) and
    every jnp serving twin, so they cannot drift. Two VPU optimizations vs
    the naive transcription, both serving-side only (the simulation keeps
    the torch-parallel forms, quant/intops.py):

      * ``w_os`` = ln_w/out_scale and ``b_os`` = ln_b/out_scale arrive as
        PRECOMPUTED constant vectors — hoisting those divides out of the
        (rows, C) element grid removes the two most expensive per-element
        ops of the epilogue (f32 divide is multi-pass on the VPU).
      * N/2^N/2^-N via exponent extraction (exact; ops/fastmath.py), no
        log2/exp2 transcendentals.

    Returns y = round((sign(A)·M·x + B)·2^-N).
    """
    mean = (sx / c_true) * s1
    std = (s1 / c_true) * jnp.sqrt(c_true * sxx - sx * sx)
    a = (s1 / std) * w_os  # per-row divide only: std is (rows, 1)
    a_sign = jnp.sign(a)
    a_abs = jnp.abs(a)
    n = jnp.clip(7 - floor_log2i(a_abs), 0, 31)
    p2n = exp2i(n)
    m = jnp.clip(jnp.floor(a_abs * p2n), 0.0, 255.0)
    bb = jnp.round((b_os - (mean / std) * w_os) * p2n)
    return jnp.round((a_sign * m * x + bb) * exp2i(-n))


def _kernel(s1_ref, codes_ref, vec_ref, o_ref, *, c_true):
    s1 = s1_ref[0, 0]
    mask = vec_ref[0, :][None, :]
    w_os = vec_ref[1, :][None, :]
    b_os = vec_ref[2, :][None, :]
    ratio = vec_ref[3, :][None, :]

    x = codes_ref[:].astype(jnp.float32) * mask
    sx = jnp.sum(x, axis=1, keepdims=True)
    sxx = jnp.sum(x * x, axis=1, keepdims=True)
    y = ln_mn_chain(x, sx, sxx, s1, c_true, w_os, b_os)
    o_ref[:] = jnp.clip(jnp.round(y * ratio), -128, 127).astype(jnp.int8)


def _pad_to(a, axis, mult):
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def int_ln_requant(
    codes: jnp.ndarray,
    ptf_mask: jnp.ndarray,
    s1: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray,
    out_scale: jnp.ndarray,
    ratio: jnp.ndarray,
    block_m: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Integer LN on (M, C) int8 codes → int8 codes of the consumer node.

    Args:
      codes: (M, C) int8 producer codes.
      ptf_mask: (C,) f32, round(in_scale / in_scale.min()) ∈ {1,2,4,8}.
      s1: scalar f32, in_scale.min().
      ln_w/ln_b: (C,) LayerNorm affine.
      out_scale: (C,) f32 consumer scale (× any smoothquant channel scale).
      ratio: (C,) f32 post-LN code multiplier (norm2 smoothquant quirk; 1s
        otherwise).
    """
    m, c = codes.shape
    cp = _pad_to(codes, 1, 128)
    cpad = cp.shape[1]
    # The f32 row-stats temporaries cost ~27 B per block element of scoped
    # VMEM; cap block_m · cpad ≈ 512·768 so wide-channel layers (Swin's 4C
    # patch-merging LN, C=1536) stay under the 16 MB scoped-vmem limit.
    cap = max(128, (393216 // cpad) // 128 * 128)
    block_m = min(block_m, cap)
    if m % block_m:  # avoid the M pad copy + output slice when possible
        for cand in (512, 384, 256, 128):
            if cand <= cap and m % cand == 0:
                block_m = cand
                break
    cp = _pad_to(cp, 0, block_m)
    mp = cp.shape[0]
    # hoist the /out_scale divides out of the per-element chain (ln_mn_chain);
    # same 1e-30 dead-channel floor as the other two LN entry points sharing
    # this chain (matmul_ln.py, layer_fused.py)
    osc = jnp.maximum(jnp.asarray(out_scale, jnp.float32), 1e-30)
    w_os = jnp.asarray(ln_w, jnp.float32) / osc
    b_os = jnp.asarray(ln_b, jnp.float32) / osc
    vecs = jnp.stack(
        [
            _pad_to(jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c,)), 0, 128)
            for v in (ptf_mask, w_os, b_os, ratio)
        ]
    )
    s1a = jnp.asarray(s1, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, c_true=float(c)),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cpad), jnp.int8),
        interpret=interpret,
    )(s1a, cp, vecs)
    return out[:m, :c]


def _res_kernel(s1_ref, a_ref, b_ref, vec_ref, res_o_ref, ln_o_ref, *, c_true):
    s1 = s1_ref[0, 0]
    s_a = vec_ref[0, :][None, :]
    s_b = vec_ref[1, :][None, :]
    inv_out = vec_ref[2, :][None, :]
    mask = vec_ref[3, :][None, :]
    w_os = vec_ref[4, :][None, :]
    b_os = vec_ref[5, :][None, :]
    ratio = vec_ref[6, :][None, :]

    val = (a_ref[:].astype(jnp.float32) * s_a
           + b_ref[:].astype(jnp.float32) * s_b)
    res_codes = jnp.clip(jnp.round(val * inv_out), -128, 127)
    res_o_ref[:] = res_codes.astype(jnp.int8)

    x = res_codes * mask
    sx = jnp.sum(x, axis=1, keepdims=True)
    sxx = jnp.sum(x * x, axis=1, keepdims=True)
    y = ln_mn_chain(x, sx, sxx, s1, c_true, w_os, b_os)
    ln_o_ref[:] = jnp.clip(jnp.round(y * ratio), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def int_res_ln_requant(
    a_q: jnp.ndarray,
    s_a: jnp.ndarray,
    b_q: jnp.ndarray,
    s_b: jnp.ndarray,
    s_out: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray,
    ln_out_scale: jnp.ndarray,
    ratio: jnp.ndarray,
    block_m: int = 512,
    interpret: bool = False,
):
    """Residual requant-add + integer LN, fused: one HBM pass instead of two.

    The Swin attention-side junction (residual add after window_reverse →
    qact2 codes → norm2, serving_swin.py) cannot fuse into its producer
    matmul — the window reorder sits in between — so expressed in XLA it
    costs one fused-elementwise pass (read 2× int8, write int8) PLUS the
    standalone LN kernel's read/write. This kernel reads both operand code
    tensors once and emits BOTH junction outputs:

      val       = a_q·s_a + b_q·s_b            (f32, in VMEM)
      res_codes = clip(round(val · 1/s_out))   (the residual carrier)
      ln_codes  = int-LN(res_codes)·ratio      (the consumer codes)

    Same hoisted-reciprocal / ln_mn_chain serving math as the other three
    LN entry points (intln/matmul_ln/layer_fused); replicates the reference
    chain QAct→QIntLayerNorm (/root/reference/models/swin_quant.py:525-560).

    Args:
      a_q/b_q: (M, C) int8 code operands.
      s_a/s_b: their scales (scalar or (C,)).
      s_out: residual node scale (scalar or (C,)); also the LN input scale
        (s1 = min, ptf_mask = round(s_out/s1)).
      ln_w/ln_b: (C,) LayerNorm affine.
      ln_out_scale: (C,)-broadcastable consumer scale.
      ratio: (C,)-broadcastable post-LN code multiplier.
    Returns: (res_codes, ln_codes), both (M, C) int8.
    """
    m, c = a_q.shape
    ap = _pad_to(a_q, 1, 128)
    bp = _pad_to(b_q, 1, 128)
    cpad = ap.shape[1]
    # two int8 operand panels + the f32 val/stats temporaries ≈ 30 B per
    # block element of scoped VMEM; same cap policy as int_ln_requant
    cap = max(128, (393216 // cpad) // 128 * 128)
    block_m = min(block_m, cap)
    if m % block_m:
        for cand in (512, 384, 256, 128):
            if cand <= cap and m % cand == 0:
                block_m = cand
                break
    ap = _pad_to(ap, 0, block_m)
    bp = _pad_to(bp, 0, block_m)
    mp = ap.shape[0]

    s_out_v = jnp.broadcast_to(jnp.asarray(s_out, jnp.float32), (c,))
    s1 = s_out_v.min()
    ptf_mask = jnp.round(s_out_v / s1)
    osc = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(ln_out_scale, jnp.float32), (c,)), 1e-30
    )
    vecs = jnp.stack(
        [
            _pad_to(jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c,)), 0, 128)
            for v in (
                s_a,
                s_b,
                1.0 / jnp.maximum(s_out_v, 1e-30),
                ptf_mask,
                jnp.asarray(ln_w, jnp.float32) / osc,
                jnp.asarray(ln_b, jnp.float32) / osc,
                ratio,
            )
        ]
    )

    res_out, ln_out = pl.pallas_call(
        functools.partial(_res_kernel, c_true=float(c)),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, cpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, cpad), jnp.int8),
            jax.ShapeDtypeStruct((mp, cpad), jnp.int8),
        ),
        interpret=interpret,
    )(s1.reshape(1, 1), ap, bp, vecs)
    return res_out[:m, :c], ln_out[:m, :c]


def int_res_ln_requant_ref(a_q, s_a, b_q, s_b, s_out, ln_w, ln_b,
                           ln_out_scale, ratio):
    """jnp twin of int_res_ln_requant: identical hoisted-reciprocal math,
    bit for bit (the use_pallas=False serving path and interpret-mode
    parity tests run this)."""
    m, c = a_q.shape
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c,))[None, :]
    s_out_v = jnp.broadcast_to(jnp.asarray(s_out, jnp.float32), (c,))
    val = (a_q.astype(jnp.float32) * bc(s_a)
           + b_q.astype(jnp.float32) * bc(s_b))
    res_codes = jnp.clip(
        jnp.round(val * (1.0 / jnp.maximum(s_out_v, 1e-30))[None, :]),
        -128, 127,
    )
    s1 = s_out_v.min()
    mask = jnp.round(s_out_v / s1)[None, :]
    osc = jnp.maximum(bc(ln_out_scale), 1e-30)
    w_os = bc(ln_w) / osc
    b_os = bc(ln_b) / osc
    x = res_codes * mask
    sx = x.sum(axis=1, keepdims=True)
    sxx = (x * x).sum(axis=1, keepdims=True)
    y = ln_mn_chain(x, sx, sxx, s1, float(c), w_os, b_os)
    ln_codes = jnp.clip(jnp.round(y * bc(ratio)), -128, 127)
    return res_codes.astype(jnp.int8), ln_codes.astype(jnp.int8)
