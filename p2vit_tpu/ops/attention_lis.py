"""Pallas TPU kernel: fused int8 attention with Log-Int-Softmax.

One kernel per (batch·head): q@kᵀ int8→int32 → PoT requant to the attn
quantizer's codes → I-BERT integer exp → log2-round to 4-bit log-domain
attention (exact powers of two) → attn@v → PoT requant to the output
quantizer's codes. The (N, N) attention matrix never leaves VMEM, and the
log-domain attn@v is the TPU realization of the paper accelerator's
shift-accumulate dataflow (SURVEY §7 'serving-path layout'): every attn
weight is 2^-q, exactly representable in f32, so the MXU matmul is bit-exact
to integer shift-accumulate.

Integer-softmax math mirrors QIntSoftmax
(/root/reference/models/ptq/layers.py:375-428); see quant/intops.py for the
simulation twin these kernels are tested against.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fastmath import exp2i, floor_log2i

_EXP_N = 32  # range-reduction steps (layers.py:402)
_COEF = (0.35815147, 0.96963238, 1.0)  # int-exp polynomial (layers.py:387)


def _int_exp(x_int, scale):
    """I-BERT integer exp on quantizer codes (layers.py:398-410)."""
    c0, c1, c2 = _COEF
    x0_int = jnp.floor(-0.6931 / scale)
    x_int = jnp.maximum(x_int, _EXP_N * x0_int)
    q = jnp.floor(x_int / x0_int)
    r = x_int - x0_int * q
    b_int = jnp.floor((c1 / c0) / scale)
    c_int = jnp.floor((c2 / c0) / scale**2)
    poly = r * (r + b_int) + c_int
    # 2^(N-q) for integer q ∈ [0, N]: exponent construction is exact and
    # skips the VPU exp2 transcendental (ops/fastmath.py)
    p2 = exp2i(_EXP_N - q.astype(jnp.int32))
    return jnp.maximum(jnp.floor(poly * p2), 0.0)


def _lis_from_scores(attn_c, s_attn, col, n_valid, lis_bits):
    """Shared Log-Int-Softmax core on quantizer codes: int-exp →
    round(sum/exp) → log2-round (ties up) → 2^-q with overflow→0.

    Shared verbatim by the Pallas kernels and the jnp reference twins so
    they stay bit-identical. (An exponent-bit-manipulation variant of the
    2^k/floor-log2 ops measured ~25% SLOWER than the VPU's transcendental
    unit on v5e — see BENCH.md "attempted and rejected" — so
    transcendentals stay.)
    """
    # the exponent-extraction big (below) is bit-identical to the log2 form
    # only while the 2^lis_bits overflow threshold stays ≤ 2^19. Raised at
    # trace time of every wrapper (not a strippable assert): the reference's
    # LIS codes are uint4 (config.py:34-38), so >4 bits is out of spec here.
    if lis_bits > 4:
        raise ValueError(
            f"lis_bits={lis_bits}: the exponent-field floor(log2) is proven "
            "bit-identical to the transcendental form only for <=4-bit LIS "
            "codes (overflow threshold 2^bits <= 2^19, see ops/fastmath.py). "
            "The reference's Log-Int-Softmax is uint4 "
            "(/root/reference/config.py:34-38); use the simulation path "
            "(quant/intops.py, full-domain _pow2) for wider log codes."
        )
    x_int = attn_c - attn_c.max(axis=-1, keepdims=True)
    exp_int = _int_exp(x_int, s_attn)
    # padded key columns must contribute ZERO mass (int_exp never underflows
    # all the way to 0 on its own)
    exp_int = jnp.where(col < n_valid, exp_int, 0.0)
    exp_sum = exp_int.sum(axis=-1, keepdims=True)
    # exp_int == 0 → +inf → log2 → inf → overflow mask, exactly like the
    # reference's unguarded division (layers.py:422)
    softmax_out = jnp.round(exp_sum / exp_int)
    # big = ⌊log2 softmax_out⌋ via exponent extraction — exact, and
    # bit-identical to floor(jnp.log2(·)) under the overflow mask (the two
    # can only differ for softmax_out ≥ 2^19, which is masked to 0 either
    # way for lis_bits ≤ 4; proof in ops/fastmath.py)
    big = floor_log2i(softmax_out)
    # ties-up test as one exact comparison: s ≥ 1.5·2^big (1.5·2^big is
    # exact; equals the reference's fl(s − 2^big) ≥ 2^(big-1) everywhere
    # unmasked — they can only differ when s ≥ 2^24, where big ≥ 24 is
    # masked to 0 by the overflow rule). Then 2^-(big+tie) is ONE exponent
    # construction; no 0..2^bits-1 clip needed (big ≥ 0 since softmax_out =
    # round(S/e) ≥ 1, and the mask covers the top end).
    # exp_int == 0 rows: softmax_out = inf → big = 128 ≥ 2^bits → 0, same
    # as the reference's overflow.
    tie = softmax_out >= 1.5 * exp2i(big)
    big = big + tie.astype(jnp.int32)
    return jnp.where(big >= 2**lis_bits, 0.0, exp2i(-big))


def _kernel(s_ref, q_ref, k_ref, v_ref, o_ref, *, n_valid, lis_bits, qmin, qmax):
    rq, s_attn, ro = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2]
    qm = q_ref[0]
    km = k_ref[0]
    vm = v_ref[0]

    # int dot: pin DEFAULT so the global matmul_precision=highest doesn't
    # stamp contract_precision<fp32> onto an i8 tpu.matmul (Mosaic rejects)
    acc = jax.lax.dot_general(
        qm, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # codes of the qact_attn1 node (PoT requant of the int32 scores)
    attn_c = jnp.clip(jnp.round(acc.astype(jnp.float32) * rq), qmin, qmax)
    # park padded key columns at qmin so they can't win the row max
    col = jax.lax.broadcasted_iota(jnp.int32, attn_c.shape, 1)
    attn_c = jnp.where(col < n_valid, attn_c, jnp.float32(qmin))
    attn_pot = _lis_from_scores(attn_c, s_attn, col, n_valid, lis_bits)

    # shift-accumulate attn@v: powers of two × int8 codes. Both operands are
    # EXACT in bf16 (attn is 2^-q, v codes are 8-bit ints), so the bf16 MXU
    # pass (Precision.DEFAULT) computes every product exactly and
    # accumulates in f32 — bit-identical to the fp32 multi-pass matmul the
    # global matmul_precision=highest would emit, at ~3x the rate.
    av = jax.lax.dot_general(
        attn_pot,
        vm.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[0] = jnp.clip(jnp.round(av * ro), qmin, qmax).astype(jnp.int8)


def _pad_axis(a, axis, mult):
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(jax.jit, static_argnames=("lis_bits", "interpret"))
def lis_attention(
    q_q: jnp.ndarray,
    k_q: jnp.ndarray,
    v_q: jnp.ndarray,
    score_requant: jnp.ndarray,
    attn_scale: jnp.ndarray,
    out_requant: jnp.ndarray,
    lis_bits: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused quantized attention.

    Args:
      q_q/k_q/v_q: (BH, N, d) int8 codes of the qact1 node.
      score_requant: scalar f32 = s_qkv² · head_scale / s_attn.
      attn_scale: scalar f32, the qact_attn1 quantizer scale (LIS input).
      out_requant: scalar f32 = s_qkv / s_out (PoT).
    Returns (BH, N, d) int8 codes of the qact2 node.
    """
    bh, n, d = q_q.shape
    qp = _pad_axis(_pad_axis(q_q, 1, 128), 2, 128)
    kp = _pad_axis(_pad_axis(k_q, 1, 128), 2, 128)
    vp = _pad_axis(_pad_axis(v_q, 1, 128), 2, 128)
    npad, dpad = qp.shape[1], qp.shape[2]
    scalars = jnp.stack(
        [
            jnp.asarray(score_requant, jnp.float32),
            jnp.asarray(attn_scale, jnp.float32),
            jnp.asarray(out_requant, jnp.float32),
        ]
    ).reshape(1, 3)

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_valid=n, lis_bits=lis_bits, qmin=-128.0, qmax=127.0
        ),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, npad, dpad), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * npad * npad * dpad,
            bytes_accessed=4 * bh * npad * dpad,
            transcendentals=2 * bh * npad * npad,
        ),
        interpret=interpret,
    )(scalars, qp, kp, vp)
    return out[:, :n, :d]


def _fp_softmax_from_scores(attn_c, s_attn, col, n_valid):
    """fp32 softmax over the dequantized attention codes — the LIS-off path
    (cfg.INT_SOFTMAX False → plain softmax, layers.py:439)."""
    logits = attn_c * s_attn
    logits = jnp.where(col < n_valid, logits, -jnp.inf)
    e = jnp.exp(logits - logits.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _fused_kernel(
    s_ref, qkv_ref, o_ref, *, n_valid, lis_bits, qmin, qmax, c, d, num_heads,
    lis,
):
    """Per-image step: q/k/v head slices are STATIC offsets into the fused
    (N, 3C) qkv panel, so no head-split/merge transposes ever materialize in
    HBM; the per-head attention loop unrolls inside the kernel (shared with
    the qkv-fused and whole-layer kernels via heads_attention)."""
    rq, s_attn, ro = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2]
    o_ref[:] = heads_attention(
        qkv_ref[:], rq, s_attn, ro, n_valid=n_valid, lis_bits=lis_bits,
        qmin=qmin, qmax=qmax, c=c, d=d, num_heads=num_heads, lis=lis,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "lis_bits", "lis", "row_align", "interpret"),
)
def lis_attention_fused(
    qkv_q: jnp.ndarray,
    num_heads: int,
    score_requant,
    attn_scale,
    out_requant,
    lis_bits: int = 4,
    lis: bool = True,
    row_align: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused quantized attention over the (B, N, 3C) fused-qkv codes.

    Same math as ``lis_attention`` but indexes heads inside the kernel, so
    the (B,N,3C)→(3,B,H,N,d)→(B,N,C) reshuffles (two full memory passes per
    layer) disappear. Returns (B, N, C) int8 codes of the qact2 node.
    """
    b, n, c3 = qkv_q.shape
    c = c3 // 3
    d = c // num_heads
    assert d % 128 == 0 or 128 % d == 0, f"head_dim {d} vs lane width"
    # Rows only need the int8 sublane tile (32), not the lane tile (128):
    # 197 tokens -> 224 rows instead of 256, trimming ~12.5% off every VPU
    # pass over the (rows, keys) attention matrix. Key columns stay padded
    # to the physical lane tile by Mosaic and are masked via n_valid.
    # row_align is an A/B knob: 128 restores clean MXU row tiles.
    npad = (-n) % row_align
    qkv_p = jnp.pad(qkv_q, ((0, 0), (0, npad), (0, 0))) if npad else qkv_q
    nfull = n + npad
    scalars = jnp.stack(
        [
            jnp.asarray(score_requant, jnp.float32),
            jnp.asarray(attn_scale, jnp.float32),
            jnp.asarray(out_requant, jnp.float32),
        ]
    ).reshape(1, 3)

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, n_valid=n, lis_bits=lis_bits, qmin=-128.0, qmax=127.0,
            c=c, d=d, num_heads=num_heads, lis=lis,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nfull, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nfull, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nfull, c), jnp.int8),
        interpret=interpret,
    )(scalars, qkv_p)
    return out[:, :n, :]


def _qkv_fused_kernel(
    s_ref, h_ref, w_ref, r_ref, b_ref, o_ref, *, n_valid, lis_bits, qmin,
    qmax, c, d, num_heads, lis, g, nfull, kfull,
):
    """qkv matmul + requant + attention in ONE kernel: the (N, 3C) qkv codes
    never round-trip to HBM (VERDICT r1 item 1 'fuse the qkv matmul into the
    attention kernel'). Math is bit-identical to int8_matmul_requant
    followed by _fused_kernel: same round/clip epilogue on the int32
    accumulator, same per-head attention.

    G images per grid step (like the Swin kernel's window batching): the
    qkv projection becomes one (G·N, 3C) MXU matmul and the per-head score/
    LIS/av chain is batched over G, amortizing per-step overhead. The qkv
    codes are recast to int8 in VMEM so q@kᵀ runs as an int8 MXU dot —
    identical values to the f32 dot (products ≤ 127², row sums < 2²⁴, both
    accumulate exactly)."""
    rq, s_attn, ro = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2]
    acc = jax.lax.dot_general(
        h_ref[:].reshape(g * nfull, kfull), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # int dot: see _kernel
    )  # (G·N, 3C)
    qkv = jnp.clip(
        jnp.round(acc.astype(jnp.float32) * r_ref[:] + b_ref[:]), qmin, qmax
    ).astype(jnp.int8).reshape(g, nfull, 3 * c)
    o_ref[:] = heads_attention(
        qkv, rq, s_attn, ro, n_valid=n_valid, lis_bits=lis_bits, qmin=qmin,
        qmax=qmax, c=c, d=d, num_heads=num_heads, lis=lis,
    )


def heads_attention(qkv, rq, s_attn, ro, *, n_valid, lis_bits, qmin, qmax, c,
                    d, num_heads, lis):
    """Per-head attention over a (G, N, 3C) int8 qkv panel → (G, N, C) int8.

    Shared by the qkv-fused attention kernel and the whole-layer fused
    kernel (ops/layer_fused.py). Rolled per-head loop: a staged schedule —
    all q@kᵀ dots, then all softmax chains, then all attn@v — was A/B'd
    2026-08-16 hoping Mosaic would overlap MXU dots with the VPU-bound
    chains: no speedup at g=4 and a VMEM compile failure at g=8 from 12
    live (G,N,N) f32 buffers. Mosaic serializes MXU/VPU either way; the
    rolled loop keeps ≤2 score buffers live."""
    g, nfull, _ = qkv.shape
    nr = _chain_rows(n_valid, nfull)
    outs = []
    for h in range(num_heads):
        qm = qkv[:, :, h * d : (h + 1) * d]
        km = qkv[:, :, c + h * d : c + (h + 1) * d]
        vm = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        acc2 = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,  # int dot: see _kernel
        )[:, :nr, :]  # (G, NR, N)
        attn_c = jnp.clip(jnp.round(acc2.astype(jnp.float32) * rq), qmin, qmax)
        col = jax.lax.broadcasted_iota(jnp.int32, attn_c.shape, 2)
        attn_c = jnp.where(col < n_valid, attn_c, jnp.float32(qmin))
        if lis == "bypass":
            # TIMING-ONLY mode (tools/ceiling_bench.py): replace the whole
            # softmax/LIS chain with one multiply, keeping every dot, every
            # requant and all DMA identical — the e2e slope difference vs
            # lis=True is the in-situ cost of the mandated LIS chain. The
            # math is WRONG (no normalization); never a serving mode.
            attn_pot = attn_c * s_attn
        elif lis:  # any truthy value (True, np.True_, 1) means LIS-on
            attn_pot = _lis_from_scores(attn_c, s_attn, col, n_valid, lis_bits)
        else:
            attn_pot = _fp_softmax_from_scores(attn_c, s_attn, col, n_valid)
        av = jax.lax.dot_general(
            attn_pot, vm.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if lis
                       else jax.lax.Precision.HIGHEST),  # see _fused_kernel
        )
        out = jnp.clip(jnp.round(av * ro), qmin, qmax)
        outs.append(_zero_pad_rows(out, nfull).astype(jnp.int8))
    return jnp.concatenate(outs, axis=-1)


def _chain_rows(n_valid: int, nfull: int) -> int:
    """Rows the f32 score chain actually computes: the int8 panel is
    32-row padded (197→224, 49→64) but the VPU softmax chain and the av
    dot only need f32-sublane (8) alignment — ceil(n_valid/8)·8 rows
    (197→200, 49→56), trimming ~11% off every elementwise pass. The
    dropped rows are pad garbage the caller slices off; _zero_pad_rows
    re-zeroes them for the int8 store."""
    return min(-(-n_valid // 8) * 8, nfull)


def _zero_pad_rows(out, nfull: int):
    g, nr, d = out.shape
    if nr == nfull:
        return out
    return jnp.concatenate(
        [out, jnp.zeros((g, nfull - nr, d), jnp.float32)], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "lis_bits", "lis", "images_per_step",
                     "interpret"),
)
def lis_attention_qkv_fused(
    h_q: jnp.ndarray,
    w_q: jnp.ndarray,
    requant_vec: jnp.ndarray,
    bias_vec: jnp.ndarray,
    num_heads: int,
    score_requant,
    attn_scale,
    out_requant,
    lis_bits: int = 4,
    lis: bool = True,
    images_per_step: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """qkv projection + fused attention over qact0 codes.

    Saves one full HBM round trip of the (B, N, 3C) qkv codes vs the
    two-step int8_matmul_requant → lis_attention_fused pipeline (staged for
    on-chip A/B; bit-identical by construction, asserted in tests).

    Args:
      h_q: (B, N, C_in) int8 codes of the attention input (qact0 node).
      w_q: (3·C_out, C_in) int8 qkv weight codes. C_out == C_in on a single
        device; a tensor-parallel shard (parallel/tensor.py) passes the
        head-aligned local weight with C_out = C_in/tp and its local
        num_heads — the kernel only uses the output width for the per-head
        slicing, so the sharded call is the identical program.
      requant_vec: (3·C_out,) f32 = s_act·s_w[n]/s_qact1.
      bias_vec: (3·C_out,) f32 = bias/s_qact1.
      score_requant/attn_scale/out_requant: as in lis_attention_fused but
        score_requant is built from s_qact1 like there.
    Returns (B, N, C_out) int8 codes of the qact2 node.
    """
    b, n, c_in = h_q.shape
    c = w_q.shape[0] // 3  # output width
    d = c // num_heads
    assert w_q.shape == (3 * c, c_in)
    assert d % 128 == 0 or 128 % d == 0, f"head_dim {d} vs lane width"
    g = images_per_step
    npad = (-n) % 32
    h_p = jnp.pad(h_q, ((0, 0), (0, npad), (0, 0))) if npad else h_q
    nfull = n + npad
    # zero-pad the contraction dim to the lane tile (exact: 0·w adds 0)
    kpad = (-c_in) % 128
    if kpad:
        h_p = jnp.pad(h_p, ((0, 0), (0, 0), (0, kpad)))
        w_q = jnp.pad(w_q, ((0, 0), (0, kpad)))
    kfull = c_in + kpad
    bpad = (-b) % g
    if bpad:
        h_p = jnp.pad(h_p, ((0, bpad), (0, 0), (0, 0)))
    bfull = b + bpad
    scalars = jnp.stack(
        [
            jnp.asarray(score_requant, jnp.float32),
            jnp.asarray(attn_scale, jnp.float32),
            jnp.asarray(out_requant, jnp.float32),
        ]
    ).reshape(1, 3)
    r2 = requant_vec.astype(jnp.float32).reshape(1, -1)
    b2 = bias_vec.astype(jnp.float32).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(
            _qkv_fused_kernel, n_valid=n, lis_bits=lis_bits, qmin=-128.0,
            qmax=127.0, c=c, d=d, num_heads=num_heads, lis=lis, g=g,
            nfull=nfull, kfull=kfull,
        ),
        grid=(bfull // g,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, nfull, kfull), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, kfull), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, nfull, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bfull, nfull, c), jnp.int8),
        interpret=interpret,
    )(scalars, h_p, w_q, r2, b2)
    return out[:b, :n, :]


def _swin_head_loop(qkv, bias, mask_add, rq, s1, inv_s2, ro, *, n_valid,
                    nfull, lis_bits, qmin, qmax, c, d, num_heads, lis):
    """Shared per-head windowed-attention math over a (G, NF, 3C) qkv panel
    (ref or value) → (G, NF, C) int8 value. The body of _swin_kernel and
    _swin_folded_kernel — one source so the two stay bit-identical.

    Math mirrors serving_swin._window_attention_codes exactly:
    q@kᵀ int32 → qact_attn1 codes → +rel-pos bias → /s2 (qact2 codes) →
    (+shift mask/s2, added unrounded like the simulation) → LIS / fp
    softmax → @v → qact3 codes.
    """
    nr = _chain_rows(n_valid, nfull)  # 49→56 instead of 64 for 7×7 windows
    outs = []
    for h in range(num_heads):
        qm = qkv[:, :, h * d : (h + 1) * d]
        km = qkv[:, :, c + h * d : c + (h + 1) * d]
        vm = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        acc = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,  # int dot: see _kernel
        )[:, :nr, :]  # (G, NR, N)
        attn_c = jnp.clip(jnp.round(acc.astype(jnp.float32) * rq), qmin, qmax)
        # full-block ref reads, then VALUE slices to the trimmed rows — a
        # row-sliced ref read lowers to an unsupported Mosaic gather
        bias_h = bias[h][None]
        attn2 = jnp.clip(
            jnp.round((attn_c * s1 + bias_h[:, :nr, :]) * inv_s2),
            qmin, qmax,
        )
        if mask_add is not None:
            attn2 = attn2 + mask_add[:, :nr, :]
        col = jax.lax.broadcasted_iota(jnp.int32, attn2.shape, 2)
        # park padded key columns so they can't win the row max
        attn2 = jnp.where(col < n_valid, attn2, jnp.float32(-(2.0**30)))
        if lis == "bypass":
            # TIMING-ONLY mode (tools/ceiling_swin.py): replace the whole
            # softmax/LIS chain with one multiply, keeping every dot, every
            # requant and all DMA identical — the e2e slope difference vs
            # lis=True is the in-situ cost of the mandated LIS chain (the
            # ViT kernel's probe, mirrored). Scalar reciprocal hoisted so
            # the probe really is one broadcast multiply, not a multi-pass
            # VPU divide that would inflate the baseline. The math is WRONG
            # (no normalization); never a serving mode.
            attn_pot = jnp.where(col < n_valid, attn2 * (1.0 / inv_s2), 0.0)
        elif lis:
            attn_pot = _lis_from_scores(attn2, 1.0 / inv_s2, col, n_valid,
                                        lis_bits)
        else:
            attn_pot = _fp_softmax_from_scores(attn2, 1.0 / inv_s2, col,
                                               n_valid)
        av = jax.lax.dot_general(
            attn_pot,
            vm.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if lis
                       else jax.lax.Precision.HIGHEST),  # see _fused_kernel
        )  # (G, NR, d)
        out = jnp.clip(jnp.round(av * ro), qmin, qmax)
        outs.append(_zero_pad_rows(out, nfull).astype(jnp.int8))
    return jnp.concatenate(outs, axis=-1)


def _swin_kernel(
    s_ref, qkv_ref, bias_ref, mask_ref, o_ref, *, n_valid, lis_bits, qmin,
    qmax, c, d, num_heads, lis, has_mask,
):
    """Fused quantized Swin attention, G windows per grid step (heads
    unrolled; score matrices never leave VMEM). Batching windows amortizes
    the per-step grid overhead — stage 0 has B·64 windows, far too many for
    one step each. Math: _swin_head_loop."""
    rq, s1, inv_s2, ro = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2], s_ref[0, 3]
    g, nfull, _ = qkv_ref.shape
    mask_add = mask_ref[...] if has_mask else None
    o_ref[...] = _swin_head_loop(
        qkv_ref, bias_ref, mask_add, rq, s1, inv_s2, ro, n_valid=n_valid,
        nfull=nfull, lis_bits=lis_bits, qmin=qmin, qmax=qmax, c=c, d=d,
        num_heads=num_heads, lis=lis,
    )


def _swin_folded_kernel(
    s_ref, qkv_ref, bias_ref, mask_ref, o_ref, *, ws, nwx, s_strips, nfull,
    lis_bits, qmin, qmax, c, d, num_heads, lis, has_mask,
):
    """Folded-layout Swin attention: one grid step consumes S contiguous
    (ws, res, 3C) raster ROW-STRIPS (each = nwx windows), relayouts them to
    window panels IN VMEM, runs _swin_head_loop, and writes the output back
    in raster layout. window_partition/window_reverse never touch HBM —
    the strip fetch is one contiguous DMA and the (ws, nwx·ws) ↔
    (nwx, ws·ws) shuffle is in-register (sublane-dim split + above-lane
    transpose; the lane dim 3C is never split).

    Rows are zero-padded to the same 32-multiple ``nfull`` the two-step
    kernel uses so every reduction tree matches shape-for-shape — required
    for BIT equality of the fp-softmax (lis=False) path, whose f32 sums
    round differently at 49 vs 64 elements."""
    rq, s1, inv_s2, ro = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2], s_ref[0, 3]
    g, n = nwx, ws * ws
    strip = qkv_ref[...]  # (S, ws, g·ws, 3C), one contiguous raster chunk
    w5 = strip.reshape(s_strips, ws, g, ws, 3 * c).transpose(0, 2, 1, 3, 4)
    qkv = w5.reshape(s_strips * g, n, 3 * c)  # window panels, (b, wy, wx) order
    qkv = jnp.pad(qkv, ((0, 0), (0, nfull - n), (0, 0)))
    if has_mask:
        m = mask_ref[...]  # (g, NF, NF): this row's nwx per-window masks
        mask_add = jnp.broadcast_to(
            m[None], (s_strips, g, nfull, nfull)
        ).reshape(s_strips * g, nfull, nfull)
    else:
        mask_add = None
    out = _swin_head_loop(
        qkv, bias_ref, mask_add, rq, s1, inv_s2, ro, n_valid=n, nfull=nfull,
        lis_bits=lis_bits, qmin=qmin, qmax=qmax, c=c, d=d,
        num_heads=num_heads, lis=lis,
    )[:, :n, :]  # (S·g, n, C)
    o5 = out.reshape(s_strips, g, ws, ws, c).transpose(0, 2, 1, 3, 4)
    o_ref[...] = o5.reshape(s_strips, ws, g * ws, c)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_windows", "lis_bits", "lis", "interpret"),
)
def swin_lis_attention(
    qkv_q: jnp.ndarray,
    bias: jnp.ndarray,
    mask,
    num_heads: int,
    n_windows: int,
    score_requant,
    attn_scale,
    s2,
    out_requant,
    lis_bits: int = 4,
    lis: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused quantized windowed attention over (W, N, 3C) window panels.

    Args:
      qkv_q: (B·nW, N, 3C) int8 codes of the per-window fused qkv.
      bias: (H, N, N) f32 dequantized relative-position-bias values
        (the qact_table fake-quantized table gathered per position).
      mask: (nW, N, N) f32 shifted-window mask ALREADY divided by s2, or
        None. Window i uses mask[i % n_windows] (reference
        swin_quant.py:365-395 layout).
      score_requant: s_qkv² · head_dim^-0.5 / s_attn1.
      attn_scale: the qact_attn1 scale (s1).
      s2: the qact2 scale (PoT — its reciprocal is exact).
      out_requant: s_qkv / s_qact3.
    Returns (B·nW, N, C) int8 codes of the attention output (pre-proj).
    """
    w, n, c3 = qkv_q.shape
    c = c3 // 3
    d = c // num_heads
    npad = (-n) % 32
    nfull = n + npad
    has_mask = mask is not None
    # windows per grid step: amortize grid overhead, stay G | n_windows so a
    # step's mask slice is one contiguous chunk of the (nW, N, N) mask array.
    # The LIS-off variant keeps a multi-pass fp32 attn@v contract (general
    # f32 softmax weights) whose workspace scales ~ G·C and blew the 16 MB
    # scoped-VMEM stack (measured: 21.55M at G=16·C=384, 18.27M at
    # G=8·C=768) — cap G·C ≈ 3072 for it.
    g_cap = 16 if lis else max(1, min(16, 3072 // c))
    if has_mask:
        g = math.gcd(g_cap, n_windows)
    else:
        g = g_cap
    wpad = (-w) % g
    wfull = w + wpad
    qkv_p = jnp.pad(qkv_q, ((0, wpad), (0, npad), (0, 0)))
    bias_p = jnp.pad(bias, ((0, 0), (0, npad), (0, npad))) if npad else bias
    if has_mask:
        mask_p = (
            jnp.pad(mask, ((0, 0), (0, npad), (0, npad))) if npad else mask
        ).astype(jnp.float32)
        n_chunks = n_windows // g
    else:
        # dummy operand keeps one kernel signature; never read
        mask_p = jnp.zeros((g, nfull, nfull), jnp.float32)
        n_chunks = 1
    scalars = jnp.stack(
        [
            jnp.asarray(score_requant, jnp.float32),
            jnp.asarray(attn_scale, jnp.float32),
            1.0 / jnp.asarray(s2, jnp.float32),
            jnp.asarray(out_requant, jnp.float32),
        ]
    ).reshape(1, 4)

    out = pl.pallas_call(
        functools.partial(
            _swin_kernel, n_valid=n, lis_bits=lis_bits, qmin=-128.0,
            qmax=127.0, c=c, d=d, num_heads=num_heads, lis=lis,
            has_mask=has_mask,
        ),
        grid=(wfull // g,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, nfull, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, nfull, nfull), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nfull, nfull), lambda i: (i % n_chunks, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, nfull, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((wfull, nfull, c), jnp.int8),
        interpret=interpret,
    )(scalars, qkv_p, bias_p, mask_p)
    return out[:w, :n, :]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "lis_bits", "lis", "interpret"),
)
def swin_lis_attention_folded(
    qkv_r: jnp.ndarray,
    bias: jnp.ndarray,
    mask,
    num_heads: int,
    window: int,
    score_requant,
    attn_scale,
    s2,
    out_requant,
    lis_bits: int = 4,
    lis: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Zero-copy windowed attention over RASTER-layout qkv codes.

    Same math/calibrated-state contract as swin_lis_attention, but the
    input is the unpartitioned (B, res, res, 3C) qkv grid (rolled already
    for shifted blocks) and the output comes back in the same raster
    layout — the XLA window_partition/window_reverse copies (measured
    2.11 ms = 8.6% of Swin-T e2e, BENCH.md reorder-bypass probe) are
    replaced by an in-kernel relayout of contiguous row-strips. Bit-
    identical to partition → swin_lis_attention → reverse (shared
    _swin_head_loop; asserted in tests/test_swin_serving.py).

    **Mosaic REFUSES this kernel on chip** (measured 2026-08-19, the
    current toolchain): the strip relayout's sublane split
    ``(S, ws, g·ws, 3C) → (S, ws, g, ws, 3C)`` lowers to
    ``tpu.reshape`` and fails infer-vector-layout ("unsupported shape
    cast") — exactly the sublane↔lane relayout risk BENCH.md's
    window-reorder note predicted. Any alternative expression needs the
    same (ws, ws, C)→(ws², C) sublane merge, so the 2.11 ms reorder cost
    stays itemized as the bound this toolchain cannot express. The kernel
    remains interpret-verified (bitwise vs the two-step path) as the
    recipe for a future toolchain; it is NOT a default candidate.

    Args:
      qkv_r: (B, res, res, 3C) int8 qkv codes in image-raster layout.
      bias/mask/scales: as in swin_lis_attention (mask already /s2; window
        i of each image uses mask[i], (b, wy, wx) order).
    Returns (B, res, res, C) int8 attention-output codes, raster layout.
    """
    b, res, res2, c3 = qkv_r.shape
    ws = window
    # ValueError, not assert: these strip under python -O (same reason as
    # the lis_bits guard and the serving bypass guards).
    if not (res == res2 and res % ws == 0 and res > ws):
        raise ValueError(
            f"folded layout needs a square grid of >1 whole windows: "
            f"res={res}x{res2}, window={ws}"
        )
    c = c3 // 3
    d = c // num_heads
    g = res // ws  # windows per row-strip (= nwx = nwy)
    n = ws * ws
    npad = (-n) % 32
    nfull = n + npad  # match the two-step kernel's row/key padding exactly
    has_mask = mask is not None
    # windows per grid step ≈ the two-step kernel's cap (16 LIS-on; VMEM-
    # bounded for the fp32-contract LIS-off path) in whole row-strips
    g_cap = 16 if lis else max(1, min(16, 3072 // c))
    s_strips = max(1, g_cap // g)
    bpad = (-b) % s_strips
    qkv_p = jnp.pad(qkv_r, ((0, bpad), (0, 0), (0, 0), (0, 0))) if bpad else qkv_r
    bfull = b + bpad
    bias_p = jnp.pad(bias, ((0, 0), (0, npad), (0, npad))) if npad else bias
    if has_mask:
        if mask.shape != (g * g, n, n):
            raise ValueError(
                f"mask shape {mask.shape} != expected {(g * g, n, n)} "
                f"(one (n,n) mask per window of the {g}x{g} grid)"
            )
        mask_p = (
            jnp.pad(mask, ((0, 0), (0, npad), (0, npad))) if npad else mask
        ).astype(jnp.float32)
    else:
        mask_p = jnp.zeros((g, nfull, nfull), jnp.float32)  # dummy; never read
    scalars = jnp.stack(
        [
            jnp.asarray(score_requant, jnp.float32),
            jnp.asarray(attn_scale, jnp.float32),
            1.0 / jnp.asarray(s2, jnp.float32),
            jnp.asarray(out_requant, jnp.float32),
        ]
    ).reshape(1, 4)

    out = pl.pallas_call(
        functools.partial(
            _swin_folded_kernel, ws=ws, nwx=g, s_strips=s_strips,
            nfull=nfull, lis_bits=lis_bits, qmin=-128.0, qmax=127.0, c=c,
            d=d, num_heads=num_heads, lis=lis, has_mask=has_mask,
        ),
        grid=(bfull // s_strips, g),  # batch-major: strips sweep rows
        in_specs=[
            pl.BlockSpec((1, 4), lambda bs, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((s_strips, ws, res, c3), lambda bs, r: (bs, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, nfull, nfull), lambda bs, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nfull, nfull),
                         (lambda bs, r: (r, 0, 0)) if has_mask
                         else (lambda bs, r: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (s_strips, ws, res, c), lambda bs, r: (bs, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bfull, res, res, c), jnp.int8),
        interpret=interpret,
    )(scalars, qkv_p, bias_p, mask_p)
    return out[:b]


def lis_attention_ref(
    q_q, k_q, v_q, score_requant, attn_scale, out_requant, lis_bits=4, lis=True
):
    """jnp reference twin (parity tests, CPU fallback)."""
    acc = jnp.einsum(
        "bnd,bmd->bnm", q_q.astype(jnp.int32), k_q.astype(jnp.int32)
    ).astype(jnp.float32)
    attn_c = jnp.clip(jnp.round(acc * score_requant), -128, 127)
    n = attn_c.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, attn_c.shape, 2)
    sa = jnp.asarray(attn_scale, jnp.float32)
    if lis:
        attn_pot = _lis_from_scores(attn_c, sa, col, n, lis_bits)
    else:
        attn_pot = _fp_softmax_from_scores(attn_c, sa, col, n)
    av = jnp.einsum("bnm,bmd->bnd", attn_pot, v_q.astype(jnp.float32))
    return jnp.clip(jnp.round(av * out_requant), -128, 127).astype(jnp.int8)
