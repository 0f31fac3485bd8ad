"""Pallas TPU kernel: int8 matmul + residual junction + following integer LN.

The deepest fusion in the serving pipeline. After the residual junctions
(proj→qact3→+x→qact2 and fc2→qact2→+x→qact4) the very next op is always an
integer LayerNorm whose row statistics need the full channel dim — and the
matmul's N (=C) fits one block, so the epilogue already holds complete rows.
Fusing the LN here removes every mid-block standalone LN pass (2 per block,
~0.35 ms each at DeiT-S batch 256).

Outputs per tile:
  res_out: the residual-carrier codes (qact2 / qact4) — still needed by the
           next junction,
  ln_out:  the LN'd codes of the consumer (attention qact0 / mlp qact0),
           with the smoothquant ratio folded (serving._int_ln_codes math).

All steps replicate the two-kernel sequence bit for bit: intermediate
round/clip at the mid node, the same f32 association in the requant-add, and
the same M·2⁻ᴺ LayerNorm ops (ops/intln.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intln import ln_mn_chain


def _kernel(s1_ref, x_ref, w_ref, rb_ref, res_ref, vec_ref, res_o_ref,
            ln_o_ref, *, qmin, qmax, c_true, bypass_vpu=False):
    s1 = s1_ref[0, 0]
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        # int dot: pin DEFAULT or the global matmul_precision=highest stamps
        # contract_precision<fp32> onto the i8 tpu.matmul (Mosaic rejects)
        precision=jax.lax.Precision.DEFAULT,
    )
    r = rb_ref[0, :][None, :]
    b = rb_ref[1, :][None, :]
    # mid-node codes (round/clip is load-bearing for parity)
    mid = jnp.clip(jnp.round(acc.astype(jnp.float32) * r + b), qmin, qmax)
    if bypass_vpu:
        # TIMING-ONLY probe (wrong values, same I/O): keep the dot, the
        # requant, the residual-operand DMA (one real add keeps it live
        # against DCE) and both output writes, but skip the res-junction
        # multiplies and the whole int-LN chain. The end-to-end delta vs
        # the full kernel is the IN-SITU VPU cost of the junction chains
        # (tools/resln_insitu.py; the additive model only had standalone
        # differentials for this term — BENCH.md round-4 cross-check).
        val = jnp.clip(mid + res_ref[:].astype(jnp.float32), qmin, qmax)
        codes = val.astype(jnp.int8)
        res_o_ref[:] = codes
        ln_o_ref[:] = codes
        return
    s_mid = vec_ref[0, :][None, :]
    s_res = vec_ref[1, :][None, :]
    inv_s_out = vec_ref[2, :][None, :]  # hoisted reciprocal (see wrapper)
    val = mid * s_mid + res_ref[:].astype(jnp.float32) * s_res
    res_codes = jnp.clip(jnp.round(val * inv_s_out), qmin, qmax)
    res_o_ref[:] = res_codes.astype(jnp.int8)

    # integer LN on the residual codes (shared chain, ops/intln.py)
    mask = vec_ref[3, :][None, :]
    w_os = vec_ref[4, :][None, :]
    b_os = vec_ref[5, :][None, :]
    ratio = vec_ref[6, :][None, :]
    x = res_codes * mask
    sx = jnp.sum(x, axis=1, keepdims=True)
    sxx = jnp.sum(x * x, axis=1, keepdims=True)
    y = ln_mn_chain(x, sx, sxx, s1, c_true, w_os, b_os)
    ln_o_ref[:] = jnp.clip(jnp.round(y * ratio), qmin, qmax).astype(jnp.int8)


def _pad_vec(v, n, mult):
    v = jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,))
    pad = (-n) % mult
    return jnp.pad(v, (0, pad)) if pad else v


@functools.partial(
    jax.jit,
    static_argnames=("qmin", "qmax", "block_m", "interpret", "bypass_vpu"),
)
def int8_matmul_res_ln(
    x_q,
    w_q,
    requant_scale,
    bias_scaled,
    res_q,
    s_mid,
    s_res,
    s_out,
    ln_w,
    ln_b,
    ln_out_scale,
    ratio,
    qmin: int = -128,
    qmax: int = 127,
    block_m: int = 256,
    interpret: bool = False,
    bypass_vpu: bool = False,
):
    """Returns (res_codes, ln_codes), both (M, N) int8.

    Requires the full output width in one block (N = C ≤ 2048), which holds
    for every residual junction in the zoo (proj/fc2 have N = embed_dim).
    ``s_out`` (the residual node's scale vector) supplies the LN's input
    scale: s1 = min(s_out), ptf_mask = round(s_out/s1).
    """
    m, k = x_q.shape
    n = w_q.shape[0]
    if m % block_m:
        for cand in (512, 384, 256, 128):
            if m % cand == 0:
                block_m = cand
                break
    npad = -(-n // 128) * 128
    assert npad <= 2048, "residual+LN fusion needs the full row in one block"
    kpad = (-k) % 128  # K must be a lane multiple for the int8 MXU
    x_p = jnp.pad(x_q, ((0, (-m) % block_m), (0, kpad)))
    w_p = jnp.pad(w_q, ((0, npad - n), (0, kpad)))
    k = k + kpad
    res_p = res_q if (m % block_m == 0 and npad == n) else jnp.pad(
        res_q, ((0, (-m) % block_m), (0, npad - n))
    )
    rb = jnp.stack([_pad_vec(requant_scale, n, 128), _pad_vec(bias_scaled, n, 128)])
    s_out_v = jnp.broadcast_to(jnp.asarray(s_out, jnp.float32), (n,))
    s1 = s_out_v.min()
    ptf_mask = jnp.round(s_out_v / s1)
    # hoisted constants: the residual requant reciprocal and the LN chain's
    # /out_scale divides (ln_mn_chain) — one vector divide here instead of a
    # per-element divide in the kernel. Exact for the PoT scales the search
    # produces; for non-PoT ablation scales this differs from a true divide
    # only at 1-ulp knife edges (serving twins change in lockstep).
    osc = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(ln_out_scale, jnp.float32), (n,)), 1e-30
    )
    vecs = jnp.stack(
        [
            _pad_vec(s_mid, n, 128),
            _pad_vec(s_res, n, 128),
            1.0 / jnp.maximum(_pad_vec(s_out, n, 128), 1e-30),
            _pad_vec(ptf_mask, n, 128),
            _pad_vec(jnp.asarray(ln_w, jnp.float32) / osc, n, 128),
            _pad_vec(jnp.asarray(ln_b, jnp.float32) / osc, n, 128),
            _pad_vec(ratio, n, 128),
        ]
    )
    mp = x_p.shape[0]

    res_out, ln_out = pl.pallas_call(
        functools.partial(_kernel, qmin=qmin, qmax=qmax, c_true=float(n),
                          bypass_vpu=bypass_vpu),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, npad), jnp.int8),
            jax.ShapeDtypeStruct((mp, npad), jnp.int8),
        ),
        interpret=interpret,
    )(s1.reshape(1, 1), x_p, w_p, rb, res_p, vecs)
    return res_out[:m, :n], ln_out[:m, :n]


def res_ln_epilogue_ref(
    acc, requant_scale, bias_scaled, res_q, s_mid, s_res, s_out,
    ln_w, ln_b, ln_out_scale, ratio, qmin=-128, qmax=127,
):
    """Everything this kernel does AFTER its dot, on a raw int32 accumulator.

    The row-parallel TP junction (parallel/tensor.py) computes per-device
    partial int32 accumulators over its in-feature shard, ``psum``s them
    across the "model" mesh axis, and then runs this — bitwise-identical to
    the single-device fused kernel because int32 addition is exact (max
    |acc| < 2^26 at ViT shapes) and the f32 chain below is the very code
    ``int8_matmul_res_ln_ref`` runs (which the kernel-parity tests pin
    against the Pallas kernel bit for bit).
    """
    n = acc.shape[-1]
    mid = jnp.clip(
        jnp.round(
            acc.astype(jnp.float32) * requant_scale[None, :]
            + bias_scaled[None, :]
        ),
        qmin, qmax,
    )
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,))[None, :]
    val = mid * bc(s_mid) + res_q.astype(jnp.float32) * bc(s_res)
    inv_s_out = 1.0 / jnp.maximum(bc(s_out), 1e-30)  # kernel's hoisted form
    res_codes = jnp.clip(jnp.round(val * inv_s_out), qmin, qmax).astype(
        jnp.int8
    )
    s_out_v = jnp.broadcast_to(jnp.asarray(s_out, jnp.float32), (n,))
    s1 = s_out_v.min()
    mask = jnp.round(s_out_v / s1)
    x = res_codes.astype(jnp.float32) * mask
    sx = x.sum(axis=1, keepdims=True)
    sxx = (x * x).sum(axis=1, keepdims=True)
    osc = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(ln_out_scale, jnp.float32), (n,)), 1e-30
    )
    w_os = (jnp.asarray(ln_w, jnp.float32) / osc)[None, :]
    b_os = (jnp.asarray(ln_b, jnp.float32) / osc)[None, :]
    rat = jnp.broadcast_to(jnp.asarray(ratio, jnp.float32), (n,))[None, :]
    y = ln_mn_chain(x, sx, sxx, s1, float(n), w_os, b_os)
    ln_codes = jnp.clip(jnp.round(y * rat), qmin, qmax).astype(jnp.int8)
    return res_codes, ln_codes


def int8_matmul_res_ln_ref(
    x_q, w_q, requant_scale, bias_scaled, res_q, s_mid, s_res, s_out,
    ln_w, ln_b, ln_out_scale, ratio, qmin=-128, qmax=127,
):
    """jnp twin: the exact two-step sequence this kernel fuses (same hoisted
    reciprocal/vector forms, bit for bit) — a full-K dot plus
    ``res_ln_epilogue_ref``."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return res_ln_epilogue_ref(
        acc, requant_scale, bias_scaled, res_q, s_mid, s_res, s_out,
        ln_w, ln_b, ln_out_scale, ratio, qmin, qmax,
    )
