"""Pallas TPU kernel: ONE kernel per transformer layer.

Motivation (measured, BENCH.md 2026-08-17): int8 arrays move between HBM
and VMEM at only ~100 GB/s on v5e through this stack — about 1/3.5 of the
f32 byte rate — because the (32, 128) int8 tile layout defeats the DMA
burst size. The four-kernel serving pipeline (attention → proj+LN → fc1 →
fc2+LN) moves ~330 MB of int8 activations per DeiT-S batch-256 layer, i.e.
~3.3 ms/layer of pure DMA: the whole forward was DMA-bound, not compute-
bound. Fusing the entire encoder layer into one kernel cuts the per-layer
boundary traffic to h/xc in + h'/xc' out (~78 MB), a ~4× reduction.

Per grid step (G images), entirely in VMEM:

  qkv matmul → requant → per-head LIS attention     (ops/attention_lis.py)
  proj matmul → requant → +residual → int-LN2       (ops/matmul_ln.py math)
  fc1 matmul → GELU → requant                       (ops/matmul_int8.py math)
  fc2 matmul → requant → +residual → int-LN (next)

Every step reuses the SHARED building blocks of the standalone kernels
(heads_attention, ln_mn_chain, _gelu_exact), so the fused layer is
bit-identical to the four-kernel pipeline — asserted end to end in
tests/test_serving.py. Weight panels (~1.8 MB for DeiT-S) use constant
index maps, so Mosaic keeps them resident across grid steps.

Quantization semantics per the reference: qkv/proj epilogues layers
(/root/reference/models/ptq/layers.py:199-231), residual junctions and LN
chaining as in models/vit.py quant_forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_lis import heads_attention
from .intln import ln_mn_chain
from .matmul_int8 import _gelu_exact

_INT = jax.lax.Precision.DEFAULT  # int dots: see matmul_int8._kernel


def _idot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        precision=_INT,
    )


def _kernel(
    s_ref, h_ref, xc_ref, wqkv_ref, qv_ref, wproj_ref, pv_ref, wfc1_ref,
    f1v_ref, wfc2_ref, f2v_ref, ho_ref, xo_ref, *,
    n_valid, lis_bits, qmin, qmax, c, d, num_heads, lis, g, nfull, kfull,
):
    rq, s_attn, ro = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2]
    fc1_inv, s1_ln2, s1_lnn = s_ref[0, 3], s_ref[0, 4], s_ref[0, 5]

    # ---- qkv projection + per-head attention (qact2 codes)
    acc = _idot(h_ref[:].reshape(g * nfull, kfull), wqkv_ref[:])
    qkv = jnp.clip(
        jnp.round(acc.astype(jnp.float32) * qv_ref[0, :] + qv_ref[1, :]),
        qmin, qmax,
    ).astype(jnp.int8).reshape(g, nfull, 3 * c)
    attn = heads_attention(
        qkv, rq, s_attn, ro, n_valid=n_valid, lis_bits=lis_bits, qmin=qmin,
        qmax=qmax, c=c, d=d, num_heads=num_heads, lis=lis,
    ).reshape(g * nfull, c)

    # ---- proj + residual junction + int-LN2 (ops/matmul_ln.py op for op)
    pacc = _idot(attn, wproj_ref[:])
    mid = jnp.clip(
        jnp.round(pacc.astype(jnp.float32) * pv_ref[0, :] + pv_ref[1, :]),
        qmin, qmax,
    )
    val = (
        mid * pv_ref[2, :]
        + xc_ref[:].reshape(g * nfull, c).astype(jnp.float32) * pv_ref[3, :]
    )
    res1 = jnp.clip(jnp.round(val * pv_ref[4, :]), qmin, qmax)  # qact2 codes
    x2 = res1 * pv_ref[5, :]
    sx = jnp.sum(x2, axis=1, keepdims=True)
    sxx = jnp.sum(x2 * x2, axis=1, keepdims=True)
    y2 = ln_mn_chain(x2, sx, sxx, s1_ln2, float(c), pv_ref[6, :][None, :],
                     pv_ref[7, :][None, :])
    mlp_in = jnp.clip(jnp.round(y2 * pv_ref[8, :]), qmin, qmax).astype(jnp.int8)

    # ---- fc1 + GELU (ops/matmul_int8.py gelu epilogue op for op)
    facc = _idot(mlp_in, wfc1_ref[:])
    y1 = facc.astype(jnp.float32) * f1v_ref[0, :] + f1v_ref[1, :]
    h1 = jnp.clip(
        jnp.round(_gelu_exact(y1) * fc1_inv), qmin, qmax
    ).astype(jnp.int8)

    # ---- fc2 + residual junction + int-LN of the NEXT block (or the final
    # encoder norm after the last block)
    f2acc = _idot(h1, wfc2_ref[:])
    mid2 = jnp.clip(
        jnp.round(f2acc.astype(jnp.float32) * f2v_ref[0, :] + f2v_ref[1, :]),
        qmin, qmax,
    )
    val2 = mid2 * f2v_ref[2, :] + res1 * f2v_ref[3, :]
    res2 = jnp.clip(jnp.round(val2 * f2v_ref[4, :]), qmin, qmax)
    xo_ref[:] = res2.reshape(g, nfull, c).astype(jnp.int8)
    x3 = res2 * f2v_ref[5, :]
    sx3 = jnp.sum(x3, axis=1, keepdims=True)
    sxx3 = jnp.sum(x3 * x3, axis=1, keepdims=True)
    y3 = ln_mn_chain(x3, sx3, sxx3, s1_lnn, float(c), f2v_ref[6, :][None, :],
                     f2v_ref[7, :][None, :])
    hn = jnp.clip(jnp.round(y3 * f2v_ref[8, :]), qmin, qmax)
    ho_ref[:] = hn.reshape(g, nfull, c).astype(jnp.int8)


def _vec(v, n):
    return jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,))


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "lis_bits", "lis", "images_per_step",
                     "interpret"),
)
def fused_vit_layer(
    h_q: jnp.ndarray,
    xc_q: jnp.ndarray,
    w_qkv: jnp.ndarray,
    qkv_requant,
    qkv_bias,
    num_heads: int,
    score_requant,
    attn_scale,
    out_requant,
    w_proj: jnp.ndarray,
    proj_requant,
    proj_bias,
    s_mid,
    s_res_prev,
    s_res1,
    ln2_w,
    ln2_b,
    ln2_out,
    ln2_ratio,
    w_fc1: jnp.ndarray,
    fc1_requant,
    fc1_bias,
    fc1_out_inv,
    w_fc2: jnp.ndarray,
    fc2_requant,
    fc2_bias,
    s_mid2,
    s_res2,
    lnn_w,
    lnn_b,
    lnn_out,
    lnn_ratio,
    lis_bits: int = 4,
    lis: bool = True,
    images_per_step: int = 2,
    interpret: bool = False,
):
    """One full quantized encoder layer on (B, N, C) int8 codes.

    Args mirror the four-kernel pipeline in serving.serving_forward:
      h_q: attention-input codes (this block's LN1 output).
      xc_q: residual-carrier codes at scale ``s_res_prev``.
      qkv_requant/bias: (3C,) epilogue of the qkv matmul → qact1 codes.
      score_requant/attn_scale/out_requant: as lis_attention_qkv_fused.
      proj_requant/bias → qact3 codes; s_mid=s_qact3, s_res_prev, s_res1
        form the first residual junction; ln2_* the following int-LN into
        the mlp input node (ln2_out already × smoothquant channel scale,
        ln2_ratio the norm2 quirk ratio).
      fc1_requant/bias + fc1_out_inv: GELU epilogue → mlp qact1 codes.
      fc2_requant/bias → mlp qact2; s_mid2=s_mq2, s_res1, s_res2 form the
        second junction; lnn_* the next block's LN1 (or the final norm).
    Returns (h'_q, xc'_q): next block's attention input and residual codes.
    """
    b, n, c = h_q.shape
    d = c // num_heads
    assert w_qkv.shape == (3 * c, c)
    assert d % 128 == 0 or 128 % d == 0, f"head_dim {d} vs lane width"
    hid = w_fc1.shape[0]
    g = images_per_step
    npad = (-n) % 32
    nfull = n + npad
    kpad = (-c) % 128
    kfull = c + kpad

    def _vmem_bytes(g_):
        """Static working-set estimate: resident weight panels + per-step
        int8 activations + the dominant 32-bit matmul/attention temporaries
        (the same accounting that sized intln's block_m cap)."""
        weights = 3 * c * kfull + c * c + 2 * hid * c  # int8 panels
        acts = g_ * nfull * (kfull + 4 * c)  # int8 in/out blocks
        temps = g_ * nfull * (3 * c + num_heads * nfull + c + hid + c) * 4
        return weights + acts + temps

    # Mosaic enforces ~16 MB of scoped VMEM (BENCH.md 2026-08-16 item 4);
    # shrink the per-step image count instead of failing at compile time on
    # wide-channel geometries (DeiT-B/ViT-L approach the limit at g=2).
    while g > 1 and _vmem_bytes(g) > 14 * 2**20:
        g -= 1
    if _vmem_bytes(g) > 14 * 2**20:
        raise ValueError(
            f"fused_vit_layer working set ~{_vmem_bytes(g) / 2**20:.1f} MiB "
            f"at images_per_step=1 exceeds the ~16 MiB scoped-VMEM budget "
            f"for geometry (n={n}, c={c}, hid={hid}); use the four-kernel "
            "pipeline (fuse_layer=False)"
        )
    h_p = jnp.pad(h_q, ((0, 0), (0, npad), (0, kpad))) if npad or kpad else h_q
    w_qkv_p = jnp.pad(w_qkv, ((0, 0), (0, kpad))) if kpad else w_qkv
    xc_p = jnp.pad(xc_q, ((0, 0), (0, npad), (0, 0))) if npad else xc_q
    bpad = (-b) % g
    if bpad:
        h_p = jnp.pad(h_p, ((0, bpad), (0, 0), (0, 0)))
        xc_p = jnp.pad(xc_p, ((0, bpad), (0, 0), (0, 0)))
    bfull = b + bpad

    s_res1_v = _vec(s_res1, c)
    s1_ln2 = s_res1_v.min()
    s_res2_v = _vec(s_res2, c)
    s1_lnn = s_res2_v.min()
    # same 1e-30 floor as int8_matmul_res_ln (ops/matmul_ln.py) — required
    # for bit-parity with the four-kernel path on dead-channel scales
    ln2_osc = jnp.maximum(_vec(ln2_out, c), 1e-30)
    lnn_osc = jnp.maximum(_vec(lnn_out, c), 1e-30)
    scalars = jnp.stack(
        [
            jnp.asarray(score_requant, jnp.float32),
            jnp.asarray(attn_scale, jnp.float32),
            jnp.asarray(out_requant, jnp.float32),
            jnp.asarray(fc1_out_inv, jnp.float32),
            s1_ln2,
            s1_lnn,
        ]
    ).reshape(1, 6)
    qv = jnp.stack([_vec(qkv_requant, 3 * c), _vec(qkv_bias, 3 * c)])
    pv = jnp.stack(
        [
            _vec(proj_requant, c),
            _vec(proj_bias, c),
            _vec(s_mid, c),
            _vec(s_res_prev, c),
            1.0 / jnp.maximum(s_res1_v, 1e-30),
            jnp.round(s_res1_v / s1_ln2),
            _vec(ln2_w, c) / ln2_osc,
            _vec(ln2_b, c) / ln2_osc,
            _vec(ln2_ratio, c),
        ]
    )
    f1v = jnp.stack([_vec(fc1_requant, hid), _vec(fc1_bias, hid)])
    f2v = jnp.stack(
        [
            _vec(fc2_requant, c),
            _vec(fc2_bias, c),
            _vec(s_mid2, c),
            s_res1_v,
            1.0 / jnp.maximum(s_res2_v, 1e-30),
            jnp.round(s_res2_v / s1_lnn),
            _vec(lnn_w, c) / lnn_osc,
            _vec(lnn_b, c) / lnn_osc,
            _vec(lnn_ratio, c),
        ]
    )

    const = lambda i: (0, 0)
    ho, xo = pl.pallas_call(
        functools.partial(
            _kernel, n_valid=n, lis_bits=lis_bits, qmin=-128.0, qmax=127.0,
            c=c, d=d, num_heads=num_heads, lis=lis, g=g, nfull=nfull,
            kfull=kfull,
        ),
        grid=(bfull // g,),
        in_specs=[
            pl.BlockSpec((1, 6), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((g, nfull, kfull), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nfull, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, kfull), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, nfull, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nfull, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bfull, nfull, c), jnp.int8),
            jax.ShapeDtypeStruct((bfull, nfull, c), jnp.int8),
        ),
        interpret=interpret,
    )(scalars, h_p, xc_p, w_qkv_p, qv, w_proj, pv, w_fc1, f1v, w_fc2, f2v)
    return ho[:b, :n, :], xo[:b, :n, :]
