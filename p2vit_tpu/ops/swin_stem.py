"""Pallas TPU kernel: the Swin patch stem, fused end to end.

The Swin serving prologue — f32 patch matmul (+bias), requant to codes,
patch-norm integer LN — cost 2.2 ms standalone at Swin-T batch 64
(tools/swin_glue_bench.py 2026-08-17): three XLA/kernel passes with two
full (B·L, C) HBM round trips between them, one of them f32. This kernel
reads the f32 patch matrix once and emits the patch-qact int8 codes once:

  h     = patches @ wᵀ + bias            (f32 MXU; weights are the
                                          DEQUANTIZED w_q·sw — the fp
                                          patch stem of serving_swin.py;
                                          the caller fake-quantizes the
                                          image first, qact_input)
  codes = clip(round(h · 1/s_bn))        (patch_qact_bn node)
  out   = int-LN(codes)                  (patch_norm → patch_qact codes,
                                          shared ln_mn_chain)

Same hoisted-reciprocal serving math as every other LN entry point; the
jnp twin (``fused_swin_stem_ref``) replicates it bit for bit. The f32 dot
runs at the package-global highest precision like the unfused XLA stem,
but its in-kernel tiling order may differ from XLA's → 1-ulp accumulator
differences at requant knife edges are possible between fused and unfused
(serving-vs-sim stays within the statistical bar).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intln import _pad_to, ln_mn_chain


def _kernel(s1_ref, px_ref, wt_ref, vec_ref, o_ref, *, c_true):
    s1 = s1_ref[0, 0]
    bias = vec_ref[0, :][None, :]
    inv_sbn = vec_ref[1, :][None, :]
    mask = vec_ref[2, :][None, :]
    w_os = vec_ref[3, :][None, :]
    b_os = vec_ref[4, :][None, :]

    h = jax.lax.dot_general(
        px_ref[:], wt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
    ) + bias
    codes = jnp.clip(jnp.round(h * inv_sbn), -128, 127)

    x = codes * mask
    sx = jnp.sum(x, axis=1, keepdims=True)
    sxx = jnp.sum(x * x, axis=1, keepdims=True)
    y = ln_mn_chain(x, sx, sxx, s1, c_true, w_os, b_os)
    o_ref[:] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def fused_swin_stem(
    patches: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    s_bn: jnp.ndarray,
    ln_w: jnp.ndarray,
    ln_b: jnp.ndarray,
    out_scale: jnp.ndarray,
    block_m: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, K) f32 patch rows → (M, C) int8 patch-qact codes.

    Args:
      patches: (M, K) f32 patch matrix (models/swin._patches, flattened).
      w: (C, K) f32 DEQUANTIZED patch weights (w_q · sw).
      bias: (C,) f32 patch-embed bias.
      s_bn: patch_qact_bn scale (scalar or (C,)) — the mid-node requant.
      ln_w/ln_b: (C,) patch_norm affine.
      out_scale: patch_qact scale (scalar or (C,)) — the LN consumer node.
    """
    m, k = patches.shape
    c = w.shape[0]
    px = _pad_to(patches.astype(jnp.float32), 1, 128)
    kpad = px.shape[1]
    wt = _pad_to(_pad_to(jnp.asarray(w, jnp.float32), 1, 128).T, 1, 128)
    cpad = wt.shape[1]
    px = _pad_to(px, 0, block_m)
    mp = px.shape[0]

    s_bn_v = jnp.broadcast_to(jnp.asarray(s_bn, jnp.float32), (c,))
    s1 = s_bn_v.min()
    ptf_mask = jnp.round(s_bn_v / s1)
    osc = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (c,)), 1e-30
    )
    vecs = jnp.stack(
        [
            _pad_to(jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c,)), 0, 128)
            for v in (
                bias,
                1.0 / jnp.maximum(s_bn_v, 1e-30),
                ptf_mask,
                jnp.asarray(ln_w, jnp.float32) / osc,
                jnp.asarray(ln_b, jnp.float32) / osc,
            )
        ]
    )

    out = pl.pallas_call(
        functools.partial(_kernel, c_true=float(c)),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, kpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, cpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, cpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cpad), jnp.int8),
        interpret=interpret,
    )(s1.reshape(1, 1), px, wt, vecs)
    return out[:m, :c]


def fused_swin_stem_ref(patches, w, bias, s_bn, ln_w, ln_b, out_scale):
    """jnp twin: identical hoisted-reciprocal chain, bit for bit."""
    m, k = patches.shape
    c = w.shape[0]
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c,))[None, :]
    h = patches.astype(jnp.float32) @ jnp.asarray(w, jnp.float32).T + bc(bias)
    s_bn_v = jnp.broadcast_to(jnp.asarray(s_bn, jnp.float32), (c,))
    codes = jnp.clip(
        jnp.round(h * (1.0 / jnp.maximum(s_bn_v, 1e-30))[None, :]), -128, 127
    )
    s1 = s_bn_v.min()
    mask = jnp.round(s_bn_v / s1)[None, :]
    osc = jnp.maximum(bc(out_scale), 1e-30)
    x = codes * mask
    sx = x.sum(axis=1, keepdims=True)
    sxx = (x * x).sum(axis=1, keepdims=True)
    y = ln_mn_chain(x, sx, sxx, s1, float(c), bc(ln_w) / osc, bc(ln_b) / osc)
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
