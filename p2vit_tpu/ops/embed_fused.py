"""Pallas TPU kernel: the ENTIRE serving prologue in one kernel.

Round-2's dissection left ~4 ms of the 38.7 ms DeiT-S batch-256 forward in
the embed glue (tools/glue_bench.py): input quantize (0.5 ms), int8 patch
reorder (0.4), patch matmul (0.5), the requant→cls→pos→requant tail (0.4),
the standalone block-0 int-LN (0.65), plus ~1.5 ms of inter-stage HBM
round trips. Only the roofline-mandated parts survive here: ONE pass over
the f32 patch matrix in, the (xc, h) int8 codes out, everything between —

  quantize → patch matmul → patch-qact requant → qact_embed requant →
  +positional codes → qact1 requant → [cls row] → block-0 integer LN1

— runs in VMEM. Per-op f32 semantics are identical to the unfused
pipeline (same ops, same order; the matmul accumulates exactly in int32 on
both paths), so the kernel output is BIT-IDENTICAL to serving.embed_codes'
four-stage path — asserted in tests/test_serving.py and on chip by
tools/ab_tpu.py.

Quantization semantics per the reference: patch conv as matmul + QAct
chain (/root/reference/models/vit_fquant.py:675-698, layers_quant.py:
462-497), QIntLayerNorm via the shared serving chain (ops/intln.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intln import _pad_to, ln_mn_chain

_I8 = (-128.0, 127.0)


def _kernel(s_ref, px_ref, w_ref, vec_ref, pos_ref, cls_ref, xc_ref, h_ref,
            *, g, n_patch, c_true):
    s_input, r2, s_embed, s1 = (
        s_ref[0, 0], s_ref[0, 1], s_ref[0, 2], s_ref[0, 3]
    )
    r1 = vec_ref[0, :][None, :]
    b1 = vec_ref[1, :][None, :]
    sq1 = vec_ref[2, :][None, :]
    mask = vec_ref[3, :][None, :]
    w_os = vec_ref[4, :][None, :]
    b_os = vec_ref[5, :][None, :]
    kpad = px_ref.shape[-1]
    cpad = w_ref.shape[0]

    # input quantize (qact_input) + patch matmul + patch-qact epilogue.
    # int8 patches arrive PRE-quantized (quantize-then-extract commutes
    # exactly with the extraction permutation; XLA fuses the quantize into
    # the patch transpose, moving 4x fewer bytes — tools/embed_bench.py).
    x = px_ref[:].reshape(g * n_patch, kpad)
    if x.dtype == jnp.int8:
        q = x
    else:
        q = jnp.clip(jnp.round(x / s_input), *_I8).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # see matmul_int8._kernel
    )
    mid1 = jnp.clip(jnp.round(acc.astype(jnp.float32) * r1 + b1), *_I8)
    # qact_embed requant, + positional codes, qact1 requant (PTF vector scale)
    mid2 = jnp.clip(jnp.round(mid1 * r2), *_I8)
    val = mid2.reshape(g, n_patch, cpad) * s_embed + pos_ref[:][None]
    xcp = jnp.clip(jnp.round(val / sq1[None]), *_I8)

    # assemble [cls; patches] rows and the block-0 integer LN1
    cls_row = jnp.broadcast_to(
        cls_ref[:].astype(jnp.float32)[None], (g, 1, cpad)
    )
    xc_all = jnp.concatenate([cls_row, xcp], axis=1)
    xc_ref[:] = xc_all.astype(jnp.int8)
    x2 = xc_all.reshape(g * (n_patch + 1), cpad) * mask
    sx = jnp.sum(x2, axis=1, keepdims=True)
    sxx = jnp.sum(x2 * x2, axis=1, keepdims=True)
    y = ln_mn_chain(x2, sx, sxx, s1, c_true, w_os, b_os)
    h_ref[:] = (
        jnp.clip(jnp.round(y), *_I8)
        .astype(jnp.int8)
        .reshape(g, n_patch + 1, cpad)
    )


@functools.partial(
    jax.jit, static_argnames=("images_per_step", "interpret")
)
def fused_patch_embed(
    patches: jnp.ndarray,
    w_q: jnp.ndarray,
    s_input,
    patch_requant,
    patch_bias,
    embed_requant,
    s_embed,
    pos_val: jnp.ndarray,
    cls_xc: jnp.ndarray,
    s_qact1,
    ln_mask,
    ln_s1,
    ln_w_os,
    ln_b_os,
    images_per_step: int | None = None,
    interpret: bool = False,
):
    """Image patches → (xc, h) int8 codes of the first encoder block.

    Args:
      patches: (B, N_patch, K) patch matrix. f32: raw patches, quantized
        in-kernel. int8: qact_input codes (extract_patches on the quantized
        image — quantize-then-extract and extract-then-quantize commute
        exactly, both are elementwise + permutation; the int8 form moves
        4x fewer HBM bytes and is the serving default).
      w_q: (C, K) int8 patch-embed weight codes.
      s_input: scalar qact_input scale (divides, like the unfused path).
      patch_requant/patch_bias: (C,) matmul epilogue → patch-qact codes.
      embed_requant: scalar s_patch_out/s_embed ratio (qact_embed requant).
      s_embed: scalar; pos_val: (N_patch, C) f32 = pos_codes[1:]·s_pos,
        prefolded (same mul the unfused path does, just hoisted).
      cls_xc: (1, C) int8 — the [CLS] row of xc, identical for every image
        (cls codes and pos row 0 are image-independent), precomputed by the
        caller with the same op chain.
      s_qact1: (C,) PTF vector scale (divides).
      ln_mask/ln_s1/ln_w_os/ln_b_os: block-0 LN1 constants in the shared
        serving form (ops/intln.py int_ln_requant's precomputation).
    Returns (xc, h): (B, N_patch+1, C) int8 code pairs.
    """
    b, n_patch, k = patches.shape
    c = w_q.shape[0]
    px_itemsize = 1 if patches.dtype == jnp.int8 else 4
    if images_per_step is None:
        # on-chip g-sweeps (tools/embed_bench.py): int8 patch blocks
        # pipeline best one image at a time (1.17 vs 1.44 ms at g=2,
        # DeiT-S batch 256); the f32 sweep put g=2 fastest.
        images_per_step = 1 if px_itemsize == 1 else 2
    g = images_per_step

    px = _pad_to(patches, 2, 128)
    kpad = px.shape[2]
    wp = _pad_to(_pad_to(w_q, 0, 128), 1, 128)
    cpad = wp.shape[0]

    def _vmem_bytes(g_):
        """Static working-set estimate: patch block + i32/f32 matmul and
        LN temporaries + weight panel (same accounting as layer_fused's
        guard; the on-chip sweep put g=2 fastest and g=8 over the ~16 MiB
        scoped-VMEM budget at DeiT-S geometry)."""
        n1 = n_patch + 1
        return (
            g_ * n_patch * kpad * px_itemsize  # patch block (f32 or i8)
            + cpad * kpad + 6 * cpad * 4     # weight panel + vecs
            + n_patch * cpad * 4             # pos values
            + g_ * n_patch * cpad * 8        # acc i32 + mid f32
            + g_ * n1 * cpad * 8             # xc_all/x2 f32
            + 2 * g_ * n1 * cpad             # int8 outputs
        )

    while g > 1 and _vmem_bytes(g) > 12 * 2**20:
        g -= 1
    if _vmem_bytes(g) > 14 * 2**20:
        raise ValueError(
            f"fused_patch_embed working set ~{_vmem_bytes(g) / 2**20:.1f} "
            f"MiB at images_per_step=1 exceeds the ~16 MiB scoped-VMEM "
            f"budget for this geometry; use fuse_embed=False"
        )
    bpad = (-b) % g
    if bpad:
        px = jnp.pad(px, ((0, bpad), (0, 0), (0, 0)))
    bfull = b + bpad

    vec = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (c,))
    # pad the qact1 scale with ones: padded lanes divide 0/1 = 0 (mask pads
    # with zeros, so they also add nothing to the LN row sums)
    sq1 = jnp.concatenate([vec(s_qact1), jnp.ones((cpad - c,), jnp.float32)])
    vecs = jnp.stack(
        [
            _pad_to(vec(patch_requant), 0, cpad),
            _pad_to(vec(patch_bias), 0, cpad),
            sq1,
            _pad_to(vec(ln_mask), 0, cpad),
            _pad_to(vec(ln_w_os), 0, cpad),
            _pad_to(vec(ln_b_os), 0, cpad),
        ]
    )
    scalars = jnp.stack(
        [
            jnp.asarray(s_input, jnp.float32),
            jnp.asarray(embed_requant, jnp.float32),
            jnp.asarray(s_embed, jnp.float32),
            jnp.asarray(ln_s1, jnp.float32),
        ]
    ).reshape(1, 4)
    pos_p = _pad_to(jnp.asarray(pos_val, jnp.float32), 1, cpad)
    cls_p = _pad_to(jnp.asarray(cls_xc, jnp.int8).reshape(1, c), 1, cpad)

    const = lambda i: (0, 0)
    xc, h = pl.pallas_call(
        functools.partial(
            _kernel, g=g, n_patch=n_patch, c_true=float(c)
        ),
        grid=(bfull // g,),
        in_specs=[
            pl.BlockSpec((1, 4), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((g, n_patch, kpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpad, kpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_patch, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, n_patch + 1, cpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_patch + 1, cpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bfull, n_patch + 1, cpad), jnp.int8),
            jax.ShapeDtypeStruct((bfull, n_patch + 1, cpad), jnp.int8),
        ),
        interpret=interpret,
    )(scalars, px, wp, vecs, pos_p, cls_p)
    return xc[:b, :, :c], h[:b, :, :c]
