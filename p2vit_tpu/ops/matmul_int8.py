"""Pallas TPU kernel: int8 matmul with fused PoT shift-requant epilogue.

The core serving primitive of the P²-ViT dataflow: with every scale a power
of two (the point of the paper), the requantization after a matmul is
``(acc << k) + b`` — here realized as an exact multiply by the f32 power-of-
two ``requant_scale`` fused into the matmul epilogue, so the int32
accumulator never round-trips to HBM and no fp rescale op exists between
layers (BASELINE.json north star; the reference has no kernel code — its
accelerator exists only in the paper, SURVEY §0).

Epilogues:
  * plain:  out = clip(round(acc·r + b))            (r = s_x·s_w/s_out)
  * gelu:   out = clip(round(gelu(acc·r + b)·inv))  (r = s_x·s_w, inv = 1/s_out)
    — the fc1→GELU→qact1 fusion of the MLP (the fp GELU runs on the exact
    dequantized accumulator, matching the simulation path's semantics,
    /root/reference/models/layers_quant.py:373-375).

MXU mapping: int8 × int8 → int32 accumulation, 128-aligned tiles, one
(BM, BN) output tile per grid step with the full K panel resident in VMEM
(ViT K ≤ 4096 → ≤ 2 MB per operand tile at BM=BN=256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7).

    Pallas TPU has no erf lowering; this rational+exp form matches f32 libm
    erf to its own accuracy, so GELU codes differ from the erf-GELU
    simulation only at exact rounding knife-edges.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(y):
    # erf-based GELU (torch nn.GELU default, not the tanh approximation)
    return 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))


def _kernel(s_ref, x_ref, w_ref, r_ref, b_ref, o_ref, *, qmin, qmax, gelu,
            raw_store=False, w_contract_dim=1):
    # precision is meaningless for integer matmuls, but the package-global
    # jax_default_matmul_precision=highest (needed by the f32 PoT searches,
    # p2vit_tpu/__init__.py) would otherwise stamp contract_precision<fp32>
    # onto the i8 tpu.matmul, which Mosaic rejects ("Bad lhs type"). Pin
    # DEFAULT on every integer dot.
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (w_contract_dim,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if raw_store:
        # TIMING-ONLY (tools/ceiling_bench.py): truncation store of the raw
        # accumulator — same dot, same DMA, no requant chain. The time
        # difference vs the normal epilogue is the in-kernel cost of the
        # mandated PoT requant (i32→f32, mul, add, round, clip, →i8).
        # The MATH IS WRONG (mod-256 wraparound); never a serving mode.
        o_ref[:] = acc.astype(jnp.int8)
        return
    # PoT requant: exact multiply by 2^k (bit-shift in silicon) + prescaled
    # bias, round-half-even like the simulation path
    y = acc.astype(jnp.float32) * r_ref[:] + b_ref[:]
    if gelu:
        y = _gelu_exact(y) * s_ref[0, 0]
    o_ref[:] = jnp.clip(jnp.round(y), qmin, qmax).astype(jnp.int8)


def _pick_blocks(m, n, block_m, block_n):
    """Choose tile sizes that avoid padding copies.

    Padding M (the big token axis) costs a full extra HBM pass for the pad
    copy and the output slice; a block that divides M exactly makes both
    no-ops. N-side weight/vector pads are tiny, and keeping the whole padded
    N resident (one j step) loads each x tile exactly once.
    """
    if m % block_m:
        for cand in (512, 384, 256, 128):
            if m % cand == 0:
                block_m = cand
                break
    if block_n is None:
        block_n = min(-(-n // 128) * 128, 2048)
    return block_m, block_n


def _pad_to(a, axis, mult):
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(
    jax.jit,
    static_argnames=("qmin", "qmax", "gelu", "block_m", "block_n", "interpret",
                     "raw_store", "w_layout"),
)
def int8_matmul_requant(
    x_q: jnp.ndarray,
    w_q: jnp.ndarray,
    requant_scale: jnp.ndarray,
    bias_scaled: jnp.ndarray,
    out_inv=1.0,
    qmin: int = -128,
    qmax: int = 127,
    gelu: bool = False,
    block_m: int = 256,
    block_n: int | None = None,
    interpret: bool = False,
    raw_store: bool = False,
    w_layout: str = "nk",
) -> jnp.ndarray:
    """out_q = clip(round(epilogue(Σ_k x_q·w_q · requant[n] + bias[n])))

    Args:
      x_q: (M, K) int8 activation codes.
      w_q: (N, K) int8 weight codes (torch (out, in) layout), or (K, N)
        with ``w_layout="kn"``.
      requant_scale: (N,) f32. Plain: s_x·s_w[n]/s_out (powers of two).
        GELU epilogue: s_x·s_w[n] (dequant only).
      bias_scaled: (N,) f32. Plain: bias/s_out; GELU: bias.
      out_inv: scalar f32, 1/s_out — used by the GELU epilogue.
      qmin/qmax: output clamp (the consumer activation node's bounds).
      w_layout: "nk" (default) contracts both operands' LANE axes;
        "kn" stores the weight transposed so its contraction dim K lives
        on SUBLANES (dims ((1,),(0,))). Integer math is layout-invariant —
        the two are bitwise identical (tests/test_serving.py) — but their
        Mosaic lowerings differ; tools/dtpack_ab.py A/Bs them on chip
        (BENCH.md round-4 decision table, VERDICT r3 item 4).
    Returns (M, N) int8 codes of the consumer activation node.
    """
    if w_layout not in ("nk", "kn"):
        raise ValueError(f"w_layout must be 'nk' or 'kn', got {w_layout!r}")
    m, k = x_q.shape
    n = w_q.shape[0] if w_layout == "nk" else w_q.shape[1]
    block_m, block_n = _pick_blocks(m, n, block_m, block_n)
    # K must be a lane multiple for the int8 MXU; zero-pad (exact)
    x_p = _pad_to(_pad_to(x_q, 0, block_m), 1, 128)
    k = x_p.shape[1]
    if w_layout == "nk":
        w_p = _pad_to(_pad_to(w_q, 0, block_n), 1, 128)
        w_spec = pl.BlockSpec((block_n, k), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        np_ = w_p.shape[0]
    else:
        # K on the weight's sublane axis: pad K to match x's padded K (the
        # contraction dims must agree), N to the lane-tiled block
        w_p = _pad_to(_pad_to(w_q, 1, block_n), 0, k)
        w_spec = pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        np_ = w_p.shape[1]
    r_p = _pad_to(requant_scale.astype(jnp.float32), 0, block_n).reshape(1, -1)
    b_p = _pad_to(bias_scaled.astype(jnp.float32), 0, block_n).reshape(1, -1)
    s = jnp.asarray(out_inv, jnp.float32).reshape(1, 1)
    mp = x_p.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, qmin=qmin, qmax=qmax, gelu=gelu,
                          raw_store=raw_store,
                          w_contract_dim=1 if w_layout == "nk" else 0),
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k + np_ * k + mp * np_,
            transcendentals=mp * np_ if gelu else 0,
        ),
        interpret=interpret,
    )(s, x_p, w_p, r_p, b_p)
    return out[:m, :n]


def pack_int4(w_q: jnp.ndarray) -> jnp.ndarray:
    """Pack int4-valued int8 weight codes two-per-byte for the packed store.

    Byte j of row n holds w[n, j] in the LOW nibble and w[n, j + K/2] in the
    HIGH nibble: the kernel unpacks two CONTIGUOUS half-K panels (no lane
    interleave, which Mosaic lowers as an expensive shuffle) and contracts
    each against the matching contiguous activation slice. K must be even;
    values must lie in [-8, 7] (the int4 weight-code range, bit_type.py).
    """
    n, k = w_q.shape
    assert k % 2 == 0
    if not isinstance(w_q, jax.core.Tracer):
        import numpy as np

        wv = np.asarray(w_q)
        if wv.min() < -8 or wv.max() > 7:
            raise ValueError(
                f"pack_int4 expects int4 codes in [-8, 7]; got "
                f"[{wv.min()}, {wv.max()}] — `& 0xF` would silently corrupt "
                f"out-of-range values (w=-100 packs as 12)"
            )
    else:
        # can't raise on traced values; saturate so jit-side packing of a
        # buggy caller degrades to clamped codes instead of `& 0xF` wrap
        # garbage (w=-100 would otherwise pack as 12)
        w_q = jnp.clip(w_q, -8, 7)
    lo = w_q[:, : k // 2].astype(jnp.int32) & 0xF
    hi = w_q[:, k // 2 :].astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def _packed_kernel(s_ref, x_ref, w_ref, r_ref, b_ref, o_ref, *, qmin, qmax,
                   gelu, khalf):
    w32 = w_ref[:].astype(jnp.int32)
    # sign-extend each nibble: low via (v^8)-8, high via arithmetic shift
    lo = (((w32 & 0xF) ^ 8) - 8).astype(jnp.int8)
    hi = (w32 >> 4).astype(jnp.int8)  # int8->int32 was sign-extended
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc = dot(x_ref[:, :khalf], lo) + dot(x_ref[:, khalf:], hi)
    y = acc.astype(jnp.float32) * r_ref[:] + b_ref[:]
    if gelu:
        y = _gelu_exact(y) * s_ref[0, 0]
    o_ref[:] = jnp.clip(jnp.round(y), qmin, qmax).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("qmin", "qmax", "gelu", "block_m", "block_n", "interpret"),
)
def int4_matmul_requant(
    x_q: jnp.ndarray,
    w_packed: jnp.ndarray,
    requant_scale: jnp.ndarray,
    bias_scaled: jnp.ndarray,
    out_inv=1.0,
    qmin: int = -128,
    qmax: int = 127,
    gelu: bool = False,
    block_m: int = 256,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8_matmul_requant with an int4-PACKED weight store (pack_int4).

    Memory-format experiment for W4 serving (VERDICT r2 item 4): weight HBM
    bytes halve; the unpack costs ~4 VPU ops per packed byte plus a split-K
    pair of half-K dots (identical int32 accumulation, exact). The A/B
    against the plain int8 store lives in BENCH.md — weights are a small
    fraction of batch-256 serving traffic, so this is a latency-regime
    (small batch) play.
    """
    m, k2 = x_q.shape
    assert k2 % 2 == 0 and w_packed.shape[1] == k2 // 2
    n = w_packed.shape[0]
    block_m, block_n = _pick_blocks(m, n, block_m, block_n)
    # pad half-K to a lane multiple on BOTH halves (x halves padded alike)
    khalf = k2 // 2
    kh_pad = (-khalf) % 128
    if kh_pad:
        xa = jnp.pad(x_q[:, :khalf], ((0, 0), (0, kh_pad)))
        xb = jnp.pad(x_q[:, khalf:], ((0, 0), (0, kh_pad)))
        x_q = jnp.concatenate([xa, xb], axis=1)
        w_packed = jnp.pad(w_packed, ((0, 0), (0, kh_pad)))
        khalf += kh_pad
    x_p = _pad_to(x_q, 0, block_m)
    w_p = _pad_to(w_packed, 0, block_n)
    r_p = _pad_to(requant_scale.astype(jnp.float32), 0, block_n).reshape(1, -1)
    b_p = _pad_to(bias_scaled.astype(jnp.float32), 0, block_n).reshape(1, -1)
    s = jnp.asarray(out_inv, jnp.float32).reshape(1, 1)
    mp, np_ = x_p.shape[0], w_p.shape[0]

    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, qmin=qmin, qmax=qmax, gelu=gelu, khalf=khalf
        ),
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, 2 * khalf), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, khalf), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        interpret=interpret,
    )(s, x_p, w_p, r_p, b_p)
    return out[:m, :n]


def requant_epilogue_ref(
    acc, requant_scale, bias_scaled, out_inv=1.0, qmin=-128, qmax=127,
    gelu=False,
):
    """The kernel's post-dot chain on a raw int32 accumulator — exactly
    ``_kernel``'s epilogue math (requant → optional GELU → round/clip).

    Factored for the row-parallel TP junctions (parallel/tensor_swin.py):
    psum the int32 partials across the "model" axis, then run this — the
    reduction is exact integer addition, so the result is bitwise equal to
    the single-device fused kernel (same contract as
    ops/matmul_ln.res_ln_epilogue_ref)."""
    y = acc.astype(jnp.float32) * requant_scale[None, :] + bias_scaled[None, :]
    if gelu:
        y = _gelu_exact(y) * jnp.asarray(out_inv, jnp.float32)
    return jnp.clip(jnp.round(y), qmin, qmax).astype(jnp.int8)


def int8_matmul_requant_ref(
    x_q, w_q, requant_scale, bias_scaled, out_inv=1.0, qmin=-128, qmax=127,
    gelu=False,
):
    """jnp reference (for kernel parity tests and CPU fallback)."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return requant_epilogue_ref(acc, requant_scale, bias_scaled, out_inv,
                                qmin, qmax, gelu)
