"""Pallas TPU kernel: bf16 matmul with a STREAMED quantized weight store.

Weight-only serving (serving.weight_only_params) runs the plain bf16 XLA
forward over dequantized weight constants — bf16 speed by construction
(BENCH.md §"Weight-only serving arm"). At small batch that forward is
weight-DMA-bound (~22 MB of DeiT-S weights vs ~0.3 MB of activations per
batch-1 forward), so the remaining lever below the int8-over-bf16
crossover is WEIGHT BYTES: stream the int8/int4 weight codes instead of
bf16 weights, dequantize in VMEM, and run the same bf16 MXU matmul.

Layout: raw int8 arrays DMA at ~100 GB/s on this chip (the (32,128) int8
tile defeats bursts — BENCH.md §"Measured hardware rates") while int32
moves at f32 rate, so the packed stores carry 4 byte-codes (or 8 nibble
codes) per int32 word. Packing splits K into P contiguous panels, pads
each panel to the 128-lane quantum, and puts panel p's code at byte
(nibble) p of the word — the unpack is shift+mask+convert with every code
staying in its own lane (no cross-lane shuffle, the same reasoning as
matmul_int8.pack_int4), followed by P panel dots on the MXU.

Exactness: weight codes (|w| ≤ 127) and PoT scales are exactly
representable in bf16, and the per-out-channel scale factors out of the
contraction, so `acc(x, codes)·s_w` equals the XLA forward's
`x @ (codes·s_w)ᵀ` up to f32 accumulation ORDER: the packed stores
contract split-K (one partial accumulator per panel), so vs the
single-dot XLA weight-only forward they agree to ≤1 ulp of the bf16
output (≤2 through the many-rounding GELU chain), and BITWISE vs the
panel-matched jnp ref twin when gelu=False — the PoT row scale makes
acc·r exact, leaving the epilogue a single f32 rounding
(tests/test_wstream.py pins all of this). The SmoothQuant fold
(w_eff = fq(w·cs)/cs, serving.weight_only_params) moves to the
activation side: pre-scale x by 1/cs (PoT → exact in bf16) and stream
the raw codes.

The reference has no serving path at all (SURVEY §0); this kernel probes
the TPU-native lever for the latency regime its own crossover
measurements say full-int8 serving loses (BENCH.md §"Small-batch latency
A/B"). ON-CHIP VERDICT (2026-08-19, tools/wstream_bench.py, two
captures incl. one with explicit bf16-const baseline): measured dead-end
for latency — the Pallas bf16 control arm runs 14-21% behind XLA's
constant-stream rate at these thin shapes, and no packed byte saving
climbs back over it on the chain (best arm 0.80-0.93× of the XLA
weight-only chain; w4p does win the one deit_base-fc2-scale GEMM
outright, 1.053×). Kept in-tree as the documented experiment and as the
HBM-capacity option (w4p = 4× weight residency at K ≥ 1024). Full study:
BENCH.md §"Streamed-weight bf16 matmul (wstream)".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul_int8 import _gelu_exact, _pad_to, _pick_blocks

LANE = 128


def _panel_len(k: int, panels: int) -> int:
    """Per-panel length: K split into `panels` parts, padded to 128 lanes."""
    per_panel = -(-k // panels)
    return -(-per_panel // LANE) * LANE


def pack_w8(w_q: jnp.ndarray) -> jnp.ndarray:
    """Pack (N, K) int8 codes into (N, ceil(K/4→lane)) int32 words.

    Word j of row n holds panel p's code w[n, p·PK + j] in byte p
    (PK = the 128-padded quarter-K panel length). K pads to 4·PK with
    zero codes, which contract to exact zeros.
    """
    k = w_q.shape[1]
    pk = _panel_len(k, 4)
    w = _pad_to(w_q, 1, 4 * pk) if k != 4 * pk else w_q
    w32 = w.astype(jnp.int32) & 0xFF
    panels = [w32[:, p * pk:(p + 1) * pk] for p in range(4)]
    out = panels[0]
    for p in range(1, 4):
        out = out | (panels[p] << (8 * p))
    return out.astype(jnp.int32)


def pack_w4(w_q: jnp.ndarray) -> jnp.ndarray:
    """Pack (N, K) int4-valued codes into (N, ceil(K/8→lane)) int32 words.

    Word j holds panel p's code in nibble p (8 panels of the 128-padded
    K/8 panel length). Values must lie in [-8, 7] (int4 weight codes,
    quant/bit_type.py); out-of-range non-traced input raises. Traced
    input CANNOT raise on values — it saturates to [-8, 7] (clip, not
    nibble wraparound) AND emits a runtime jax.debug warning with the
    offending count (advisor r4: silent saturation inside a jitted
    pipeline gave a mis-routed int8 tensor no signal at all). Intended
    call site is host-side weight constants (tools/wstream_bench.py,
    serving conversion) — packing inside jit is supported but the codes
    should already be int4-solved there.
    """
    k = w_q.shape[1]
    if not isinstance(w_q, jax.core.Tracer):
        import numpy as np

        wv = np.asarray(w_q)
        if wv.size and (wv.min() < -8 or wv.max() > 7):
            raise ValueError(
                f"pack_w4 expects int4 codes in [-8, 7]; got "
                f"[{wv.min()}, {wv.max()}]")
    else:
        clipped = jnp.clip(w_q, -8, 7)
        n_bad = jnp.sum((w_q != clipped).astype(jnp.int32))
        jax.lax.cond(
            n_bad > 0,
            lambda n: jax.debug.print(
                "pack_w4 WARNING: {n} codes outside [-8, 7] saturated — "
                "mis-routed int8 tensor?", n=n),
            lambda n: None,
            n_bad)
        w_q = clipped
    pk = _panel_len(k, 8)
    w = _pad_to(w_q, 1, 8 * pk) if k != 8 * pk else w_q
    w32 = w.astype(jnp.int32) & 0xF
    out = w32[:, :pk]
    for p in range(1, 8):
        out = out | (w32[:, p * pk:(p + 1) * pk] << (4 * p))
    return out.astype(jnp.int32)


def _dot_bf16(a, b):
    # bf16 × bf16 → f32 accumulation on the MXU. Pin DEFAULT precision:
    # the package-global jax_default_matmul_precision=highest (needed by
    # the f32 PoT searches) would request a multi-pass contraction.
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel(x_ref, w_ref, r_ref, b_ref, o_ref, *, w_format, pk, gelu):
    xv = x_ref[:]
    if w_format == "bf16":
        acc = _dot_bf16(xv, w_ref[:])
    elif w_format == "i8":
        acc = _dot_bf16(xv, w_ref[:].astype(jnp.bfloat16))
    elif w_format == "w8p":
        w32 = w_ref[:]
        acc = None
        for p in range(4):
            panel = ((((w32 >> (8 * p)) & 0xFF) ^ 0x80) - 0x80)
            d = _dot_bf16(xv[:, p * pk:(p + 1) * pk],
                          panel.astype(jnp.bfloat16))
            acc = d if acc is None else acc + d
    elif w_format == "w4p":
        w32 = w_ref[:]
        acc = None
        for p in range(8):
            panel = ((((w32 >> (4 * p)) & 0xF) ^ 8) - 8)
            d = _dot_bf16(xv[:, p * pk:(p + 1) * pk],
                          panel.astype(jnp.bfloat16))
            acc = d if acc is None else acc + d
    else:  # pragma: no cover - guarded in the wrapper
        raise ValueError(w_format)
    y = acc * r_ref[:] + b_ref[:]
    if gelu:
        y = _gelu_exact(y)
    o_ref[:] = y.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("w_format", "gelu", "block_m", "block_n", "interpret"),
)
def wstream_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    row_scale: jnp.ndarray,
    bias: jnp.ndarray,
    w_format: str = "w8p",
    gelu: bool = False,
    block_m: int = 256,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = [gelu](x @ codesᵀ · row_scale[n] + bias[n]) in bf16.

    Args:
      x: (M, K) bf16 activations. For SmoothQuant layers pre-scale by the
        PoT 1/cs OUTSIDE (exact in bf16; weight_only_params' fold).
      w: weight store per ``w_format``:
        "bf16" — (N, K) bf16 dequantized weights (XLA-parity arm);
        "i8"   — (N, K) int8 codes (raw int8 DMA-rate arm);
        "w8p"  — pack_w8(codes), int32 words at f32 DMA rate, 2× fewer
                 weight bytes than bf16 (1.5× when K < 512 pads);
        "w4p"  — pack_w4(int4 codes), up to 4× fewer bytes (K ≥ 1024).
      row_scale: (N,) f32 per-out-channel weight scale s_w (PoT).
      bias: (N,) f32.
    Returns (M, N) bf16.
    """
    if w_format not in ("bf16", "i8", "w8p", "w4p"):
        raise ValueError(f"unknown w_format {w_format!r}")
    m, k = x.shape
    n = row_scale.shape[0]
    panels = {"bf16": 1, "i8": 1, "w8p": 4, "w4p": 8}[w_format]
    pk = _panel_len(k, panels)
    kp = panels * pk
    if w.shape[0] != n:
        raise ValueError(
            f"weight store has {w.shape[0]} rows; row_scale has {n}")
    block_m, block_n = _pick_blocks(m, n, block_m, block_n)
    x_p = _pad_to(_pad_to(x.astype(jnp.bfloat16), 0, block_m), 1, kp)
    if w_format in ("bf16", "i8"):
        if w.shape[1] != k:
            raise ValueError(
                f"{w_format} store has {w.shape[1]} cols; x has K={k}")
        w_p = _pad_to(_pad_to(w, 0, block_n), 1, kp)
        wk = kp
    else:
        if w.shape[1] != pk:
            raise ValueError(
                f"{w_format} store has {w.shape[1]} words/row; expected "
                f"{pk} for K={k} — repack with "
                f"{'pack_w8' if w_format == 'w8p' else 'pack_w4'}")
        w_p = _pad_to(w, 0, block_n)
        wk = pk
    r_p = _pad_to(row_scale.astype(jnp.float32), 0, block_n).reshape(1, -1)
    b_p = _pad_to(bias.astype(jnp.float32), 0, block_n).reshape(1, -1)
    mp, np_ = x_p.shape[0], w_p.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, w_format=w_format, pk=pk, gelu=gelu),
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, x_p.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, wk), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=2 * mp * kp + w_p.size * w_p.dtype.itemsize
            + 2 * mp * np_,
            transcendentals=mp * np_ if gelu else 0,
        ),
        interpret=interpret,
    )(x_p, w_p, r_p, b_p)
    return out[:m, :n]


def wstream_ref(x, w_q, row_scale, bias, gelu=False, panels=1):
    """jnp twin: same math, XLA execution (parity tests + CPU fallback).

    ``panels`` mirrors the packed stores' split-K contraction (4 for w8p,
    8 for w4p): a sum of per-panel f32 accumulators is bitwise what the
    packed kernel computes but differs from the single-dot contraction in
    f32 accumulation ORDER — i.e. vs the XLA weight-only forward the
    packed arms agree up to ≤1 ulp of the bf16 output (pinned at argmax
    level by the serving tests), while panel-matched twin vs kernel is
    bitwise.
    """
    xb = x.astype(jnp.bfloat16)
    wb = w_q.astype(jnp.bfloat16)
    k = xb.shape[1]
    pk = _panel_len(k, panels)
    if panels > 1 and k != panels * pk:
        xb = _pad_to(xb, 1, panels * pk)
        wb = _pad_to(wb, 1, panels * pk)
    acc = None
    for p in range(panels):
        d = jax.lax.dot_general(
            xb[:, p * pk:(p + 1) * pk], wb[:, p * pk:(p + 1) * pk],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = d if acc is None else acc + d
    y = acc * row_scale[None, :].astype(jnp.float32) + bias[None, :]
    if gelu:
        y = _gelu_exact(y)
    return y.astype(jnp.bfloat16)
