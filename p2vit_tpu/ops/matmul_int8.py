"""Pallas TPU kernel: int8 matmul with fused PoT shift-requant epilogue.

The core serving primitive of the P²-ViT dataflow: with every scale a power
of two (the point of the paper), the requantization after a matmul is
``(acc << k) + b`` — here realized as an exact multiply by the f32 power-of-
two ``requant_scale`` fused into the matmul epilogue, so the int32
accumulator never round-trips to HBM and no fp rescale op exists between
layers (BASELINE.json north star; the reference has no kernel code — its
accelerator exists only in the paper, SURVEY §0).

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


def _kernel(x_ref, w_ref, r_ref, b_ref, o_ref, *, qmin, qmax):
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # PoT requant: exact multiply by 2^k (bit-shift in silicon) + prescaled
    # bias, round-half-even like the simulation path
    y = acc.astype(jnp.float32) * r_ref[:] + b_ref[:]
    o_ref[:] = jnp.clip(jnp.round(y), qmin, qmax).astype(jnp.int8)


def _pad_to(a, axis, mult):
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(
    jax.jit, static_argnames=("qmin", "qmax", "block_m", "block_n", "interpret")
)
def int8_matmul_requant(
    x_q: jnp.ndarray,
    w_q: jnp.ndarray,
    requant_scale: jnp.ndarray,
    bias_scaled: jnp.ndarray,
    qmin: int = -128,
    qmax: int = 127,
    block_m: int = 256,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """out_q[m,n] = clip(round(Σ_k x_q·w_q · requant[n] + bias[n]))

    Args:
      x_q: (M, K) int8 activation codes.
      w_q: (N, K) int8 weight codes (torch (out, in) layout).
      requant_scale: (N,) f32, = s_x·s_w[n]/s_out — exact powers of two.
      bias_scaled: (N,) f32, = bias[n]/s_out.
      qmin/qmax: output clamp (the consumer activation node's bounds).
    Returns (M, N) int8 codes of the consumer activation node.
    """
    m, k = x_q.shape
    n = w_q.shape[0]
    x_p = _pad_to(x_q, 0, block_m)
    w_p = _pad_to(w_q, 0, block_n)
    r_p = _pad_to(requant_scale.astype(jnp.float32), 0, block_n).reshape(1, -1)
    b_p = _pad_to(bias_scaled.astype(jnp.float32), 0, block_n).reshape(1, -1)
    mp, np_ = x_p.shape[0], w_p.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, qmin=qmin, qmax=qmax),
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k, bytes_accessed=mp * k + np_ * k + mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p, w_p, r_p, b_p)
    return out[:m, :n]


def int8_matmul_requant_ref(x_q, w_q, requant_scale, bias_scaled, qmin=-128, qmax=127):
    """jnp reference (for kernel parity tests and CPU fallback)."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * requant_scale[None, :] + bias_scaled[None, :]
    return jnp.clip(jnp.round(y), qmin, qmax).astype(jnp.int8)
