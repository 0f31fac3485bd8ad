"""Exact exponent-field integer math for the serving kernels' VPU chains.

The LIS softmax and integer-LN epilogues are VPU-bound, and their cost is
dominated by transcendentals (`log2`, `exp2`) applied to values that are
integers or only consumed through ⌊log2 ·⌋. Both have exact 3-4 op integer
formulations via the IEEE-754 exponent field:

  * ``floor_log2i(x)`` = unbiased exponent of x — for positive NORMAL x this
    IS ⌊log2 x⌋ exactly (mantissa ∈ [1,2)), with no dependence on the
    rounding of a polynomial log2.
  * ``exp2i(k)`` constructs 2^k by placing k+127 in the exponent field —
    exact for k ∈ [-126, 127], +inf for k = 128 (matching ``exp2`` overflow),
    ±0 for k ≤ -127 (where ``exp2`` would return a subnormal; callers must
    only rely on k ≥ -126, see each call site's range argument).

Equivalence notes for the call sites (each carries its own proof):

  * LIS ``big = floor(log2(softmax_out))`` with integer softmax_out: XLA's
    faithfully-rounded log2 and the exact exponent agree for all integers
    < 2^19 (a flip needs |log2 x - k| < ~2 ulp(k), i.e. x within 2^(k-19) of
    2^k — impossible for integers when k < 19). For softmax_out ≥ 2^19 the
    two can differ, but every such row has big ≥ 19 > 2^lis_bits-1 (4-bit
    LIS ⇒ threshold 16) and is masked to exactly 0 by the overflow rule in
    BOTH formulations. Kernel output is bit-identical.
  * int-exp ``2^(N-q)`` with integer q ∈ [0, N]: exp2 of a small integer is
    exact in any implementation; so is the constructed value.
  * int-LN ``N = clip(bit - floor(log2 a), 0, 31)`` with ARBITRARY positive
    a: the exponent field is the mathematically exact ⌊log2 a⌋, while
    log2-then-floor can flip to k for a ∈ (2^k(1-ε), 2^k). This changes the
    (M, N) pair only on that measure-zero sliver, where both encodings
    represent the same value to ≤ 1/255 relative — within the serving-vs-
    simulation statistical envelope (serving.py module docstring). The
    simulation twin (quant/intops.get_mn) deliberately KEEPS jnp.log2 so it
    stays op-for-op parallel to the torch reference
    (/root/reference/models/ptq/layers.py:294-337).

(An earlier round measured an exponent-trick variant SLOWER than the VPU
transcendentals on the then-current toolchain and deleted this module; the
2026-08-16 Mosaic rewrite changed that — see BENCH.md for the A/B.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def floor_log2i(x: jnp.ndarray) -> jnp.ndarray:
    """Unbiased IEEE exponent of f32 ``x`` as int32.

    Exactly ⌊log2 x⌋ for positive normal x; -127 for ±0 and subnormals;
    128 for ±inf/NaN. The sign bit is ignored (callers pass x ≥ 0).
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def exp2i(k: jnp.ndarray) -> jnp.ndarray:
    """2.0**k for int32 ``k`` ∈ [-126, 128] via exponent construction.

    k = 128 gives +inf (like exp2 overflow); k = -127 gives +0.0 — callers
    must show k ≥ -126 or tolerate 0 (exp2 would give a subnormal there).
    """
    return jax.lax.bitcast_convert_type(
        jnp.left_shift(k + 127, 23), jnp.float32
    )
