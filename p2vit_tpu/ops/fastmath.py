"""Exact power-of-two float ops via exponent-bit manipulation.

The LIS attention and integer-LN kernels need ``2^k`` (k integral) and
``floor(log2 x)`` — all exactly representable operations that the VPU would
otherwise run through multi-cycle transcendental approximations. IEEE-754
f32 makes both single integer ops:

  2^k            = bitcast((k + 127) << 23)          for k ∈ [-126, 128]
  floor(log2 x)  = ((bitcast(x) >> 23) & 0xff) - 127 for normal x > 0

Edge cases line up with the transcendental versions everywhere the kernels
use them: k = 128 produces +inf (so the LIS overflow mask fires identically)
and x = 0 yields -127 - 127 = ... the biased exponent 0 → -127, which the
int-LN M·2^-N clamp maps to the same (M=0, N=31) as log2(0) = -inf did.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exp2i(k):
    """2**k for integer-valued f32 ``k`` (exact, no transcendental)."""
    bits = (k.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def floor_log2(x):
    """floor(log2(x)) as f32 for positive ``x`` (exponent-field extract)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return (((bits >> 23) & 0xFF) - 127).astype(jnp.float32)
