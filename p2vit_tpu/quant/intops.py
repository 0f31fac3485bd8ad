"""Integer-arithmetic LayerNorm and Log-Int-Softmax (simulation path).

TPU-native rebuild of QIntLayerNorm / QIntSoftmax
(/root/reference/models/ptq/layers.py:263-466). These are the FQ-ViT
integer-friendly kernels P²-ViT inherits:

  * int LayerNorm: requantize the input with the PTF per-channel shift mask,
    compute integer mean/std, and fold the affine + requantization into a
    multiply-by-M / arithmetic-shift-by-N (M·2^-N) epilogue.
  * Log-Int-Softmax: I-BERT-style integer exp via a 2nd-order polynomial on a
    range-reduced argument, then log2-rounding of sum/exp to a 4-bit
    log-domain code.

This module is the float-simulated semantics used for calibration and
accuracy evaluation (everything stays f32 but all values are integral where
the reference's are); the Pallas serving kernels in ``p2vit_tpu.ops`` realize
the same math in real integer arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.fastmath import exp2i
from .bit_type import BitType


def _pow2(n):
    """Exact 2.0**n for an integer-valued f32 array ``n``, full f32 domain.

    torch's ``2**n`` (libm pow) is correctly rounded — exact at integer
    exponents — but XLA lowers ``2.0**n`` to a polynomial exp2 that is OFF
    BY ~5e-7 RELATIVE at some integer exponents (e.g. exp2(13.0) ≠ 8192 on
    CPU). That inexactness broke the 'attention weights are exact powers of
    two' contract and shifted log_round's tie threshold vs the torch
    reference. Exponent-field construction (ops/fastmath.py) restores
    bit-exact torch semantics everywhere a power of two is formed.

    Unlike the serving kernels (whose exponents are proof-bounded to
    exp2i's normal range), the simulation must cover the whole domain:
    subnormals for n ∈ [-149, -127] are built by placing 1 << (n+149) in
    the mantissa field, n < -149 underflows to 0, n > 127 overflows to inf
    — exactly libm pow's behavior (an 8-bit log-domain bit_type_s reaches
    qlog = 255 → 2^-255 → 0).
    """
    n_i = n.astype(jnp.int32)
    normal = exp2i(jnp.clip(n_i, -126, 128))
    sub = jax.lax.bitcast_convert_type(
        jnp.left_shift(1, jnp.clip(n_i + 149, 0, 22)), jnp.float32
    )
    out = jnp.where(n_i >= -126, normal, jnp.where(n_i >= -149, sub, 0.0))
    return out.astype(jnp.result_type(n, jnp.float32))


def get_mn(x: jnp.ndarray):
    """Decompose a positive multiplier into M * 2^-N with M an 8-bit-ish int.

    Mirrors QIntLayerNorm.get_MN (/root/reference/models/ptq/layers.py:270-274)
    with bit=7: N = clamp(7 - floor(log2 x), 0, 31); M = clamp(floor(x*2^N),
    0, 255).
    """
    bit = 7
    n = jnp.clip(bit - jnp.floor(jnp.log2(x)), 0, 31)
    m = jnp.clip(jnp.floor(x * _pow2(n)), 0, 2 ** (bit + 1) - 1)
    return m, n


def int_layernorm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    in_scale: jnp.ndarray,
    out_scale: jnp.ndarray,
    in_scale_expand: int = 1,
):
    """Integer LayerNorm with PTF shift alignment and M·2^-N output requant.

    Mirrors QIntLayerNorm.forward 'int' mode
    (/root/reference/models/ptq/layers.py:294-337):

      x_q           = round(x / in_scale)              # codes of the producer
      in_scale_mask = round(in_scale / min(in_scale))  # PTF {1,2,4,8} shifts
      x_q          *= in_scale_mask                    # align to min scale
      mean, std     = integer stats * in_scale1
      A             = in_scale1/std * weight / out_scale   -> sign, M, N
      B             = round((bias - mean/std*weight)/out_scale * 2^N)
      out           = round((sign(A)*M*x_q + B) / 2^N) * out_scale

    Args:
      in_scale: scalar or [C] scale of the quantizer feeding this LN.
      out_scale: scalar or [C] scale of the quantizer consuming the output
        (already multiplied by any smoothquant channel scale by the caller,
        matching ``out_quantizer_scale`` at layers.py:304-306).
      in_scale_expand: Swin PatchMerging 4x-concat expansion
        (layers.py:296-299): each entry of in_scale is repeated to cover the
        concatenated channels ([c0,c1,...] -> [c0...,c1...,] interleaved as
        tile, i.e. unsqueeze(-1).expand(-1, E).T.reshape(-1)).
    """
    channel_nums = x.shape[-1]
    in_scale = jnp.asarray(in_scale, dtype=x.dtype)
    out_scale = jnp.asarray(out_scale, dtype=x.dtype)

    if in_scale_expand != 1:
        # torch: in_scale.unsqueeze(-1).expand(-1, E).T.reshape(-1)
        # => [s0, s1, ..., sC, s0, s1, ..., sC, ...] (E tiles of the vector)
        in_scale = jnp.tile(in_scale, in_scale_expand)

    in_scale = in_scale.reshape(1, 1, -1) if in_scale.ndim else in_scale
    out_scale = out_scale.reshape(1, 1, -1) if out_scale.ndim else out_scale

    x_q = jnp.round(x / in_scale)
    in_scale1 = in_scale.min()
    in_scale_mask = jnp.round(in_scale / in_scale1)
    x_q = x_q * in_scale_mask

    mean_x_q = x_q.mean(axis=-1) * in_scale1
    std_x_q = (in_scale1 / channel_nums) * jnp.sqrt(
        channel_nums * (x_q**2).sum(axis=-1) - x_q.sum(axis=-1) ** 2
    )

    a = (in_scale1 / std_x_q)[..., None] * weight.reshape(1, 1, -1) / out_scale
    a_sign = jnp.sign(a)
    m, n = get_mn(jnp.abs(a))
    p2n = _pow2(n)  # exact 2^N (see _pow2)
    b = jnp.round(
        (bias.reshape(1, 1, -1) - (mean_x_q / std_x_q)[..., None] * weight.reshape(1, 1, -1))
        / out_scale
        * p2n
    )

    x_q = jnp.round((a_sign * m * x_q + b) / p2n)
    return x_q * out_scale


def log_round(x: jnp.ndarray):
    """Round a positive value to the nearest power of two, in log2 domain.

    Mirrors QIntSoftmax.log_round (/root/reference/models/ptq/layers.py:375-381):
    floor(log2 x), +1 where x - 2^floor >= 2^(floor-1) (ties round UP —
    different tie rule from the calibration-side round_to_pot).

    Domain: exact over the full f32 NORMAL range [2^-126, 2^128). XLA
    backends flush subnormals to zero, so subnormal x returns -inf exactly
    like x = 0 (torch on a non-flushing CPU would log-round them; the
    in-repo callers only ever pass x >= 1).
    """
    # Read both quantities straight off the IEEE bit pattern — exact for
    # every positive NORMAL x, with no arithmetic that could flush or a
    # polynomial log2/pow that is ~5e-7 off at integer exponents (which
    # shifted the tie threshold vs the reference, flipping e.g. x = 3·2^12):
    #   floor(log2 x) = unbiased exponent field;
    #   x - 2^floor >= 2^(floor-1)  ⟺  frac(x) >= 1.5  ⟺  mantissa bit 22.
    # (The earlier arithmetic form (x-p >= p·0.5) silently broke at the
    # smallest normals: XLA flushes the subnormal x-p / p·0.5 intermediates
    # to zero, mis-rounding the whole [1.5, 2.0)·2^-126 band.)
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    tie = (bits >> 22) & 1
    res = (e + tie).astype(jnp.float32)
    # Non-normal lanes follow jnp.log2's own convention: x = 0 (and
    # subnormals, which XLA flushes) → -inf, +inf → +inf, NaN/negative → NaN.
    big = jnp.floor(jnp.log2(xf))
    normal = (bits >= 0) & (e > -127) & (e < 128)
    return jnp.where(normal, res, big).astype(jnp.result_type(x, jnp.float32))


def int_polynomial(x_int: jnp.ndarray, scaling_factor):
    """2nd-order integer polynomial approximating exp on [-ln2, 0]
    (layers.py:386-396)."""
    coef0, coef1, coef2 = 0.35815147, 0.96963238, 1.0
    coef1 = coef1 / coef0
    coef2 = coef2 / coef0
    b_int = jnp.floor(coef1 / scaling_factor)
    c_int = jnp.floor(coef2 / scaling_factor**2)
    z = x_int + b_int
    z = x_int * z
    z = z + c_int
    return z, coef0 * scaling_factor**2


def int_exp(x_int: jnp.ndarray, scaling_factor):
    """Range-reduced integer exp (layers.py:398-410), n=32."""
    x0 = -0.6931  # -ln2
    n = 32
    x0_int = jnp.floor(x0 / scaling_factor)
    x_int = jnp.maximum(x_int, n * x0_int)
    q = jnp.floor(x_int / x0_int)
    r = x_int - x0_int * q
    exp_int, exp_sf = int_polynomial(r, scaling_factor)
    # exact 2^(n-q), q integer ∈ [0, n] (see _pow2)
    exp_int = jnp.maximum(jnp.floor(exp_int * _pow2(n - q)), 0.0)
    return exp_int, exp_sf / 2.0**n


def int_softmax(x: jnp.ndarray, scaling_factor):
    """Integer softmax numerator/denominator (layers.py:383-417).

    Returns (exp_int, exp_int_sum) along the last axis.
    """
    x_int = x / scaling_factor
    x_int = x_int - x_int.max(axis=-1, keepdims=True)
    exp_int, _ = int_exp(x_int, scaling_factor)
    exp_int_sum = exp_int.sum(axis=-1, keepdims=True)
    return exp_int, exp_int_sum


def log_int_softmax(x: jnp.ndarray, scale, bit_type: BitType):
    """Full Log-Int-Softmax: int exp -> round(sum/exp) -> log2-round -> 2^-q.

    Mirrors QIntSoftmax.forward quantized branch (layers.py:419-428). Output
    values are exact powers of two (or 0 on overflow), so the following
    attn @ V matmul is shift-accumulate in the integer serving path.
    """
    exp_int, exp_int_sum = int_softmax(x, scale)
    softmax_out = jnp.round(exp_int_sum / exp_int)
    rounds = log_round(softmax_out)
    mask = rounds >= 2**bit_type.bits
    qlog = jnp.clip(rounds, 0, 2**bit_type.bits - 1)
    # exact 2^-q — the 'attention weights are exact powers of two' contract
    # this module's docstring promises (see _pow2)
    return jnp.where(mask, 0.0, _pow2(-qlog))
