"""Pure fake-quantization primitives (uniform affine + log2).

TPU-native rebuild of the reference quantizer layer
(/root/reference/models/ptq/quantizer/{uniform.py,log2.py,base.py}). The
reference wraps these in stateful nn.Modules holding per-bit scale dicts; here
they are pure jnp functions over explicit (scale, zero_point) arrays so they
can be fused by XLA around every tensor in a jitted forward.

All rounding is round-half-to-even (jnp.round == torch.round semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bit_type import BitType


def lp_loss(pred, tgt, p: float = 2.0):
    """Mean |pred - tgt|^p — the metric used by every calibration search.

    Mirrors /root/reference/models/ptq/observer/utils.py:2-9 with
    reduction='all'.
    """
    return jnp.mean(jnp.abs(pred - tgt) ** p)


def round_to_pot(x):
    """Round a positive value to the nearest power of two (exponent).

    Mirrors the reference's ``round_ln(x, 'round')``
    (/root/reference/models/ptq/observer/minmax.py:50-64): ``y = floor(log2 x)``
    then round up when ``(x - 2^y) > (2^(y+1) - x)`` (strict: ties round down).
    Returns the integer exponent as a float array.
    """
    y = jnp.floor(jnp.log2(x))
    up = (x - 2.0**y) > (2.0 ** (y + 1) - x)
    return y + up.astype(y.dtype)


def floor_pot_exponent(x):
    """``floor(log2 x)`` — the reference's ``round_ln(x, 'floor')``."""
    return jnp.floor(jnp.log2(x))


def quantize(x, scale, zero_point, bit_type: BitType):
    """Affine quantize: ``round(x / scale + zp).clamp(qmin, qmax)``.

    Mirrors /root/reference/models/ptq/quantizer/uniform.py:48-87. ``scale`` /
    ``zero_point`` must already be broadcastable against ``x`` (the reference's
    ``get_reshape_range`` is the caller's responsibility here).
    """
    q = jnp.round(x / scale + zero_point)
    return jnp.clip(q, bit_type.lower_bound, bit_type.upper_bound)


def dequantize(q, scale, zero_point):
    """Affine dequantize: ``(q - zp) * scale``.

    Mirrors /root/reference/models/ptq/quantizer/uniform.py:89-126.
    """
    return (q - zero_point) * scale


def fake_quant(x, scale, zero_point, bit_type: BitType):
    """quant → dequant round trip (the reference BaseQuantizer.forward,
    /root/reference/models/ptq/quantizer/base.py:42-45)."""
    return dequantize(quantize(x, scale, zero_point, bit_type), scale, zero_point)


def fake_quant_dyn(x, scale, zero_point, qmin, qmax):
    """Fake-quant with TRACED integer bounds.

    Used on the jittable eval path where the per-layer bit width comes from a
    traced ``bit_config`` array (the reference rebinds quantizer.bit_type per
    call, /root/reference/models/ptq/layers.py:204-207; here the bounds are
    data so one compiled forward serves every mixed-precision config).
    """
    q = jnp.clip(jnp.round(x / scale + zero_point), qmin, qmax)
    return (q - zero_point) * scale


def log2_quantize(x, bit_type: BitType):
    """Log2 quantization of a probability-like tensor.

    Mirrors /root/reference/models/ptq/quantizer/log2.py:17-21:
    ``q = round(-log2 x)`` clamped to [0, 2^bits - 1]; entries whose unclamped
    code is >= 2^bits are flagged in an overflow mask (dequantized to 0).

    Returns (codes, overflow_mask).
    """
    rounds = jnp.round(-jnp.log2(x))
    mask = rounds >= 2**bit_type.bits
    codes = jnp.clip(rounds, 0, 2**bit_type.bits - 1)
    return codes, mask


def log2_dequantize(codes, mask):
    """``2^-q`` with overflow entries zeroed
    (/root/reference/models/ptq/quantizer/log2.py:23-26)."""
    out = 2.0 ** (-codes)
    return jnp.where(mask, 0.0, out)


def fake_quant_log2(x, bit_type: BitType):
    codes, mask = log2_quantize(x, bit_type)
    return log2_dequantize(codes, mask)


def weight_scale_reshape(scale, weight_ndim: int):
    """Broadcast a per-out-channel scale vector onto a weight tensor.

    Mirrors BaseQuantizer.get_reshape_range for conv_weight (-1,1,1,1) and
    linear_weight (-1,1) (/root/reference/models/ptq/quantizer/base.py:14-31).
    Scalar (layer-wise) scales pass through unchanged.
    """
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return scale
    return scale.reshape((-1,) + (1,) * (weight_ndim - 1))


def act_scale_reshape(scale, act_ndim: int):
    """Broadcast a per-channel activation scale onto an activation tensor.

    Activations are channel-last everywhere in this framework (2D (B,C),
    3D (B,N,C)); NCHW 4-D activations of the reference
    (/root/reference/models/ptq/quantizer/base.py:20-28) have no analogue here
    because the patch-embed conv is expressed channel-last on TPU.
    """
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return scale
    return scale.reshape((1,) * (act_ndim - 1) + (-1,))
