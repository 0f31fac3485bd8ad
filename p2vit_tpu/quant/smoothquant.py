"""PoT-rounded SmoothQuant channel scaling.

TPU-native rebuild of the reference's inline smoothquant logic
(/root/reference/models/vit_fquant.py:232-353 for attention qkv, alpha pool
[0.35]; /root/reference/models/layers_quant.py:255-360 for MLP fc1, alpha pool
[0.5]). The activation outlier energy is migrated into the weight via a
per-input-channel scale rounded to a power of two, so the smoothing division
is a pure exponent shift in the integer serving path.

The per-alpha / per-bit selection loop lives in the model calibration code
(models/vit.py); this module holds the pure scale computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fake_quant import round_to_pot
from .observers import EPS

# Alpha pools hardcoded by the reference (vit_fquant.py:37, layers_quant.py:14).
ATTN_ALPHA_POOL = (0.35,)
MLP_ALPHA_POOL = (0.5,)


def pot_smooth_channel_scale(x: jnp.ndarray, weight: jnp.ndarray, alpha: float):
    """Per-input-channel PoT smoothing scale.

    Mirrors vit_fquant.py:254-282: ``global_max_x = max over (batch, token) of
    |x|`` per channel; ``max_weight = max over out-channels of |W|`` per input
    channel; ``channel_scale = round_to_pot(global_max_x^alpha /
    max_weight^(1-alpha))``.

    Args:
      x: (..., C) activation feeding the linear.
      weight: (O, C) linear weight.
    Returns channel_scale: (C,) powers of two.
    """
    global_max_x = jnp.abs(x).reshape(-1, x.shape[-1]).max(axis=0)
    max_weight = jnp.abs(weight).max(axis=0)
    channel_scale = global_max_x**alpha / jnp.maximum(
        max_weight ** (1.0 - alpha), EPS
    )
    exp = round_to_pot(jnp.maximum(channel_scale, EPS))
    return 2.0**exp
