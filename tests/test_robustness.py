"""Degenerate-input robustness probes.

The quantization math divides by scales and ranges; these pin the eps
clamps: all-zero weight channels / activation tensors, constant PTF
channels, extreme attention logits, and the invalid-bit error surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu.quant.bit_type import BIT_TYPE_DICT
from p2vit_tpu.quant import observers as O
from p2vit_tpu.quant.fake_quant import fake_quant
from p2vit_tpu.quant.intops import log_int_softmax

INT8 = BIT_TYPE_DICT["int8"]
INT4 = BIT_TYPE_DICT["int4"]
UINT4 = BIT_TYPE_DICT["uint4"]


def test_zero_weight_channel_scales_finite():
    """A dead out-channel must not produce 0/NaN scales (eps clamp)."""
    w = jnp.ones((6, 16)) * 0.5
    w = w.at[2].set(0.0)  # dead channel
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    stats = O.collect_minmax(w, "weight", layer_wise=False)
    scale, zp = O.minmax_pot_weight_params(stats, w, x, INT4, channel_wise=True)
    assert jnp.isfinite(scale).all() and (scale > 0).all()
    wq = fake_quant(w, scale[:, None], jnp.reshape(zp, (-1, 1)) if jnp.ndim(zp) else zp, INT4)
    assert jnp.isfinite(wq).all()


def test_zero_activation_tensor_scales_finite():
    x = jnp.zeros((4, 7, 16))
    stats = O.collect_minmax(x, "activation", layer_wise=True)
    scale, zp = O.minmax_pot_act_params(stats, x, INT8)
    assert jnp.isfinite(scale).all() and (scale > 0).all()
    assert jnp.isfinite(fake_quant(x, scale, zp, INT8)).all()
    # float (non-PoT) path too
    s2, z2 = O.float_scale_params(stats, INT8, symmetric=False)
    assert jnp.isfinite(s2).all() and (s2 > 0).all()


def test_constant_channel_ptf_finite():
    """Constant (zero-range) channels still get a mask and finite scales."""
    x = jnp.concatenate(
        [jnp.full((4, 5, 3), 2.5), jnp.zeros((4, 5, 3)),
         jax.random.normal(jax.random.PRNGKey(1), (4, 5, 10))],
        axis=-1,
    )
    stats = O.collect_minmax(x, "activation", layer_wise=False)
    scale, zp, mask = O.ptf_params(stats, x, INT8)
    assert scale.shape == (16,) and jnp.isfinite(scale).all()
    assert (scale > 0).all()
    assert set(np.unique(np.asarray(mask))).issubset({1.0, 2.0, 4.0, 8.0})


def test_extreme_attention_logits_lis():
    """±1000 logits through Log-Int-Softmax: finite, one-hot-ish rows."""
    x = jnp.zeros((2, 3, 5, 5))
    x = x.at[..., 0].set(1000.0).at[..., 1].set(-1000.0)
    scale = jnp.float32(2.0**-4)
    out, _codes = log_int_softmax(x, scale, UINT4)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # the +1000 column dominates; the -1000 column underflows to 0
    assert (out[..., 0] >= 0.99).all()
    assert (out[..., 1] == 0.0).all()


def test_invalid_bit_width_raises():
    from p2vit_tpu.models import vit

    with pytest.raises(ValueError, match="unsupported bit widths"):
        vit.bits_to_idx([4, 8, 6, 4])
