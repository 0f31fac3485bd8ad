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


def test_serving_bypass_requires_pallas():
    """lis='bypass' on the XLA fallback must raise, not silently run LIS
    (the probe only exists in the Pallas kernels' head loop)."""
    from p2vit_tpu import serving
    from p2vit_tpu.models.common import ViTConfig

    cfg = ViTConfig(embed_dim=64, depth=1, num_heads=2)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    with pytest.raises(ValueError, match="bypass"):
        serving.serving_forward({}, cfg, x, use_pallas=False, lis="bypass")


def test_swin_convert_pre_input_quant_state_raises():
    """Quant states saved before qact_input landed get a clear recalibrate
    message, not a bare KeyError('qact_input')."""
    from p2vit_tpu import serving_swin
    from p2vit_tpu.config import make_policy
    from p2vit_tpu.models.swin import SwinConfig

    policy = make_policy()
    cfg = SwinConfig()
    with pytest.raises(KeyError, match="[Rr]ecalibrate"):
        serving_swin.convert({}, {}, cfg, policy)


def test_swin_quant_forward_pre_input_quant_state_raises():
    from p2vit_tpu.models import swin

    cfg = swin.SwinConfig()
    from p2vit_tpu.config import make_policy

    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    bit_idx = jnp.zeros((cfg.num_matmuls,), jnp.int32)
    with pytest.raises(KeyError, match="[Rr]ecalibrate"):
        swin.quant_forward_mixed({}, {}, cfg, make_policy(), x, bit_idx)


def test_swin_folded_shape_guards_are_valueerrors():
    """The folded-layout preconditions survive python -O: ValueError, not
    assert (ADVICE r3)."""
    from p2vit_tpu.ops.attention_lis import swin_lis_attention_folded

    # non-square grid
    qkv = jnp.zeros((1, 14, 7, 3 * 32), jnp.int8)
    bias = jnp.zeros((2, 49, 49), jnp.float32)
    with pytest.raises(ValueError, match="square grid"):
        swin_lis_attention_folded(qkv, bias, None, 2, 7, 1.0, 2.0**-4, 1.0, 1.0)
    # bad mask shape
    qkv = jnp.zeros((1, 14, 14, 3 * 32), jnp.int8)
    bad_mask = jnp.zeros((3, 49, 49), jnp.float32)
    with pytest.raises(ValueError, match="mask shape"):
        swin_lis_attention_folded(
            qkv, bias, bad_mask, 2, 7, 1.0, 2.0**-4, 1.0, 1.0
        )
