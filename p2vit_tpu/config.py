"""Quantization policy configuration.

TPU-native rebuild of /root/reference/config.py:4-51. Maps the (ptf, lis,
quant_method) triple onto per-tensor-class bit-types / observers / calibration
granularity. The reference hardcodes several choices as constants; they are
surfaced here as real fields (SURVEY §5 config gap) but default to the
reference's values.
"""

from __future__ import annotations

import dataclasses

from .quant.bit_type import BIT_TYPE_DICT, BitType


@dataclasses.dataclass(frozen=True)
class QuantPolicy:
    """Per-tensor-class quantization policy (reference Config equivalent)."""

    # Weight / activation formats (config.py:13,17). BIT_TYPE_W is the default
    # weight format; at inference the per-layer bit_config overrides it from
    # the eval pool {int4, int8}.
    bit_type_w: BitType = BIT_TYPE_DICT["int4"]
    bit_type_a: BitType = BIT_TYPE_DICT["int8"]

    # Observers (config.py:19-20): weights always minmax (with the P²-ViT PoT
    # search); activations use the CLI-selected method.
    observer_w: str = "minmax"
    observer_a: str = "minmax"

    # Granularity (config.py:27-30).
    calibration_mode_w: str = "channel_wise"
    calibration_mode_a: str = "layer_wise"

    # Log-Int-Softmax (config.py:32-43).
    int_softmax: bool = True
    bit_type_s: BitType = BIT_TYPE_DICT["uint4"]

    # Power-of-Two-Factor integer LayerNorm (config.py:44-51).
    int_norm: bool = True
    observer_a_ln: str = "ptf"
    calibration_mode_a_ln: str = "channel_wise"

    # SmoothQuant on qkv/fc1 (always on in the reference eval path,
    # vit_fquant.py:185 smoothquant=True default).
    smoothquant: bool = True

    # Reference-compat quirk: Block.forward passes attn.channel_scale (not
    # mlp.channel_scale) as norm2's out_quantizer_scale
    # (/root/reference/models/vit_fquant.py:561-570). True replicates it;
    # False uses the mlp's own channel scale.
    norm2_attn_channel_scale_compat: bool = True


def make_policy(ptf: bool = True, lis: bool = True, quant_method: str = "minmax") -> QuantPolicy:
    """Build a policy from the reference CLI triple (config.py:6)."""
    kw = dict(observer_a=quant_method)
    if lis:
        kw.update(int_softmax=True, bit_type_s=BIT_TYPE_DICT["uint4"])
    else:
        kw.update(int_softmax=False, bit_type_s=BIT_TYPE_DICT["uint8"])
    if ptf:
        kw.update(int_norm=True, observer_a_ln="ptf", calibration_mode_a_ln="channel_wise")
    else:
        kw.update(int_norm=False, observer_a_ln=quant_method, calibration_mode_a_ln="layer_wise")
    return QuantPolicy(**kw)
