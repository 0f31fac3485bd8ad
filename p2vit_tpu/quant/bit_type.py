"""Integer format descriptors.

TPU-native rebuild of the reference bit-type registry
(/root/reference/models/ptq/bit_type.py:7-57). A ``BitType`` is a frozen,
hashable descriptor of an integer quantization format; the registry holds the
same five formats the reference registers (uint3, uint4, int4, int8, uint8).

Unlike the reference (mutable class with derived properties), BitType here is
pure static data so it can be closed over by jitted functions without becoming
a traced value.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BitType:
    """Descriptor of an integer format (bits + signedness).

    Mirrors /root/reference/models/ptq/bit_type.py:7-39: ``upper_bound`` /
    ``lower_bound`` / ``range`` are derived exactly the same way.
    """

    bits: int
    signed: bool
    name: str

    @property
    def upper_bound(self) -> int:
        if not self.signed:
            return 2**self.bits - 1
        return 2 ** (self.bits - 1) - 1

    @property
    def lower_bound(self) -> int:
        if not self.signed:
            return 0
        return -(2 ** (self.bits - 1))

    @property
    def range(self) -> int:
        return 2**self.bits


# Same registry contents/order as the reference's BIT_TYPE_LIST
# (/root/reference/models/ptq/bit_type.py:42-56). Order matters: the
# per-weight-layer calibration loop iterates this list (minus uint8) and the
# mixed-precision `global_distance` entries are recorded in this order.
BIT_TYPE_LIST = [
    BitType(3, False, "uint3"),
    BitType(4, False, "uint4"),
    BitType(4, True, "int4"),
    BitType(8, True, "int8"),
    BitType(8, False, "uint8"),
]

BIT_TYPE_DICT = {bt.name: bt for bt in BIT_TYPE_LIST}

# Bit types swept during weight calibration: BIT_TYPE_LIST minus uint8
# (/root/reference/models/ptq/layers.py:178-180).
WEIGHT_CALIB_BIT_TYPES = [bt for bt in BIT_TYPE_LIST if bt.name != "uint8"]

# Bit widths selectable at inference via `bit_config`
# (/root/reference/test_quant.py:327: bit_choice = [4, 8]).
EVAL_BIT_POOL = (4, 8)
EVAL_BIT_TYPES = [BIT_TYPE_DICT["int4"], BIT_TYPE_DICT["int8"]]
