"""Per-node calibration solvers: observe one calibration tensor, emit params.

This is the glue between the pure observer/solver math in ``observers.py``
and the model-level calibration walkers in ``p2vit_tpu.models``. The
reference mutates observer objects during a calibration forward; here each
quantization node is solved by one pure call.

Single-calibration-batch semantics match the reference driver, which runs
stats + last-calibrate in ONE forward over one batch
(/root/reference/test_quant.py:306-307). Multi-batch statistics can be
accumulated with the ``collect_*``/``merge_*`` functions and passed in via
``stats``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .bit_type import WEIGHT_CALIB_BIT_TYPES, BitType
from .fake_quant import fake_quant, lp_loss, weight_scale_reshape
from .observers import (
    MinMaxStats,
    collect_minmax,
    collect_percentile,
    float_scale_params,
    merge_ema,
    merge_minmax,
    merge_percentile,
    minmax_pot_act_params,
    minmax_pot_weight_params,
    omse_params,
    ptf_params,
)

ACT_METHODS = ("minmax", "ema", "omse", "percentile", "ptf")


def accumulate_act_stats(
    method: str,
    x: jnp.ndarray,
    prev: MinMaxStats | None = None,
) -> MinMaxStats:
    """Observe one calibration batch for an activation node, merging into
    running stats from earlier batches.

    This is the multi-batch ``observer.update`` loop the reference driver
    collects batches for but never actually runs more than once
    (/root/reference/test_quant.py:285-307): minmax/omse/ptf accumulate
    running min/max (minmax.py:15-32), ema/percentile EMA-merge
    (ema.py:14-29, percentile.py:29-43). ``prev=None`` (single batch) makes
    this identical to observing the batch alone.
    """
    if method == "ptf":
        cur = collect_minmax(x, "activation", layer_wise=False)
        return cur if prev is None else merge_minmax(prev, cur)
    if method == "percentile":
        cur = collect_percentile(x, "activation")
        return cur if prev is None else merge_percentile(prev, cur)
    cur = collect_minmax(x, "activation", layer_wise=True)
    if prev is None:
        return cur
    if method == "ema":
        return merge_ema(prev, cur)
    return merge_minmax(prev, cur)  # minmax, omse


def solve_act(
    method: str,
    x: jnp.ndarray,
    bit_type: BitType,
    stats: MinMaxStats | None = None,
):
    """Solve (scale, zero_point) for one activation node.

    Method semantics follow /root/reference/models/ptq/observer/build.py:8-14:
      * minmax      — running min/max + the P²-ViT 4-candidate PoT search
                      (layer-wise symmetric; minmax.py:209-226).
      * ema         — EMA min/max, plain float scale (ema.py:31-51).
      * percentile  — 99.999th percentile clip, plain float scale
                      (percentile.py:57-77).
      * omse        — 90-step range-shrink L2 search (omse.py:30-57).
      * ptf         — channel-wise power-of-two-factor mask for LN inputs
                      (ptf.py:32-152). Returns (scale[C], zp, mask[C]).

    All paths are symmetric (the reference never rebinds observer.symmetric
    in practice — see observers.py module docstring).
    """
    if method == "ptf":
        if stats is None:
            stats = collect_minmax(x, "activation", layer_wise=False)
        return ptf_params(stats, x, bit_type)
    if method == "percentile":
        if stats is None:
            stats = collect_percentile(x, "activation")
        scale, zp = float_scale_params(stats, bit_type, symmetric=True)
        return scale, zp
    if stats is None:
        stats = collect_minmax(x, "activation", layer_wise=True)
    if method == "minmax":
        return minmax_pot_act_params(stats, x, bit_type)
    if method == "ema":
        return float_scale_params(stats, bit_type, symmetric=True)
    if method == "omse":
        return omse_params(stats, x, bit_type)
    raise NotImplementedError(method)


def solve_weight_all_bits(weight2d: jnp.ndarray, x2d: jnp.ndarray):
    """Per-bit-type output-aware PoT weight scales + quantization distances.

    Mirrors the QLinear/QConv2d calibration loop
    (/root/reference/models/ptq/layers.py:62-85,175-201): sweep
    [uint3, uint4, int4, int8] (uint8 skipped), forcing layer-wise for int8
    and channel-wise otherwise, run the minmax PoT output-aware search per
    bit type, and record the L2 WEIGHT quantization error (layers.py:198-200
    — the loss is on the weight, not the output).

    Reference quirk replicated deliberately: the observer's ``symmetric``
    flag is set once from the initial (signed) bit type and never rebound
    when the loop switches to uint3/uint4 (layers.py:67-68 rebinds bit_type
    only; minmax.py:13 sets symmetric at init). The unsigned formats are
    therefore solved on the SYMMETRIC path (zero_point 0, negative weights
    clamped to 0) — their distances feed the mixed-precision Ω exactly as in
    the reference (/root/reference/test_quant.py:350-352 indexes
    global_distance with k∈{0,1} = the uint3/uint4 entries).

    Args:
      weight2d: (O, K) folded weight (possibly already smoothquant-scaled).
      x2d: (M, K) folded calibration input to this layer.
    Returns:
      wscale: (n_bits, O) PoT scales, one row per WEIGHT_CALIB_BIT_TYPES
        entry (the int8 layer-wise scalar is broadcast across O).
      distance: (n_bits,) per-bit L2 weight quantization errors.
    """
    o = weight2d.shape[0]
    scales, dists = [], []
    for bt in WEIGHT_CALIB_BIT_TYPES:
        channel_wise = bt.name != "int8"
        stats = collect_minmax(weight2d, "weight", layer_wise=not channel_wise)
        scale, _ = minmax_pot_weight_params(stats, weight2d, x2d, bt, channel_wise)
        wq = fake_quant(weight2d, weight_scale_reshape(scale, 2), 0.0, bt)
        dists.append(lp_loss(weight2d, wq))
        scales.append(jnp.broadcast_to(jnp.asarray(scale), (o,)))
    return jnp.stack(scales), jnp.stack(dists)
