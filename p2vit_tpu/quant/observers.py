"""Range observers + scale/zero-point solvers (incl. the P²-ViT PoT search).

TPU-native rebuild of /root/reference/models/ptq/observer/. The reference
implements observers as stateful objects mutated during a calibration forward;
here each observer is split into two pure pieces:

  * ``collect_minmax`` / ``merge_*`` — statistics over calibration batches
    (running min/max, EMA, percentile), pytree-friendly, reducible across a
    device mesh with ``lax.pmin``/``lax.pmax``.
  * ``*_params`` solvers — turn (stats, calibration tensor) into
    (scale, zero_point). The P²-ViT power-of-two search
    (/root/reference/models/ptq/observer/minmax.py:145-207) is vectorized:
    the reference's per-channel Python loop re-running one tiny matmul per
    candidate exponent becomes ONE batched matmul over a stacked
    [4-candidate] axis, with a per-channel argmin — identical argmin results,
    MXU-friendly shapes.

All tensors are channel-last activations / (out, in...) weights.

Deliberate divergences from the reference (documented, crash-for-crash fixes):
  * Degenerate all-zero channels: the reference takes log2(0) = -inf and later
    clamps the scale to eps; we clamp the pre-log scale to eps so no inf/NaN
    flows through the candidate search (same final scale: eps-level).
  * The reference's asymmetric ``round_x`` branch has a latent broadcast bug
    (zero_point vector applied unindexed, minmax.py:166) and is dead in
    practice (observer.symmetric is never rebound, layers.py:247 is only hit
    with asymmetric=True which no call site uses). We implement the symmetric
    path it actually executes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bit_type import BitType
from .fake_quant import fake_quant, lp_loss

EPS = float(jnp.finfo(jnp.float32).eps)

# Candidate exponent offsets searched around floor(log2(scale)):
# weight_1..weight_4 in /root/reference/models/ptq/observer/minmax.py:166-194.
POT_CANDIDATE_OFFSETS = (-1.0, 0.0, 1.0, 2.0)


class MinMaxStats(NamedTuple):
    """Per-channel (or scalar, layer-wise) running min/max."""

    min_val: jnp.ndarray
    max_val: jnp.ndarray


# ---------------------------------------------------------------------------
# Statistics collection (the reference observers' ``update``)
# ---------------------------------------------------------------------------


def channel_view(v: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Canonicalize a tensor to (channels, everything_else).

    Mirrors BaseObserver.reshape_tensor
    (/root/reference/models/ptq/observer/base.py:16-29): weights fold onto the
    out-channel axis; activations fold onto the last (feature) axis.
    """
    if kind == "weight":
        return v.reshape(v.shape[0], -1)
    if kind == "activation":
        return v.reshape(-1, v.shape[-1]).T
    raise NotImplementedError(kind)


def collect_minmax(v: jnp.ndarray, kind: str, layer_wise: bool) -> MinMaxStats:
    """Single-tensor min/max stats (minmax.py:15-32 for one update call)."""
    m = channel_view(v, kind)
    mx = m.max(axis=1)
    mn = m.min(axis=1)
    if layer_wise:
        mx = mx.max()
        mn = mn.min()
    return MinMaxStats(min_val=mn, max_val=mx)


def merge_minmax(a: MinMaxStats, b: MinMaxStats) -> MinMaxStats:
    """Running min/max across batches (minmax.py:19-28)."""
    return MinMaxStats(
        min_val=jnp.minimum(a.min_val, b.min_val),
        max_val=jnp.maximum(a.max_val, b.max_val),
    )


def merge_ema(a: MinMaxStats, b: MinMaxStats, sigma: float = 0.01) -> MinMaxStats:
    """EMA min/max update (/root/reference/models/ptq/observer/ema.py:14-29)."""
    return MinMaxStats(
        min_val=a.min_val + sigma * (b.min_val - a.min_val),
        max_val=a.max_val + sigma * (b.max_val - a.max_val),
    )


def collect_percentile(
    v: jnp.ndarray,
    kind: str,
    alpha: float = 0.99999,
) -> MinMaxStats:
    """Percentile-clipped range (layer-wise only, percentile.py:26-43)."""
    flat = channel_view(v, kind).reshape(-1)
    mx = jnp.quantile(flat, alpha)
    mn = jnp.quantile(flat, 1.0 - alpha)
    return MinMaxStats(min_val=mn, max_val=mx)


def merge_percentile(a: MinMaxStats, b: MinMaxStats, sigma: float = 0.01) -> MinMaxStats:
    """Percentile observer uses EMA merging (percentile.py:44-55)."""
    return merge_ema(a, b, sigma)


def mesh_reduce_minmax(stats: MinMaxStats, axis_name: str) -> MinMaxStats:
    """Cross-device reduction of min/max stats over a sharded calibration
    batch — the entire 'communication backend' this workload needs (SURVEY §5)."""
    return MinMaxStats(
        min_val=jax.lax.pmin(stats.min_val, axis_name),
        max_val=jax.lax.pmax(stats.max_val, axis_name),
    )


# ---------------------------------------------------------------------------
# Plain (float-scale) solvers: ema / percentile / symmetric fallback
# ---------------------------------------------------------------------------


def float_scale_params(stats: MinMaxStats, bit_type: BitType, symmetric: bool):
    """Float symmetric/asymmetric scale from min/max stats.

    Mirrors ema.py:31-51 / percentile.py:57-77 (identical math in both).
    Returns (scale, zero_point) with zero_point as float (integral values).
    """
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound
    if symmetric:
        max_val = jnp.maximum(-stats.min_val, stats.max_val)
        scale = max_val / (float(qmax - qmin) / 2)
        scale = jnp.maximum(scale, EPS)
        zero_point = jnp.zeros_like(scale)
    else:
        scale = (stats.max_val - stats.min_val) / float(qmax - qmin)
        scale = jnp.maximum(scale, EPS)
        zero_point = jnp.clip(qmin - jnp.round(stats.min_val / scale), qmin, qmax)
    return scale, zero_point


def omse_params(stats: MinMaxStats, x: jnp.ndarray, bit_type: BitType):
    """OMSE range-shrink search (/root/reference/models/ptq/observer/omse.py:30-57).

    90 linear shrink candidates max*(1-0.01*i); pick the (scale, zp) minimizing
    the L2 fake-quant error of the calibration tensor. Vectorized over the
    candidate axis with a scan (first-minimum tie-breaking: the reference keeps
    the FIRST candidate achieving the best score because it updates only on
    strict improvement, omse.py:51).
    """
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound
    steps = 1.0 - 0.01 * jnp.arange(90, dtype=jnp.float32)

    def score_one(step):
        new_max = stats.max_val * step
        new_min = stats.min_val * step
        scale = jnp.maximum((new_max - new_min) / float(qmax - qmin), EPS)
        zp = jnp.clip(qmin - jnp.round(new_min / scale), qmin, qmax)
        xq = fake_quant(x, scale, zp, bit_type)
        return lp_loss(x, xq), (scale, zp)

    scores, params = jax.lax.map(score_one, steps)
    idx = jnp.argmin(scores)  # argmin returns first minimum, like the reference
    scale = jax.tree.map(lambda p: p[idx], params[0])
    zp = jax.tree.map(lambda p: p[idx], params[1])
    return scale, zp


# ---------------------------------------------------------------------------
# P²-ViT minmax + PoT search
# ---------------------------------------------------------------------------


def _pot_candidate_scales(scale0: jnp.ndarray):
    """Stack the 4 candidate PoT scales 2^(floor(log2 s0) + {-1,0,1,2}).

    scale0 may be scalar (layer-wise) or [C] (channel-wise); the returned
    array has a leading candidate axis: [4] or [4, C].
    """
    af = jnp.floor(jnp.log2(jnp.maximum(scale0, EPS)))
    offs = jnp.array(POT_CANDIDATE_OFFSETS, dtype=af.dtype)
    alphas = af[None, ...] + offs.reshape((-1,) + (1,) * af.ndim)
    return af, 2.0**alphas


def _symmetric_scale0(stats: MinMaxStats, bit_type: BitType):
    """Float symmetric scale before PoT rounding (minmax.py:209-212)."""
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound
    max_val = jnp.maximum(-stats.min_val, stats.max_val)
    return max_val / (float(qmax - qmin) / 2)


def minmax_pot_act_params(stats: MinMaxStats, x: jnp.ndarray, bit_type: BitType):
    """PoT scale for an activation tensor (layer-wise, symmetric).

    The activation branch of minmax.round_x (minmax.py:152-207 with
    module_type='activation'): each candidate fake-quantizes the calibration
    tensor itself; loss is vs. the raw tensor. Returns (scale, zero_point)
    scalars.
    """
    scale0 = _symmetric_scale0(stats, bit_type)
    af, cand = _pot_candidate_scales(scale0)  # [4]

    def score(s):
        return lp_loss(x, fake_quant(x, s, 0.0, bit_type))

    losses = jax.vmap(score)(cand)
    idx = jnp.argmin(losses)
    alpha = af - 1.0 + idx.astype(af.dtype)
    scale = jnp.maximum(2.0**alpha, EPS)
    return scale, jnp.zeros_like(scale)


def minmax_pot_weight_params(
    stats: MinMaxStats,
    weight2d: jnp.ndarray,
    x2d: jnp.ndarray,
    bit_type: BitType,
    channel_wise: bool,
):
    """Output-aware PoT scale search for a (folded 2-D) weight.

    The core P²-ViT mechanism (minmax.py:82-207): for each candidate exponent,
    fake-quantize the weight and measure L2 loss OF THE LAYER OUTPUT
    (x @ W^T), not of the weight — per out-channel when channel_wise. The
    reference loops channels × 4 candidates, each a single-row F.linear; a
    row's output is exactly one column of the full matmul, so we batch: one
    [4]-stacked matmul + per-(candidate, channel) reduction + argmin.

    Bias is omitted: the reference adds the same bias to both the fp and the
    candidate output (minmax.py:111-141), so it cancels in the L2 difference.

    Args:
      weight2d: (O, K) weight folded to 2-D (conv kernels pre-flattened; the
        patch-embed conv is expressed as patch-extraction + matmul on TPU).
      x2d: (M, K) calibration input folded to 2-D.
    Returns (scale, zero_point): shape [O] if channel_wise else scalars.
    """
    scale0 = _symmetric_scale0(stats, bit_type)
    af, cand = _pot_candidate_scales(scale0)  # [4,(O)]

    out_fp = x2d @ weight2d.T  # (M, O)

    if channel_wise:

        def score(s_c):  # s_c: [O]
            wq = fake_quant(weight2d, s_c[:, None], 0.0, bit_type)
            out_q = x2d @ wq.T
            return jnp.mean((out_fp - out_q) ** 2, axis=0)  # [O]

        losses = jax.lax.map(score, cand)  # [4, O]
        idx = jnp.argmin(losses, axis=0)  # [O]
    else:

        def score(s):
            wq = fake_quant(weight2d, s, 0.0, bit_type)
            return jnp.mean((out_fp - x2d @ wq.T) ** 2)

        losses = jax.lax.map(score, cand)  # [4]
        idx = jnp.argmin(losses)

    alpha = af - 1.0 + idx.astype(af.dtype)
    scale = jnp.maximum(2.0**alpha, EPS)
    return scale, jnp.zeros_like(scale)


# ---------------------------------------------------------------------------
# PTF observer (FQ-ViT Power-of-Two Factor, for LayerNorm inputs)
# ---------------------------------------------------------------------------


def ptf_params(stats: MinMaxStats, x: jnp.ndarray, bit_type: BitType):
    """Per-channel PoT-multiplier scale for LayerNorm inputs.

    Mirrors /root/reference/models/ptq/observer/ptf.py:32-152: one global
    symmetric layer scale ``scale8 = 2*max(|min|, max)/(qmax-qmin)`` (NOT
    PoT-rounded — the reference's rounding call is commented out, ptf.py:106-
    108), then per channel choose a multiplier in {1,2,4,8} on top of
    ``scale1 = scale8/8`` minimizing the channel's fake-quant L2 error.

    ``stats`` must be channel-wise (vector min/max). Returns
    (scale_vector[C], zero_point scalar 0, mask[C] in {1,2,4,8}).
    """
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound
    max_val_t = jnp.maximum(-stats.min_val.min(), stats.max_val.max())
    scale8 = jnp.maximum(2.0 * max_val_t / float(qmax - qmin), EPS)
    scale1 = scale8 / 8.0

    scales = jnp.stack([scale1, scale1 * 2, scale1 * 4, scale8])  # [4]

    def score(s):
        xq = fake_quant(x, s, 0.0, bit_type)
        # per-channel mean over all leading dims
        return jnp.mean((x - xq) ** 2, axis=tuple(range(x.ndim - 1)))  # [C]

    losses = jax.vmap(score)(scales)  # [4, C]
    idx = jnp.argmin(losses, axis=0)  # [C]
    mask = 2.0 ** idx.astype(jnp.float32)
    scale = scale1 * mask
    zero_point = jnp.zeros((), dtype=jnp.float32)
    return scale, zero_point, mask
