"""Multi-batch calibration: running-statistics accumulation across N
calibration batches, solved on the last (the reference's last-calibrate
semantics — it collects --calib-iter batches but only ever calibrates on
one, /root/reference/test_quant.py:285-307; the observer update loop it
WOULD run is minmax.py:15-32 / ema.py:14-29)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu.config import make_policy
from p2vit_tpu.models import swin, vit
from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.quant.bit_type import BIT_TYPE_DICT
from p2vit_tpu.quant.observers import MinMaxStats, minmax_pot_act_params
from p2vit_tpu.quant.solve import accumulate_act_stats, solve_act

INT8 = BIT_TYPE_DICT["int8"]

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=10, embed_dim=16, depth=2, num_heads=2
)
TINY_SWIN = swin.SwinConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=16,
    depths=(2, 2), num_heads=(2, 2), window_size=4,
)


def _batches(n=3, shape=(2, 3, 32, 32)):
    """Batches with DIFFERENT dynamic ranges so merged stats ≠ last-batch
    stats (guaranteeing N=3 differs from N=1). Ranges DESCEND so the last
    (solve) batch is the narrowest: the merged range is then dominated by
    earlier batches, and the >16x spread keeps the merged 4-candidate PoT
    window disjoint from the single-batch one, so solved scales cannot
    coincide."""
    mult = (61.0, 31.0, 1.0)
    return [
        jax.random.normal(jax.random.PRNGKey(10 + i), shape) * mult[i]
        for i in range(n)
    ]


def test_accumulate_minmax_matches_hand_merge():
    xs = _batches(3, (4, 8))
    st = None
    for x in xs:
        st = accumulate_act_stats("minmax", x, st)
    allv = np.concatenate([np.asarray(x).reshape(-1) for x in xs])
    assert float(st.max_val) == allv.max()
    assert float(st.min_val) == allv.min()

    # solving with merged stats == the PoT search on (merged range, last batch)
    scale, zp = solve_act("minmax", xs[-1], INT8, stats=st)
    oracle = minmax_pot_act_params(
        MinMaxStats(jnp.asarray(allv.min()), jnp.asarray(allv.max())), xs[-1], INT8
    )
    assert float(scale) == float(oracle[0])
    # and differs from single-batch calibration (batch 2 had 5x the range)
    single, _ = solve_act(
        "minmax", xs[-1], INT8, stats=accumulate_act_stats("minmax", xs[-1])
    )
    assert float(scale) != float(single)


def test_accumulate_ema_matches_hand_chain():
    """EMA semantics: first update assigns, later updates move by sigma
    (ema.py:14-29)."""
    xs = _batches(3, (4, 8))
    st = None
    for x in xs:
        st = accumulate_act_stats("ema", x, st)
    mx = float(np.asarray(xs[0]).max())
    mn = float(np.asarray(xs[0]).min())
    for x in xs[1:]:
        mx += 0.01 * (float(np.asarray(x).max()) - mx)
        mn += 0.01 * (float(np.asarray(x).min()) - mn)
    np.testing.assert_allclose(float(st.max_val), mx, rtol=1e-6)
    np.testing.assert_allclose(float(st.min_val), mn, rtol=1e-6)


def test_vit_multibatch_calibration_matches_oracle():
    policy = make_policy(True, True, "minmax")
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    xs = _batches(3)

    stats = None
    for x in xs[:-1]:
        stats = vit.collect_stats(params, TINY, policy, x, stats)
    calib3 = vit.calibrate(params, TINY, policy, xs[-1], stats=stats)
    calib1 = vit.calibrate(params, TINY, policy, xs[-1])

    # N=3 must differ from N=1 at the input node (batch ranges differ by 5x)
    s3 = float(calib3.qstate["qact_input"]["scale"])
    s1 = float(calib1.qstate["qact_input"]["scale"])
    assert s3 != s1

    # hand-merged oracle at the input node: global min/max over all three
    # batches, 4-candidate PoT search on the LAST batch
    allv = np.concatenate([np.asarray(x).reshape(-1) for x in xs])
    oracle, _ = minmax_pot_act_params(
        MinMaxStats(jnp.asarray(allv.min()), jnp.asarray(allv.max())),
        xs[-1], INT8,
    )
    assert s3 == float(oracle)

    # quantized forward still runs off the multi-batch state
    bits = vit.bits_to_idx([8] * TINY.num_matmuls)
    out = vit.quant_forward(params, calib3.qstate, TINY, policy, xs[-1], bits)
    assert np.isfinite(np.asarray(out)).all()

    # the stats pytree mirrors the qstate naming (every PTF node included)
    assert set(stats.keys()) == {
        "qact_input", "patch", "qact_embed", "qact_pos", "qact1",
        "blocks", "qact2", "act_out",
    }
    assert set(stats["blocks"][0]["attn"].keys()) == {
        "qact0", "qact1", "qact_attn1", "qact2", "qact3",
    }


def test_vit_single_batch_unchanged_by_plumbing():
    """calibrate(x) must equal calibrate(x, stats=None): the multi-batch
    plumbing cannot perturb the reference-parity single-batch path."""
    policy = make_policy(True, True, "minmax")
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = _batches(1)[0]
    a = vit.calibrate(params, TINY, policy, x)
    b = vit.calibrate(params, TINY, policy, x, stats=None)
    for la, lb in zip(jax.tree_util.tree_leaves(a.qstate),
                      jax.tree_util.tree_leaves(b.qstate)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_swin_multibatch_calibration():
    policy = make_policy(True, True, "minmax")
    params = swin.init_params(jax.random.PRNGKey(0), TINY_SWIN)
    xs = _batches(2)

    stats = swin.collect_stats(params, TINY_SWIN, policy, xs[0])
    calib2 = swin.calibrate(params, TINY_SWIN, policy, xs[1], stats=stats)
    calib1 = swin.calibrate(params, TINY_SWIN, policy, xs[1])

    s2 = float(calib2.qstate["patch_qact_bn"]["scale"])
    s1 = float(calib1.qstate["patch_qact_bn"]["scale"])
    assert np.isfinite(s2) and s2 > 0
    # ranges differ by 3x between the batches → merged stats must matter
    # somewhere in the tree
    diff = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(calib2.qstate),
                        jax.tree_util.tree_leaves(calib1.qstate))
    )
    assert diff

    out = swin.quant_forward(params, calib2.qstate, TINY_SWIN, policy, xs[1], 8)
    assert np.isfinite(np.asarray(out)).all()
