"""Quantized Swin tests: window helpers, fp forward, calibrate + quant
forward on a tiny hierarchical config (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu.config import make_policy
from p2vit_tpu.models import swin

# 32px, patch 4 → 8×8 grid; window 4; two stages (8×8 then 4×4 after merge)
TINY = swin.SwinConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=16,
    depths=(2, 2), num_heads=(2, 2), window_size=4,
)


@pytest.fixture(scope="module")
def setup():
    params = swin.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    return params, x


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 5))
    w = swin.window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 5)
    back = swin.window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = swin.relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() == 0 and idx.max() == (2 * 4 - 1) ** 2 - 1
    # symmetric pairs map to mirrored offsets; diagonal is the center cell
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_attn_mask():
    m = swin.shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # the first (non-boundary) window is unmasked
    assert (m[0] == 0).all()


def test_fp_forward(setup):
    params, x = setup
    logits = swin.fp_forward(params, TINY, x)
    assert logits.shape == (2, 10)
    assert jnp.isfinite(logits).all()


def test_swin_state_dict_roundtrip(setup):
    """params -> official-Swin-layout state_dict -> params is the identity."""
    from p2vit_tpu import checkpoints

    params, _ = setup
    sd = {
        "patch_embed.proj.weight": np.asarray(params["patch_embed"]["w"]).reshape(
            TINY.embed_dim, 3, 4, 4
        ),
        "patch_embed.proj.bias": np.asarray(params["patch_embed"]["b"]),
        "patch_embed.norm.weight": np.asarray(params["patch_norm"]["w"]),
        "patch_embed.norm.bias": np.asarray(params["patch_norm"]["b"]),
        "norm.weight": np.asarray(params["norm"]["w"]),
        "norm.bias": np.asarray(params["norm"]["b"]),
        "head.weight": np.asarray(params["head"]["w"]),
        "head.bias": np.asarray(params["head"]["b"]),
    }
    for i, stage in enumerate(params["stages"]):
        for j, blk in enumerate(stage["blocks"]):
            p = f"layers.{i}.blocks.{j}."
            sd[p + "attn.relative_position_bias_table"] = np.asarray(blk["bias_table"])
            for ours, theirs in [
                ("norm1", "norm1"), ("qkv", "attn.qkv"), ("proj", "attn.proj"),
                ("norm2", "norm2"), ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2"),
            ]:
                sd[p + theirs + ".weight"] = np.asarray(blk[ours]["w"])
                sd[p + theirs + ".bias"] = np.asarray(blk[ours]["b"])
        if "downsample" in stage:
            d = f"layers.{i}.downsample."
            sd[d + "norm.weight"] = np.asarray(stage["downsample"]["norm"]["w"])
            sd[d + "norm.bias"] = np.asarray(stage["downsample"]["norm"]["b"])
            sd[d + "reduction.weight"] = np.asarray(stage["downsample"]["reduction"]["w"])
    re = checkpoints.from_torch_state_dict_swin(sd, TINY)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(re)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibrate_and_quant_forward(setup):
    params, x = setup
    policy = make_policy()
    calib = swin.calibrate(params, TINY, policy, x)
    # weight layers: per block qkv+proj+fc1+fc2, +1 downsample reduction,
    # +1 patch conv, +1 head
    n_w = 4 * sum(TINY.depths) + (TINY.num_layers - 1) + 2
    assert calib.global_distance.shape == (n_w, 4)
    # PoT weight scales
    ws = calib.qstate["stages"][0]["blocks"][0]["attn"]["qkv_wscale"]
    exps = jnp.log2(ws)
    assert jnp.allclose(exps, jnp.round(exps), atol=1e-6)
    # PatchMerging PTF state exists with 2C channels (post-reduction)
    dq = calib.qstate["stages"][0]["downsample"]
    assert dq["qact2"]["scale"].shape == (2 * TINY.embed_dim,)

    for w_bit in (8, 4):
        out = swin.quant_forward(params, calib.qstate, TINY, policy, x, w_bit)
        assert out.shape == (2, 10)
        assert jnp.isfinite(out).all()

    fp = swin.fp_forward(params, TINY, x)
    q8 = swin.quant_forward(params, calib.qstate, TINY, policy, x, 8)
    rel = jnp.linalg.norm(q8 - fp) / jnp.linalg.norm(fp)
    assert rel < 0.6, f"W8A8 too far from fp: {rel}"


# ---------------------------------------------------------------------------
# Mixed precision (beyond the reference, whose Swin has no bit_config at all)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def calibrated(setup):
    params, x = setup
    policy = make_policy()
    return params, x, policy, swin.calibrate(params, TINY, policy, x)


def test_swin_flops_and_layout_consistency():
    flops = swin.swin_flops(TINY)
    assert len(flops) == TINY.num_matmuls
    groups, _ = swin.mixed_layout(TINY)
    covered = sorted(s for g in groups for s in g)
    # every slot except the pinned patch (0) appears exactly once
    assert covered == list(range(1, TINY.num_matmuls))


def test_quant_forward_mixed_uniform_matches_wbit(calibrated):
    from p2vit_tpu.models.vit import bits_to_idx

    params, x, policy, calib = calibrated
    n = TINY.num_matmuls
    for bit in (8, 4):
        uni = swin.quant_forward(params, calib.qstate, TINY, policy, x, bit)
        mix = swin.quant_forward_mixed(
            params, calib.qstate, TINY, policy, x, bits_to_idx([bit] * n)
        )
        np.testing.assert_array_equal(np.asarray(uni), np.asarray(mix))
    # a genuinely mixed config runs on the SAME executable (traced bits)
    mixed_cfg = [8] + [4, 4, 8, 8] * sum(TINY.depths) + [8] * (TINY.num_layers - 1 + 1)
    mixed_cfg = mixed_cfg[:n]
    out = swin.quant_forward_mixed(
        params, calib.qstate, TINY, policy, x, bits_to_idx(mixed_cfg)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_swin_mixed_precision_search(calibrated):
    import random

    from p2vit_tpu import search

    params, x, policy, calib = calibrated
    n = TINY.num_matmuls
    groups, _ = swin.mixed_layout(TINY)
    rng = random.Random(0)
    mh = list(np.random.RandomState(0).rand(n - 1))

    front = search.pareto_front(
        calib.flops, calib.global_distance, mh, rng,
        constraint_ratio=2.5, layout=groups, distances_include_patch=True,
    )
    assert front and front[0][1] <= front[-1][1]
    for cfg_bits, _ in front:
        assert len(cfg_bits) == n
        assert cfg_bits[0] == 8  # patch pinned to max bit
        for g in groups:  # paired genes share a bit
            assert len({cfg_bits[s] for s in g}) == 1

    # evolutionary search over the swin configs with a surrogate evaluator
    pop = search.evolutionary_search(
        lambda bits: -sum(bits), [c for c, _ in front], calib.flops,
        random.Random(0), pop_size=4, evo_iter=2, mutate_size=3,
        crossover_size=3, constraint_ratio=2.5,
    )
    assert len(pop) <= 4 and pop[0][1] >= pop[-1][1]


def test_swin_hessian_traces(setup):
    from p2vit_tpu.hessian import hessian_traces, normalized_mean_hessian

    params, x = setup
    labels = jnp.asarray([0, 1])
    tr = hessian_traces(params, TINY, x, labels, jax.random.PRNGKey(0), n_probes=2)
    assert tr.shape == (TINY.num_matmuls - 1,)
    assert jnp.isfinite(tr).all()
    mh = normalized_mean_hessian([tr])
    assert len(mh) == TINY.num_matmuls - 1
