"""Swin int8 serving vs fake-quant simulation parity (CPU, jnp twins)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu.config import make_policy
from p2vit_tpu.models import swin
from p2vit_tpu import serving_swin

TINY = swin.SwinConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=16,
    depths=(2, 2), num_heads=(2, 2), window_size=4,
)


@pytest.fixture(scope="module")
def setup():
    policy = make_policy()
    params = swin.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    calib = swin.calibrate(params, TINY, policy, x)
    return policy, params, x, calib


@pytest.mark.parametrize("w_bit", [8, 4])
def test_swin_serving_matches_simulation(setup, w_bit):
    policy, params, x, calib = setup
    sim = np.asarray(
        swin.quant_forward(params, calib.qstate, TINY, policy, x, w_bit)
    )
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, w_bit)
    srv = np.asarray(
        serving_swin.serving_forward(
            ss, calib.qstate, TINY, policy, x, use_pallas=False
        )
    )
    rel = np.linalg.norm(srv - sim) / max(np.linalg.norm(sim), 1e-9)
    assert rel < 0.05, f"swin serving diverges: rel={rel}"
    assert (sim.argmax(1) == srv.argmax(1)).all()


def test_swin_pallas_attention_kernel_bit_exact(setup):
    """The fused Pallas window-attention kernel (interpret mode) is
    bit-identical to the XLA integer-math twin, shifted blocks included."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    ref = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False))
    pal = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False,
        pallas_attn=True, interpret=True))
    assert np.array_equal(ref, pal)


def test_swin_kernel_mask_chunk_indexing():
    """Direct kernel test with n_windows > windows-per-step: each grid step
    must pick the right contiguous mask chunk (index i % n_chunks)."""
    from p2vit_tpu.ops.attention_lis import (
        swin_lis_attention,
        _lis_from_scores,
    )

    key = jax.random.PRNGKey(0)
    b, n_win, n, heads, d = 2, 64, 9, 2, 4  # 64 windows/image, ws=3
    c = heads * d
    w = b * n_win
    qkv = jax.random.randint(key, (w, n, 3 * c), -128, 128, jnp.int8)
    bias = jax.random.normal(jax.random.PRNGKey(1), (heads, n, n)) * 0.3
    # distinct mask per window so a wrong chunk index changes the output
    mask = -100.0 * jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (n_win, n, n)
    ).astype(jnp.float32)
    rq, s1, s2, ro = 2.0**-9, 2.0**-4, 2.0**-4, 2.0**-2

    out = swin_lis_attention(qkv, bias, mask / s2, heads, n_win, rq, s1, s2,
                             ro, interpret=True)

    # jnp twin (serving_swin._window_attention_codes math)
    q, k, v = [
        qkv.reshape(w, n, 3, heads, d).transpose(2, 0, 3, 1, 4)[i]
        for i in range(3)
    ]
    acc = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.int32),
                     k.astype(jnp.int32)).astype(jnp.float32)
    attn_c = jnp.clip(jnp.round(acc * rq), -128, 127)
    attn2 = jnp.clip(jnp.round((attn_c * s1 + bias[None]) / s2), -128, 127)
    attn2 = attn2.reshape(b, n_win, heads, n, n) + (mask / s2)[None, :, None]
    attn2 = attn2.reshape(w, heads, n, n)
    col = jax.lax.broadcasted_iota(jnp.int32, attn2.shape, 3)
    attn_p = _lis_from_scores(attn2, s2, col, n, 4)
    av = jnp.einsum("bhnm,bhmd->bhnd", attn_p, v.astype(jnp.float32))
    ref = jnp.clip(
        jnp.round(av.transpose(0, 2, 1, 3).reshape(w, n, c) * ro), -128, 127
    ).astype(jnp.int8)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_swin_serving_mixed_bits_matches_simulation(setup):
    """Per-layer bit_config serving (beyond the reference, whose Swin has no
    bit_config at all): convert with a mixed list, compare against
    quant_forward_mixed. The uniform-int path must equal the list path."""
    from p2vit_tpu.models.vit import bits_to_idx

    policy, params, x, calib = setup
    n = TINY.num_matmuls
    rng = np.random.RandomState(0)
    mixed = [8] + [int(b) for b in rng.choice([4, 8], n - 2)] + [8]

    sim = np.asarray(
        swin.quant_forward_mixed(
            params, calib.qstate, TINY, policy, x, bits_to_idx(mixed)
        )
    )
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, mixed)
    srv = np.asarray(
        serving_swin.serving_forward(
            ss, calib.qstate, TINY, policy, x, use_pallas=False
        )
    )
    rel = np.linalg.norm(srv - sim) / max(np.linalg.norm(sim), 1e-9)
    assert rel < 0.05, f"mixed swin serving diverges: rel={rel}"
    assert (sim.argmax(1) == srv.argmax(1)).all()

    # uniform int arg == uniform list arg, bitwise
    a = serving_swin.convert(params, calib.qstate, TINY, policy, 4)
    bcfg = serving_swin.convert(params, calib.qstate, TINY, policy, [4] * n)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(bcfg)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_res_ln_requant_kernel_matches_ref():
    """The fused residual+requant+LN kernel (interpret mode) is bit-identical
    to its jnp twin, scalar and PTF-vector residual scales included."""
    from p2vit_tpu.ops.intln import int_res_ln_requant, int_res_ln_requant_ref

    key = jax.random.PRNGKey(0)
    m, c = 24, 16
    a = jax.random.randint(key, (m, c), -128, 128, jnp.int8)
    b = jax.random.randint(jax.random.PRNGKey(1), (m, c), -128, 128, jnp.int8)
    ln_w = jax.random.normal(jax.random.PRNGKey(2), (c,))
    ln_b = jax.random.normal(jax.random.PRNGKey(3), (c,)) * 0.1
    for s_out in (jnp.float32(0.07),
                  2.0 ** jax.random.randint(key, (c,), -6, -2).astype(
                      jnp.float32) * 0.05):
        got = int_res_ln_requant(a, 0.03, b, 0.05, s_out, ln_w, ln_b,
                                 0.02, 1.0, interpret=True)
        want = int_res_ln_requant_ref(a, 0.03, b, 0.05, s_out, ln_w, ln_b,
                                      0.02, 1.0)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_swin_fuse_res_matches_unfused(setup):
    """fuse_res=True (fused junction kernels) tracks the unfused path —
    identical up to 1-ulp divide knife edges — and agrees on argmax."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    fused = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False, fuse_res=True))
    plain = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False, fuse_res=False))
    rel = np.linalg.norm(fused - plain) / max(np.linalg.norm(plain), 1e-9)
    assert rel < 0.02, f"fused junctions diverge: rel={rel}"
    assert (fused.argmax(1) == plain.argmax(1)).all()


def test_swin_stem_kernel_matches_ref():
    """The fused patch-stem kernel (interpret mode) is bit-identical to its
    jnp twin."""
    from p2vit_tpu.ops.swin_stem import fused_swin_stem, fused_swin_stem_ref

    m, k, c = 32, 48, 16
    px = jax.random.normal(jax.random.PRNGKey(0), (m, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (c, k)) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.05
    ln_w = jax.random.normal(jax.random.PRNGKey(3), (c,))
    ln_b = jax.random.normal(jax.random.PRNGKey(4), (c,)) * 0.1
    got = fused_swin_stem(px, w, bias, 0.04, ln_w, ln_b, 0.03,
                          interpret=True)
    want = fused_swin_stem_ref(px, w, bias, 0.04, ln_w, ln_b, 0.03)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_swin_fuse_stem_matches_unfused(setup):
    """fuse_stem tracks the staged stem (identical up to f32 dot tiling
    knife edges) and agrees on argmax."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    fused = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=True, interpret=True,
        fuse_stem=True))
    plain = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=True, interpret=True,
        fuse_stem=False))
    rel = np.linalg.norm(fused - plain) / max(np.linalg.norm(plain), 1e-9)
    assert rel < 0.02, f"fused stem diverges: rel={rel}"
    assert (fused.argmax(1) == plain.argmax(1)).all()


def test_swin_folded_attention_kernel_bit_exact():
    """swin_lis_attention_folded (raster in/out, in-VMEM windowing) is
    bit-identical to window_partition → swin_lis_attention →
    window_reverse, masks and both softmax modes included — the shared
    _swin_head_loop plus matched nfull padding make every reduction tree
    shape-identical."""
    from p2vit_tpu.models.swin import shift_attn_mask, window_partition, \
        window_reverse
    from p2vit_tpu.ops.attention_lis import (
        swin_lis_attention,
        swin_lis_attention_folded,
    )

    b, res, ws, heads, c = 2, 8, 4, 2, 32
    n = ws * ws
    rng = np.random.RandomState(0)
    qkv4 = jnp.asarray(rng.randint(-128, 128, (b, res, res, 3 * c)), jnp.int8)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32)) * 0.3
    s2 = 2.0**-4
    scales = (2.0**-9, 2.0**-4, s2, 2.0**-2)
    for lis in (True, False):
        for mask in (None, jnp.asarray(shift_attn_mask(res, res, ws, ws // 2))
                     / s2):
            hw = window_partition(qkv4, ws).reshape(-1, n, 3 * c)
            ref = swin_lis_attention(hw, bias, mask, heads, (res // ws) ** 2,
                                     *scales, lis=lis, interpret=True)
            ref4 = window_reverse(ref, ws, res, res)
            got = swin_lis_attention_folded(qkv4, bias, mask, heads, ws,
                                            *scales, lis=lis, interpret=True)
            assert np.array_equal(np.asarray(ref4), np.asarray(got)), (
                f"lis={lis} mask={mask is not None}"
            )


def test_swin_fold_windows_matches_default(setup):
    """serving_forward(fold_windows=True) is bit-identical to the default
    two-step windowing path (same rows through qkv/proj, shared attention
    math), shifted blocks and the res == ws final stage included."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    base = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=True, interpret=True))
    fold = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=True, interpret=True,
        fold_windows=True))
    assert np.array_equal(base, fold)


def test_swin_int_stem_matches_fp_stem(setup):
    """int8 patch stem (input codes @ w_q on the MXU, fused requant) vs the
    fp stem: exact int32 accumulation vs f32 rounding — knife-edge-only
    differences, so decisions must agree and values stay tight."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    a = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False))
    b = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False, int_stem=True))
    assert (a.argmax(1) == b.argmax(1)).all()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 5e-2, f"int_stem diverges from fp stem: rel={rel}"
    # the Pallas int_stem arm compiles and agrees in interpret mode (the
    # mm kernel itself is bit-exact-tested against its ref twin elsewhere)
    c = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=True, interpret=True,
        int_stem=True))
    assert (c.argmax(1) == b.argmax(1)).all()


def test_swin_int_stem_nonzero_zero_point(setup):
    """The int_stem bias fold handles a nonzero input zero-point exactly:
    (q0−zp)@Wᵀ·s·sw = q0@Wᵀ·s·sw − zp·s·(sw·Σ_k w) — perturb zp_input in the
    frozen state and both stems must still track each other (an asymmetric
    input observer or an imported reference state can carry zp≠0)."""
    policy, params, x, calib = setup
    ss = dict(serving_swin.convert(params, calib.qstate, TINY, policy, 8))
    ss["zp_input"] = ss["zp_input"] + 3.0
    a = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False))
    b = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False, int_stem=True))
    assert np.isfinite(b).all()
    assert (a.argmax(1) == b.argmax(1)).all()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 5e-2, f"zp fold wrong: rel={rel}"


@pytest.mark.parametrize("lis", [True, False])
def test_swin_all_options_combined(setup, lis):
    """Every serving option at once (fold_windows + int_stem + fuse_res, the
    full candidate default set, LIS on AND off) tracks the plain default
    path. The per-option tests pin each arm alone; this pins the
    interactions — the stem feeds the first block's codes, fold_windows
    changes the attention kernel's input layout, fuse_res changes which
    kernel emits each block's LN codes — so a regression in any handoff
    shows up before the on-chip A/B does. int_stem is the only inexact arm
    (f32-vs-int32 stem knife edges), so the envelope matches its solo test."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    base = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=False, lis=lis))
    combo = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, TINY, policy, x, use_pallas=True, interpret=True,
        lis=lis, fold_windows=True, int_stem=True, fuse_res=True))
    assert np.isfinite(combo).all()
    assert (base.argmax(1) == combo.argmax(1)).all()
    rel = np.linalg.norm(combo - base) / max(np.linalg.norm(base), 1e-9)
    assert rel < 5e-2, f"combined options diverge: rel={rel}"


def test_swin_lis_bypass_probe_runs(setup):
    """lis="bypass" (the timing-only ceiling probe, tools/ceiling_swin.py)
    must survive the serving lis-normalization, reach the kernels' probe
    branch in both window layouts, and produce finite logits — its MATH is
    deliberately wrong (no softmax normalization), so only shape/finiteness
    and the guard are pinned here."""
    policy, params, x, calib = setup
    ss = serving_swin.convert(params, calib.qstate, TINY, policy, 8)
    for fold in (False, True):
        out = np.asarray(serving_swin.serving_forward(
            ss, calib.qstate, TINY, policy, x, use_pallas=True,
            interpret=True, lis="bypass", fold_windows=fold))
        assert out.shape == (x.shape[0], TINY.num_classes)
        assert np.isfinite(out).all()
    with pytest.raises(ValueError, match="bypass"):
        serving_swin.serving_forward(ss, calib.qstate, TINY, policy, x,
                                     use_pallas=False, lis="bypass")


def test_swin_weight_only_params_roundtrip_and_forward(setup):
    """serving_swin.weight_only_params: requantizing every effective
    weight (incl. the PatchMerging reduction) reproduces convert()'s
    codes bit for bit; the pytree runs the plain fp forward."""
    policy, params, x, calib = setup
    s = serving_swin.convert(params, calib.qstate, TINY, policy, 4)
    pw = serving_swin.weight_only_params(params, calib.qstate, TINY,
                                         policy, 4)

    def requant(w_eff, layer):
        codes = jnp.clip(jnp.round(w_eff / layer["sw"][:, None]),
                         -8, 7).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(codes),
                                      np.asarray(layer["w_q"]))

    requant(pw["patch_embed"]["w"], s["patch"])
    requant(pw["head"]["w"], s["head"])
    for stage, st in zip(pw["stages"], s["stages"]):
        for blk, sb in zip(stage["blocks"], st["blocks"]):
            for key in ("qkv", "proj", "fc1", "fc2"):
                requant(blk[key]["w"], sb[key])
        if "downsample" in stage:
            requant(stage["downsample"]["reduction"]["w"],
                    st["downsample"]["red"])
    logits = np.asarray(swin.fp_forward(pw, TINY, x))
    assert logits.shape == (2, TINY.num_classes)
    assert np.isfinite(logits).all()
