"""Serving-path tests: Pallas kernel parity (interpret mode on CPU) and
full-network serving vs fake-quant simulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu.config import make_policy
from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.models import vit
from p2vit_tpu import serving
from p2vit_tpu.ops.matmul_int8 import int8_matmul_requant, int8_matmul_requant_ref
from p2vit_tpu.ops.attention_lis import lis_attention, lis_attention_ref

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=16, embed_dim=32, depth=2, num_heads=2
)


def test_int8_matmul_kernel_parity_interpret():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-128, 128, (70, 96), dtype=np.int8))
    w = jnp.asarray(rng.randint(-128, 128, (130, 96), dtype=np.int8))
    r = jnp.asarray(2.0 ** rng.randint(-12, -4, 130).astype(np.float32))
    b = jnp.asarray(rng.randn(130).astype(np.float32))
    out = int8_matmul_requant(x, w, r, b, block_m=128, block_n=128, interpret=True)
    ref = int8_matmul_requant_ref(x, w, r, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # gelu epilogue
    outg = int8_matmul_requant(
        x, w, r, b, out_inv=8.0, gelu=True, block_m=128, block_n=128, interpret=True
    )
    refg = int8_matmul_requant_ref(x, w, r, b, out_inv=8.0, gelu=True)
    np.testing.assert_array_equal(np.asarray(outg), np.asarray(refg))


def test_int8_matmul_kn_layout_bit_identical_interpret():
    """w_layout="kn" (weight K on sublanes, dims ((1,),(0,))) must equal the
    default "nk" layout bitwise — integer accumulation is layout-invariant.
    Shapes chosen so K (=192) is NOT a lane multiple (the DeiT-T pad case
    the layout A/B targets, tools/dtpack_ab.py) and N needs padding too."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(-128, 128, (70, 192), dtype=np.int8))
    w = jnp.asarray(rng.randint(-128, 128, (130, 192), dtype=np.int8))
    r = jnp.asarray(2.0 ** rng.randint(-12, -4, 130).astype(np.float32))
    b = jnp.asarray(rng.randn(130).astype(np.float32))
    base = int8_matmul_requant(x, w, r, b, block_m=128, block_n=128,
                               interpret=True)
    kn = int8_matmul_requant(x, w.T, r, b, block_m=128, block_n=128,
                             interpret=True, w_layout="kn")
    np.testing.assert_array_equal(np.asarray(base), np.asarray(kn))
    # gelu epilogue too (the fc1 path is the layout A/B's biggest GEMM)
    bg = int8_matmul_requant(x, w, r, b, out_inv=8.0, gelu=True,
                             block_m=128, block_n=128, interpret=True)
    kg = int8_matmul_requant(x, w.T, r, b, out_inv=8.0, gelu=True,
                             block_m=128, block_n=128, interpret=True,
                             w_layout="kn")
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(kg))
    with pytest.raises(ValueError, match="w_layout"):
        int8_matmul_requant(x, w, r, b, interpret=True, w_layout="bogus")


def test_lis_attention_kernel_parity_interpret():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randint(-128, 128, (4, 33, 16), dtype=np.int8))
    k = jnp.asarray(rng.randint(-128, 128, (4, 33, 16), dtype=np.int8))
    v = jnp.asarray(rng.randint(-128, 128, (4, 33, 16), dtype=np.int8))
    sr, sa, ro = 2.0**-9 * 0.25, 0.0625, 2.0**-2
    out = lis_attention(q, k, v, sr, sa, ro, interpret=True)
    ref = lis_attention_ref(q, k, v, sr, sa, ro)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # attention rows are dominated by their max — winner keeps weight 2^0
    # (sanity: outputs bounded by int8)
    assert np.asarray(out).min() >= -128 and np.asarray(out).max() <= 127


def test_matmul_res_ln_kernel_parity_interpret():
    from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln, int8_matmul_res_ln_ref

    rng = np.random.RandomState(2)
    m, k, n = 64, 96, 128
    x = jnp.asarray(rng.randint(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.randint(-128, 128, (n, k), dtype=np.int8))
    r = jnp.asarray(2.0 ** rng.randint(-12, -6, n).astype(np.float32))
    bias = jnp.asarray(rng.randn(n).astype(np.float32))
    res = jnp.asarray(rng.randint(-128, 128, (m, n), dtype=np.int8))
    s_mid = jnp.asarray(np.abs(rng.randn(n)).astype(np.float32) * 0.02 + 0.01)
    s_res = jnp.asarray(0.011 * 2.0 ** rng.randint(0, 4, n).astype(np.float32))
    s_out = jnp.asarray(0.013 * 2.0 ** rng.randint(0, 4, n).astype(np.float32))
    ln_w = jnp.asarray(rng.randn(n).astype(np.float32))
    ln_b = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)
    ln_out = jnp.asarray(np.abs(rng.randn(n)).astype(np.float32) * 0.03 + 0.01)
    ratio = jnp.asarray(2.0 ** rng.randint(-1, 2, n).astype(np.float32))
    out = int8_matmul_res_ln(
        x, w, r, bias, res, s_mid, s_res, s_out, ln_w, ln_b, ln_out, ratio,
        interpret=True,
    )
    ref = int8_matmul_res_ln_ref(
        x, w, r, bias, res, s_mid, s_res, s_out, ln_w, ln_b, ln_out, ratio
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))


@pytest.mark.parametrize("bits", [[8], [4], [4, 8]])
def test_serving_matches_simulation(bits):
    """[4,8] = alternating mixed-precision config, the evolutionary-search
    deployment case (per-layer bits frozen at convert time)."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    n = TINY.num_matmuls
    bit_config = (bits * n)[:n]
    sim = np.asarray(
        vit.quant_forward(
            params, calib.qstate, TINY, policy, x, vit.bits_to_idx(bit_config)
        )
    )
    ss = serving.convert(params, calib.qstate, TINY, policy, bit_config)
    srv = np.asarray(serving.serving_forward(ss, TINY, x, use_pallas=False))
    rel = np.linalg.norm(srv - sim) / max(np.linalg.norm(sim), 1e-9)
    assert rel < 0.05, f"serving diverges from simulation: rel={rel}"
    assert (sim.argmax(1) == srv.argmax(1)).all()


def test_qkv_fused_attention_bit_identical_interpret():
    """lis_attention_qkv_fused must equal int8_matmul_requant →
    lis_attention_fused exactly (same round/clip epilogue, f32-exact
    integer products), both LIS on and off."""
    from p2vit_tpu.ops.attention_lis import (
        lis_attention_fused,
        lis_attention_qkv_fused,
    )

    rng = np.random.RandomState(2)
    b, n, c, heads = 2, 33, 32, 2
    h = jnp.asarray(rng.randint(-128, 128, (b, n, c), dtype=np.int8))
    w = jnp.asarray(rng.randint(-128, 128, (3 * c, c), dtype=np.int8))
    rvec = jnp.asarray(2.0 ** rng.randint(-12, -4, 3 * c).astype(np.float32))
    bvec = jnp.asarray(rng.randn(3 * c).astype(np.float32))
    sr, sa, ro = 2.0**-9 * 0.25, 0.0625, 2.0**-2
    for lis in (True, False):
        qkv_codes = int8_matmul_requant(
            h.reshape(-1, c), w, rvec, bvec, block_m=128, block_n=128,
            interpret=True,
        ).reshape(b, n, 3 * c)
        two_step = lis_attention_fused(
            qkv_codes, heads, sr, sa, ro, lis=lis, interpret=True
        )
        fused = lis_attention_qkv_fused(
            h, w, rvec, bvec, heads, sr, sa, ro, lis=lis, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(two_step))


def test_serving_forward_fuse_qkv_bit_identical():
    """End-to-end serving with fuse_qkv=True equals the two-step pipeline
    bitwise (interpret mode)."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    base = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_qkv=False, fuse_layer=False)
    )
    fused = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_qkv=True, fuse_layer=False)
    )
    np.testing.assert_array_equal(base, fused)


@pytest.mark.parametrize("lis", [True, False])
def test_serving_forward_fused_layer_bit_identical(lis):
    """The one-kernel-per-layer path (ops/layer_fused.py) equals the
    four-kernel pipeline bitwise end to end (interpret mode), LIS on/off
    and under a mixed bit config."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(3), TINY)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    n = TINY.num_matmuls
    ss = serving.convert(params, calib.qstate, TINY, policy, ([8, 4] * n)[:n])
    base = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                lis=lis, fuse_layer=False)
    )
    fused = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                lis=lis, fuse_layer=True)
    )
    np.testing.assert_array_equal(base, fused)


def test_fused_layer_dead_channel_scale_parity():
    """A dead channel (zero smoothquant/LN consumer scale) must not break
    fused-vs-four-kernel bit parity: both paths floor the LN out-scale at
    1e-30 (regression for the fused-layer path missing the floor)."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(5), TINY)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    # zero one channel of the LN2 consumer scale (ln2_out = s_act * norm2_cs)
    sb = ss["blocks"][0]
    sb["norm2_cs"] = sb["norm2_cs"].at[0].set(0.0)
    base = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_layer=False)
    )
    fused = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_layer=True)
    )
    np.testing.assert_array_equal(base, fused)
    assert np.isfinite(fused).all()


def test_fused_embed_bit_identical_interpret():
    """ops/embed_fused.py: the one-kernel prologue must equal the staged
    pipeline (quantize → patch mm → requants → pos → qact1 → block-0 int-LN)
    bit for bit, and so must the full forward through it."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    h0, xc0 = serving.embed_codes(ss, TINY, x, use_pallas=False)
    h1, xc1 = serving.embed_codes(ss, TINY, x, use_pallas=True,
                                  interpret=True, fuse_embed=True)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(xc0), np.asarray(xc1))
    a = serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_embed=True)
    b = serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_embed=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # batch not divisible by images_per_step (padded grid rows sliced off)
    h2, xc2 = serving.embed_codes(ss, TINY, x[:3], use_pallas=True,
                                  interpret=True, fuse_embed=True)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h0)[:3])
    np.testing.assert_array_equal(np.asarray(xc2), np.asarray(xc0)[:3])


def test_int4_packed_matmul_bit_identical_interpret():
    """ops/matmul_int8.int4_matmul_requant (packed W4 store, split-K
    unpack) must equal the int8-store reference exactly, plain and GELU."""
    from p2vit_tpu.ops.matmul_int8 import int4_matmul_requant, pack_int4

    rng = np.random.RandomState(3)
    for m, k, n in ((64, 96, 48), (70, 130 * 2, 33)):
        x = jnp.asarray(rng.randint(-128, 128, (m, k), dtype=np.int8))
        w = jnp.asarray(rng.randint(-8, 8, (n, k), dtype=np.int8))
        r = jnp.asarray(2.0 ** rng.randint(-12, -6, n).astype(np.float32))
        b = jnp.asarray(rng.randn(n).astype(np.float32))
        ref = int8_matmul_requant_ref(x, w, r, b)
        got = int4_matmul_requant(x, pack_int4(w), r, b, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        refg = int8_matmul_requant_ref(x, w, r, b, out_inv=16.0, gelu=True)
        gotg = int4_matmul_requant(x, pack_int4(w), r, b, out_inv=16.0,
                                   gelu=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(gotg), np.asarray(refg))


def test_scan_layers_bit_identical():
    """serving_forward(scan_layers=True) — ONE lax.scan over depth-stacked
    constants, depth-independent program size (the ViT-L unroll exceeded
    the tunnel's compile-request cap) — must equal the unrolled loop
    bit for bit on both backends."""
    policy = make_policy()
    cfg = ViTConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=16,
                    depth=3, num_heads=2)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    calib = vit.calibrate(params, cfg, policy, x)
    ss = serving.convert(params, calib.qstate, cfg, policy,
                         [8] * cfg.num_matmuls)
    for kw in (dict(use_pallas=False), dict(use_pallas=True, interpret=True),
               dict(use_pallas=True, interpret=True, fuse_qkv=False)):
        a = np.asarray(serving.serving_forward(ss, cfg, x, scan_layers=True, **kw))
        b = np.asarray(serving.serving_forward(ss, cfg, x, scan_layers=False, **kw))
        np.testing.assert_array_equal(a, b, err_msg=str(kw))


def test_pack_int4_rejects_out_of_range_codes():
    """`& 0xF` would silently corrupt non-int4 codes (w=-100 packs as 12);
    pack_int4 must refuse them loudly."""
    from p2vit_tpu.ops.matmul_int8 import pack_int4

    w = jnp.full((4, 8), -100, jnp.int8)
    with pytest.raises(ValueError, match="int4 codes"):
        pack_int4(w)
    # under jit the value check can't raise — out-of-range codes saturate
    # to [-8, 7] instead of wrapping through `& 0xF`
    packed = jax.jit(pack_int4)(w)
    expect = jax.jit(pack_int4)(jnp.full((4, 8), -8, jnp.int8))
    assert (np.asarray(packed) == np.asarray(expect)).all()


def test_matmul_res_ln_bypass_vpu_probe_interpret():
    """The resln timing probe's kernel arm (bypass_vpu=True) must keep the
    dot + requant + full I/O but write the documented probe values
    (clip(mid + res) in both outputs) — pinned so the on-chip probe
    (tools/resln_insitu.py) measures the intended work, not DCE'd air."""
    from p2vit_tpu.ops.matmul_ln import int8_matmul_res_ln

    rng = np.random.RandomState(3)
    m, k, n = 64, 96, 128
    x = jnp.asarray(rng.randint(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.randint(-128, 128, (n, k), dtype=np.int8))
    r = jnp.asarray(2.0 ** rng.randint(-12, -6, n).astype(np.float32))
    bias = jnp.asarray(rng.randn(n).astype(np.float32))
    res = jnp.asarray(rng.randint(-128, 128, (m, n), dtype=np.int8))
    ones = jnp.ones((n,), jnp.float32)
    out_res, out_ln = int8_matmul_res_ln(
        x, w, r, bias, res, ones, ones, ones, ones, ones, ones, ones,
        interpret=True, bypass_vpu=True,
    )
    acc = jnp.dot(x.astype(jnp.int32), w.T.astype(jnp.int32))
    mid = jnp.clip(jnp.round(acc.astype(jnp.float32) * r[None, :]
                             + bias[None, :]), -128, 127)
    expect = np.asarray(
        jnp.clip(mid + res.astype(jnp.float32), -128, 127).astype(jnp.int8)
    )
    np.testing.assert_array_equal(np.asarray(out_res), expect)
    np.testing.assert_array_equal(np.asarray(out_ln), expect)


def test_serving_resln_probe_arms():
    """The in-situ junction probe arms must run end to end (finite logits,
    right shape — values are WRONG by design) and the guards must refuse
    every configuration where the probe would silently lie."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    base = np.asarray(serving.serving_forward(
        ss, TINY, x, use_pallas=True, interpret=True))
    for arm in ("novpu", "nodma"):
        out = np.asarray(serving.serving_forward(
            ss, TINY, x, use_pallas=True, interpret=True, resln=arm))
        assert out.shape == base.shape and np.isfinite(out).all(), arm
        # scan path drives the same _junction dispatch
        out_s = np.asarray(serving.serving_forward(
            ss, TINY, x, use_pallas=True, interpret=True, resln=arm,
            scan_layers=True))
        np.testing.assert_array_equal(out, out_s, err_msg=arm)
    with pytest.raises(ValueError, match="resln must be"):
        serving.serving_forward(ss, TINY, x, use_pallas=True,
                                interpret=True, resln="bogus")
    with pytest.raises(ValueError, match="Pallas four-kernel"):
        serving.serving_forward(ss, TINY, x, use_pallas=False, resln="novpu")
    with pytest.raises(ValueError, match="Pallas four-kernel"):
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_layer=True, resln="nodma")


def test_weight_only_params_roundtrip_and_forward():
    """serving.weight_only_params: requantizing each effective weight with
    the serving scales must reproduce convert()'s codes BIT FOR BIT
    (including the SmoothQuant fold on qkv/fc1 — sw and cs are both PoT,
    so the dequant→requant float round trip is exact), and the pytree must
    run the plain fp forward. This is the bf16 fallback mode for the
    regimes where the fully-quantized pipeline measures below bf16."""
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    n = TINY.num_matmuls
    bit_config = ([4, 8] * n)[:n]
    s = serving.convert(params, calib.qstate, TINY, policy, bit_config)
    pw = serving.weight_only_params(params, calib.qstate, TINY, policy,
                                    bit_config)

    def requant(w_eff, layer, bit):
        qmin, qmax = (-8, 7) if bit == 4 else (-128, 127)
        if "cs" in layer:
            w_eff = w_eff * layer["cs"][None, :]
        codes = jnp.clip(jnp.round(w_eff / layer["sw"][:, None]),
                         qmin, qmax).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(codes),
                                      np.asarray(layer["w_q"]))

    requant(pw["patch_embed"]["w"], s["patch"], bit_config[0])
    requant(pw["head"]["w"], s["head"], bit_config[-1])
    for i, (nb, sb) in enumerate(zip(pw["blocks"], s["blocks"])):
        bq, bp, b1, b2 = bit_config[1 + 4 * i: 5 + 4 * i]
        requant(nb["qkv"]["w"], sb["qkv"], bq)
        requant(nb["proj"]["w"], sb["proj"], bp)
        requant(nb["fc1"]["w"], sb["mlp_fc1"], b1)
        requant(nb["fc2"]["w"], sb["fc2"], b2)
    # non-weight leaves untouched; weights actually changed
    np.testing.assert_array_equal(np.asarray(pw["blocks"][0]["qkv"]["b"]),
                                  np.asarray(params["blocks"][0]["qkv"]["b"]))
    assert not np.array_equal(np.asarray(pw["blocks"][0]["qkv"]["w"]),
                              np.asarray(params["blocks"][0]["qkv"]["w"]))
    logits = np.asarray(vit.fp_forward(pw, TINY, x))
    assert logits.shape == (4, TINY.num_classes)
    assert np.isfinite(logits).all()


def test_weight_only_params_rejects_ptf_false():
    """ptf=False calibrations have no frozen serving codes (the SmoothQuant
    channel scales depend on the PTF LN-output observers) — the mode-specific
    guard must explain that, not the int8-pipeline assert."""
    policy = make_policy(ptf=False)
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    with pytest.raises(ValueError, match="weight-only serving"):
        serving.weight_only_params(params, {}, TINY, policy,
                                   [8] * TINY.num_matmuls)
