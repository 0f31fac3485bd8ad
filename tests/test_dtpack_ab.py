"""Math-equality pin for the dtpack contraction-layout A/B arms.

Interpret mode on tiny shapes: every layout arm must produce the exact
integer result of the `lanes` (serving) layout — the on-chip tool then
only has to answer the SPEED question (and Mosaic lowering viability,
which interpret mode cannot see, BENCH.md round-2b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tools.dtpack_ab as ab


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ab, "INTERPRET", True)


def test_gemm_arms_exact():
    rng = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(rng)
    m, k, n = 512, 192, 64
    x = jax.random.randint(kx, (m, k), -128, 128, jnp.int8)
    w = jax.random.randint(kw, (n, k), -128, 128, jnp.int8)
    ref = np.asarray(ab.gemm_arm(x, w, ((1,), (1,))))
    wsub = np.asarray(ab.gemm_arm(x, w.T.copy(), ((1,), (0,))))
    xsub = np.asarray(ab.gemm_arm(x.T.copy(), w.T.copy(), ((0,), (0,))))
    exact = np.asarray(
        jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    ).astype(np.int8)
    np.testing.assert_array_equal(ref, exact)
    np.testing.assert_array_equal(wsub, ref)
    np.testing.assert_array_equal(xsub, ref)


def test_attention_arms_exact():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv, ka = jax.random.split(rng, 4)
    g, nfull, nr, d = 8, 32, 24, 64
    q = jax.random.randint(kq, (g, nfull, d), -128, 128, jnp.int8)
    k = jax.random.randint(kk, (g, nfull, d), -128, 128, jnp.int8)
    v = jax.random.randint(kv, (g, nfull, d), -8, 8, jnp.int8)
    attn = jnp.round(jax.random.uniform(ka, (g, nr, nfull)) * 8)

    s_lanes = np.asarray(
        ab.batched_arm(q, k, ((2,), (2,)), nfull, nfull, g_step=4))
    s_ksub = np.asarray(
        ab.batched_arm(q, jnp.transpose(k, (0, 2, 1)).copy(),
                       ((2,), (1,)), nfull, nfull, g_step=4))
    s_xsub = np.asarray(
        ab.batched_arm(jnp.transpose(q, (0, 2, 1)).copy(),
                       jnp.transpose(k, (0, 2, 1)).copy(),
                       ((1,), (1,)), nfull, nfull, g_step=4))
    np.testing.assert_array_equal(s_lanes, s_ksub)
    np.testing.assert_array_equal(s_lanes, s_xsub)

    vf = v.astype(jnp.float32)
    av_lanes = np.asarray(
        ab.batched_arm(attn, vf, ((2,), (1,)), nr, d, g_step=4,
                       out_dtype=jnp.float32))
    av_xsub = np.asarray(
        ab.batched_arm(jnp.transpose(attn, (0, 2, 1)).copy(), vf,
                       ((1,), (1,)), nr, d, g_step=4,
                       out_dtype=jnp.float32))
    np.testing.assert_array_equal(av_lanes, av_xsub)


def test_checksum_matches_numpy():
    """2**31 must not be traced into a jitted mod on an int32 operand —
    the interpret-mode main smoke caught an OverflowError here."""
    x = (jnp.arange(300, dtype=jnp.int32) - 150).astype(jnp.int8)
    want = int(np.asarray(x, dtype=np.int32).sum()) % (2**31)
    assert ab._checksum(x) == want


def test_folded_ln_bitwise():
    from p2vit_tpu.ops.intln import int_ln_requant

    rng = jax.random.PRNGKey(2)
    kc, kw, kb, ks = jax.random.split(rng, 4)
    m, c = 64, 192
    codes = jax.random.randint(kc, (m, c), -128, 128, jnp.int8)
    ptf_mask = jnp.asarray(
        np.random.RandomState(0).choice([1.0, 2.0, 4.0, 8.0], size=c),
        jnp.float32)
    s1 = jnp.float32(0.013)
    ln_w = jax.random.normal(kw, (c,), jnp.float32)
    ln_b = jax.random.normal(kb, (c,), jnp.float32) * 0.1
    out_scale = jnp.abs(jax.random.normal(ks, (c,), jnp.float32)) * 0.02
    ratio = jnp.ones((c,), jnp.float32)

    ref = np.asarray(int_ln_requant(codes, ptf_mask, s1, ln_w, ln_b,
                                    out_scale, ratio, interpret=True))
    fold = np.asarray(
        ab.folded_int_ln(codes.reshape(m // 2, 2 * c), ptf_mask, s1, ln_w,
                         ln_b, out_scale, ratio, c, block_m=8)
    ).reshape(m, c)
    np.testing.assert_array_equal(ref, fold)
