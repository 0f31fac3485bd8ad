"""Exactness of the exponent-field fastmath used by the serving kernels.

These pin the claims made in p2vit_tpu/ops/fastmath.py: floor_log2i is the
exact ⌊log2 x⌋, exp2i constructs exact powers of two, and the LIS tail built
on them is bit-identical to the log2/exp2 transcendental form for every
reachable input (lis_bits=4).
"""

import numpy as np

import jax.numpy as jnp

from p2vit_tpu.ops.fastmath import exp2i, floor_log2i


def test_floor_log2i_integers_exact():
    # every integer 1..2^20: exponent extraction == exact floor(log2)
    v = np.arange(1, 2**20, dtype=np.float32)
    got = np.asarray(floor_log2i(jnp.asarray(v)))
    want = np.floor(np.log2(v.astype(np.float64))).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_floor_log2i_normals_and_edges():
    rng = np.random.RandomState(0)
    x = np.float32(2.0) ** rng.uniform(-126, 127, 20000).astype(np.float32)
    got = np.asarray(floor_log2i(jnp.asarray(x)))
    want = np.floor(np.log2(x.astype(np.float64))).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    # exact powers of two, zero, inf
    k = np.arange(-126, 128, dtype=np.int32)
    np.testing.assert_array_equal(
        np.asarray(floor_log2i(jnp.asarray(2.0**k, jnp.float32))), k
    )
    assert int(floor_log2i(jnp.float32(0.0))) == -127
    assert int(floor_log2i(jnp.float32(np.inf))) == 128
    # just below a power of two: log2-then-floor would round UP here for
    # large k; the exponent field is exactly k-1
    x = np.nextafter(np.float32(2.0**30), np.float32(0), dtype=np.float32)
    assert int(floor_log2i(jnp.asarray(x))) == 29


def test_exp2i_exact():
    k = np.arange(-126, 128, dtype=np.int32)
    got = np.asarray(exp2i(jnp.asarray(k)))
    np.testing.assert_array_equal(got, (2.0**k.astype(np.float64)).astype(np.float32))
    assert np.isposinf(np.asarray(exp2i(jnp.int32(128))))


def _lis_tail_new(softmax_out, lis_bits):
    """The fastmath tail exactly as _lis_from_scores composes it."""
    big = floor_log2i(softmax_out)
    tie = softmax_out >= 1.5 * exp2i(big)
    big = big + tie.astype(jnp.int32)
    return jnp.where(big >= 2**lis_bits, 0.0, exp2i(-big))


def _lis_tail_oracle(v, lis_bits):
    """f64 ground truth of the reference tail (layers.py:419-428): exact
    ⌊log2⌋, exact powers of two, ties up, overflow → 0. torch matches this
    (libm pow/log2 are correctly rounded); XLA's polynomial exp2 did NOT —
    exp2(13.0) ≈ 8192.004 on CPU — which is why the serving chain builds its
    powers via the exponent field instead."""
    v = v.astype(np.float64)
    big = np.floor(np.log2(v))
    with np.errstate(invalid="ignore"):
        p = np.where(np.isfinite(big), np.exp2(big), np.inf)
        tie = (v - p) >= p * 0.5
    q = big + tie
    out = np.where(q >= 2**lis_bits, 0.0, np.exp2(-q))
    return out.astype(np.float32)


def test_lis_tail_matches_exact_reference():
    """Every reachable softmax_out (= round(exp_sum/exp_int) ≥ 1, any
    magnitude, plus the exp_int=0 → inf row) produces the reference-exact
    4-bit LIS weight."""
    chunks = [
        np.arange(1, 2**22, dtype=np.float32),  # dense small integers
        np.float32(2.0) ** np.arange(22, 39)[:, None]
        + np.arange(-4, 5, dtype=np.float32)[None, :] * 2.0**15,  # big knives
        np.array([np.inf], np.float32),
    ]
    for v in chunks:
        v = np.abs(v.ravel())
        new = np.asarray(_lis_tail_new(jnp.asarray(v), 4))
        np.testing.assert_array_equal(new, _lis_tail_oracle(v, 4))


def test_sim_pow2_full_domain():
    """quant/intops._pow2 must match correctly-rounded libm pow over the
    ENTIRE f32 exponent range — including subnormals (an 8-bit log-domain
    bit type reaches 2^-255) and overflow — unlike the serving kernels'
    proof-bounded exp2i."""
    from p2vit_tpu.quant.intops import _pow2

    n = np.arange(-300, 300, dtype=np.float32)
    got = np.asarray(_pow2(jnp.asarray(n)))
    want = (2.0 ** n.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(got, want)
    assert np.isposinf(np.asarray(_pow2(jnp.float32(128.0))))
    assert float(_pow2(jnp.float32(-149.0))) == float(np.float32(2.0**-149))
    assert float(_pow2(jnp.float32(-150.0))) == 0.0
