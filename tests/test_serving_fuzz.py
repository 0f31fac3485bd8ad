"""Property-based fuzz of the serving-twin BITWISE invariant.

test_serving.py pins each Pallas kernel against its jnp `_ref` twin at one
fixed shape; these tests randomize shapes (exercising every padding path:
K to 128 lanes, M to the block size, N to the block), power-of-two scale
magnitudes, biases, and code contents. The invariant under test is the
project's parity spec: serving twins are bit-for-bit equal — ANY mismatch
is a real kernel bug, so assertions are exact array equality.

Interpret mode on CPU: each distinct shape is a fresh XLA compile, so
example counts are bounded and shapes kept small. `derandomize=True` makes
CI deterministic (the fuzz corpus is fixed per hypothesis version).
"""

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import HealthCheck, given, settings, strategies as st

from p2vit_tpu.ops.matmul_int8 import (
    int4_matmul_requant,
    int8_matmul_requant,
    int8_matmul_requant_ref,
    pack_int4,
)

FUZZ = dict(
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


def _pot(rng, shape, lo=-12, hi=2):
    return jnp.asarray(2.0 ** rng.integers(lo, hi, size=shape),
                       jnp.float32)


@settings(max_examples=20, **FUZZ)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(1, 40),
    k=st.integers(1, 96),
    n=st.integers(1, 48),
    gelu=st.booleans(),
)
def test_int8_matmul_requant_bitwise(seed, m, k, n, gelu):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-128, 128, size=(m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, size=(n, k)), jnp.int8)
    r = _pot(rng, n)
    b = jnp.asarray(rng.normal(size=n).astype(np.float32) * 3)
    inv = float(2.0 ** rng.integers(0, 6)) if gelu else 1.0
    out = int8_matmul_requant(x, w, r, b, out_inv=inv, gelu=gelu,
                              block_m=128, block_n=128, interpret=True)
    ref = int8_matmul_requant_ref(x, w, r, b, out_inv=inv, gelu=gelu)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@settings(max_examples=10, **FUZZ)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(1, 24),
    khalf=st.integers(1, 48),
    n=st.integers(1, 32),
)
def test_int4_packed_matches_plain_store(seed, m, khalf, n):
    """The packed-int4 kernel must equal the plain int8 kernel on the SAME
    int4 codes (the W4 memory-format claim: identical int32 accumulation,
    exact)."""
    rng = np.random.default_rng(seed)
    k = 2 * khalf
    x = jnp.asarray(rng.integers(-128, 128, size=(m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, size=(n, k)), jnp.int8)
    r = _pot(rng, n)
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))
    plain = int8_matmul_requant(x, w, r, b, block_m=128, block_n=128,
                                interpret=True)
    packed = int4_matmul_requant(x, pack_int4(w), r, b, block_m=128,
                                 block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed))


@settings(max_examples=12, **FUZZ)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(1, 24),
    c=st.integers(2, 80),
)
def test_int_res_ln_requant_bitwise(seed, m, c):
    from p2vit_tpu.ops.intln import (
        int_res_ln_requant,
        int_res_ln_requant_ref,
    )

    rng = np.random.default_rng(seed)
    a_q = jnp.asarray(rng.integers(-128, 128, size=(m, c)), jnp.int8)
    b_q = jnp.asarray(rng.integers(-128, 128, size=(m, c)), jnp.int8)
    s_a = _pot(rng, c, -8, 0)
    s_b = _pot(rng, c, -8, 0)
    s_out = _pot(rng, c, -8, 0)
    ln_w = jnp.asarray(rng.normal(size=c).astype(np.float32))
    ln_b = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    out_scale = _pot(rng, c, -10, -2)
    ratio = jnp.asarray(
        rng.choice([1.0, 2.0], size=c).astype(np.float32))
    got = int_res_ln_requant(a_q, s_a, b_q, s_b, s_out, ln_w, ln_b,
                             out_scale, ratio, interpret=True)
    ref = int_res_ln_requant_ref(a_q, s_a, b_q, s_b, s_out, ln_w, ln_b,
                                 out_scale, ratio)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


@settings(max_examples=12, **FUZZ)
@given(
    seed=st.integers(0, 2**31 - 1),
    m=st.integers(1, 24),
    k=st.integers(1, 64),
    n=st.integers(2, 48),
)
def test_int8_matmul_res_ln_bitwise(seed, m, k, n):
    from p2vit_tpu.ops.matmul_ln import (
        int8_matmul_res_ln,
        int8_matmul_res_ln_ref,
    )

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-128, 128, size=(m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, size=(n, k)), jnp.int8)
    res = jnp.asarray(rng.integers(-128, 128, size=(m, n)), jnp.int8)
    r = _pot(rng, n)
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))
    s_mid = _pot(rng, n, -8, 0)
    s_res = _pot(rng, n, -8, 0)
    s_out = _pot(rng, n, -8, 0)
    ln_w = jnp.asarray(rng.normal(size=n).astype(np.float32))
    ln_b = jnp.asarray(rng.normal(size=n).astype(np.float32) * 0.1)
    ln_out = _pot(rng, n, -10, -2)
    ratio = jnp.ones((n,), jnp.float32)
    got = int8_matmul_res_ln(x, w, r, b, res, s_mid, s_res, s_out, ln_w,
                             ln_b, ln_out, ratio, interpret=True)
    ref = int8_matmul_res_ln_ref(x, w, r, b, res, s_mid, s_res, s_out,
                                 ln_w, ln_b, ln_out, ratio)
    for g, rr in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(rr))


@settings(max_examples=8, **FUZZ)
@given(
    seed=st.integers(0, 2**31 - 1),
    bh=st.integers(1, 4),
    n=st.integers(2, 40),
    d=st.integers(1, 24),
    lis_bits=st.sampled_from([3, 4]),
)
def test_lis_attention_bitwise(seed, bh, n, d, lis_bits):
    """The fused attention kernel vs its jnp twin: the whole
    score-requant -> LIS -> shift-accumulate chain must match bit for bit
    at arbitrary (BH, N, d) paddings and scale magnitudes."""
    from p2vit_tpu.ops.attention_lis import lis_attention, lis_attention_ref

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.integers(-128, 128, size=(bh, n, d)), jnp.int8)
    k = jnp.asarray(rng.integers(-128, 128, size=(bh, n, d)), jnp.int8)
    v = jnp.asarray(rng.integers(-128, 128, size=(bh, n, d)), jnp.int8)
    sr = float(2.0 ** rng.integers(-12, -6)) * 0.25
    sa = float(2.0 ** rng.integers(-6, -2))
    ro = float(2.0 ** rng.integers(-4, 0))
    out = lis_attention(q, k, v, sr, sa, ro, lis_bits=lis_bits,
                        interpret=True)
    ref = lis_attention_ref(q, k, v, sr, sa, ro, lis_bits=lis_bits)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
