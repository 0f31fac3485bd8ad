"""ops/matmul_wstream: the weight-streaming bf16 matmul (interpret mode).

Pins (exactness study in the module docstring):
  * gelu=False: every store format is BITWISE equal to the panel-matched
    jnp ref twin — the PoT row scale makes acc·r exact, so the epilogue
    has a single f32 rounding and XLA's mul+add-vs-fma choice cannot
    split the twins;
  * gelu=True: the erf/exp chain has many roundings, so fma contraction
    may differ between compilations — twins agree to ≤1 ulp of bf16;
  * vs the single-dot contraction (what the XLA weight-only forward runs)
    the split-K packed arms differ by ≤1 ulp (f32 accumulation order),
    ≤2 with gelu;
  * pack_w8/pack_w4 round-trip and reject out-of-range codes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p2vit_tpu.ops.matmul_wstream import (
    _panel_len,
    pack_w4,
    pack_w8,
    wstream_matmul,
    wstream_ref,
)

FORMATS = (("bf16", 1), ("i8", 1), ("w8p", 4), ("w4p", 8))


def _bf16_ulp_dist(a, b):
    """Lexicographic integer distance between bf16 arrays (0 == bitwise)."""

    def key(x):
        u = np.asarray(x, jnp.bfloat16).view(np.uint16).astype(np.int32)
        return np.where(u & 0x8000, 0x8000 - (u & 0x7FFF) - 1, u + 0x8000)

    return int(np.abs(key(a) - key(b)).max())


def _case(seed, m, k, n):
    kx, kw, kr, kb = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.randint(kw, (n, k), -8, 8, jnp.int8)  # int4 codes
    r = 2.0 ** jax.random.randint(kr, (n,), -9, -5).astype(jnp.float32)
    b = jax.random.normal(kb, (n,), jnp.float32)
    return x, w, r, b


@pytest.mark.parametrize("m,k,n", [(197, 384, 1152), (197, 1536, 384),
                                   (5, 200, 70)])
@pytest.mark.parametrize("gelu", [False, True])
def test_wstream_formats_vs_ref(m, k, n, gelu):
    x, w, r, b = _case(k * n + m, m, k, n)
    single = wstream_ref(x, w, r, b, gelu=gelu)
    pack = {"bf16": lambda a: a.astype(jnp.bfloat16), "i8": lambda a: a,
            "w8p": pack_w8, "w4p": pack_w4}
    for fmt, panels in FORMATS:
        out = wstream_matmul(x, pack[fmt](w), r, b, w_format=fmt, gelu=gelu,
                             interpret=True)
        assert out.shape == (m, n) and out.dtype == jnp.bfloat16
        twin = wstream_ref(x, w, r, b, gelu=gelu, panels=panels)
        twin_tol, single_tol = (1, 2) if gelu else (0, 1)
        assert _bf16_ulp_dist(out, twin) <= twin_tol, (fmt, "vs panel twin")
        assert _bf16_ulp_dist(out, single) <= single_tol, (fmt, "vs single")


def test_wstream_w8_full_range_codes():
    """w8p carries full int8 codes (not just int4-valued ones)."""
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (33, 384), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.randint(kw, (256, 384), -128, 128, jnp.int8)
    r = jnp.full((256,), 2.0 ** -7, jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    out = wstream_matmul(x, pack_w8(w), r, b, w_format="w8p", interpret=True)
    twin = wstream_ref(x, w, r, b, panels=4)
    assert _bf16_ulp_dist(out, twin) == 0


def test_pack_w4_rejects_out_of_range():
    w = jnp.full((4, 256), 100, jnp.int8)
    with pytest.raises(ValueError, match=r"\[-8, 7\]"):
        pack_w4(w)


def test_wstream_rejects_bad_format_and_store_width():
    # K=1536: w8p store is 384 words/row, w4p expects 256 — widths differ
    x, w, r, b = _case(0, 8, 1536, 32)
    with pytest.raises(ValueError, match="unknown w_format"):
        wstream_matmul(x, w, r, b, w_format="nope", interpret=True)
    with pytest.raises(ValueError, match="words/row"):
        wstream_matmul(x, pack_w8(w), r, b, w_format="w4p", interpret=True)
    # unpacked stores must match K exactly (no silent pad/truncate) and
    # every store must carry one row per output channel
    with pytest.raises(ValueError, match="cols; x has K"):
        wstream_matmul(x, w[:, :384], r, b, w_format="i8", interpret=True)
    with pytest.raises(ValueError, match="rows; row_scale"):
        wstream_matmul(x, w[:16], r, b, w_format="i8", interpret=True)


def test_panel_len_lane_quantum():
    assert _panel_len(384, 4) == 128   # 96 -> one lane tile
    assert _panel_len(1536, 4) == 384  # exact split, no padding
    assert _panel_len(1536, 8) == 256  # 192 -> two lane tiles
    assert _panel_len(3072, 8) == 384  # exact split at deit_base fc2
