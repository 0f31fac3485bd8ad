"""Unit tests for integer LayerNorm and Log-Int-Softmax simulation kernels."""

import numpy as np
import jax.numpy as jnp

from p2vit_tpu.quant import BIT_TYPE_DICT, get_mn, int_layernorm, log_int_softmax, log_round


class TestGetMN:
    def test_formula(self):
        # layers.py:270-274, bit=7
        x = jnp.array([1.0, 0.5, 3.7, 1e-12, 1e6])
        m, n = get_mn(x)
        xn = np.asarray(x)
        want_n = np.clip(7 - np.floor(np.log2(xn)), 0, 31)
        want_m = np.clip(np.floor(xn * 2.0**want_n), 0, 255)
        np.testing.assert_allclose(n, want_n)
        np.testing.assert_allclose(m, want_m)

    def test_reconstruction_accuracy(self):
        # M * 2^-N should approximate x within ~1/128 relative error
        x = jnp.array([0.123, 1.9, 42.0])
        m, n = get_mn(x)
        rec = np.asarray(m) * 2.0 ** (-np.asarray(n))
        np.testing.assert_allclose(rec, np.asarray(x), rtol=1.0 / 128)


class TestIntLayerNorm:
    def _run(self, in_scale, out_scale, expand=1, C=8):
        rng = np.random.RandomState(0)
        w = rng.randn(C).astype(np.float32) * 0.5 + 1.0
        b = rng.randn(C).astype(np.float32) * 0.1
        full_c = C
        xq = rng.randint(-100, 100, size=(2, 5, full_c)).astype(np.float32)
        in_s = np.asarray(in_scale, np.float32)
        tiled = np.tile(in_s, expand) if expand != 1 else in_s
        x = xq * tiled  # exact codes of the producing quantizer
        got = int_layernorm(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            jnp.asarray(in_scale), jnp.asarray(out_scale), in_scale_expand=expand,
        )
        return x, w, b, np.asarray(got), np.asarray(out_scale)

    def test_close_to_float_ln(self):
        # int LN output should track F.layer_norm within a few out_scale steps
        C = 8
        x, w, b, got, out_s = self._run(np.float32(0.02), np.float32(0.05), C=C)
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        want = (x - mu) / np.sqrt(var + 0.0) * w + b
        assert np.abs(got - want).max() < 4 * np.max(out_s)

    def test_output_on_grid(self):
        # layers.py:336-337: output = round(...) * out_scale -> exact grid
        x, w, b, got, out_s = self._run(np.float32(0.02), np.float32(0.05))
        codes = got / out_s
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)

    def test_ptf_vector_in_scale(self):
        C = 8
        in_scale = (0.01 * np.array([1, 2, 4, 8, 1, 2, 4, 8])).astype(np.float32)
        x, w, b, got, out_s = self._run(in_scale, np.float32(0.05), C=C)
        mu = x.mean(-1, keepdims=True)
        want = (x - mu) / x.std(-1, keepdims=True) * w + b
        assert np.abs(got - want).max() < 4 * np.max(out_s)

    def test_in_scale_expand_tiling(self):
        # Swin PatchMerging: in_scale tiled 4x across the concat axis
        # (layers.py:296-299)
        base = (0.01 * np.array([1, 2], np.float32))
        x, w, b, got, out_s = self._run(base, np.float32(0.05), expand=4, C=8)
        assert got.shape == x.shape


class TestLogIntSoftmax:
    def test_log_round_tie_up(self):
        # layers.py:375-381: ties (x - 2^floor == 2^(floor-1)) round UP
        got = log_round(jnp.array([3.0, 2.9, 6.0, 1.0]))
        np.testing.assert_allclose(got, [2.0, 1.0, 3.0, 0.0])

    def test_log_round_bottom_of_domain(self):
        """log_round is exported public API; the bottom of the f32 range must
        stay exact/sane, not bitcast garbage from feeding exp2i out of its
        domain. Normal range: exact floor/tie-up down to 2^-126 inclusive —
        the tie threshold is formed as (x-p)·2 >= p because p·0.5 FLUSHES to
        zero at p = 2^-126 and would wrongly fire the tie. Subnormal x: XLA
        backends flush to zero, so the documented result is -inf, same as
        x = 0 (no garbage)."""
        xs, want = [], []
        for k in (-126, -125, -120, -100):
            for frac, extra in ((1.0, 0), (1.25, 0), (1.5, 1), (1.75, 1)):
                xs.append(np.float32(frac * 2.0**k))
                want.append(k + extra)
        got = np.asarray(log_round(jnp.asarray(np.array(xs, np.float32))))
        np.testing.assert_allclose(got, np.array(want, np.float64))
        sub = np.asarray(
            log_round(jnp.asarray(np.array([2.0**-149, 2.0**-130, 0.0], np.float32)))
        )
        assert np.all(np.isneginf(sub))

    def test_outputs_are_pot_or_zero(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, 5, 5).astype(np.float32) * 4
        scale = jnp.float32(2.0**-6)
        out = np.asarray(log_int_softmax(jnp.asarray(x), scale, BIT_TYPE_DICT["uint4"]))
        nz = out[out > 0]
        np.testing.assert_allclose(np.log2(nz), np.round(np.log2(nz)))
        assert out.min() >= 0 and out.max() <= 1.0

    def test_close_to_softmax(self):
        rng = np.random.RandomState(2)
        x = (rng.randn(4, 7).astype(np.float32) * 2).astype(np.float32)
        scale = jnp.float32(2.0**-8)
        got = np.asarray(log_int_softmax(jnp.asarray(x), scale, BIT_TYPE_DICT["uint4"]))
        ex = np.exp(x - x.max(-1, keepdims=True))
        want = ex / ex.sum(-1, keepdims=True)
        # 4-bit log-domain: coarse, but big probabilities must be within ~sqrt(2)
        big = want > 0.1
        ratio = got[big] / want[big]
        assert (ratio > 0.55).all() and (ratio < 1.9).all()

    def test_rows_roughly_normalized(self):
        rng = np.random.RandomState(3)
        x = rng.randn(8, 16).astype(np.float32)
        got = np.asarray(log_int_softmax(jnp.asarray(x), jnp.float32(2**-7), BIT_TYPE_DICT["uint4"]))
        sums = got.sum(-1)
        assert (sums > 0.5).all() and (sums < 2.0).all()
