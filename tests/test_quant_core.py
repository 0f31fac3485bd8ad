"""Unit tests for the quantization core (bit types, fake-quant, observers).

Golden values are computed by independent numpy oracles that restate the
reference math (file:line cited per test) — not by importing the reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from p2vit_tpu.quant import (
    BIT_TYPE_DICT,
    MinMaxStats,
    collect_minmax,
    fake_quant,
    fake_quant_log2,
    float_scale_params,
    lp_loss,
    merge_ema,
    merge_minmax,
    minmax_pot_act_params,
    minmax_pot_weight_params,
    omse_params,
    pot_smooth_channel_scale,
    ptf_params,
    round_to_pot,
)


class TestBitType:
    def test_bounds(self):
        # bit_type.py:17-31 semantics
        int8 = BIT_TYPE_DICT["int8"]
        assert (int8.lower_bound, int8.upper_bound, int8.range) == (-128, 127, 256)
        int4 = BIT_TYPE_DICT["int4"]
        assert (int4.lower_bound, int4.upper_bound) == (-8, 7)
        uint4 = BIT_TYPE_DICT["uint4"]
        assert (uint4.lower_bound, uint4.upper_bound) == (0, 15)
        uint3 = BIT_TYPE_DICT["uint3"]
        assert (uint3.lower_bound, uint3.upper_bound) == (0, 7)


class TestFakeQuant:
    def test_uniform_roundtrip(self):
        # quantizer/uniform.py:48-126: ((round(x/s+zp).clamp)-zp)*s
        x = jnp.array([-2.0, -0.3, 0.0, 0.26, 1.0, 300.0])
        s, zp = 0.25, 0.0
        got = fake_quant(x, s, zp, BIT_TYPE_DICT["int8"])
        want = np.clip(np.round(np.asarray(x) / s), -128, 127) * s
        np.testing.assert_allclose(got, want)

    def test_round_half_to_even(self):
        # torch.round and jnp.round are both banker's rounding
        x = jnp.array([0.5, 1.5, 2.5, -0.5, -1.5])
        got = fake_quant(x, 1.0, 0.0, BIT_TYPE_DICT["int8"])
        np.testing.assert_allclose(got, [0.0, 2.0, 2.0, 0.0, -2.0])

    def test_log2(self):
        # quantizer/log2.py:17-26 with uint4: q=round(-log2 x) in [0,15],
        # overflow (q>=16) dequantizes to 0
        x = jnp.array([1.0, 0.5, 0.3, 2.0**-15, 2.0**-17])
        got = fake_quant_log2(x, BIT_TYPE_DICT["uint4"])
        want = [1.0, 0.5, 0.25, 2.0**-15, 0.0]  # round(-log2(0.3)) = 2
        np.testing.assert_allclose(got, want)

    def test_round_to_pot_tie_down(self):
        # round_ln 'round' (minmax.py:60-64): up only if strictly closer above.
        # 3.0: floor=2 (2^1=2, 2^2=4); 3-2 == 4-3 -> tie -> stays at floor
        got = round_to_pot(jnp.array([3.0, 3.1, 2.9, 1.0, 0.7]))
        np.testing.assert_allclose(got, [1.0, 2.0, 1.0, 0.0, -1.0])


class TestObservers:
    def test_collect_minmax_weight(self):
        w = jnp.arange(12.0).reshape(3, 4) - 5.0
        st = collect_minmax(w, "weight", layer_wise=False)
        np.testing.assert_allclose(st.max_val, [-2.0, 2.0, 6.0])
        np.testing.assert_allclose(st.min_val, [-5.0, -1.0, 3.0])

    def test_collect_minmax_activation_channel_last(self):
        # base.py:16-29: activations fold on the LAST axis
        x = jnp.arange(24.0).reshape(2, 3, 4)
        st = collect_minmax(x, "activation", layer_wise=False)
        assert st.max_val.shape == (4,)
        np.testing.assert_allclose(st.max_val, [20.0, 21.0, 22.0, 23.0])

    def test_merge(self):
        a = MinMaxStats(jnp.array(-1.0), jnp.array(2.0))
        b = MinMaxStats(jnp.array(-3.0), jnp.array(1.0))
        m = merge_minmax(a, b)
        assert float(m.min_val) == -3.0 and float(m.max_val) == 2.0
        e = merge_ema(a, b, sigma=0.01)  # ema.py:14-29
        np.testing.assert_allclose(float(e.max_val), 2.0 + 0.01 * (1.0 - 2.0))

    def test_float_scale_symmetric(self):
        # ema.py:41-45: scale = max(|min|,max)/((qmax-qmin)/2)
        st = MinMaxStats(jnp.array(-4.0), jnp.array(3.0))
        s, zp = float_scale_params(st, BIT_TYPE_DICT["int8"], symmetric=True)
        np.testing.assert_allclose(float(s), 4.0 / 127.5)
        assert float(zp) == 0.0

    def test_float_scale_asymmetric(self):
        st = MinMaxStats(jnp.array(-1.0), jnp.array(3.0))
        s, zp = float_scale_params(st, BIT_TYPE_DICT["uint8"], symmetric=False)
        np.testing.assert_allclose(float(s), 4.0 / 255.0)
        np.testing.assert_allclose(float(zp), np.clip(0 - np.round(-1.0 / (4 / 255)), 0, 255))


def _np_fake_quant(x, s, lo, hi):
    return np.clip(np.round(x / s), lo, hi) * s


class TestPoTSearch:
    def test_act_search_matches_bruteforce(self):
        # minmax.py:145-207 activation branch: candidates 2^(floor(log2 s0)+k),
        # k in {-1,0,1,2}; loss = mean((x - fq(x))^2); first-min argmin.
        rng = np.random.RandomState(0)
        x = rng.randn(7, 13).astype(np.float32) * 2.3
        bt = BIT_TYPE_DICT["int8"]
        st = collect_minmax(jnp.asarray(x), "activation", layer_wise=True)
        scale, zp = minmax_pot_act_params(st, jnp.asarray(x), bt)

        maxabs = max(-x.min(), x.max())
        s0 = maxabs / 127.5
        af = np.floor(np.log2(s0))
        losses = []
        for k in (-1, 0, 1, 2):
            s = 2.0 ** (af + k)
            losses.append(np.mean((x - _np_fake_quant(x, s, -128, 127)) ** 2))
        want = 2.0 ** (af - 1 + int(np.argmin(losses)))
        np.testing.assert_allclose(float(scale), want)
        assert float(zp) == 0.0
        # scale must be an exact power of two
        assert float(jnp.log2(scale)) == int(jnp.log2(scale))

    def test_weight_search_channelwise_matches_bruteforce(self):
        # minmax.py:82-207 linear_weight channel_wise: loss of the layer
        # OUTPUT column per channel.
        rng = np.random.RandomState(1)
        O, K, M = 5, 8, 11
        w = rng.randn(O, K).astype(np.float32)
        x = rng.randn(M, K).astype(np.float32)
        bt = BIT_TYPE_DICT["int4"]
        st = collect_minmax(jnp.asarray(w), "weight", layer_wise=False)
        scale, zp = minmax_pot_weight_params(
            st, jnp.asarray(w), jnp.asarray(x), bt, channel_wise=True
        )
        assert scale.shape == (O,)

        out_fp = x @ w.T
        for j in range(O):
            maxabs = np.abs(w[j]).max()
            s0 = maxabs / 7.5
            af = np.floor(np.log2(s0))
            losses = []
            for k in (-1, 0, 1, 2):
                s = 2.0 ** (af + k)
                wq = _np_fake_quant(w[j], s, -8, 7)
                losses.append(np.mean((out_fp[:, j] - x @ wq) ** 2))
            want = 2.0 ** (af - 1 + int(np.argmin(losses)))
            np.testing.assert_allclose(float(scale[j]), want, rtol=1e-6)

    def test_weight_search_layerwise_scalar(self):
        rng = np.random.RandomState(2)
        w = rng.randn(4, 6).astype(np.float32)
        x = rng.randn(9, 6).astype(np.float32)
        bt = BIT_TYPE_DICT["int8"]
        st = collect_minmax(jnp.asarray(w), "weight", layer_wise=True)
        scale, _ = minmax_pot_weight_params(
            st, jnp.asarray(w), jnp.asarray(x), bt, channel_wise=False
        )
        assert scale.shape == ()
        assert float(jnp.log2(scale)) == int(jnp.log2(scale))


class TestPTF:
    def test_mask_selection(self):
        # ptf.py:32-152: scale8 = 2*max(|min|,max)/255 (not PoT-rounded),
        # per-channel multiplier in {1,2,4,8} on scale1 = scale8/8.
        rng = np.random.RandomState(3)
        x = rng.randn(6, 10, 4).astype(np.float32)
        x[..., 0] *= 8.0  # big channel -> needs mask 8
        x[..., 1] *= 0.01  # tiny channel -> mask 1
        bt = BIT_TYPE_DICT["int8"]
        st = collect_minmax(jnp.asarray(x), "activation", layer_wise=False)
        scale, zp, mask = ptf_params(st, jnp.asarray(x), bt)

        max_t = max(-x.min(), x.max())
        scale8 = 2.0 * max_t / 255.0
        scale1 = scale8 / 8
        want_mask = []
        for c in range(4):
            losses = [
                np.mean((x[..., c] - _np_fake_quant(x[..., c], scale1 * m, -128, 127)) ** 2)
                for m in (1, 2, 4, 8)
            ]
            want_mask.append(2 ** int(np.argmin(losses)))
        np.testing.assert_allclose(mask, want_mask)
        np.testing.assert_allclose(scale, scale1 * np.array(want_mask), rtol=1e-6)
        assert int(mask[0]) == 8 and int(mask[1]) == 1

    def test_scale8_not_pot(self):
        # The reference's PoT rounding of scale8 is commented out (ptf.py:106-108)
        x = jnp.full((2, 3, 4), 3.3)
        st = collect_minmax(x, "activation", layer_wise=False)
        scale, _, _ = ptf_params(st, x, BIT_TYPE_DICT["int8"])
        s8 = float(scale.max()) * 1.0  # largest = scale1*8 = scale8
        np.testing.assert_allclose(s8, 2 * 3.3 / 255.0, rtol=1e-6)


class TestOMSE:
    def test_matches_bruteforce(self):
        # omse.py:30-57: 90 shrink candidates vs original min/max; first-min.
        rng = np.random.RandomState(4)
        x = rng.randn(5, 7).astype(np.float32)
        bt = BIT_TYPE_DICT["int8"]
        st = collect_minmax(jnp.asarray(x), "activation", layer_wise=True)
        scale, zp = omse_params(st, jnp.asarray(x), bt)

        mx, mn = x.max(), x.min()
        best, want = 1e10, None
        for i in range(90):
            nmx, nmn = mx * (1 - i * 0.01), mn * (1 - i * 0.01)
            s = max((nmx - nmn) / 255.0, np.finfo(np.float32).eps)
            z = np.clip(-128 - np.round(nmn / s), -128, 127)
            xq = (np.clip(np.round(x / s + z), -128, 127) - z) * s
            sc = np.mean((x - xq) ** 2)
            if sc < best:
                best, want = sc, (s, z)
        np.testing.assert_allclose(float(scale), want[0], rtol=1e-5)
        np.testing.assert_allclose(float(zp), want[1])


class TestSmoothQuant:
    def test_channel_scale_pot(self):
        # vit_fquant.py:254-282
        rng = np.random.RandomState(5)
        x = rng.randn(2, 9, 6).astype(np.float32)
        w = rng.randn(12, 6).astype(np.float32)
        alpha = 0.35
        cs = pot_smooth_channel_scale(jnp.asarray(x), jnp.asarray(w), alpha)
        assert cs.shape == (6,)
        logs = np.log2(np.asarray(cs))
        np.testing.assert_allclose(logs, np.round(logs))

        gmax = np.abs(x).reshape(-1, 6).max(axis=0)
        maxw = np.abs(w).max(axis=0)
        raw = gmax**alpha / maxw ** (1 - alpha)
        y = np.floor(np.log2(raw))
        up = (raw - 2.0**y) > (2.0 ** (y + 1) - raw)
        np.testing.assert_allclose(np.asarray(cs), 2.0 ** (y + up))

    def test_smoothing_identity(self):
        # x/cs @ (W*cs).T == x @ W.T mathematically
        rng = np.random.RandomState(6)
        x = rng.randn(3, 5, 4).astype(np.float32)
        w = rng.randn(8, 4).astype(np.float32)
        cs = np.asarray(pot_smooth_channel_scale(jnp.asarray(x), jnp.asarray(w), 0.5))
        a = (x / cs) @ (w * cs).T
        b = x @ w.T
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
