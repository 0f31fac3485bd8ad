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
