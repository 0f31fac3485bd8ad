"""uint8 ingestion: RAW-image serving entry vs the host-normalized f32 path.

The host pipeline emits ``(u/255 - mean)/std`` in f32 (data.build_transform,
replicating torchvision ToTensor+Normalize — reference test_quant.py:565-597);
serving.attach_u8_ingest replays that op sequence on device. The input domain
is finite (256 values x 3 channels), so ingestion exactness is PROVEN by
enumeration (serving.u8_ingest_exact); the whole-model logits bit-equality
checks the wiring around it.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu import data, serving, serving_swin
from p2vit_tpu.config import make_policy
from p2vit_tpu.models import swin, vit
from p2vit_tpu.models.common import ViTConfig

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=16, embed_dim=32, depth=2, num_heads=2
)
STINY = swin.SwinConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=16,
    depths=(2, 2), num_heads=(2, 2), window_size=4,
)


def _host_normalize(u8):
    """The exact data.py transform tail: u8 CHW -> /255 -> normalize (f32)."""
    mean = np.asarray(MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(STD, np.float32).reshape(3, 1, 1)
    arr = u8.astype(np.float32) / 255.0
    return (arr - mean) / std


def _u8_batch(shape, seed=0):
    u8 = np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)
    u8[0, :, 0, 0] = 0  # force the clip corners into the batch
    u8[0, :, 0, 1] = 255
    return u8


@pytest.fixture(scope="module")
def vit_setup():
    policy = make_policy()
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    serving.attach_u8_ingest(ss, MEAN, STD)
    return policy, ss


def test_u8_exact_proven_by_enumeration(vit_setup):
    _, ss = vit_setup
    assert serving.u8_ingest_exact(ss)


def test_u8_serving_logits_bit_equal(vit_setup):
    _, ss = vit_setup
    u8 = _u8_batch((2, 3, 32, 32))
    xf = jnp.asarray(_host_normalize(u8))
    a = np.asarray(serving.serving_forward(ss, TINY, xf, use_pallas=False))
    b = np.asarray(
        serving.serving_forward(ss, TINY, jnp.asarray(u8), use_pallas=False)
    )
    np.testing.assert_array_equal(a, b)


def test_u8_affine_matches_when_proven(vit_setup):
    _, ss = vit_setup
    if not serving.u8_ingest_exact(ss, affine=True):
        pytest.skip("fused affine inexact on this backend (FMA knife edge) — "
                    "the literal path stays the default")
    u8 = _u8_batch((2, 3, 32, 32), seed=1)
    xf = jnp.asarray(_host_normalize(u8))
    a = np.asarray(serving.serving_forward(ss, TINY, xf, use_pallas=False))
    b = np.asarray(
        serving.serving_forward(ss, TINY, jnp.asarray(u8), use_pallas=False,
                                u8_affine=True)
    )
    np.testing.assert_array_equal(a, b)


def test_u8_without_attach_raises(vit_setup):
    policy, _ = vit_setup
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    with pytest.raises(ValueError, match="attach_u8_ingest"):
        serving.serving_forward(
            ss, TINY, jnp.asarray(_u8_batch((1, 3, 32, 32))), use_pallas=False
        )


def test_u8_swin_serving_logits_bit_equal():
    policy = make_policy()
    params = swin.init_params(jax.random.PRNGKey(0), STINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    calib = swin.calibrate(params, STINY, policy, x)
    ss = serving_swin.convert(params, calib.qstate, STINY, policy, 8)
    serving_swin.attach_u8_ingest(ss, MEAN, STD)
    u8 = _u8_batch((2, 3, 32, 32), seed=2)
    xf = jnp.asarray(_host_normalize(u8))
    a = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, STINY, policy, xf, use_pallas=False))
    b = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, STINY, policy, jnp.asarray(u8), use_pallas=False))
    np.testing.assert_array_equal(a, b)


def test_raw_transform_matches_normalized():
    """build_transform(raw=True) + host normalize == build_transform()."""
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 256, (48, 56, 3), dtype=np.uint8))
    tf = data.build_transform(32, MEAN, STD, crop_pct=0.875)
    tf_raw = data.build_transform(32, MEAN, STD, crop_pct=0.875, raw=True)
    raw = tf_raw(img)
    assert raw.dtype == np.uint8 and raw.shape == (3, 32, 32)
    np.testing.assert_array_equal(tf(img), _host_normalize(raw))
