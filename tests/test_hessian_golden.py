"""Golden parity of the Hessian engine's OPERATOR vs torch autograd.

hessian.py's trace/eigenvalue/density estimators are stochastic, so they
cannot be compared to pyhessian run-for-run (different RNG streams). What
CAN be pinned exactly is the quadratic form they all estimate: with a
FIXED probe vector v, our forward-over-reverse jvp-of-grad v^T H v must
equal torch's double-backward v^T H v on the same tiny model, same
weights, same CE loss (the reference criterion, test_quant.py:148), per
tracked weight. If the operator matches, every estimator built on it
estimates the same quantity — this is the strongest deterministic
evidence available for the Hutchinson rebuild
(/root/reference/pyhessian/hessian.py:36-217).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not mounted"
)

torch = pytest.importorskip("torch")

from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.models import vit
from p2vit_tpu import hessian as hx

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=10, embed_dim=16, depth=2,
    num_heads=2,
)


@pytest.fixture(scope="module")
def ref_pair():
    sys.path.insert(0, REF)
    orig_t, orig_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        from functools import partial

        import test_reference_model_parity as tm
        from config import Config
        from models.ptq import QIntLayerNorm
        from models.vit_fquant import VisionTransformer

        model = VisionTransformer(
            img_size=32, patch_size=8, num_classes=10, embed_dim=16,
            depth=2, num_heads=2, qkv_bias=True,
            norm_layer=partial(QIntLayerNorm, eps=1e-6), input_quant=True,
            cfg=Config(True, True, "minmax"),
        )  # never quantized/calibrated: pure fp forward, as the
        # reference's hessian_statistic mode runs it (vit_fquant.py:232)
        params = vit.init_params(jax.random.PRNGKey(0), TINY)
        tm._load_our_params(model, params)
        yield model, params
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = orig_t, orig_m
        sys.path.remove(REF)


def test_hvp_quadratic_form_matches_torch(ref_pair):
    model, params = ref_pair
    rng = np.random.RandomState(7)
    x = rng.randn(4, 3, 32, 32).astype(np.float32)
    labels = np.array([0, 3, 1, 7])

    # ---- torch side: double backward over the SAME tracked weights ----
    name_map = {"qkv": "attn.qkv", "proj": "attn.proj",
                "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    tws = []
    for i in range(TINY.depth):
        for ours in ("qkv", "proj", "fc1", "fc2"):
            tws.append(dict(model.named_parameters())[
                f"blocks.{i}.{name_map[ours]}.weight"])
    tws.append(dict(model.named_parameters())["head.weight"])
    vs = [np.where(rng.rand(*t.shape) < 0.5, -1.0, 1.0).astype(np.float32)
          for t in tws]

    model.eval()
    out = model(torch.from_numpy(x))
    logits = out[0] if isinstance(out, tuple) else out
    loss = torch.nn.CrossEntropyLoss()(logits, torch.from_numpy(labels))
    grads = torch.autograd.grad(loss, tws, create_graph=True)
    gv = sum((g * torch.from_numpy(v)).sum() for g, v in zip(grads, vs))
    hvs = torch.autograd.grad(gv, tws)
    ref_vthv = np.array([
        float((hv * torch.from_numpy(v)).sum()) for hv, v in zip(hvs, vs)
    ])

    # ---- our side: the jvp-of-grad core with the same fixed probes ----
    ws = [w for _, w in hx.tracked_weights(params)]
    assert len(ws) == len(tws)

    def loss_fn(ws_):
        logits = vit.fp_forward(hx._with_weights(params, ws_), TINY,
                                jnp.asarray(x))
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(
            logp, jnp.asarray(labels)[:, None], axis=1).mean()

    vjs = [jnp.asarray(v) for v in vs]
    _, hvs_j = jax.jvp(jax.grad(loss_fn), (ws,), (vjs,))
    ours_vthv = np.array([
        float(jnp.vdot(v, hv)) for v, hv in zip(vjs, hvs_j)
    ])

    # second derivatives magnify fp drift; the DECISIONS downstream
    # (normalized mean-Hessian ranking) are insensitive at this level
    np.testing.assert_allclose(ours_vthv, ref_vthv, rtol=5e-3, atol=1e-5)
    # the ranking itself must agree exactly
    assert (np.argsort(ours_vthv) == np.argsort(ref_vthv)).all()
