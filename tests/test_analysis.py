"""Activation-capture + distribution-plot tests (plot_distrib rebuild)."""

import os

import numpy as np

import jax

from p2vit_tpu import analysis
from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.models import vit

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=10, embed_dim=16, depth=2, num_heads=2
)


def test_collect_and_plot(tmp_path):
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    acts = analysis.collect_activations(params, TINY, x)
    # default: last block only, 7 tapped tensors
    assert all(k.startswith("block1.") for k in acts)
    assert len(acts) == 7
    mx, mn = analysis.channel_ranges(acts["block1.qkv_out"])
    assert mx.shape == (3 * TINY.embed_dim,)
    assert (mx >= mn).all()
    paths = analysis.plot_distribution(acts, "tiny", quant=False, outdir=str(tmp_path))
    assert len(paths) == 7
    assert all(os.path.exists(p) and p.endswith(".svg") for p in paths)
