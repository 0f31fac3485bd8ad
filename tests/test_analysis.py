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


def test_profiling_utilities(tmp_path):
    """cost_model matches vit_flops for ViT and the Swin matmul count;
    device_time returns a sane positive duration; AverageMeter averages."""
    import jax
    import jax.numpy as jnp

    from p2vit_tpu import profiling
    from p2vit_tpu.models.common import ViTConfig, vit_flops
    from p2vit_tpu.models.swin import SwinConfig

    vcfg = ViTConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                     depth=2, num_heads=2)
    assert profiling.cost_model(vcfg) == vit_flops(vcfg)

    scfg = SwinConfig(img_size=32, patch_size=4, num_classes=10, embed_dim=16,
                      depths=(2, 2), num_heads=(2, 2), window_size=4)
    sf = profiling.cost_model(scfg)
    # patch + 4 per block (2+2 blocks) + 1 downsample + head = 19
    assert len(sf) == 1 + 4 * 4 + 1 + 1
    assert all(f > 0 for f in sf)

    t = profiling.device_time(lambda x: x * 2.0, jnp.ones((8, 8)), iters=3,
                              repeats=1)
    assert 0 < t < 5.0

    m = profiling.AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0

    with profiling.trace(str(tmp_path / "trace")):
        jnp.zeros(4).sum().block_until_ready()
