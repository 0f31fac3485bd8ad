"""Activation-distribution analysis and plotting.

Rebuild of /root/reference/models/plot_distrib.py:82-99 plus the ``plot=True``
activation-capture plumbing threaded through the reference forward
(vit_fquant.py:403-404, layers_quant.py:390-391). Functional design: a
capture pass returns named activations; plotting is a pure consumer.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .models.common import ViTConfig, extract_patches, gelu, layer_norm, linear, merge_heads, split_qkv


def collect_activations(params, cfg: ViTConfig, x, blocks=None) -> dict:
    """Run the fp forward capturing the reference's plotted tensors.

    Returns {name: (B, ..., C) array} for the attention-path activations of
    the selected blocks (default: last block, like the reference's
    ``i == depth-1 and global_plot`` gate, vit_fquant.py:884-888).
    """
    eps = cfg.ln_eps
    blocks = set([cfg.depth - 1] if blocks is None else blocks)
    acts: dict = {}
    b = x.shape[0]
    x = extract_patches(x, cfg.patch_size)
    x = linear(x, params["patch_embed"]["w"], params["patch_embed"]["b"])
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    for i, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
        if i in blocks:
            acts[f"block{i}.attn_in"] = h
        h = linear(h, blk["qkv"]["w"], blk["qkv"]["b"])
        if i in blocks:
            acts[f"block{i}.qkv_out"] = h
        q, k, v = split_qkv(h, cfg.num_heads)
        attn = (q @ k.transpose(0, 1, 3, 2)) * cfg.attn_scale
        if i in blocks:
            acts[f"block{i}.attn_scores"] = attn
        attn = jnp.exp(attn - attn.max(-1, keepdims=True))
        attn = attn / attn.sum(-1, keepdims=True)
        h = merge_heads(attn @ v)
        if i in blocks:
            acts[f"block{i}.attn_v"] = h
        h = linear(h, blk["proj"]["w"], blk["proj"]["b"])
        if i in blocks:
            acts[f"block{i}.proj_out"] = h
        x = x + h
        h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
        if i in blocks:
            acts[f"block{i}.mlp_in"] = h
        h = gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"]))
        h = linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
        if i in blocks:
            acts[f"block{i}.mlp_out"] = h
        x = x + h
    return acts


def channel_ranges(act) -> tuple:
    """Per-channel (max, min) over all leading dims — the quantity the
    reference plots (plot_distrib.py:84-93)."""
    a = np.asarray(act)
    m = a.reshape(-1, a.shape[-1])
    return m.max(axis=0), m.min(axis=0)


def plot_distribution(acts: dict, name: str, quant: bool, outdir: str = "figs"):
    """Per-channel max/min line plots, one SVG per activation
    (plot_distrib.py:82-99; output path pattern preserved)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(outdir, exist_ok=True)
    paths = []
    for i, (key, act) in enumerate(acts.items()):
        mx, mn = channel_ranges(act)
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(mx, label="max", linewidth=0.8)
        ax.plot(mn, label="min", linewidth=0.8)
        ax.set_title(f"{name} {key} ({'quant' if quant else 'fp'})")
        ax.set_xlabel("channel")
        ax.legend()
        path = os.path.join(
            outdir, f"{name}_{key}_{'quant' if quant else 'fp'}.svg"
        )
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths
