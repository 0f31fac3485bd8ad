"""PSAQ-ViT-style data-free calibration image synthesis.

TPU-native rebuild of /root/reference/generate_data.py:34-193 +
/root/reference/utils/kde.py. Gaussian-noise images are optimized against
the FP model so that:

  1. cross-entropy to random pseudo-labels falls (generate_data.py:99),
  2. the total-variation prior approaches a target drawn from U[2500,3000]
     (:62,100,146-156),
  3. the differential entropy of a Gaussian-KDE over patch cosine
     similarities of each block's attn@v map RISES (loss subtracts it,
     :102-122; kde.py:86-100 bandwidth 0.01),

with DeepInversion jitter/flip augmentation (:86-91), per-channel color
clipping (:159-171), Adam(0.5, 0.9) and a per-epoch cosine LR schedule with
100-step warmup (:55-56,75,183-193).

The reference taps a pretrained timm model through monkey-patched MatMul
hooks (utils/build_model.py:78-108); here the framework's own ``fp_forward``
exposes the same attn@v tap natively (models/vit.py attn_tap), so no
external model zoo is needed.
"""

from __future__ import annotations

import math
import random

import jax
import jax.numpy as jnp
import numpy as np

from .models.common import ViTConfig
from .models import vit

_KDE_BANDWIDTH = 0.01
_KDE_POINTS = 10

# ImageNet normalization used for the color clip (generate_data.py:165-166)
_CLIP_MEAN = np.array([0.485, 0.456, 0.406])
_CLIP_STD = np.array([0.229, 0.224, 0.225])


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of L2 norms of the 4 directional pixel differences
    (generate_data.py:146-156)."""
    d1 = x[:, :, :, :-1] - x[:, :, :, 1:]
    d2 = x[:, :, :-1, :] - x[:, :, 1:, :]
    d3 = x[:, :, 1:, :-1] - x[:, :, :-1, 1:]
    d4 = x[:, :, :-1, :-1] - x[:, :, 1:, 1:]
    return sum(jnp.linalg.norm(d) for d in (d1, d2, d3, d4))


def kde_differential_entropy(sims: jnp.ndarray) -> jnp.ndarray:
    """Differential entropy of a Gaussian KDE over flattened similarities.

    sims: (B, M) per-sample patch-similarity values. Evaluates the KDE at 10
    points spanning the batch min/max (generate_data.py:112-121) and
    integrates -p·log(p) with the trapezoidal rule (:137-143).
    """
    b = sims.shape[0]
    lo, hi = sims.min(), sims.max()
    xs = jnp.linspace(lo, hi, _KDE_POINTS)  # shared across batch, as reference
    var = _KDE_BANDWIDTH**2
    coef = 1.0 / math.sqrt(2 * math.pi * var)
    # p(x) per sample: mean over that sample's train points (kde.py:89-95)
    diffs = xs[None, :, None] - sims[:, None, :]  # (B, 10, M)
    pdf = (coef * jnp.exp(-(diffs**2) / (2 * var))).mean(axis=-1)  # (B, 10)
    pdf = pdf + 1e-4
    f = -pdf * jnp.log(pdf)
    return jnp.trapezoid(f, xs[None, :].repeat(b, 0), axis=-1).mean()


def patch_similarity_entropy(attn_maps, drop_cls: bool = True) -> jnp.ndarray:
    """Σ_blocks differential entropy of cosine sims between patch features.

    attn_maps: list of (B, N, C) attn@v outputs. The cls token is dropped
    for ViT (drop_cls; Swin windows have none) and (unlike the GPU
    reference, whose hook fires before head-merge and averages over heads,
    generate_data.py:106) the tap is the merged (B,N,C) tensor — cosine
    similarity over the full channel dim, which is the mean over heads of
    per-head dot products up to normalization; the entropy objective is
    preserved.
    """
    total = 0.0
    for a in attn_maps:
        p = a[:, 1:, :] if drop_cls else a
        p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
        sims = jnp.einsum("bnc,bmc->bnm", p, p)
        total = total + kde_differential_entropy(sims.reshape(a.shape[0], -1))
    return total


def _cosine_lr(base_lr, it, iters, warmup=100):
    """lr_cosine_policy (generate_data.py:183-193)."""
    if it < warmup:
        return base_lr * (it + 1) / warmup
    e, es = it - warmup, iters - warmup
    return 0.5 * (1 + math.cos(math.pi * e / es)) * base_lr


def generation_loss(im, params, cfg, labels, var_pred, off, flip):
    """The PSAQ objective for one jittered view: CE to pseudo-labels + TV
    prior + negated patch-similarity entropy (generate_data.py:86-122).

    Public and jit/grad-friendly (im is the differentiated leaf, argnums=0;
    off/flip are TRACED so one executable serves every jitter draw) so the
    multi-chip dry run can shard the same gradient step over a device mesh
    — the framework's one training-style step. The KDE entropy couples
    images ACROSS the batch (kde_differential_entropy spans the batch
    min/max), so under data parallelism GSPMD inserts the cross-device
    collectives; no hand-written reduction exists to get wrong."""
    is_vit = isinstance(cfg, ViTConfig)
    if not is_vit:
        from .models import swin as swin_mod

    im_jit = jnp.roll(im, (off, off), axis=(2, 3))
    im_jit = jnp.where(flip, im_jit[:, :, :, ::-1], im_jit)
    taps: list = []
    if is_vit:
        logits = vit.fp_forward(params, cfg, im_jit, attn_tap=taps)
    else:
        logits = swin_mod.fp_forward(params, cfg, im_jit, attn_tap=taps)
    logp = jax.nn.log_softmax(logits)
    loss_oh = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
    loss_tv = jnp.abs(total_variation(im_jit) - var_pred)
    loss_entropy = -patch_similarity_entropy(taps, drop_cls=is_vit)
    return loss_entropy + 1.0 * loss_oh + 0.05 * loss_tv


def generate_data(
    params,
    cfg,
    batch_size: int = 32,
    seed: int = 0,
    iterations_per_epoch: int = 500,
    lr: float = 0.20,
) -> jnp.ndarray:
    """Synthesize a calibration batch from Gaussian noise (mode 2,
    test_quant.py:266-273). cfg may be a ViTConfig or SwinConfig — the
    reference's build_model taps timm's Attention and WindowAttention alike
    (utils/build_model.py:78-108)."""
    import optax

    rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)
    img = jax.random.normal(key, (batch_size, 3, cfg.img_size, cfg.img_size))
    labels = jnp.asarray(
        [rng.randint(0, cfg.num_classes - 1) for _ in range(batch_size)]
    )
    var_pred = rng.uniform(2500, 3000)

    opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.5, b2=0.9, eps=1e-8
    )
    opt_state = opt.init(img)

    def loss_fn(im, off, flip):
        return generation_loss(im, params, cfg, labels, var_pred, off, flip)

    grad_fn = jax.jit(jax.grad(loss_fn))

    @jax.jit
    def clip_colors(im):
        lo = jnp.asarray(-_CLIP_MEAN / _CLIP_STD)[None, :, None, None]
        hi = jnp.asarray((1 - _CLIP_MEAN) / _CLIP_STD)[None, :, None, None]
        return jnp.clip(im, lo, hi)

    for epoch in range(2):
        lim = 15 if epoch == 0 else 30
        for it in range(iterations_per_epoch):
            cur_lr = _cosine_lr(lr, it, iterations_per_epoch)
            opt_state.hyperparams["learning_rate"] = cur_lr
            # traced roll shift + flip flag: one compiled step serves every
            # jitter offset (a static shift would retrace 61 variants)
            off = jnp.asarray(rng.randint(-lim, lim))
            flip = jnp.asarray(rng.random() > 0.5)
            g = grad_fn(img, off, flip)
            updates, opt_state = opt.update(g, opt_state)
            img = optax.apply_updates(img, updates)
            img = clip_colors(img)
    return img
