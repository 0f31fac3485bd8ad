"""Shared model-building primitives (patch extraction, attention core, MLP).

TPU-native building blocks shared by the ViT/DeiT and Swin model families.
The reference expresses the patch stem as a strided Conv2d
(/root/reference/models/layers_quant.py:419-430); on TPU we express it as
patch extraction + one large matmul, which is bit-identical (a stride-p
kernel-p conv visits disjoint patches) and maps directly onto the MXU.

Weight layout conventions (kept torch-compatible for checkpoint ingestion):
  * linear weights:  (out_features, in_features)   -> y = x @ W.T + b
  * conv-as-matmul:  (embed_dim, C*p*p)            with K index = c*(p*p)+i*p+j
  * activations:     channel-last (B, N, C)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static architecture description (one per model-zoo entry)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def attn_scale(self) -> float:
        # /root/reference/models/vit_fquant.py:89
        return self.head_dim ** -0.5

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + cls token

    @property
    def hidden_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def num_matmuls(self) -> int:
        """Length of the bit_config / FLOPs vector: patch + 4*depth + head
        (/root/reference/test_quant.py:467: 50 for depth-12)."""
        return 2 + 4 * self.depth


def extract_patches(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, C, H, W) NCHW image -> (B, N, C*p*p) patch matrix.

    K ordering is c*(p*p) + i*p + j, matching a torch Conv2d weight
    (O, C, p, p) folded to (O, C*p*p), so ``patches @ W_fold.T`` equals the
    reference's stride-p conv (/root/reference/models/layers_quant.py:486).
    """
    b, c, h, w = x.shape
    g_h, g_w = h // patch, w // patch
    x = x.reshape(b, c, g_h, patch, g_w, patch)
    # -> (B, gh, gw, C, p, p): channel slowest inside the patch vector
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, g_h * g_w, c * patch * patch)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float):
    """Plain fp LayerNorm over the last axis (the reference's 'ln' mode,
    /root/reference/models/ptq/layers.py:290-293)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default
    (/root/reference/models/layers_quant.py:188). jax.nn.gelu defaults to the
    tanh approximation, which would break parity."""
    return jax.nn.gelu(x, approximate=False)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None) -> jnp.ndarray:
    """y = x @ W.T + b with torch (O, I) weight layout."""
    y = x @ w.T
    if b is not None:
        y = y + b
    return y


def split_qkv(x: jnp.ndarray, num_heads: int):
    """(B, N, 3C) fused qkv -> (q, k, v) each (B, heads, N, head_dim).

    Mirrors /root/reference/models/vit_fquant.py:373-380.
    """
    b, n, three_c = x.shape
    c = three_c // 3
    qkv = x.reshape(b, n, 3, num_heads, c // num_heads).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, heads, N, head_dim) -> (B, N, C)."""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal init (±2σ), the reference's trunc_normal_
    (/root/reference/models/layers_quant.py:63-119)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def to_2tuple(v):
    """Scalar -> (v, v); pass tuples through (reference layers_quant.py's
    timm-lineage helper)."""
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def drop_path(key, x, rate: float, training: bool = False):
    """Stochastic depth (reference DropPath, layers_quant.py:122-150).

    Identity when not training or rate==0 — the only case the reference's
    PTQ/eval workload ever exercises (drop rates default to 0); kept for API
    parity and for fine-tuning uses. Scales kept samples by 1/(1-rate).
    """
    if not training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, mask_shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def hybrid_embed(backbone_fn, x, proj_w, proj_b=None):
    """CNN-backbone patch embedding (reference HybridEmbed,
    /root/reference/models/layers_quant.py:500-542).

    The reference wraps a timm CNN backbone: run it, take the final feature
    map (B, C_feat, H', W') (or (B, N, C_feat) if already token-shaped),
    flatten spatial dims to tokens, and apply a 1x1-conv projection —
    identical to a per-token linear. None of the 8 registered models use it
    (all are pure patch-conv stems), so like the reference it is an
    unquantized utility; ``backbone_fn`` is any JAX callable, keeping the
    framework free of a bundled CNN zoo (timm is unavailable here anyway).
    """
    feat = backbone_fn(x)
    if feat.ndim == 4:  # (B, C_feat, H', W') -> (B, H'*W', C_feat)
        b, c, h, w = feat.shape
        feat = feat.reshape(b, c, h * w).transpose(0, 2, 1)
    return linear(feat, proj_w, proj_b)


def vit_flops(cfg: ViTConfig) -> list:
    """Analytic per-matmul cost vector, one entry per bit_config slot.

    Mirrors the FLOPs accumulator threaded through the reference forward
    (/root/reference/models/vit_fquant.py:369,399,934;
    layers_quant.py:371,386,488): patch-embed, then per block
    [qkv, proj, fc1, fc2], then head. Values are multiply counts (the
    reference counts N*C*M per matmul, no factor 2).
    """
    c, n, h = cfg.embed_dim, cfg.seq_len, cfg.hidden_dim
    flops = [cfg.in_chans * cfg.patch_size**2 * c * cfg.grid * cfg.grid]
    for _ in range(cfg.depth):
        flops += [n * c * 3 * c, n * c * c, n * c * h, n * h * c]
    flops.append(c * cfg.num_classes)
    return flops
