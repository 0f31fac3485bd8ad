"""Checkpoint ingestion: torch state_dicts + Flax AugReg .npz → params pytree.

TPU-native rebuild of the reference's pretrained-weight loading
(/root/reference/models/vit_fquant.py:960-1073 torch.hub state_dicts;
/root/reference/models/utils.py:12-206 AugReg npz with a hardcoded local
cache path). Differences by design:

  * No implicit downloads (this environment has no egress; the reference's
    npz download call is itself commented out, models/utils.py:100-102).
    Callers pass an explicit local file; ``load_pretrained`` resolves the
    standard torch-hub cache directory if present.
  * Output is the p2vit_tpu params pytree (jnp arrays), not an nn.Module.

Quantization state is a SEPARATE serializable artifact (see
``save_quant_state``/``load_quant_state``) — fixing the reference gap where
scales/PoT masks/smoothquant caches are never serialized and every run
re-calibrates (SURVEY §5).
"""

from __future__ import annotations

import io
import math
import os
import pickle

import numpy as np
import jax.numpy as jnp

from .models.common import ViTConfig


# ---------------------------------------------------------------------------
# Checkpoint-shape adaptation (reference models/utils.py:51-97)
# ---------------------------------------------------------------------------


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    """Cubic convolution kernel with A=-0.75 — the kernel torch's
    F.interpolate(mode='bicubic') uses (NOT jax.image.resize's Keys a=-0.5;
    using that would silently diverge from the reference's resized grids)."""
    A = -0.75
    x = np.abs(x)
    return np.where(
        x <= 1.0,
        ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A, 0.0),
    )


def _bicubic_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) row-stochastic-by-construction resampling matrix matching
    torch bicubic, align_corners=False: half-pixel centers, 4 taps around
    floor(center), border-clamped tap indices, no weight renormalization."""
    scale = src / dst
    centers = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(centers).astype(np.int64)
    frac = centers - i0
    mat = np.zeros((dst, src), dtype=np.float64)
    for t in range(-1, 3):
        w = _cubic_kernel(frac - t)  # distance from center to tap i0+t
        idx = np.clip(i0 + t, 0, src - 1)
        np.add.at(mat, (np.arange(dst), idx), w)
    return mat


def resize_pos_embed(posemb: np.ndarray, gs_new, num_tokens: int = 1) -> np.ndarray:
    """Bicubically resample a (1, ntok_old, C) position embedding onto a new
    grid, keeping the first ``num_tokens`` special tokens (cls) untouched —
    parity with the reference's resize_pos_embed
    (/root/reference/models/utils.py:76-97, torch F.interpolate bicubic,
    align_corners=False), pinned against torch in
    tests/test_pipeline.py::test_resize_pos_embed_matches_torch."""
    posemb = np.asarray(posemb, dtype=np.float32)
    gs_new = (int(gs_new[0]), int(gs_new[1])) if not isinstance(gs_new, int) \
        else (int(gs_new), int(gs_new))
    tok, grid = posemb[:, :num_tokens], posemb[0, num_tokens:]
    gs_old = int(round(math.sqrt(grid.shape[0])))
    if gs_old * gs_old != grid.shape[0]:
        raise ValueError(f"pos_embed grid of {grid.shape[0]} tokens is not square")
    c = grid.shape[-1]
    grid = grid.reshape(gs_old, gs_old, c).astype(np.float64)
    wy = _bicubic_matrix(gs_new[0], gs_old)
    wx = _bicubic_matrix(gs_new[1], gs_old)
    out = np.einsum("yi,ijc->yjc", wy, grid)
    out = np.einsum("xj,yjc->yxc", wx, out)
    out = out.reshape(1, gs_new[0] * gs_new[1], c).astype(np.float32)
    return np.concatenate([tok, out], axis=1)


def adapt_input_conv(in_chans: int, conv_weight: np.ndarray) -> np.ndarray:
    """Adapt a pretrained (O, I, kh, kw) patch-conv kernel to ``in_chans``
    input channels — parity with the reference's adapt_input_conv
    (/root/reference/models/utils.py:51-75): grayscale sums the RGB taps
    (linearity of the conv makes this exact for gray inputs); other channel
    counts tile the RGB kernel and rescale by 3/in_chans to preserve the
    expected response magnitude."""
    conv_weight = np.asarray(conv_weight, dtype=np.float32)
    o, i, kh, kw = conv_weight.shape
    if in_chans == i:
        return conv_weight
    if in_chans == 1:
        if i > 3:
            if i % 3 != 0:
                raise ValueError(f"cannot reduce {i}-channel kernel to grayscale")
            conv_weight = conv_weight.reshape(o, i // 3, 3, kh, kw).sum(axis=2)
        else:
            conv_weight = conv_weight.sum(axis=1, keepdims=True)
    else:
        if i != 3:
            raise NotImplementedError(
                f"no conversion from {i}-channel kernel to in_chans={in_chans}"
            )
        repeat = int(math.ceil(in_chans / 3))
        conv_weight = np.tile(conv_weight, (1, repeat, 1, 1))[:, :in_chans]
        conv_weight = conv_weight * (3.0 / float(in_chans))
    return conv_weight


def _fit_vit_inputs(conv_oihw: np.ndarray, pos: np.ndarray, cfg: ViTConfig):
    """Shared shape-adaptation step for both ViT ingestion paths: adapt the
    patch conv to cfg.in_chans and the position embedding to cfg's grid.
    The reference only wires these into the npz loader (its .pth loads
    crash on mismatched shapes); applying them uniformly is the documented
    divergence."""
    conv_oihw = adapt_input_conv(cfg.in_chans, conv_oihw)
    pos = np.asarray(pos)
    if pos.shape[1] != cfg.seq_len:
        pos = resize_pos_embed(pos, (cfg.grid, cfg.grid), num_tokens=1)
    return conv_oihw, pos

# torch-hub filenames for the 8 zoo entries (vit_fquant.py:960-1073;
# swin_quant.py:934-994)
HUB_FILES = {
    "deit_tiny_patch16_224": "deit_tiny_patch16_224-a1311bcf.pth",
    "deit_small_patch16_224": "deit_small_patch16_224-cd65a155.pth",
    "deit_base_patch16_224": "deit_base_patch16_224-b5f2ef4d.pth",
    "vit_base_patch16_224": "B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0--imagenet2012-steps_20k-lr_0.01-res_224.npz",
    "vit_large_patch16_224": "L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0--imagenet2012-steps_20k-lr_0.01-res_224.npz",
    "swin_tiny_patch4_window7_224": "swin_tiny_patch4_window7_224.pth",
    "swin_small_patch4_window7_224": "swin_small_patch4_window7_224.pth",
    "swin_base_patch4_window7_224": "swin_base_patch4_window7_224.pth",
}


def _torch_load_state_dict(path: str) -> dict:
    """Load a torch .pth checkpoint to numpy (torch import is lazy: only
    .pth ingestion needs it; the .npz path and quant-state IO are
    torch-free)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked in
        raise ImportError(
            "loading .pth checkpoints requires torch (zip+pickle tensor "
            "storage has no stdlib decoder); convert to .npz offline or "
            "install torch"
        ) from e
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj:  # facebook deit wrapping
        obj = obj["model"]
    return {k: np.asarray(v.detach().numpy()) for k, v in obj.items()}


def from_torch_state_dict(sd: dict, cfg: ViTConfig) -> dict:
    """Map a timm/DeiT-style ViT state_dict onto the params pytree.

    Key layout follows the reference model's module tree (vit_fquant.py:
    patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, norm, head).
    """

    def g(k):
        return jnp.asarray(sd[k])

    conv, pos = _fit_vit_inputs(
        np.asarray(sd["patch_embed.proj.weight"]), np.asarray(sd["pos_embed"]),
        cfg,
    )
    params = {
        "cls_token": g("cls_token"),
        "pos_embed": jnp.asarray(pos),
        "patch_embed": {
            # (C,in,p,p) conv kernel folds to (C, in*p*p) with the same
            # c*(p*p)+i*p+j ordering extract_patches produces
            "w": jnp.asarray(conv.reshape(cfg.embed_dim, -1)),
            "b": g("patch_embed.proj.bias"),
        },
        "blocks": [],
        "norm": {"w": g("norm.weight"), "b": g("norm.bias")},
        "head": {"w": g("head.weight"), "b": g("head.bias")},
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        params["blocks"].append(
            {
                "norm1": {"w": g(p + "norm1.weight"), "b": g(p + "norm1.bias")},
                "qkv": {"w": g(p + "attn.qkv.weight"), "b": g(p + "attn.qkv.bias")},
                "proj": {"w": g(p + "attn.proj.weight"), "b": g(p + "attn.proj.bias")},
                "norm2": {"w": g(p + "norm2.weight"), "b": g(p + "norm2.bias")},
                "fc1": {"w": g(p + "mlp.fc1.weight"), "b": g(p + "mlp.fc1.bias")},
                "fc2": {"w": g(p + "mlp.fc2.weight"), "b": g(p + "mlp.fc2.bias")},
            }
        )
    return params


def from_augreg_npz(npz, cfg: ViTConfig) -> dict:
    """Map a Google AugReg Flax .npz ViT checkpoint onto the params pytree.

    Same transposition logic as the reference loader
    (/root/reference/models/utils.py:143-206): conv kernel HWIO→OI(hw),
    per-block q/k/v kernels concatenated into the fused qkv, Flax (in,out)
    dense kernels transposed to torch (out,in).
    """
    c = cfg.embed_dim

    def g(k):
        return np.asarray(npz[k])

    def dense(k):  # Flax (in, out) -> (out, in)
        return jnp.asarray(g(k + "/kernel").T), jnp.asarray(g(k + "/bias"))

    kern = g("embedding/kernel")  # (p, p, 3, C)
    # HWIO -> OIHW, then in_chans/pos-grid adaptation (the reference wires
    # both into exactly this loader: models/utils.py:145-159)
    conv, pos = _fit_vit_inputs(
        kern.transpose(3, 2, 0, 1),
        g("Transformer/posembed_input/pos_embedding"), cfg,
    )
    patch_w = jnp.asarray(conv.reshape(c, -1))
    params = {
        "cls_token": jnp.asarray(g("cls")),
        "pos_embed": jnp.asarray(pos),
        "patch_embed": {"w": patch_w, "b": jnp.asarray(g("embedding/bias"))},
        "blocks": [],
        "norm": {
            "w": jnp.asarray(g("Transformer/encoder_norm/scale")),
            "b": jnp.asarray(g("Transformer/encoder_norm/bias")),
        },
        "head": {
            "w": jnp.asarray(g("head/kernel").T),
            "b": jnp.asarray(g("head/bias")),
        },
    }
    for i in range(cfg.depth):
        b = f"Transformer/encoderblock_{i}/"
        att = b + "MultiHeadDotProductAttention_1/"
        qkv_w = jnp.concatenate(
            [
                jnp.asarray(g(att + f"{n}/kernel").reshape(c, c).T)
                for n in ("query", "key", "value")
            ],
            axis=0,
        )  # (3C, C)
        qkv_b = jnp.concatenate(
            [jnp.asarray(g(att + f"{n}/bias").reshape(c)) for n in ("query", "key", "value")]
        )
        proj_w = jnp.asarray(g(att + "out/kernel").reshape(c, c).T)
        proj_b = jnp.asarray(g(att + "out/bias"))
        fc1_w, fc1_b = dense(b + "MlpBlock_3/Dense_0")
        fc2_w, fc2_b = dense(b + "MlpBlock_3/Dense_1")
        params["blocks"].append(
            {
                "norm1": {
                    "w": jnp.asarray(g(b + "LayerNorm_0/scale")),
                    "b": jnp.asarray(g(b + "LayerNorm_0/bias")),
                },
                "qkv": {"w": qkv_w, "b": qkv_b},
                "proj": {"w": proj_w, "b": proj_b},
                "norm2": {
                    "w": jnp.asarray(g(b + "LayerNorm_2/scale")),
                    "b": jnp.asarray(g(b + "LayerNorm_2/bias")),
                },
                "fc1": {"w": fc1_w, "b": fc1_b},
                "fc2": {"w": fc2_w, "b": fc2_b},
            }
        )
    return params


def from_torch_state_dict_swin(sd: dict, cfg) -> dict:
    """Map the official Swin state_dict (microsoft/Swin-Transformer layout,
    the checkpoints swin_quant.py:934-994 loads) onto the Swin params pytree.
    ``attn_mask``/``relative_position_index`` buffers are recomputed, not
    loaded (they are functions of the static geometry)."""

    def g(k):
        return jnp.asarray(sd[k])

    params = {
        "patch_embed": {
            "w": g("patch_embed.proj.weight").reshape(cfg.embed_dim, -1),
            "b": g("patch_embed.proj.bias"),
        },
        "patch_norm": {"w": g("patch_embed.norm.weight"), "b": g("patch_embed.norm.bias")},
        "stages": [],
        "norm": {"w": g("norm.weight"), "b": g("norm.bias")},
        "head": {"w": g("head.weight"), "b": g("head.bias")},
    }
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}."
            blocks.append(
                {
                    "norm1": {"w": g(p + "norm1.weight"), "b": g(p + "norm1.bias")},
                    "qkv": {"w": g(p + "attn.qkv.weight"), "b": g(p + "attn.qkv.bias")},
                    "proj": {"w": g(p + "attn.proj.weight"), "b": g(p + "attn.proj.bias")},
                    "bias_table": g(p + "attn.relative_position_bias_table"),
                    "norm2": {"w": g(p + "norm2.weight"), "b": g(p + "norm2.bias")},
                    "fc1": {"w": g(p + "mlp.fc1.weight"), "b": g(p + "mlp.fc1.bias")},
                    "fc2": {"w": g(p + "mlp.fc2.weight"), "b": g(p + "mlp.fc2.bias")},
                }
            )
        stage = {"blocks": blocks}
        if i < cfg.num_layers - 1:
            d = f"layers.{i}.downsample."
            stage["downsample"] = {
                "norm": {"w": g(d + "norm.weight"), "b": g(d + "norm.bias")},
                "reduction": {"w": g(d + "reduction.weight"), "b": None},
            }
        params["stages"].append(stage)
    return params


def load_pretrained(model_name: str, cfg, path: str | None = None) -> dict:
    """Resolve + load pretrained weights for a zoo model from a local file.

    Looks in (1) explicit ``path``, (2) $TORCH_HOME/hub/checkpoints,
    (3) ~/.cache/torch/hub/checkpoints. Raises FileNotFoundError with the
    expected filename if absent (no network egress here).
    """
    fname = HUB_FILES.get(model_name)
    candidates = [path] if path else []
    if fname:
        hub = os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch"))
        candidates += [os.path.join(hub, "hub", "checkpoints", fname)]
    for cand in candidates:
        if cand and os.path.exists(cand):
            if cand.endswith(".npz"):
                return from_augreg_npz(np.load(cand), cfg)
            sd = _torch_load_state_dict(cand)
            if model_name.startswith("swin") or "layers.0.blocks.0.norm1.weight" in sd:
                return from_torch_state_dict_swin(sd, cfg)
            return from_torch_state_dict(sd, cfg)
    raise FileNotFoundError(
        f"no local checkpoint for {model_name}; expected {fname!r} under "
        "$TORCH_HOME/hub/checkpoints or pass an explicit path"
    )


# ---------------------------------------------------------------------------
# Decision import: reference torch model -> our QuantState
# ---------------------------------------------------------------------------

# dic_scale key order must match WEIGHT_CALIB_BIT_TYPES / the wscale row
# layout (bit_type.py; models/vit.py EVAL_QMIN comment)
_WEIGHT_DIC_KEYS = ("uint3", "uint4", "int4", "int8")


def import_reference_state(ref_model, cfg: ViTConfig):
    """Ingest a CALIBRATED reference ViT (vit_fquant.VisionTransformer after
    model_open_calibrate → last_calibrate forward → model_quant) into our
    QuantState, decoupling bit-exact quantization decisions from
    preprocessing/batch-order identity (SURVEY §7 hard parts).

    State sources in the reference modules:
      * activation nodes: ``m.quantizer.scale`` / ``.zero_point``
        (/root/reference/models/ptq/quantizer/uniform.py:25-46),
      * weight nodes: ``m.quantizer.dic_scale[bit_name]`` per-bit dics
        (uniform.py:44-46),
      * smoothquant caches: ``best_scale``/``best_act_scale``/``best_act_zp``
        /``best_weight_scale`` lists indexed by bit_pool
        (vit_fquant.py:323-331; layers_quant.py:337-346).

    PTF masks are not stored separately by the reference (the scale vector
    already carries them, ptf.py:151); the mask entry is recomputed as
    ``round(scale / scale.min())`` — exactly what integer LN derives from
    the scale at run time (layers.py:309-313) — so it may differ from the
    original {1,2,4,8} mask by a global factor when no channel used
    multiplier 1; nothing consumes it beyond that derivation.

    Returns a CalibResult whose ``global_distance`` is zeros: the per-bit
    weight distances are a calibration-forward by-product the reference
    never stores on modules, so imported state serves fixed-bit evaluation;
    run ``calibrate`` for the mixed-precision search artifacts.
    """
    from .models.common import vit_flops
    from .models.vit import CalibResult

    def arr(t):
        return jnp.asarray(np.asarray(t.detach().cpu(), dtype=np.float32))

    def act(m):
        q = m.quantizer
        scale, zp = arr(q.scale), arr(q.zero_point)
        if scale.ndim == 0 or scale.size == 1:
            return {"scale": scale.reshape(()), "zp": zp.reshape(())}
        scale = scale.reshape(-1)
        mask = jnp.round(scale / scale.min())
        return {"scale": scale, "zp": zp.reshape(()), "mask": mask}

    def wdic(m, o):
        dic = m.quantizer.dic_scale
        return jnp.stack(
            [jnp.broadcast_to(arr(dic[k]).reshape(-1), (o,)) for k in _WEIGHT_DIC_KEYS]
        )

    def smooth(mod, o):
        return {
            "channel_scale": jnp.stack([arr(s) for s in mod.best_scale]),
            "qact0_scale": jnp.stack([arr(s).reshape(()) for s in mod.best_act_scale]),
            "qact0_zp": jnp.stack([arr(z).reshape(()) for z in mod.best_act_zp]),
            "wscale": jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.broadcast_to(arr(dic[k]).reshape(-1), (o,))
                            for k in _WEIGHT_DIC_KEYS
                        ]
                    )
                    for dic in mod.best_weight_scale
                ]
            ),
        }

    c, hid = cfg.embed_dim, cfg.hidden_dim
    qs: dict = {
        "qact_input": act(ref_model.qact_input),
        "patch": {
            "wscale": wdic(ref_model.patch_embed.proj, c),
            "qact": act(ref_model.patch_embed.qact),
        },
        "qact_embed": act(ref_model.qact_embed),
        "qact_pos": act(ref_model.qact_pos),
        "qact1": act(ref_model.qact1),
        "blocks": [],
        "qact2": act(ref_model.qact2),
        "head_wscale": wdic(ref_model.head, cfg.num_classes),
        "act_out": act(ref_model.act_out),
    }
    for blk in ref_model.blocks:
        a = smooth(blk.attn, 3 * c)
        a.update(
            qact1=act(blk.attn.qact1),
            qact_attn1=act(blk.attn.qact_attn1),
            qact2=act(blk.attn.qact2),
            proj_wscale=wdic(blk.attn.proj, c),
            qact3=act(blk.attn.qact3),
        )
        m = smooth(blk.mlp, hid)
        m.update(
            qact1=act(blk.mlp.qact1),
            fc2_wscale=wdic(blk.mlp.fc2, c),
            qact2=act(blk.mlp.qact2),
        )
        qs["blocks"].append(
            {"attn": a, "qact2": act(blk.qact2), "mlp": m, "qact4": act(blk.qact4)}
        )
    flops = vit_flops(cfg)
    return CalibResult(
        qstate=qs,
        flops=flops,
        global_distance=jnp.zeros((len(flops) - 1, len(_WEIGHT_DIC_KEYS))),
    )


def import_reference_state_swin(ref_model, cfg):
    """Swin twin of ``import_reference_state``: ingest a CALIBRATED
    reference Swin (swin_quant.SwinTransformer run under the documented
    reconstruction shims — see tests/test_reference_swin_parity.py — after
    the open_calibrate → last_calibrate forward → model_quant protocol)
    into our Swin QuantState.

    Same state sources as the ViT importer (quantizer.scale/zero_point,
    per-bit dic_scale rows, PTF masks rederived as round(scale/scale.min())
    — layers.py:309-313); Swin has no smoothquant caches to carry
    (SURVEY §2 ⚠: P²-ViT never wired SmoothQuant into Swin).

    ``global_distance`` is zeros (not stored by the reference): imported
    state serves fixed/uniform-bit evaluation; run ``calibrate`` for the
    mixed-precision search artifacts.
    """
    from .models.swin import SwinCalibResult, swin_flops

    def arr(t):
        return jnp.asarray(np.asarray(t.detach().cpu(), dtype=np.float32))

    def act(m):
        q = m.quantizer
        scale, zp = arr(q.scale), arr(q.zero_point)
        if scale.ndim == 0 or scale.size == 1:
            return {"scale": scale.reshape(()), "zp": zp.reshape(())}
        scale = scale.reshape(-1)
        mask = jnp.round(scale / scale.min())
        return {"scale": scale, "zp": zp.reshape(()), "mask": mask}

    def wdic(m, o):
        dic = m.quantizer.dic_scale
        return jnp.stack(
            [jnp.broadcast_to(arr(dic[k]).reshape(-1), (o,))
             for k in _WEIGHT_DIC_KEYS]
        )

    qs: dict = {
        "qact_input": act(ref_model.qact_input),
        "patch_wscale": wdic(ref_model.patch_embed.proj, cfg.embed_dim),
        "patch_qact_bn": act(ref_model.patch_embed.qact_before_norm),
        "patch_qact": act(ref_model.patch_embed.qact),
        "stages": [],
        "qact2": act(ref_model.qact2),
        "qact3": act(ref_model.qact3),
        "head_wscale": wdic(ref_model.head, cfg.num_classes),
        "act_out": act(ref_model.act_out),
    }
    for i, layer in enumerate(ref_model.layers):
        c = cfg.stage_dim(i)
        st: dict = {"blocks": []}
        for blk in layer.blocks:
            aq = {
                "qkv_wscale": wdic(blk.attn.qkv, 3 * c),
                "qact1": act(blk.attn.qact1),
                "qact_attn1": act(blk.attn.qact_attn1),
                "qact_table": act(blk.attn.qact_table),
                "qact2": act(blk.attn.qact2),
                "qact3": act(blk.attn.qact3),
                "proj_wscale": wdic(blk.attn.proj, c),
                "qact4": act(blk.attn.qact4),
            }
            st["blocks"].append(
                {
                    "qact1": act(blk.qact1),
                    "attn": aq,
                    "qact2": act(blk.qact2),
                    "qact3": act(blk.qact3),
                    "fc1_wscale": wdic(blk.mlp.fc1, int(c * cfg.mlp_ratio)),
                    "mlp_qact1": act(blk.mlp.qact1),
                    "fc2_wscale": wdic(blk.mlp.fc2, c),
                    "mlp_qact2": act(blk.mlp.qact2),
                    "qact4": act(blk.qact4),
                }
            )
        if layer.downsample is not None:
            st["downsample"] = {
                "qact1": act(layer.downsample.qact1),
                "red_wscale": wdic(layer.downsample.reduction, 2 * c),
                "qact2": act(layer.downsample.qact2),
            }
        qs["stages"].append(st)
    flops = swin_flops(cfg)
    return SwinCalibResult(
        qstate=qs,
        flops=flops,
        global_distance=jnp.zeros((cfg.num_matmuls, len(_WEIGHT_DIC_KEYS))),
    )


# ---------------------------------------------------------------------------
# QuantState serialization (first-class calibration artifact)
# ---------------------------------------------------------------------------


def save_quant_state(path: str, calib) -> None:
    """Serialize a CalibResult (qstate + flops + distances) to one .npz."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(
        {"qstate": calib.qstate, "flops": jnp.asarray(calib.flops),
         "global_distance": calib.global_distance}
    )
    np.savez(
        path,
        treedef=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_quant_state(path: str):
    """Inverse of save_quant_state; returns a CalibResult."""
    import jax
    from .models.vit import CalibResult

    data = np.load(path, allow_pickle=False)
    treedef = pickle.loads(data["treedef"].tobytes())
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return CalibResult(
        qstate=tree["qstate"],
        flops=[int(f) for f in np.asarray(tree["flops"])],
        global_distance=tree["global_distance"],
    )
