"""Fully-quantized Swin Transformer — TPU-native rebuild of swin_quant.py.

Rebuild of /root/reference/models/swin_quant.py (995 LoC). The reference's
Swin path is STALE and crashes as-is (SURVEY §2 ⚠): it calls
``patch_embed(x)`` / ``mlp(...)`` with pre-P²-ViT signatures
(swin_quant.py:886,441-445) and passes ``4`` positionally into
QIntLayerNorm's ``out_quantizer_scale`` slot where ``in_scale_expand=4`` was
meant (swin_quant.py:520 vs ptq/layers.py:276-283). This rebuild implements
the INTENT — the FQ-ViT quantized Swin — and makes it actually work:

  * input fake-quant (qact_input — every constructor passes
    input_quant=True, :697-705,930,957,984),
  * windowed attention with a quantized relative-position-bias table
    (qact_table, swin_quant.py:145-152,222-235) and shifted-window masks
    (:365-395),
  * PatchMerging 2×2-concat → integer LN with in_scale_expand=4 → QLinear
    reduction (:503-524),
  * per-stage quantizer chaining (patch-embed qact → block qact4 →
    downsample qact2, :619-630,891-897),
  * final int-LN → token avg-pool → head (:899-914).

P²-ViT's additions (SmoothQuant, per-layer bit_config, Hessian search) were
never wired into Swin by the reference; this rebuild goes further and wires
them: ``quant_forward`` takes a single uniform weight bit selectable at
eval, and ``quant_forward_mixed`` + ``mixed_layout`` + ``swin_flops`` (below)
give Swin real per-matmul mixed precision — the CLI drives it via
``--mixed --live-hessian`` (hessian.py computes the layer traces the
reference's hardcoded table only has for ViT). The per-bit scale dics are
calibrated for every block, like QLinear's, so both paths share QuantState.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import QuantPolicy
from ..quant.bit_type import BIT_TYPE_DICT
from ..quant.fake_quant import fake_quant, fake_quant_dyn
from ..quant.intops import int_layernorm, log_int_softmax
from ..quant.solve import accumulate_act_stats, solve_act, solve_weight_all_bits
from .common import gelu, layer_norm, linear, trunc_normal
from .vit import EVAL_QMAX, EVAL_QMIN, _sget, bits_to_idx

INT8 = BIT_TYPE_DICT["int8"]


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Static architecture description (swin_quant.py:917-995)."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5

    @property
    def num_layers(self):
        return len(self.depths)

    @property
    def num_matmuls(self):
        """Weight-layer count: patch conv + 4/block + 1/downsample + head."""
        return 2 + 4 * sum(self.depths) + (self.num_layers - 1)

    @property
    def num_features(self):
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def grid(self):
        return self.img_size // self.patch_size

    def stage_dim(self, i):
        return int(self.embed_dim * 2**i)

    def stage_res(self, i):
        return self.grid // (2**i)


def swin_flops(cfg: SwinConfig) -> list:
    """Analytic per-matmul cost vector, one entry per bit_config slot, in
    the calibration-walk order: [patch] + per stage (per block [qkv, proj,
    fc1, fc2], then [downsample reduction]) + [head]. Multiply counts, same
    convention as models/common.vit_flops — the model-size proxy of the
    mixed-precision constraint the reference never wired into Swin
    (SURVEY §2 ⚠)."""
    flops = [cfg.in_chans * cfg.patch_size**2 * cfg.embed_dim * cfg.grid**2]
    for i, depth in enumerate(cfg.depths):
        c = cfg.stage_dim(i)
        h = int(c * cfg.mlp_ratio)
        n = cfg.stage_res(i) ** 2
        for _ in range(depth):
            flops += [n * c * 3 * c, n * c * c, n * c * h, n * h * c]
        if i < cfg.num_layers - 1:
            flops.append((n // 4) * 4 * c * 2 * c)
    flops.append(cfg.num_features * cfg.num_classes)
    return flops


def mixed_layout(cfg: SwinConfig):
    """(groups, pinned) bit-config layout for the mixed-precision sampler.

    Follows the reference's ViT pairing convention (qkv/proj share a gene,
    fc1/fc2 share a gene, patch pinned to max bit, head free —
    /root/reference/test_quant.py:329-334) extended to Swin's geometry:
    each downsample reduction is its own free gene.
    """
    groups, pinned = [], {0: max}
    slot = 1
    for i, depth in enumerate(cfg.depths):
        for _ in range(depth):
            groups.append([slot, slot + 1])      # qkv/proj
            groups.append([slot + 2, slot + 3])  # fc1/fc2
            slot += 4
        if i < cfg.num_layers - 1:
            groups.append([slot])                # downsample reduction
            slot += 1
    groups.append([slot])                        # head
    return groups, {0: None}  # slot 0 pinned to max(bit_choice) by the sampler


# ---------------------------------------------------------------------------
# Window helpers (swin_quant.py:26-59) — pure reshapes, XLA-free of copies
# ---------------------------------------------------------------------------


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B·nW, ws·ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    """(B·nW, ws·ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws-1)² bias table
    (swin_quant.py:100-115)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws², ws²) 0/-100 mask for shifted windows
    (swin_quant.py:365-391)."""
    img = np.zeros((h, w), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    # pure-numpy window partition (this runs at trace time inside jit)
    mw = (
        img.reshape(h // ws, ws, w // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(key, cfg: SwinConfig) -> dict:
    ws = cfg.window_size
    n_bias = (2 * ws - 1) ** 2
    keys = iter(jax.random.split(key, 8 + 8 * sum(cfg.depths) + 2 * cfg.num_layers))

    def lin(o, i, bias=True):
        p = {"w": trunc_normal(next(keys), (o, i))}
        p["b"] = jnp.zeros((o,)) if bias else None
        return p

    def ln(c):
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}

    stages = []
    for i, depth in enumerate(cfg.depths):
        c = cfg.stage_dim(i)
        h = int(c * cfg.mlp_ratio)
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "norm1": ln(c),
                    "qkv": lin(3 * c, c),
                    "proj": lin(c, c),
                    "bias_table": trunc_normal(next(keys), (n_bias, cfg.num_heads[i])),
                    "norm2": ln(c),
                    "fc1": lin(h, c),
                    "fc2": lin(c, h),
                }
            )
        stage = {"blocks": blocks}
        if i < cfg.num_layers - 1:
            stage["downsample"] = {"norm": ln(4 * c), "reduction": lin(2 * c, 4 * c, bias=False)}
        stages.append(stage)
    return {
        "patch_embed": lin(cfg.embed_dim, cfg.in_chans * cfg.patch_size**2),
        "patch_norm": ln(cfg.embed_dim),
        "stages": stages,
        "norm": ln(cfg.num_features),
        "head": lin(cfg.num_classes, cfg.num_features),
    }


def _patches(x, p):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // p, p, w // p, p).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def _rel_bias(blk, cfg: SwinConfig, stage: int):
    """(heads, ws², ws²) bias from the table (swin_quant.py:225-234)."""
    ws = cfg.window_size
    idx = relative_position_index(ws).reshape(-1)
    bias = blk["bias_table"][idx].reshape(ws * ws, ws * ws, -1)
    return bias.transpose(2, 0, 1)


def _window_attention_fp(blk, cfg, stage, xw, mask, attn_tap=None):
    """fp windowed attention on (B·nW, N, C) windows.

    attn_tap: optional list; the merged attn@v window tensor is appended —
    the Swin analogue of the reference's MatMul hook on WindowAttention
    (/root/reference/utils/build_model.py:100-108), consumed by the PSAQ
    data-free generator.
    """
    heads = cfg.num_heads[stage]
    b_, n, c = xw.shape
    hd = c // heads
    qkv = linear(xw, blk["qkv"]["w"], blk["qkv"]["b"])
    qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(0, 1, 3, 2) + _rel_bias(blk, cfg, stage)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, heads, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    if attn_tap is not None:
        attn_tap.append(out)
    return linear(out, blk["proj"]["w"], blk["proj"]["b"])


def fp_forward(params, cfg: SwinConfig, x, attn_tap=None):
    """Plain fp Swin forward (baseline eval / Hessian / PSAQ taps)."""
    eps = cfg.ln_eps
    x = linear(_patches(x, cfg.patch_size), params["patch_embed"]["w"],
               params["patch_embed"]["b"])
    x = layer_norm(x, params["patch_norm"]["w"], params["patch_norm"]["b"], eps)
    for i, stage in enumerate(params["stages"]):
        res = cfg.stage_res(i)
        ws = min(cfg.window_size, res)
        for j, blk in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else ws // 2
            if res <= cfg.window_size:
                shift = 0
            b, l, c = x.shape
            shortcut = x
            h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
            h = h.reshape(b, res, res, c)
            if shift:
                h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            hw = window_partition(h, ws)
            mask = (
                jnp.asarray(shift_attn_mask(res, res, ws, shift)) if shift else None
            )
            hw = _window_attention_fp(blk, cfg, i, hw, mask, attn_tap)
            h = window_reverse(hw, ws, res, res)
            if shift:
                h = jnp.roll(h, (shift, shift), axis=(1, 2))
            x = shortcut + h.reshape(b, l, c)
            h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
            h = gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"]))
            x = x + linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
        if "downsample" in stage:
            b, l, c = x.shape
            x = _merge_patches(x, res)
            ds = stage["downsample"]
            x = layer_norm(x, ds["norm"]["w"], ds["norm"]["b"], eps)
            x = linear(x, ds["reduction"]["w"], None)
    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps)
    x = x.mean(axis=1)
    return linear(x, params["head"]["w"], params["head"]["b"])


def _merge_patches(x, res):
    """2×2 neighborhood concat (swin_quant.py:512-519)."""
    b, l, c = x.shape
    x = x.reshape(b, res, res, c)
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    return jnp.concatenate([x0, x1, x2, x3], -1).reshape(b, -1, 4 * c)


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SwinCalibResult:
    qstate: dict
    global_distance: jnp.ndarray  # (n_weight_layers, 4)
    flops: list = dataclasses.field(default_factory=list)  # serialization compat


def _qact(method, x, bit_type=INT8, prev=None):
    out = solve_act(method, x, bit_type, stats=accumulate_act_stats(method, x, prev))
    if len(out) == 3:
        return {"scale": out[0], "zp": out[1], "mask": out[2]}
    return {"scale": out[0], "zp": out[1]}


def calibrate(params, cfg: SwinConfig, policy: QuantPolicy, x,
              stats=None) -> SwinCalibResult:
    qs, dists = _calibrate_jit(params, cfg, policy, x, stats)
    return SwinCalibResult(qstate=qs, global_distance=dists,
                           flops=swin_flops(cfg))


def collect_stats(params, cfg: SwinConfig, policy: QuantPolicy, x, prev=None):
    """Multi-batch stats pass (see models/vit.py collect_stats)."""
    return _collect_stats_jit(params, cfg, policy, x, prev)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _calibrate_jit(params, cfg: SwinConfig, policy: QuantPolicy, x, stats=None):
    """Calibration walker (same protocol as models/vit.py); ``stats`` are
    running multi-batch activation statistics keyed like the qstate."""
    a, a_ln = policy.observer_a, policy.observer_a_ln
    eps = cfg.ln_eps
    dists: list = []
    qs: dict = {}

    def wsolve(w, xin):
        scale, dist = solve_weight_all_bits(w, xin.reshape(-1, xin.shape[-1]))
        dists.append(dist)
        return scale

    # input quantizer: every Swin constructor passes input_quant=True
    # (swin_quant.py:697-705,930,957,984) — int8 layer-wise on the image.
    # Calibration still walks the RAW image (QAct returns x unquantized
    # while calibrating); the scale only bites at eval.
    qs["qact_input"] = _qact(a, x, prev=_sget(stats, "qact_input"))
    patches = _patches(x, cfg.patch_size)
    qs["patch_wscale"] = wsolve(params["patch_embed"]["w"], patches)
    x = linear(patches, params["patch_embed"]["w"], params["patch_embed"]["b"])
    qs["patch_qact_bn"] = _qact(a, x, prev=_sget(stats, "patch_qact_bn"))
    x = layer_norm(x, params["patch_norm"]["w"], params["patch_norm"]["b"], eps)
    qs["patch_qact"] = _qact(a, x, prev=_sget(stats, "patch_qact"))

    qs["stages"] = []
    for i, stage in enumerate(params["stages"]):
        res = cfg.stage_res(i)
        ws = min(cfg.window_size, res)
        heads = cfg.num_heads[i]
        sq: dict = {"blocks": []}
        for j, blk in enumerate(stage["blocks"]):
            pbq = _sget(stats, "stages", i, "blocks", j)
            shift = 0 if (j % 2 == 0 or res <= cfg.window_size) else ws // 2
            b, l, c = x.shape
            hd = c // heads
            bq: dict = {}
            shortcut = x
            h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
            bq["qact1"] = _qact(a, h, prev=_sget(pbq, "qact1"))
            h = h.reshape(b, res, res, c)
            if shift:
                h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            hw = window_partition(h, ws)
            # --- window attention ---
            aq: dict = {}
            aq["qkv_wscale"] = wsolve(blk["qkv"]["w"], hw)
            hw2 = linear(hw, blk["qkv"]["w"], blk["qkv"]["b"])
            aq["qact1"] = _qact(a, hw2, prev=_sget(pbq, "attn", "qact1"))
            b_, n, _ = hw2.shape
            qkv = hw2.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
            attn = q @ k.transpose(0, 1, 3, 2)
            aq["qact_attn1"] = _qact(a, attn, prev=_sget(pbq, "attn", "qact_attn1"))
            aq["qact_table"] = _qact(
                a, blk["bias_table"], prev=_sget(pbq, "attn", "qact_table")
            )
            attn = attn + _rel_bias(blk, cfg, i)[None]
            aq["qact2"] = _qact(a, attn, prev=_sget(pbq, "attn", "qact2"))
            if shift:
                mask = jnp.asarray(shift_attn_mask(res, res, ws, shift))
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, heads, n, n) + mask[None, :, None]
                attn = attn.reshape(b_, heads, n, n)
            if policy.int_softmax:
                attn = log_int_softmax(attn, aq["qact2"]["scale"], policy.bit_type_s)
            else:
                attn = jax.nn.softmax(attn, axis=-1)
            hw = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
            aq["qact3"] = _qact(a, hw, prev=_sget(pbq, "attn", "qact3"))
            aq["proj_wscale"] = wsolve(blk["proj"]["w"], hw)
            hw = linear(hw, blk["proj"]["w"], blk["proj"]["b"])
            aq["qact4"] = _qact(a, hw, prev=_sget(pbq, "attn", "qact4"))
            bq["attn"] = aq
            h = window_reverse(hw, ws, res, res)
            if shift:
                h = jnp.roll(h, (shift, shift), axis=(1, 2))
            x = shortcut + h.reshape(b, l, c)
            bq["qact2"] = _qact(a_ln, x, prev=_sget(pbq, "qact2"))
            # --- mlp ---
            h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
            bq["qact3"] = _qact(a, h, prev=_sget(pbq, "qact3"))
            bq["fc1_wscale"] = wsolve(blk["fc1"]["w"], h)
            h = gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"]))
            bq["mlp_qact1"] = _qact(a, h, prev=_sget(pbq, "mlp_qact1"))
            bq["fc2_wscale"] = wsolve(blk["fc2"]["w"], h)
            h = linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
            bq["mlp_qact2"] = _qact(a_ln, h, prev=_sget(pbq, "mlp_qact2"))
            x = x + h
            bq["qact4"] = _qact(a_ln, x, prev=_sget(pbq, "qact4"))
            sq["blocks"].append(bq)
        if "downsample" in stage:
            ds = stage["downsample"]
            pdq = _sget(stats, "stages", i, "downsample")
            dq: dict = {}
            x = _merge_patches(x, res)
            x = layer_norm(x, ds["norm"]["w"], ds["norm"]["b"], eps)
            dq["qact1"] = _qact(a, x, prev=_sget(pdq, "qact1"))
            dq["red_wscale"] = wsolve(ds["reduction"]["w"], x)
            x = linear(x, ds["reduction"]["w"], None)
            dq["qact2"] = _qact(a_ln, x, prev=_sget(pdq, "qact2"))
            sq["downsample"] = dq
        qs["stages"].append(sq)

    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps)
    qs["qact2"] = _qact(a, x, prev=_sget(stats, "qact2"))
    x = x.mean(axis=1)
    qs["qact3"] = _qact(a, x, prev=_sget(stats, "qact3"))
    qs["head_wscale"] = wsolve(params["head"]["w"], x)
    x = linear(x, params["head"]["w"], params["head"]["b"])
    qs["act_out"] = _qact(a, x, prev=_sget(stats, "act_out"))
    return qs, jnp.stack(dists)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _collect_stats_jit(params, cfg: SwinConfig, policy: QuantPolicy, x, prev):
    """Stats-only walker: the fp forward of ``fp_forward`` with min/max
    accumulation at every activation node (keys mirror the qstate); LIS
    falls back to fp softmax like the reference's non-last calibrate
    batches (layers.py:429-447)."""
    a, a_ln = policy.observer_a, policy.observer_a_ln
    eps = cfg.ln_eps
    st: dict = {}

    def acc(method, v, *path):
        return accumulate_act_stats(method, v, _sget(prev, *path))

    st["qact_input"] = acc(a, x, "qact_input")
    patches = _patches(x, cfg.patch_size)
    x = linear(patches, params["patch_embed"]["w"], params["patch_embed"]["b"])
    st["patch_qact_bn"] = acc(a, x, "patch_qact_bn")
    x = layer_norm(x, params["patch_norm"]["w"], params["patch_norm"]["b"], eps)
    st["patch_qact"] = acc(a, x, "patch_qact")

    st["stages"] = []
    for i, stage in enumerate(params["stages"]):
        res = cfg.stage_res(i)
        ws = min(cfg.window_size, res)
        heads = cfg.num_heads[i]
        ss: dict = {"blocks": []}
        for j, blk in enumerate(stage["blocks"]):
            P = ("stages", i, "blocks", j)
            shift = 0 if (j % 2 == 0 or res <= cfg.window_size) else ws // 2
            b, l, c = x.shape
            hd = c // heads
            bs: dict = {"attn": {}}
            shortcut = x
            h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
            bs["qact1"] = acc(a, h, *P, "qact1")
            h = h.reshape(b, res, res, c)
            if shift:
                h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            hw = window_partition(h, ws)
            hw2 = linear(hw, blk["qkv"]["w"], blk["qkv"]["b"])
            bs["attn"]["qact1"] = acc(a, hw2, *P, "attn", "qact1")
            b_, n, _ = hw2.shape
            qkv = hw2.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
            attn = q @ k.transpose(0, 1, 3, 2)
            bs["attn"]["qact_attn1"] = acc(a, attn, *P, "attn", "qact_attn1")
            bs["attn"]["qact_table"] = acc(
                a, blk["bias_table"], *P, "attn", "qact_table"
            )
            attn = attn + _rel_bias(blk, cfg, i)[None]
            bs["attn"]["qact2"] = acc(a, attn, *P, "attn", "qact2")
            if shift:
                mask = jnp.asarray(shift_attn_mask(res, res, ws, shift))
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, heads, n, n) + mask[None, :, None]
                attn = attn.reshape(b_, heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1)  # no LIS scale yet (non-last)
            hw = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
            bs["attn"]["qact3"] = acc(a, hw, *P, "attn", "qact3")
            hw = linear(hw, blk["proj"]["w"], blk["proj"]["b"])
            bs["attn"]["qact4"] = acc(a, hw, *P, "attn", "qact4")
            h = window_reverse(hw, ws, res, res)
            if shift:
                h = jnp.roll(h, (shift, shift), axis=(1, 2))
            x = shortcut + h.reshape(b, l, c)
            bs["qact2"] = acc(a_ln, x, *P, "qact2")
            h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
            bs["qact3"] = acc(a, h, *P, "qact3")
            h = gelu(linear(h, blk["fc1"]["w"], blk["fc1"]["b"]))
            bs["mlp_qact1"] = acc(a, h, *P, "mlp_qact1")
            h = linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
            bs["mlp_qact2"] = acc(a_ln, h, *P, "mlp_qact2")
            x = x + h
            bs["qact4"] = acc(a_ln, x, *P, "qact4")
            ss["blocks"].append(bs)
        if "downsample" in stage:
            ds = stage["downsample"]
            x = _merge_patches(x, res)
            x = layer_norm(x, ds["norm"]["w"], ds["norm"]["b"], eps)
            dq = {"qact1": acc(a, x, "stages", i, "downsample", "qact1")}
            x = linear(x, ds["reduction"]["w"], None)
            dq["qact2"] = acc(a_ln, x, "stages", i, "downsample", "qact2")
            ss["downsample"] = dq
        st["stages"].append(ss)

    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps)
    st["qact2"] = acc(a, x, "qact2")
    x = x.mean(axis=1)
    st["qact3"] = acc(a, x, "qact3")
    x = linear(x, params["head"]["w"], params["head"]["b"])
    st["act_out"] = acc(a, x, "act_out")
    return st


# ---------------------------------------------------------------------------
# Quantized forward
# ---------------------------------------------------------------------------


def _fq(x, q):
    return fake_quant(x, q["scale"], q["zp"], INT8)


def _intln(x, lnp, policy, in_q, out_scale, eps, expand=1):
    if policy.int_norm:
        return int_layernorm(
            x, lnp["w"], lnp["b"], in_q["scale"], out_scale, in_scale_expand=expand
        )
    return layer_norm(x, lnp["w"], lnp["b"], eps)


def quant_forward(params, qstate, cfg: SwinConfig, policy: QuantPolicy, x,
                  w_bit: int = 8):
    """Fully-quantized Swin forward with a uniform weight bit width
    (FQ-ViT-style, the reference's intent — swin_quant.py has no
    bit_config). Thin wrapper over the per-layer ``quant_forward_mixed``."""
    return quant_forward_mixed(
        params, qstate, cfg, policy, x, bits_to_idx([w_bit] * cfg.num_matmuls)
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def quant_forward_mixed(params, qstate, cfg: SwinConfig, policy: QuantPolicy,
                        x, bit_idx):
    """Fully-quantized Swin forward with per-layer weight bits.

    ``bit_idx`` is the traced int32 [num_matmuls] vector from
    ``vit.bits_to_idx`` in the calibration-walk slot order ([patch] + per
    stage (per block [qkv, proj, fc1, fc2]) + [downsample] + [head]) — the
    mixed-precision capability the reference never wired into Swin
    (SURVEY §2 ⚠; its swin_quant.py crashes before any bit_config could
    apply). One compiled executable serves every candidate config, like
    models/vit.py quant_forward.
    """
    eps = cfg.ln_eps
    slot = iter(range(cfg.num_matmuls))

    def fqw(w, wscale):
        bit = bit_idx[next(slot)]
        return fake_quant_dyn(
            w, wscale[2 + bit][:, None], 0.0, EVAL_QMIN[bit], EVAL_QMAX[bit]
        )

    # input fake-quant (swin_quant.py:884-886: qact_input ahead of the
    # patch embed — every constructor passes input_quant=True)
    if "qact_input" not in qstate:
        raise KeyError(
            "qstate has no 'qact_input': pre-input-quant Swin quant state "
            "(saved before the input fake-quant node landed). Recalibrate "
            "and re-save (see serving_swin.convert for the full story)."
        )
    x = _fq(x, qstate["qact_input"])
    patches = _patches(x, cfg.patch_size)
    x = linear(patches, fqw(params["patch_embed"]["w"], qstate["patch_wscale"]),
               params["patch_embed"]["b"])
    x = _fq(x, qstate["patch_qact_bn"])
    x = _intln(x, params["patch_norm"], policy, qstate["patch_qact_bn"],
               qstate["patch_qact"]["scale"], eps)
    x = _fq(x, qstate["patch_qact"])
    last_q = qstate["patch_qact"]

    for i, stage in enumerate(params["stages"]):
        res = cfg.stage_res(i)
        ws = min(cfg.window_size, res)
        heads = cfg.num_heads[i]
        sq = qstate["stages"][i]
        for j, blk in enumerate(stage["blocks"]):
            bq = sq["blocks"][j]
            aq = bq["attn"]
            shift = 0 if (j % 2 == 0 or res <= cfg.window_size) else ws // 2
            b, l, c = x.shape
            hd = c // heads
            shortcut = x
            h = _intln(x, blk["norm1"], policy, last_q, bq["qact1"]["scale"], eps)
            h = _fq(h, bq["qact1"])
            h = h.reshape(b, res, res, c)
            if shift:
                h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            hw = window_partition(h, ws)
            hw = linear(hw, fqw(blk["qkv"]["w"], aq["qkv_wscale"]), blk["qkv"]["b"])
            hw = _fq(hw, aq["qact1"])
            b_, n, _ = hw.shape
            qkv = hw.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
            attn = q @ k.transpose(0, 1, 3, 2)
            attn = _fq(attn, aq["qact_attn1"])
            table_q = _fq(blk["bias_table"], aq["qact_table"])
            idx = relative_position_index(ws).reshape(-1)
            bias = table_q[idx].reshape(n, n, -1).transpose(2, 0, 1)
            attn = attn + bias[None]
            attn = _fq(attn, aq["qact2"])
            if shift:
                mask = jnp.asarray(shift_attn_mask(res, res, ws, shift))
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, heads, n, n) + mask[None, :, None]
                attn = attn.reshape(b_, heads, n, n)
            if policy.int_softmax:
                attn = log_int_softmax(attn, aq["qact2"]["scale"], policy.bit_type_s)
            else:
                attn = jax.nn.softmax(attn, axis=-1)
            hw = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
            hw = _fq(hw, aq["qact3"])
            hw = linear(hw, fqw(blk["proj"]["w"], aq["proj_wscale"]), blk["proj"]["b"])
            hw = _fq(hw, aq["qact4"])
            h = window_reverse(hw, ws, res, res)
            if shift:
                h = jnp.roll(h, (shift, shift), axis=(1, 2))
            x = shortcut + h.reshape(b, l, c)
            x = _fq(x, bq["qact2"])
            h = _intln(x, blk["norm2"], policy, bq["qact2"], bq["qact3"]["scale"], eps)
            h = _fq(h, bq["qact3"])
            h = linear(h, fqw(blk["fc1"]["w"], bq["fc1_wscale"]), blk["fc1"]["b"])
            h = gelu(h)
            h = _fq(h, bq["mlp_qact1"])
            h = linear(h, fqw(blk["fc2"]["w"], bq["fc2_wscale"]), blk["fc2"]["b"])
            h = _fq(h, bq["mlp_qact2"])
            x = x + h
            x = _fq(x, bq["qact4"])
            last_q = bq["qact4"]
        if "downsample" in stage:
            ds = stage["downsample"]
            dq = sq["downsample"]
            x = _merge_patches(x, res)
            # in_scale_expand=4: the previous quantizer's [C] scale tiles to
            # the 4C concat (the reference INTENDED this; swin_quant.py:520
            # passes 4 into the wrong argument slot — fixed here)
            x = _intln(x, ds["norm"], policy, last_q, dq["qact1"]["scale"], eps,
                       expand=4)
            x = _fq(x, dq["qact1"])
            x = linear(x, fqw(ds["reduction"]["w"], dq["red_wscale"]), None)
            x = _fq(x, dq["qact2"])
            last_q = dq["qact2"]

    x = _intln(x, params["norm"], policy, last_q, qstate["qact2"]["scale"], eps)
    x = _fq(x, qstate["qact2"])
    x = x.mean(axis=1)
    x = _fq(x, qstate["qact3"])
    x = linear(x, fqw(params["head"]["w"], qstate["head_wscale"]), params["head"]["b"])
    return _fq(x, qstate["act_out"])
