"""Int8 serving pipeline for the quantized Swin family.

Code-domain counterpart of models/swin.py::quant_forward (which itself makes
the reference's stale Swin path work — SURVEY §2 ⚠). The per-token matmuls
(qkv/proj/fc1/fc2/reduction — the FLOPs bulk of Swin) run on the Pallas int8
shift-requant kernels; the windowed attention (49-token windows, head_dim 32
— far below MXU tile size) runs the same integer math in XLA, where the
tiny-window shapes schedule better than a Pallas grid of B·nW micro-steps.

Weight bits are per-layer (uniform by default — the FQ-ViT setting);
activations int8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import QuantPolicy
from .models.swin import (
    SwinConfig,
    _merge_patches,
    _patches,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from .ops.attention_lis import (
    _fp_softmax_from_scores,
    _lis_from_scores,
    swin_lis_attention,
    swin_lis_attention_folded,
)
from .ops.intln import (
    int_ln_requant,
    int_res_ln_requant,
    int_res_ln_requant_ref,
    ln_mn_chain,
)
from .ops.matmul_int8 import int8_matmul_requant, int8_matmul_requant_ref
from .ops.matmul_ln import int8_matmul_res_ln, int8_matmul_res_ln_ref
from .ops.swin_stem import fused_swin_stem

_I8 = (-128, 127)
_ROW = {4: 2, 8: 3}
_BOUNDS = {4: (-8, 7), 8: (-128, 127)}


def attach_u8_ingest(s, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """Enable RAW uint8 image ingestion on a converted Swin ServingState.

    Ingestion is the device-side replay of the host normalize
    ``(u/255 - mean)/std`` in the exact f32 op order of
    data.build_transform — bit-identical to feeding the host-normalized
    f32 batch (tests/test_u8_ingest.py); the qact_input fake-quant then
    applies as usual in serving_forward."""
    from .serving import u8_ingest_consts

    s["u8"] = u8_ingest_consts(mean, std)
    return s


def _u8_dequant(s, x):
    if "u8" not in s:
        raise ValueError(
            "uint8 batch but no ingestion constants — call "
            "serving_swin.attach_u8_ingest(s, mean, std) after convert()"
        )
    u8 = s["u8"]
    f = x.astype(jnp.float32) / jnp.float32(255.0)
    return (f - u8["mean"][:, None, None]) / u8["std"][:, None, None]


def convert(params, qstate, cfg: SwinConfig, policy: QuantPolicy, bit_config=8):
    """Freeze int8 weight codes + requant constants for a bit config.

    ``bit_config``: a single int (uniform weight bit, the FQ-ViT default)
    or a per-layer list of length cfg.num_matmuls in the calibration-walk
    slot order ([patch] + per stage (per block [qkv, proj, fc1, fc2]) +
    [downsample] + [head]) — the layout of swin.quant_forward_mixed and the
    mixed-precision search."""
    assert policy.int_norm, "Swin serving requires the PTF integer-LN pipeline"
    if "qact_input" not in qstate:
        # Quant states saved before the input fake-quant landed (the
        # reference's input_quant=True, swin_quant.py:884-886) lack this
        # node entirely — and also lack its effect on every downstream
        # scale, so patching a default in would be silently wrong.
        raise KeyError(
            "qstate has no 'qact_input': this is a pre-input-quant Swin "
            "quant state (saved before the input fake-quant node landed). "
            "Recalibrate and re-save — the old state also lacks the "
            "reference's input fake-quant semantics (swin_quant.py:884-886)."
        )
    if isinstance(bit_config, int):
        bits = [bit_config] * cfg.num_matmuls
    else:
        bits = [int(b) for b in bit_config]
        assert len(bits) == cfg.num_matmuls, (len(bits), cfg.num_matmuls)

    def wq(w, dic, bit):
        row = _ROW[bit]
        qmin, qmax = _BOUNDS[bit]
        sw = dic[row]
        return {
            "w_q": jnp.clip(jnp.round(w / sw[:, None]), qmin, qmax).astype(jnp.int8),
            "sw": sw,
        }

    s: dict = {
        # input quantizer (swin_quant.py:697-705: every constructor passes
        # input_quant=True — int8 layer-wise on the image)
        "s_input": qstate["qact_input"]["scale"],
        "zp_input": qstate["qact_input"]["zp"],
        "patch": wq(params["patch_embed"]["w"], qstate["patch_wscale"], bits[0]),
        "patch_b": params["patch_embed"]["b"],
        "head": wq(params["head"]["w"], qstate["head_wscale"], bits[-1]),
        "head_b": params["head"]["b"],
        "lis": 1 if policy.int_softmax else 0,
        "stages": [],
    }
    slot = 1
    for i, stage in enumerate(params["stages"]):
        sq = qstate["stages"][i]
        st = {"blocks": []}
        for j, blk in enumerate(stage["blocks"]):
            bq = sq["blocks"][j]
            st["blocks"].append(
                {
                    "qkv": wq(blk["qkv"]["w"], bq["attn"]["qkv_wscale"], bits[slot]),
                    "qkv_b": blk["qkv"]["b"],
                    "proj": wq(blk["proj"]["w"], bq["attn"]["proj_wscale"],
                               bits[slot + 1]),
                    "proj_b": blk["proj"]["b"],
                    "fc1": wq(blk["fc1"]["w"], bq["fc1_wscale"], bits[slot + 2]),
                    "fc1_b": blk["fc1"]["b"],
                    "fc2": wq(blk["fc2"]["w"], bq["fc2_wscale"], bits[slot + 3]),
                    "fc2_b": blk["fc2"]["b"],
                    "bias_table": blk["bias_table"],
                    "norm1": blk["norm1"],
                    "norm2": blk["norm2"],
                }
            )
            slot += 4
        if "downsample" in stage:
            ds = stage["downsample"]
            st["downsample"] = {
                "red": wq(ds["reduction"]["w"], sq["downsample"]["red_wscale"],
                          bits[slot]),
                "norm": ds["norm"],
            }
            slot += 1
        s["stages"].append(st)
    assert slot == cfg.num_matmuls - 1  # head consumed bits[-1]
    s["patch_norm"] = params["patch_norm"]
    s["norm"] = params["norm"]
    return s


def weight_only_params(params, qstate, cfg: SwinConfig, policy: QuantPolicy,
                       bit_config=8) -> dict:
    """Weight-only quantized Swin serving: convert()'s exact weight codes
    dequantized back into the original param pytree for the bf16 XLA
    forward — the fallback for the batch<4 regime where the int8 pipeline
    measures below bf16 (BENCH.md §"Swin crossover"; see
    serving.weight_only_params for the full rationale). Swin's serving
    weights carry no SmoothQuant fold, so every effective weight is just
    w_q·sw. Round-trip pin in tests/test_swin_serving.py.

    Inherits convert()'s preconditions (policy.int_norm; a post-input-quant
    qstate with 'qact_input') deliberately: the frozen codes are defined by
    the full calibrated state — a pre-input-quant state's weight scales were
    solved against differently-scaled activations, so serving its codes
    under the current pipeline's identity claims would be silently wrong."""
    s = convert(params, qstate, cfg, policy, bit_config)
    eff = lambda l: l["w_q"].astype(jnp.float32) * l["sw"][:, None]
    new = dict(params)
    new["patch_embed"] = {**params["patch_embed"], "w": eff(s["patch"])}
    new["head"] = {**params["head"], "w": eff(s["head"])}
    stages = []
    for stage, st in zip(params["stages"], s["stages"]):
        ns = dict(stage)
        ns["blocks"] = [
            {**blk,
             "qkv": {**blk["qkv"], "w": eff(sb["qkv"])},
             "proj": {**blk["proj"], "w": eff(sb["proj"])},
             "fc1": {**blk["fc1"], "w": eff(sb["fc1"])},
             "fc2": {**blk["fc2"], "w": eff(sb["fc2"])}}
            for blk, sb in zip(stage["blocks"], st["blocks"])
        ]
        if "downsample" in stage:
            ds = stage["downsample"]
            ns["downsample"] = {
                **ds,
                "reduction": {**ds["reduction"], "w": eff(st["downsample"]["red"])},
            }
        stages.append(ns)
    new["stages"] = stages
    return new


def _iln(codes, s_in, lnp, out_scale, expand=1, interpret=False, use_pallas=True):
    """Integer LN on codes with optional PatchMerging scale tiling."""
    c = codes.shape[-1]
    s_in_v = jnp.broadcast_to(jnp.asarray(s_in, jnp.float32), (c // expand,))
    if expand != 1:
        s_in_v = jnp.tile(s_in_v, expand)
    s1 = s_in_v.min()
    mask = jnp.round(s_in_v / s1)
    if use_pallas:
        out = int_ln_requant(
            codes.reshape(-1, c), mask, s1, lnp["w"], lnp["b"],
            jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (c,)),
            jnp.ones((c,)), interpret=interpret,
        )
        return out.reshape(codes.shape)
    x = codes.astype(jnp.float32) * mask
    sx = x.sum(axis=-1, keepdims=True)
    sxx = (x * x).sum(axis=-1, keepdims=True)
    # shared serving LN chain (ops/intln.ln_mn_chain), matching the Pallas
    # kernel bit for bit
    osc = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (c,)), 1e-30
    )
    w_os = jnp.asarray(lnp["w"], jnp.float32) / osc
    b_os = jnp.asarray(lnp["b"], jnp.float32) / osc
    y = ln_mn_chain(x, sx, sxx, s1, float(c), w_os, b_os)
    return jnp.clip(jnp.round(y), *_I8).astype(jnp.int8)


def _requant(codes, ratio):
    return jnp.clip(jnp.round(codes.astype(jnp.float32) * ratio), *_I8)


def _window_attention_codes(hw, sb, bq, mask, lis, n_heads):
    """Windowed attention on codes, integer math in XLA.

    Mirrors swin.quant_forward's attention: q·scale@kᵀ → qact_attn1 →
    +bias(qact_table) → qact2 → (+mask) → LIS/softmax → @v → qact3 codes.
    """
    aq = bq["attn"]
    n = hw.shape[1]
    ws = int(round(np.sqrt(n)))
    return _window_attention_codes_vals(
        hw, _bias_values(sb, aq, ws, n, n_heads), mask, lis, n_heads,
        aq["qact1"]["scale"], aq["qact_attn1"]["scale"],
        aq["qact2"]["scale"], aq["qact3"]["scale"],
    )


def _window_attention_codes_vals(hw, bias_val, mask, lis, n_heads,
                                 s1, s_attn1, s2, s3):
    """``_window_attention_codes`` on pre-gathered bias VALUES + scalar
    scales — the head-parallel entry: every term is per-head, so a TP
    shard (parallel/tensor_swin.py) calls this with its local heads and
    the matching bias rows, bit-identically to the full-width call."""
    b_, n, c3 = hw.shape
    c = c3 // 3
    hd = c // n_heads
    qkv = hw.reshape(b_, n, 3, n_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    acc = jnp.einsum(
        "bhnd,bhmd->bhnm", q.astype(jnp.int32), k.astype(jnp.int32),
        precision=jax.lax.Precision.DEFAULT,  # int dot: precision is
        # meaningless, and the global highest default breaks int matmul
        # lowering (see ops/matmul_int8._kernel)
    ).astype(jnp.float32)
    # attn = fq(q*scale @ k^T) at qact_attn1
    attn_c = jnp.clip(
        jnp.round(acc * (s1**2 * hd**-0.5 / s_attn1)), *_I8
    )
    # + relative position bias (bias table fake-quantized at qact_table)
    attn2 = jnp.clip(
        jnp.round((attn_c * s_attn1 + bias_val[None]) / s2),
        *_I8,
    )
    if mask is not None:
        nw = mask.shape[0]
        attn2 = attn2.reshape(b_ // nw, nw, n_heads, n, n) + (mask / s2)[
            None, :, None
        ]
        attn2 = attn2.reshape(b_, n_heads, n, n)
    col = jax.lax.broadcasted_iota(jnp.int32, attn2.shape, 3)
    if lis:
        attn_p = _lis_from_scores(attn2, s2, col, n, 4)
    else:
        attn_p = _fp_softmax_from_scores(attn2, s2, col, n)
    av = jnp.einsum("bhnm,bhmd->bhnd", attn_p, v.astype(jnp.float32))
    out = av.transpose(0, 2, 1, 3).reshape(b_, n, c)
    return jnp.clip(jnp.round(out * (s1 / s3)), *_I8).astype(jnp.int8)


def _bias_values(sb, aq, ws, n, n_heads):
    """Dequantized rel-pos-bias values (H, N, N): the qact_table
    fake-quantized table gathered per position (swin_quant.py:222-235)."""
    table_q = jnp.clip(
        jnp.round(sb["bias_table"] / aq["qact_table"]["scale"]), *_I8
    )
    idx = relative_position_index(ws).reshape(-1)
    return (
        (table_q[idx] * aq["qact_table"]["scale"])
        .reshape(n, n, n_heads)
        .transpose(2, 0, 1)
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy", "interpret", "use_pallas",
                     "pallas_attn", "lis", "fuse_res", "fuse_stem",
                     "reorder", "fold_windows", "int_stem"),
)
def serving_forward(s, qstate, cfg: SwinConfig, policy: QuantPolicy, x,
                    interpret: bool = False, use_pallas: bool = True,
                    pallas_attn: bool = True, lis: bool | None = None,
                    fuse_res: bool = True, fuse_stem: bool = False,
                    reorder: str = "real", fold_windows: bool = False,
                    int_stem: bool = False):
    """Run the Swin int8 pipeline on an image batch (host-normalized f32,
    or RAW uint8 after ``attach_u8_ingest``); returns f32 logits.

    ``pallas_attn`` (default ON): the fused Pallas window-attention kernel —
    bit-identical to the XLA path on chip and 35% faster end to end
    (1937 vs 1433 img/s, Swin-T batch 64, tools/ab_tpu.py 2026-08-16).

    ``lis``: override the policy's Log-Int-Softmax switch at serving time
    (lis=False runs the fp softmax over dequantized scores on the same
    calibrated state — the reference's Config(lis=False) configuration,
    /root/reference/config.py:32-43 — mirroring serving.serving_forward's
    first-class pair).

    ``fuse_res`` (default ON): run the two per-block residual junctions as
    fused kernels instead of XLA elementwise + standalone LN passes —
    attention side via ops/intln.int_res_ln_requant (the window reorder
    blocks matmul fusion), mlp side via ops/matmul_ln.int8_matmul_res_ln
    emitting the NEXT block's norm1 codes (ViT's junction treatment,
    serving.py). Same hoisted-reciprocal serving math; differs from the
    unfused path only at 1-ulp divide knife edges.

    ``fuse_stem`` (default OFF — A/B'd a wash on chip, 2514 vs 2503 img/s
    Swin-T batch 64 2026-08-17: Mosaic already hides the staged stem's
    passes behind compute): run the patch stem as one kernel
    (ops/swin_stem.py), bit-exact-tested against its twin either way.

    ``fold_windows``: feed the attention kernel RASTER-layout qkv and let
    it relayout contiguous row-strips to windows in VMEM
    (ops/attention_lis.swin_lis_attention_folded) — the XLA
    window_partition/reverse copies (2.11 ms = 8.6% of Swin-T e2e, the
    reorder-bypass probe) never happen; shifted blocks keep their two
    rolls. qkv/proj then run on raster token order (same rows, same math).
    Bit-identical to the two-step path in interpret mode, but **the
    current Mosaic toolchain refuses to lower it on chip** (2026-08-19:
    "unsupported shape cast" on the strip relayout's sublane split — see
    the kernel docstring). Kept as the interpret-verified recipe; never
    flipped on by default.

    The image is fake-quantized by qact_input (every Swin constructor
    passes input_quant=True — swin_quant.py:697-705,930,957,984), then the
    patch conv runs fp on the quantized image against fake-quantized
    weights; everything downstream is int8 codes.

    ``int_stem`` (takes precedence over ``fuse_stem``): run the patch stem
    as an int8 MXU matmul on the input CODES with the requant fused into
    the epilogue (the ViT embed treatment, legal now that qact_input
    exists) — exact int32 accumulation where the fp stem rounds in f32, so
    it differs from the fp stem at round-to-nearest knife edges only.
    A nonzero input zero-point folds into the bias exactly (derivation at
    the call site). Default set by on-chip A/B.
    """
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    mm_res_ln = int8_matmul_res_ln if use_pallas else int8_matmul_res_ln_ref
    res_ln = int_res_ln_requant if use_pallas else int_res_ln_requant_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    rl_kw = {"interpret": interpret} if use_pallas else {}
    # "bypass" (timing-only, tools/ceiling_swin.py) must survive the
    # normalization; everything else collapses to a plain bool so the jit
    # static-arg cache sees one key per real mode.
    if lis is None:
        lis = bool(policy.int_softmax)
    elif lis == "bypass":
        # the probe only exists in the Pallas kernels' head loop; the XLA
        # fallback would silently run the LIS chain and corrupt the probe.
        # ValueError, not assert — asserts strip under python -O (the
        # ops/attention_lis.py lis_bits guard precedent)
        if not (pallas_attn and use_pallas):
            raise ValueError("lis='bypass' needs the Pallas attention path "
                             "(pallas_attn=True, use_pallas=True)")
    else:
        lis = bool(lis)
    b = x.shape[0]
    if x.dtype == jnp.uint8:
        # RAW uint8 ingestion: replay the host normalize on device
        # (bit-identical; see attach_u8_ingest)
        x = _u8_dequant(s, x)
    # input fake-quant (qact_input, swin_quant.py:884-886) — same formula
    # as the simulation's _fq so serving tracks it bit for bit here
    q0 = jnp.clip(jnp.round(x / s["s_input"] + s["zp_input"]), *_I8)
    x = (q0 - s["zp_input"]) * s["s_input"]

    sq_bn = qstate["patch_qact_bn"]["scale"]
    if int_stem:
        # int8 patch stem: input CODES @ w_q on the int8 MXU, requant to
        # patch_qact_bn codes fused into the epilogue (the ViT embed
        # treatment). The input zero-point folds into the bias exactly:
        # (q0-zp)@Wᵀ·s·sw = q0@Wᵀ·s·sw − zp·s·(sw·Σ_k w[:,k]), so a nonzero
        # zp (asymmetric input observer, imported reference state) costs one
        # weight-column reduction, not correctness.
        pc = _patches(q0.astype(jnp.int8), cfg.patch_size)
        wsum = jnp.sum(s["patch"]["w_q"].astype(jnp.float32), axis=1)
        zp_b = s["zp_input"] * s["s_input"] * s["patch"]["sw"] * wsum
        xc = mm(
            pc.reshape(-1, pc.shape[-1]), s["patch"]["w_q"],
            s["s_input"] * s["patch"]["sw"] / sq_bn,
            (s["patch_b"] - zp_b) / sq_bn, **mm_kw,
        ).reshape(b, pc.shape[1], -1)
        xc = _iln(xc, sq_bn, s["patch_norm"], qstate["patch_qact"]["scale"],
                  interpret=interpret, use_pallas=use_pallas)
    elif fuse_stem and use_pallas:
        # one kernel: f32 matmul + bias + requant + patch-norm int-LN
        # (ops/swin_stem.py; 2.2 ms of staged prologue otherwise)
        pw = s["patch"]["w_q"].astype(jnp.float32) * s["patch"]["sw"][:, None]
        px = _patches(x, cfg.patch_size)
        xc = fused_swin_stem(
            px.reshape(-1, px.shape[-1]), pw, s["patch_b"],
            sq_bn, s["patch_norm"]["w"],
            s["patch_norm"]["b"], qstate["patch_qact"]["scale"],
            interpret=interpret,
        ).reshape(b, px.shape[1], -1)
    else:
        # fp patch stem against fake-quantized weights (sim parity)
        pw = s["patch"]["w_q"].astype(jnp.float32) * s["patch"]["sw"][:, None]
        px = _patches(x, cfg.patch_size)
        h = px @ pw.T + s["patch_b"]
        xc = jnp.clip(jnp.round(h / sq_bn), *_I8).astype(jnp.int8)
        xc = _iln(xc, sq_bn, s["patch_norm"], qstate["patch_qact"]["scale"],
                  interpret=interpret, use_pallas=use_pallas)
    s_prev = qstate["patch_qact"]["scale"]

    final_ln = None
    for i, st in enumerate(s["stages"]):
        res = cfg.stage_res(i)
        ws = min(cfg.window_size, res)
        heads = cfg.num_heads[i]
        sqs = qstate["stages"][i]
        nblk = len(st["blocks"])
        h_ln = None  # norm1 codes carried out of the fused fc2 junction
        for j, sb in enumerate(st["blocks"]):
            bq = sqs["blocks"][j]
            shift = 0 if (j % 2 == 0 or res <= cfg.window_size) else ws // 2
            bs, l, c = xc.shape
            shortcut = xc
            if h_ln is None:
                h = _iln(xc, s_prev, sb["norm1"], bq["qact1"]["scale"],
                         interpret=interpret, use_pallas=use_pallas)
            else:
                h = h_ln
            aq = bq["attn"]
            mask = (
                jnp.asarray(shift_attn_mask(res, res, ws, shift)) if shift else None
            )
            folded = (fold_windows and use_pallas and pallas_attn
                      and res > ws and reorder == "real")
            if folded:
                # zero-copy windowing: qkv/proj run on raster token order
                # (per-row math is layout-independent); the attention
                # kernel fetches row-strips and windows them in VMEM.
                hd = c // heads
                hq = mm(
                    h.reshape(-1, c),
                    sb["qkv"]["w_q"],
                    bq["qact1"]["scale"] * sb["qkv"]["sw"]
                    / aq["qact1"]["scale"],
                    sb["qkv_b"] / aq["qact1"]["scale"],
                    **mm_kw,
                ).reshape(bs, res, res, 3 * c)
                if shift:
                    hq = jnp.roll(hq, (-shift, -shift), axis=(1, 2))
                hw4 = swin_lis_attention_folded(
                    hq,
                    _bias_values(sb, aq, ws, ws * ws, heads),
                    None if mask is None else mask / aq["qact2"]["scale"],
                    heads,
                    ws,
                    aq["qact1"]["scale"] ** 2 * hd**-0.5
                    / aq["qact_attn1"]["scale"],
                    aq["qact_attn1"]["scale"],
                    aq["qact2"]["scale"],
                    aq["qact1"]["scale"] / aq["qact3"]["scale"],
                    lis=lis,
                    interpret=interpret,
                )
                if shift:
                    hw4 = jnp.roll(hw4, (shift, shift), axis=(1, 2))
                h = mm(
                    hw4.reshape(-1, c),
                    sb["proj"]["w_q"],
                    aq["qact3"]["scale"] * sb["proj"]["sw"]
                    / aq["qact4"]["scale"],
                    sb["proj_b"] / aq["qact4"]["scale"],
                    **mm_kw,
                ).reshape(bs, l, c)
            else:
                if reorder == "bypass":
                    # TIMING-ONLY (tools): group 49 CONSECUTIVE tokens
                    # instead of spatial windows — same shapes, same DMA,
                    # same compute, zero permutation copies. The e2e delta
                    # vs "real" is the in-situ cost of partition/reverse/
                    # roll. MATH IS WRONG for real windows; never a
                    # serving mode.
                    hw = h.reshape(-1, ws, ws, c)
                else:
                    h = h.reshape(bs, res, res, c)
                    if shift:
                        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
                    hw = window_partition(h, ws)
                hw = mm(
                    hw.reshape(-1, c),
                    sb["qkv"]["w_q"],
                    bq["qact1"]["scale"] * sb["qkv"]["sw"]
                    / aq["qact1"]["scale"],
                    sb["qkv_b"] / aq["qact1"]["scale"],
                    **mm_kw,
                ).reshape(-1, ws * ws, 3 * c)
                if pallas_attn and use_pallas:
                    aq2 = bq["attn"]
                    hd = c // heads
                    hw = swin_lis_attention(
                        hw,
                        _bias_values(sb, aq2, ws, ws * ws, heads),
                        None if mask is None
                        else mask / aq2["qact2"]["scale"],
                        heads,
                        (res // ws) ** 2,
                        aq2["qact1"]["scale"] ** 2 * hd**-0.5
                        / aq2["qact_attn1"]["scale"],
                        aq2["qact_attn1"]["scale"],
                        aq2["qact2"]["scale"],
                        aq2["qact1"]["scale"] / aq2["qact3"]["scale"],
                        lis=lis,
                        interpret=interpret,
                    )
                else:
                    hw = _window_attention_codes(hw, sb, bq, mask, lis, heads)
                hw = mm(
                    hw.reshape(-1, c),
                    sb["proj"]["w_q"],
                    aq["qact3"]["scale"] * sb["proj"]["sw"]
                    / aq["qact4"]["scale"],
                    sb["proj_b"] / aq["qact4"]["scale"],
                    **mm_kw,
                ).reshape(-1, ws, ws, c)
                if reorder == "bypass":
                    h = hw.reshape(bs, l, c)
                else:
                    h = window_reverse(hw.reshape(-1, ws * ws, c), ws, res, res)
                    if shift:
                        h = jnp.roll(h, (shift, shift), axis=(1, 2))
                    h = h.reshape(bs, l, c)
            # residual requant-add → block qact2 codes → norm2 codes
            if fuse_res:
                xc_f, h = res_ln(
                    shortcut.reshape(-1, c), s_prev, h.reshape(-1, c),
                    aq["qact4"]["scale"], bq["qact2"]["scale"],
                    sb["norm2"]["w"], sb["norm2"]["b"],
                    bq["qact3"]["scale"], 1.0, **rl_kw,
                )
                xc = xc_f.reshape(bs, l, c)
            else:
                val = (
                    shortcut.astype(jnp.float32) * s_prev
                    + h.astype(jnp.float32) * aq["qact4"]["scale"]
                )
                xc = jnp.clip(jnp.round(val / bq["qact2"]["scale"]), *_I8).astype(
                    jnp.int8
                )
                h = _iln(xc, bq["qact2"]["scale"], sb["norm2"],
                         bq["qact3"]["scale"], interpret=interpret,
                         use_pallas=use_pallas).reshape(-1, c)
            h = mm(
                h,
                sb["fc1"]["w_q"],
                bq["qact3"]["scale"] * sb["fc1"]["sw"],
                sb["fc1_b"],
                out_inv=1.0 / bq["mlp_qact1"]["scale"],
                gelu=True,
                **mm_kw,
            )
            # fc2 + residual; when an LN follows in the SAME token layout
            # (the next block's norm1, or the model-final norm), fuse it into
            # the matmul epilogue and carry its codes forward
            last_stage = i == len(s["stages"]) - 1
            if fuse_res and (j + 1 < nblk or (last_stage and "downsample"
                                              not in st)):
                if j + 1 < nblk:
                    ln_p = st["blocks"][j + 1]["norm1"]
                    ln_out = sqs["blocks"][j + 1]["qact1"]["scale"]
                else:
                    ln_p = s["norm"]
                    ln_out = qstate["qact2"]["scale"]
                xc_f, h_f = mm_res_ln(
                    h,
                    sb["fc2"]["w_q"],
                    bq["mlp_qact1"]["scale"] * sb["fc2"]["sw"]
                    / bq["mlp_qact2"]["scale"],
                    sb["fc2_b"] / bq["mlp_qact2"]["scale"],
                    xc.reshape(-1, c),
                    bq["mlp_qact2"]["scale"], bq["qact2"]["scale"],
                    bq["qact4"]["scale"],
                    ln_p["w"], ln_p["b"], ln_out, 1.0, **mm_kw,
                )
                xc = xc_f.reshape(bs, l, c)
                if j + 1 < nblk:
                    h_ln = h_f.reshape(bs, l, c)
                else:
                    final_ln = h_f.reshape(bs, l, c)
            else:
                h = mm(
                    h,
                    sb["fc2"]["w_q"],
                    bq["mlp_qact1"]["scale"] * sb["fc2"]["sw"]
                    / bq["mlp_qact2"]["scale"],
                    sb["fc2_b"] / bq["mlp_qact2"]["scale"],
                    **mm_kw,
                ).reshape(bs, l, c)
                val = (
                    xc.astype(jnp.float32) * bq["qact2"]["scale"]
                    + h.astype(jnp.float32) * bq["mlp_qact2"]["scale"]
                )
                xc = jnp.clip(jnp.round(val / bq["qact4"]["scale"]), *_I8).astype(
                    jnp.int8
                )
                h_ln = None
            s_prev = bq["qact4"]["scale"]
        if "downsample" in st:
            dq = sqs["downsample"]
            xc = _merge_patches(xc, res)
            xc = _iln(xc, s_prev, st["downsample"]["norm"], dq["qact1"]["scale"],
                      expand=4, interpret=interpret, use_pallas=use_pallas)
            c2 = xc.shape[-1]
            xc = mm(
                xc.reshape(-1, c2),
                st["downsample"]["red"]["w_q"],
                dq["qact1"]["scale"] * st["downsample"]["red"]["sw"]
                / dq["qact2"]["scale"],
                jnp.zeros((c2 // 2,)),
                **mm_kw,
            ).reshape(b, -1, c2 // 2)
            s_prev = dq["qact2"]["scale"]

    if final_ln is None:
        final_ln = _iln(xc, s_prev, s["norm"], qstate["qact2"]["scale"],
                        interpret=interpret, use_pallas=use_pallas)
    # token average → qact3 codes (swin_quant.py:904-905)
    mean_val = (final_ln.astype(jnp.float32).mean(axis=1)
                * qstate["qact2"]["scale"])
    c3 = jnp.clip(jnp.round(mean_val / qstate["qact3"]["scale"]), *_I8).astype(
        jnp.int8
    )
    logits_c = mm(
        c3,
        s["head"]["w_q"],
        qstate["qact3"]["scale"] * s["head"]["sw"] / qstate["act_out"]["scale"],
        s["head_b"] / qstate["act_out"]["scale"],
        **mm_kw,
    )
    return logits_c.astype(jnp.float32) * qstate["act_out"]["scale"]
