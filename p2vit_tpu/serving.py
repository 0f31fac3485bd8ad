"""Int8 serving pipeline: run the calibrated ViT on integer codes.

The production counterpart of the fake-quant simulation in models/vit.py.
``convert`` specializes (params, QuantState, bit_config) into a
``ServingState`` of int8 weight codes + fused requant constants;
``serving_forward`` then runs the network with:

  * activations carried as int8 codes end to end,
  * Pallas int8 MXU matmuls with the PoT shift-requant (and fc1-GELU)
    epilogues (ops/matmul_int8.py),
  * the fused Log-Int-Softmax attention kernel (ops/attention_lis.py),
  * integer LayerNorm evaluated directly on codes (the M·2^-N multiply-shift
    of QIntLayerNorm, /root/reference/models/ptq/layers.py:294-337),
  * residual requantization as code arithmetic.

Numerics: every inter-layer scale the PoT search produces is a power of
two, so requant multiplies are exact shifts; the int32 accumulators are
EXACT where the f32 simulation rounds (K > 2^24/127² terms), so serving
output can differ from the simulation at round-to-nearest boundaries only.
Parity is asserted statistically in tests (argmax agreement + small relative
error), not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import QuantPolicy
from .models.common import ViTConfig, extract_patches
from .ops.attention_lis import (
    lis_attention,
    lis_attention_fused,
    lis_attention_qkv_fused,
    lis_attention_ref,
)
from .ops.matmul_int8 import int8_matmul_requant, int8_matmul_requant_ref
from .ops.intln import ln_mn_chain
from .ops.layer_fused import fused_vit_layer
from .ops.matmul_ln import int8_matmul_res_ln, int8_matmul_res_ln_ref

_I8 = (-128, 127)


def _wcodes(w, scale, qmin, qmax):
    """Weight → int8 codes under a per-out-channel PoT scale."""
    return jnp.clip(jnp.round(w / scale[:, None]), qmin, qmax).astype(jnp.int8)


def _bit_bounds(bit):
    return (-8, 7) if bit == 4 else (-128, 127)


# ---------------------------------------------------------------------------
# uint8 image ingestion (production serving entry)
# ---------------------------------------------------------------------------

def u8_ingest_consts(mean, std, s_input=None):
    """Constants for ingesting RAW uint8 images instead of host-normalized
    f32 (4x smaller host->device transfer; the host skips normalize too).

    Host-pipeline parity: data.build_transform emits
    ``x = (u/255 - mean)/std`` in f32 (data.py, replicating torchvision
    ToTensor+Normalize — reference test_quant.py:565-597). The serving
    entry replays that EXACT f32 op sequence on device, so a uint8 batch
    yields bit-identical input codes to the host-normalized f32 batch
    (tests/test_u8_ingest.py).

    With ``s_input`` (ViT/DeiT qact_input scale), also derives the fused
    single-affine form ``clip(round(u*a + b))`` — normalize and input
    quantize composed into one multiply-add — plus the exhaustive
    256-value golden table per channel, so the affine can be PROVEN exact
    on the serving backend (``u8_ingest_exact(affine=True)``) before use: XLA may fuse
    the mul+add into an FMA, whose single rounding can flip knife edges
    vs the literal sequence, so exactness is checked by running, never
    assumed.
    """
    mean = np.asarray(mean, np.float32).reshape(3)
    std = np.asarray(std, np.float32).reshape(3)
    out = {"mean": jnp.asarray(mean), "std": jnp.asarray(std)}
    if s_input is not None:
        s_in = np.float32(np.asarray(s_input).reshape(()))
        v = np.arange(256, dtype=np.float32)[:, None]  # (256, 1)
        x = (v / np.float32(255.0) - mean[None]) / std[None]  # host sequence
        lut = np.clip(np.round(x / s_in), -128, 127).astype(np.int8)
        a = np.float32(1.0) / (np.float32(255.0) * std * s_in)
        b = -mean / (std * s_in)
        out.update(
            a=jnp.asarray(a, jnp.float32),
            b=jnp.asarray(b, jnp.float32),
            lut=jnp.asarray(lut),
        )
    return out


def attach_u8_ingest(s, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """Enable uint8 ingestion on a converted ServingState (in place).

    ``mean``/``std`` must be the host pipeline's per-family normalization
    (models.PREPROCESS) — ingestion replays them on device.
    """
    s["u8"] = u8_ingest_consts(mean, std, s_input=s["s_input"])
    return s


def _u8_exact_codes(x, u8, s_input):
    """(B, 3, H, W) uint8 -> input codes via the literal host sequence
    (u/255 -> normalize -> quantize); bit-identical to f32 ingestion."""
    f = x.astype(jnp.float32) / jnp.float32(255.0)
    f = (f - u8["mean"][:, None, None]) / u8["std"][:, None, None]
    return jnp.clip(jnp.round(f / s_input), *_I8).astype(jnp.int8)


def _u8_affine_codes(x, u8):
    """(B, 3, H, W) uint8 -> input codes via the fused affine. Use only
    after ``u8_ingest_exact(s, affine=True)`` returned True on this backend."""
    f = x.astype(jnp.float32)
    f = f * u8["a"][:, None, None] + u8["b"][:, None, None]
    return jnp.clip(jnp.round(f), *_I8).astype(jnp.int8)


def u8_ingest_exact(s, affine: bool = False) -> bool:
    """Exhaustively prove the device-side u8 ingestion (the literal op
    sequence, or with ``affine=True`` the fused multiply-add) reproduces
    the HOST-computed golden table for every uint8 value x channel on the
    CURRENT backend — 768 cases, one tiny jit. The input domain is finite,
    so this is a proof, not a sample: run it once per backend before
    trusting bit-parity claims there (e.g. TPU f32 divide may not be
    correctly rounded the way host/CPU IEEE ops are)."""
    u8 = s["u8"]
    v = jnp.broadcast_to(
        jnp.arange(256, dtype=jnp.uint8)[None, None, :, None], (1, 3, 256, 1)
    )
    if affine:
        fn = lambda t: _u8_affine_codes(t, u8)  # noqa: E731
    else:
        fn = lambda t: _u8_exact_codes(t, u8, s["s_input"])  # noqa: E731
    got = jax.jit(fn)(v)
    want = jnp.transpose(u8["lut"])[None, :, :, None]  # (1, 3, 256, 1)
    return bool(jax.device_get((got == want).all()))


def _input_codes(s, x, u8_affine: bool = False):
    """Image batch (f32 normalized, or raw uint8 when s carries 'u8'
    ingestion constants) -> qact_input int8 codes."""
    if x.dtype == jnp.uint8:
        if "u8" not in s:
            raise ValueError(
                "uint8 batch but no ingestion constants — call "
                "serving.attach_u8_ingest(s, mean, std) after convert()"
            )
        if u8_affine:
            return _u8_affine_codes(x, s["u8"])
        return _u8_exact_codes(x, s["u8"], s["s_input"])
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / s["s_input"]), *_I8
    ).astype(jnp.int8)


def convert(params, qstate, cfg: ViTConfig, policy: QuantPolicy, bit_config) -> dict:
    """Specialize calibrated state to a fixed bit_config for serving.

    The simulation path keeps the bit choice traced (search-time); serving
    freezes it (deploy-time), mirroring how the reference's accelerator
    would be programmed per searched config.
    """
    assert policy.int_norm, (
        "the int8 serving path requires the PTF integer-LN pipeline; run "
        "the simulation path for ptf=False ablations"
    )
    bits = [int(b) for b in bit_config]
    n_idx = {4: 0, 8: 1}

    def smooth_layer(state, w, b, bit):
        """qkv/fc1-style layer with cached per-bit smoothquant."""
        j = n_idx[bit]
        cs = state["channel_scale"][j]
        sw = state["wscale"][j][2 + j]
        qmin, qmax = _bit_bounds(bit)
        return {
            "w_q": _wcodes(w * cs[None, :], sw, qmin, qmax),
            "sw": sw,
            "s_act": state["qact0_scale"][j],
            "cs": cs,
            "bias": b,
        }

    def plain_layer(wscale_dic, w, b, bit):
        j = n_idx[bit]
        sw = wscale_dic[2 + j]
        qmin, qmax = _bit_bounds(bit)
        return {"w_q": _wcodes(w, sw, qmin, qmax), "sw": sw, "bias": b}

    s: dict = {"s_input": qstate["qact_input"]["scale"]}
    # patch embed
    pb = bits[0]
    s["patch"] = plain_layer(
        qstate["patch"]["wscale"], params["patch_embed"]["w"],
        params["patch_embed"]["b"], pb,
    )
    s["patch"]["s_out"] = qstate["patch"]["qact"]["scale"]
    s2 = qstate["qact_embed"]["scale"]
    s["cls_codes"] = jnp.clip(
        jnp.round(params["cls_token"] / s2), *_I8
    ).astype(jnp.int8)
    s["s_embed"] = s2
    sp = qstate["qact_pos"]["scale"]
    s["pos_codes"] = jnp.clip(jnp.round(params["pos_embed"] / sp), *_I8)
    s["s_pos"] = sp
    s["s_qact1"] = qstate["qact1"]["scale"]

    s["blocks"] = []
    for i, blk in enumerate(params["blocks"]):
        bq = qstate["blocks"][i]
        aq, mq = bq["attn"], bq["mlp"]
        b_qkv, b_proj, b_fc1, b_fc2 = bits[1 + 4 * i : 5 + 4 * i]
        jq, jm = n_idx[b_qkv], n_idx[b_fc1]
        sb = {
            "norm1_w": blk["norm1"]["w"], "norm1_b": blk["norm1"]["b"],
            "norm2_w": blk["norm2"]["w"], "norm2_b": blk["norm2"]["b"],
            "qkv": smooth_layer(aq, blk["qkv"]["w"], blk["qkv"]["b"], b_qkv),
            "s_qact1": aq["qact1"]["scale"],
            "s_attn1": aq["qact_attn1"]["scale"],
            "s_qact2a": aq["qact2"]["scale"],
            "proj": plain_layer(aq["proj_wscale"], blk["proj"]["w"], blk["proj"]["b"], b_proj),
            "s_qact3": aq["qact3"]["scale"],
            "s_res1": bq["qact2"]["scale"],
            "mlp_fc1": smooth_layer(mq, blk["fc1"]["w"], blk["fc1"]["b"], b_fc1),
            "s_mq1": mq["qact1"]["scale"],
            "fc2": plain_layer(mq["fc2_wscale"], blk["fc2"]["w"], blk["fc2"]["b"], b_fc2),
            "s_mq2": mq["qact2"]["scale"],
            "s_res2": bq["qact4"]["scale"],
        }
        # norm2 out_quantizer_scale quirk (see models/vit.py quant_forward)
        cs_m = mq["channel_scale"][jm]
        norm2_cs = aq["channel_scale"][jq] if policy.norm2_attn_channel_scale_compat else cs_m
        sb["norm2_cs"] = norm2_cs
        sb["norm2_ratio"] = norm2_cs / cs_m
        s["blocks"].append(sb)
    s["norm_w"] = params["norm"]["w"]
    s["norm_b"] = params["norm"]["b"]
    s["s_qact2"] = qstate["qact2"]["scale"]
    s["head"] = plain_layer(qstate["head_wscale"], params["head"]["w"],
                            params["head"]["b"], bits[-1])
    s["s_out"] = qstate["act_out"]["scale"]
    s["bits"] = tuple(bits)
    s["lis"] = 1 if policy.int_softmax else 0
    return s


def weight_only_params(params, qstate, cfg: ViTConfig, policy: QuantPolicy,
                       bit_config) -> dict:
    """Weight-only quantized serving (W{4,8}, float activations): the EXACT
    weight codes the int8 pipeline serves, dequantized back into the
    original param pytree for the bf16 XLA forward.

    Why this mode exists: below the measured int8-over-bf16 crossover
    (batch <128 ViT / <4 Swin) and for C<384 ViTs at every batch, the
    fully-quantized pipeline is SLOWER than bf16 XLA (BENCH.md crossover
    tables; plan.py encodes the rule) — weight-only serving runs at bf16
    speed by construction while deploying the same searched quantized
    weights. Activations stay float, so its quantization error is strictly
    a subset of the fully-quantized path's. The reference has no such mode
    (it has no serving path at all, SURVEY §0); this is the TPU framework's
    fallback for the regimes its own measurements say int8 loses.

    SmoothQuant fold: the int8 path serves fq(w·cs) against SMOOTHED
    activation codes of x/cs; weight-only consumes unsmoothed float
    activations, so the effective weight is fq(w·cs)/cs — the smoothing
    cancels in the product exactly as in the fp algebra.

    Returns an f32 params pytree; cast and serve:
        pw = serving.weight_only_params(params, qstate, cfg, policy, bits)
        pw16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), pw)
        logits = vit.fp_forward(pw16, cfg, x.astype(jnp.bfloat16))

    The round-trip pin (tests/test_serving.py): requantizing these weights
    with the serving scales reproduces convert()'s codes bit for bit.
    """
    if not policy.int_norm:
        raise ValueError(
            "weight-only serving freezes convert()'s weight codes, which "
            "are defined by the PTF integer-LN calibration pipeline "
            "(policy.int_norm=True): ptf=False changes the LN-output "
            "observers and therefore the SmoothQuant channel scales the "
            "codes are built from. Recalibrate with ptf=True, or run the "
            "simulation path for ptf=False ablations.")
    s = convert(params, qstate, cfg, policy, bit_config)

    def smooth_eff(layer):
        return (layer["w_q"].astype(jnp.float32) * layer["sw"][:, None]
                / layer["cs"][None, :])

    def plain_eff(layer):
        return layer["w_q"].astype(jnp.float32) * layer["sw"][:, None]

    new = dict(params)
    new["patch_embed"] = {**params["patch_embed"],
                          "w": plain_eff(s["patch"])}
    new["head"] = {**params["head"], "w": plain_eff(s["head"])}
    blocks = []
    for blk, sb in zip(params["blocks"], s["blocks"]):
        nb = dict(blk)
        nb["qkv"] = {**blk["qkv"], "w": smooth_eff(sb["qkv"])}
        nb["proj"] = {**blk["proj"], "w": plain_eff(sb["proj"])}
        nb["fc1"] = {**blk["fc1"], "w": smooth_eff(sb["mlp_fc1"])}
        nb["fc2"] = {**blk["fc2"], "w": plain_eff(sb["fc2"])}
        blocks.append(nb)
    new["blocks"] = blocks
    return new


def _int_ln_codes(c_in, s_in, w, b, out_scale, ratio, use_pallas=False,
                  interpret=False):
    """Integer LayerNorm on codes → codes of the consumer node.

    The code-domain form of quant/intops.int_layernorm: the producer's codes
    arrive directly (no round(x/in_scale) needed), the M·2^-N epilogue lands
    on the consumer's scale, and ``ratio`` folds any smoothquant mismatch
    (norm2 quirk) before the final clip. On accelerators the fused Pallas
    kernel (ops/intln.py) does the whole thing in two HBM passes.
    """
    c = c_in.shape[-1]
    if use_pallas:
        from .ops.intln import int_ln_requant

        s_in_v = jnp.broadcast_to(jnp.asarray(s_in, jnp.float32), (c,))
        s1 = s_in_v.min()
        mask = jnp.round(s_in_v / s1)
        out = int_ln_requant(
            c_in.reshape(-1, c),
            mask,
            s1,
            w,
            b,
            jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (c,)),
            jnp.broadcast_to(jnp.asarray(ratio, jnp.float32), (c,)),
            interpret=interpret,
        )
        return out.reshape(c_in.shape)
    x_q = c_in.astype(jnp.float32).reshape(-1, c)
    s_in = jnp.broadcast_to(jnp.asarray(s_in, jnp.float32), (c,))
    s1 = s_in.min()
    mask = jnp.round(s_in / s1)
    x_q = x_q * mask
    sx = x_q.sum(axis=-1, keepdims=True)
    sxx = (x_q**2).sum(axis=-1, keepdims=True)
    # shared serving LN chain (ops/intln.ln_mn_chain): exponent-extraction
    # M·2^-N and hoisted /out_scale divides, matching the Pallas kernels bit
    # for bit. (The simulation path's intops.get_mn keeps jnp.log2 and the
    # per-element divides for op-for-op torch parity.)
    osc = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (c,)), 1e-30
    )
    w_os = (jnp.asarray(w, jnp.float32) / osc)[None, :]
    b_os = (jnp.asarray(b, jnp.float32) / osc)[None, :]
    y = ln_mn_chain(x_q, sx, sxx, s1, float(c), w_os, b_os)
    y = y.reshape(c_in.shape)
    return jnp.clip(jnp.round(y * ratio), *_I8).astype(jnp.int8)


def _requant_add(c_a, s_a, c_b, s_b, s_out):
    """codes of fq(a_val + b_val, s_out) — same f32 association as the
    simulation (sum of values, then divide)."""
    val = c_a.astype(jnp.float32) * s_a + c_b.astype(jnp.float32) * s_b
    return jnp.clip(jnp.round(val / s_out), *_I8).astype(jnp.int8)


def stack_layer_consts(s, cfg: ViTConfig):
    """Stack every per-layer constant of the fused-layer kernel along a
    leading depth axis (for lax.scan in serving_forward, and for
    stage-sharding in parallel/pipeline.py). Tuple order matches
    ``apply_fused_layer``'s unpack."""
    n_blocks = len(s["blocks"])

    def _lnn(bi):
        """The LN fused after this layer's fc2: next block's LN1, or the
        final encoder norm after the last block."""
        if bi + 1 < n_blocks:
            nb = s["blocks"][bi + 1]
            nqkv = nb["qkv"]
            return (nb["norm1_w"], nb["norm1_b"],
                    nqkv["s_act"] * nqkv["cs"], 1.0)
        return s["norm_w"], s["norm_b"], s["s_qact2"], 1.0

    c_v = cfg.embed_dim
    hid = s["blocks"][0]["mlp_fc1"]["w_q"].shape[0]

    def _stk(fn, shape):
        return jnp.stack(
            [
                jnp.broadcast_to(
                    jnp.asarray(fn(bi, s["blocks"][bi]), jnp.float32), shape
                )
                for bi in range(n_blocks)
            ]
        )

    sprevs = [s["s_qact1"]] + [sb["s_res2"] for sb in s["blocks"][:-1]]
    return (
        jnp.stack([sb["qkv"]["w_q"] for sb in s["blocks"]]),
        _stk(lambda i, sb: sb["qkv"]["s_act"] * sb["qkv"]["sw"] / sb["s_qact1"], (3 * c_v,)),
        _stk(lambda i, sb: sb["qkv"]["bias"] / sb["s_qact1"], (3 * c_v,)),
        _stk(lambda i, sb: sb["s_qact1"] ** 2 * cfg.attn_scale / sb["s_attn1"], ()),
        _stk(lambda i, sb: sb["s_attn1"], ()),
        _stk(lambda i, sb: sb["s_qact1"] / sb["s_qact2a"], ()),
        jnp.stack([sb["proj"]["w_q"] for sb in s["blocks"]]),
        _stk(lambda i, sb: sb["s_qact2a"] * sb["proj"]["sw"] / sb["s_qact3"], (c_v,)),
        _stk(lambda i, sb: sb["proj"]["bias"] / sb["s_qact3"], (c_v,)),
        _stk(lambda i, sb: sb["s_qact3"], (c_v,)),
        _stk(lambda i, sb: sprevs[i], (c_v,)),
        _stk(lambda i, sb: sb["s_res1"], (c_v,)),
        _stk(lambda i, sb: sb["norm2_w"], (c_v,)),
        _stk(lambda i, sb: sb["norm2_b"], (c_v,)),
        _stk(lambda i, sb: sb["mlp_fc1"]["s_act"] * sb["norm2_cs"], (c_v,)),
        _stk(lambda i, sb: sb["norm2_ratio"], (c_v,)),
        jnp.stack([sb["mlp_fc1"]["w_q"] for sb in s["blocks"]]),
        _stk(lambda i, sb: sb["mlp_fc1"]["s_act"] * sb["mlp_fc1"]["sw"], (hid,)),
        _stk(lambda i, sb: sb["mlp_fc1"]["bias"], (hid,)),
        _stk(lambda i, sb: 1.0 / sb["s_mq1"], ()),
        jnp.stack([sb["fc2"]["w_q"] for sb in s["blocks"]]),
        _stk(lambda i, sb: sb["s_mq1"] * sb["fc2"]["sw"] / sb["s_mq2"], (c_v,)),
        _stk(lambda i, sb: sb["fc2"]["bias"] / sb["s_mq2"], (c_v,)),
        _stk(lambda i, sb: sb["s_mq2"], (c_v,)),
        _stk(lambda i, sb: sb["s_res2"], (c_v,)),
        _stk(lambda i, sb: _lnn(i)[0], (c_v,)),
        _stk(lambda i, sb: _lnn(i)[1], (c_v,)),
        _stk(lambda i, sb: _lnn(i)[2], (c_v,)),
        _stk(lambda i, sb: _lnn(i)[3], (c_v,)),
    )


def _embed_fused_consts(s, cfg: ViTConfig):
    """Constants for ops/embed_fused.py, mirroring the four-stage path's
    op chain (embed_codes below) bit for bit."""
    c = cfg.embed_dim
    p = s["patch"]
    sq1 = jnp.broadcast_to(jnp.asarray(s["s_qact1"], jnp.float32), (c,))
    # the [CLS] xc row is image-independent: cls codes + pos row 0 → qact1
    cls_val = (
        s["cls_codes"].astype(jnp.float32) * s["s_embed"]
        + s["pos_codes"][:, :1, :] * s["s_pos"]
    )
    cls_xc = jnp.clip(jnp.round(cls_val / sq1), *_I8).astype(jnp.int8)
    # block-0 LN1 constants in the shared serving form (_int_ln_codes)
    qkv0 = s["blocks"][0]["qkv"]
    s1 = sq1.min()
    osc = jnp.maximum(
        jnp.broadcast_to(
            jnp.asarray(qkv0["s_act"] * qkv0["cs"], jnp.float32), (c,)
        ),
        1e-30,
    )
    return dict(
        s_input=s["s_input"],
        patch_requant=s["s_input"] * p["sw"] / p["s_out"],
        patch_bias=p["bias"] / p["s_out"],
        embed_requant=p["s_out"] / s["s_embed"],
        s_embed=s["s_embed"],
        pos_val=s["pos_codes"][0, 1:, :] * s["s_pos"],
        cls_xc=cls_xc.reshape(1, c),
        s_qact1=sq1,
        ln_mask=jnp.round(sq1 / s1),
        ln_s1=s1,
        ln_w_os=jnp.asarray(s["blocks"][0]["norm1_w"], jnp.float32) / osc,
        ln_b_os=jnp.asarray(s["blocks"][0]["norm1_b"], jnp.float32) / osc,
    )


def embed_codes(s, cfg: ViTConfig, x, use_pallas: bool = True,
                interpret: bool = False, fuse_embed: bool = True,
                u8_affine: bool = False):
    """The serving prologue: image → patch conv → [cls; patches] + pos →
    qact1 codes (``xc``), plus block 0's standalone int-LN1 output (``h``).
    Every later LN is fused into the matmul producing its input.

    ``x`` may be host-normalized f32 or RAW uint8 (after
    ``attach_u8_ingest``); uint8 ingestion replays the host normalize on
    device and is bit-identical (``u8_affine=True`` fuses it into one
    multiply-add — prove with ``u8_ingest_exact(s, affine=True)`` first).

    ``fuse_embed`` (Pallas only): run the whole prologue as ONE kernel
    (ops/embed_fused.py) — bit-identical to the staged path below, and
    ~2.5 ms faster at DeiT-S batch 256 (tools/glue_bench.py put the staged
    prologue at 4.0 ms, ~10% of the forward, mostly inter-stage HBM trips).
    """
    b = x.shape[0]
    c = cfg.embed_dim
    if use_pallas and fuse_embed:
        from .ops.embed_fused import fused_patch_embed

        k = _embed_fused_consts(s, cfg)
        # quantize BEFORE extracting: XLA fuses the qact_input round into
        # the patch transpose, so the reorder moves int8 codes (4x fewer
        # bytes) and the kernel reads a quarter of the patch DMA. Bit-
        # identical to quantizing in-kernel (commutes with the permutation);
        # A/B'd on chip 2026-08-17 (tools/embed_bench.py): 2.85 → 1.54 ms
        # for the DeiT-S batch-256 prologue (e2e 37.2 → 35.8 ms).
        c0 = _input_codes(s, x, u8_affine)
        patches = extract_patches(c0, cfg.patch_size)
        xc, h = fused_patch_embed(
            patches, s["patch"]["w_q"], interpret=interpret, **k
        )
        return h, xc
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    iln = functools.partial(_int_ln_codes, use_pallas=use_pallas,
                            interpret=interpret)
    c0 = _input_codes(s, x, u8_affine)
    patches = extract_patches(c0, cfg.patch_size)  # int8 codes, reordered only

    p = s["patch"]
    c1 = mm(
        patches.reshape(-1, patches.shape[-1]),
        p["w_q"],
        s["s_input"] * p["sw"] / p["s_out"],
        p["bias"] / p["s_out"],
        **mm_kw,
    ).reshape(b, -1, c)

    # [cls; patches] at the embed scale, + positional codes, → qact1 codes
    c_cls = jnp.broadcast_to(s["cls_codes"], (b, 1, c))
    c1 = jnp.clip(jnp.round(c1.astype(jnp.float32) * (p["s_out"] / s["s_embed"])), *_I8)
    xc = jnp.concatenate([c_cls.astype(jnp.float32), c1], axis=1)
    val = xc * s["s_embed"] + s["pos_codes"] * s["s_pos"]
    xc = jnp.clip(jnp.round(val / s["s_qact1"]), *_I8).astype(jnp.int8)

    qkv0 = s["blocks"][0]["qkv"]
    h = iln(
        xc, s["s_qact1"], s["blocks"][0]["norm1_w"], s["blocks"][0]["norm1_b"],
        qkv0["s_act"] * qkv0["cs"], 1.0,
    )
    return h, xc


def head_logits(s, h, use_pallas: bool = True, interpret: bool = False):
    """The serving epilogue: final-norm codes (h[:, 0]) → head → f32 logits."""
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    hd = s["head"]
    logits_c = mm(
        h[:, 0],
        hd["w_q"],
        s["s_qact2"] * hd["sw"] / s["s_out"],
        hd["bias"] / s["s_out"],
        **mm_kw,
    )
    return logits_c.astype(jnp.float32) * s["s_out"]


def _junction(mm, mm_res_ln, mm_kw, resln, h_flat, w, rs, rb, xc_flat,
              *ln_args):
    """One residual junction (proj/fc2 + res + int-LN), with the round-4
    timing-only probe arms (BENCH.md §roofline cross-check):

      True     — production fused kernel.
      "novpu"  — same kernel I/O (res read, both outputs written, dot +
                 requant kept) but the junction multiplies and the whole
                 int-LN chain skipped: the end-to-end delta vs True is the
                 junction chains' IN-SITU VPU cost.
      "nodma"  — plain requant matmul (no res operand, ONE output); the
                 old residual codes are carried through unchanged. Delta
                 vs "novpu" is the junction's in-situ DMA exposure.

    Both probe arms produce WRONG values (timing only); guarded at
    serving_forward."""
    if resln is True:
        return mm_res_ln(h_flat, w, rs, rb, xc_flat, *ln_args, **mm_kw)
    if resln == "novpu":
        return mm_res_ln(h_flat, w, rs, rb, xc_flat, *ln_args,
                         bypass_vpu=True, **mm_kw)
    return xc_flat, mm(h_flat, w, rs, rb, **mm_kw)


def apply_unfused_layer(cfg: ViTConfig, layer, h, xc, lis=True,
                        fuse_qkv=True, use_pallas=True, interpret=False,
                        resln=True):
    """ONE encoder layer on codes via the four-kernel pipeline, driven from
    a stack_layer_consts slice — the lax.scan body of serving_forward's
    scan_layers mode. Same kernels, same constants, same order as the
    unrolled loop (bit-identical; asserted in tests/test_serving.py)."""
    (w_qkv, qr, qb, srq, sat, oro, w_proj, prr, prb, smid, sprev,
     sres1, ln2w, ln2b, ln2o, ln2r, w_fc1, f1r, f1b, f1inv, w_fc2,
     f2r, f2b, smid2, sres2, lnnw, lnnb, lnno, lnnr) = layer
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    mm_res_ln = int8_matmul_res_ln if use_pallas else int8_matmul_res_ln_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    b, n_tok, c = h.shape
    if use_pallas and fuse_qkv:
        h = lis_attention_qkv_fused(
            h, w_qkv, qr, qb, cfg.num_heads, srq, sat, oro, lis=lis,
            interpret=interpret,
        )
    else:
        h2 = mm(h.reshape(-1, c), w_qkv, qr, qb, **mm_kw).reshape(
            b, n_tok, 3 * c
        )
        if use_pallas:
            h = lis_attention_fused(h2, cfg.num_heads, srq, sat, oro, lis=lis,
                                    interpret=interpret)
        else:
            hd = cfg.head_dim
            qkv_c = h2.reshape(b, n_tok, 3, cfg.num_heads, hd).transpose(
                2, 0, 3, 1, 4
            )
            av = lis_attention_ref(
                qkv_c[0].reshape(b * cfg.num_heads, n_tok, hd),
                qkv_c[1].reshape(b * cfg.num_heads, n_tok, hd),
                qkv_c[2].reshape(b * cfg.num_heads, n_tok, hd),
                srq, sat, oro, lis=lis,
            )
            h = (
                av.reshape(b, cfg.num_heads, n_tok, hd)
                .transpose(0, 2, 1, 3)
                .reshape(b, n_tok, c)
            )
    xc2, h = _junction(
        mm, mm_res_ln, mm_kw, resln, h.reshape(-1, c), w_proj, prr, prb,
        xc.reshape(-1, c), smid, sprev, sres1, ln2w, ln2b, ln2o, ln2r,
    )
    h = mm(h, w_fc1, f1r, f1b, out_inv=f1inv, gelu=True, **mm_kw)
    xc3, h = _junction(
        mm, mm_res_ln, mm_kw, resln, h, w_fc2, f2r, f2b, xc2,
        smid2, sres1, sres2, lnnw, lnnb, lnno, lnnr,
    )
    return h.reshape(b, n_tok, c), xc3.reshape(b, n_tok, c)


def apply_fused_layer(cfg: ViTConfig, layer, h, xc, lis=True, interpret=False):
    """Run ONE encoder layer on codes from a stack_layer_consts slice."""
    (w_qkv, qr, qb, srq, sat, oro, w_proj, prr, prb, smid, sprev,
     sres1, ln2w, ln2b, ln2o, ln2r, w_fc1, f1r, f1b, f1inv, w_fc2,
     f2r, f2b, smid2, sres2, lnnw, lnnb, lnno, lnnr) = layer
    return fused_vit_layer(
        h, xc, w_qkv, qr, qb, cfg.num_heads, srq, sat, oro,
        w_proj, prr, prb, smid, sprev, sres1, ln2w, ln2b, ln2o, ln2r,
        w_fc1, f1r, f1b, f1inv, w_fc2, f2r, f2b, smid2, sres2,
        lnnw, lnnb, lnno, lnnr,
        lis=lis, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret", "use_pallas", "lis", "fuse_qkv",
                     "fuse_layer", "fuse_embed", "scan_layers", "u8_affine",
                     "resln"),
)
def serving_forward(s, cfg: ViTConfig, x, interpret: bool = False,
                    use_pallas: bool = True, lis: bool = True,
                    fuse_qkv: bool = True, fuse_layer: bool = False,
                    fuse_embed: bool = True, scan_layers: bool | None = None,
                    u8_affine: bool = False, resln=True):
    """Run the int8 pipeline on an image batch; returns f32 logits.

    ``x``: host-normalized f32, or RAW uint8 after ``attach_u8_ingest``
    (bit-identical ingestion on device; 4x smaller host->device transfer).
    ``u8_affine``: fuse the uint8 normalize+quantize into one multiply-add
    — prove exactness on this backend with ``u8_ingest_exact(s, affine=True)`` first.

    ``lis``: Log-Int-Softmax on (the reference default) or the LIS-off fp
    softmax over dequantized attention codes (Config(lis=False),
    /root/reference/config.py:32-43; layers.py:439).
    ``fuse_qkv``: compute the qkv projection INSIDE the attention kernel
    (bit-identical; saves the HBM round trip of the (B,N,3C) qkv codes).
    Default ON: the on-chip A/B (tools/ab_tpu.py, 2026-08-16) measured
    5554 vs 5322 img/s on DeiT-S batch 256.
    ``fuse_layer``: run each encoder layer as ONE Pallas kernel
    (ops/layer_fused.py) — bit-identical to the four-kernel pipeline, and
    ~4× less int8 HBM boundary traffic (the measured bottleneck; see the
    module docstring there). Takes precedence over ``fuse_qkv``.
    ``fuse_embed``: run the whole prologue as ONE kernel
    (ops/embed_fused.py; bit-identical, default ON — see embed_codes).
    ``scan_layers``: drive the four-kernel pipeline through ONE lax.scan
    over depth-stacked layer constants instead of unrolling — every kernel
    compiles once, so the program size is depth-independent (ViT-L's
    24-layer unroll exceeded the axon tunnel's compile-request limit, and
    Mosaic compiles each pallas_call instance separately). Bit-identical to
    the unrolled loop. Default: on for depth > 12 (compile-time win),
    unrolled otherwise.
    """
    if lis == "bypass" and not use_pallas:
        # The timing-only probe (tools/ceiling_bench.py) exists only in the
        # Pallas kernels' head loop; the XLA fallback (lis_attention_ref /
        # heads_attention reference path) would treat the truthy string as
        # lis=True and silently run the full LIS chain while claiming to be
        # the bypass baseline. ValueError, not assert — asserts strip under
        # python -O (same precedent as serving_swin.py's bypass guard).
        raise ValueError("lis='bypass' needs the Pallas path (use_pallas=True)")
    if resln is not True:
        # timing-only probe arms for the residual junctions (see _junction);
        # values are WRONG by design, so gate hard: Pallas four-kernel path
        # only (the fused-layer kernel has no probe arms), never the XLA
        # fallback (same precedent as the lis='bypass' guard above).
        if resln not in ("novpu", "nodma"):
            raise ValueError(f"resln must be True|'novpu'|'nodma', got {resln!r}")
        if not use_pallas or fuse_layer:
            raise ValueError(
                "resln probe arms need the Pallas four-kernel path "
                "(use_pallas=True, fuse_layer=False)"
            )
    if scan_layers is None:
        scan_layers = len(s["blocks"]) > 12
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    mm_res_ln = int8_matmul_res_ln if use_pallas else int8_matmul_res_ln_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    iln = functools.partial(_int_ln_codes, use_pallas=use_pallas, interpret=interpret)

    b = x.shape[0]
    c = cfg.embed_dim
    n_tok = cfg.seq_len
    h, xc = embed_codes(s, cfg, x, use_pallas=use_pallas, interpret=interpret,
                        fuse_embed=fuse_embed, u8_affine=u8_affine)
    s_prev = s["s_qact1"]
    n_blocks = len(s["blocks"])
    if use_pallas and fuse_layer:
        # whole layer in one kernel (ops/layer_fused.py); the per-junction
        # requant constants are exactly the four-kernel pipeline's (see the
        # branches below). lax.scan over stacked per-layer constants: every
        # layer is the same kernel shape, so Mosaic compiles it ONCE instead
        # of 12 times (a 378 s → ~35 s serving compile on the tunnel).
        layers = stack_layer_consts(s, cfg)

        def body(carry, layer):
            return apply_fused_layer(cfg, layer, *carry, lis=lis,
                                     interpret=interpret), None

        (h, xc), _ = jax.lax.scan(body, (h, xc), layers)
        blocks_iter = []  # fall through to the shared head/tail below
    elif scan_layers:
        layers = stack_layer_consts(s, cfg)

        def body(carry, layer):
            return (
                apply_unfused_layer(
                    cfg, layer, *carry, lis=lis, fuse_qkv=fuse_qkv,
                    use_pallas=use_pallas, interpret=interpret, resln=resln,
                ),
                None,
            )

        (h, xc), _ = jax.lax.scan(body, (h, xc), layers)
        blocks_iter = []
    else:
        blocks_iter = list(enumerate(s["blocks"]))

    for bi, sb in blocks_iter:
        qkv = sb["qkv"]
        if use_pallas and fuse_qkv:
            # qkv projection inside the attention kernel: the (B,N,3C)
            # codes never visit HBM
            h = lis_attention_qkv_fused(
                h, qkv["w_q"],
                qkv["s_act"] * qkv["sw"] / sb["s_qact1"],
                qkv["bias"] / sb["s_qact1"],
                cfg.num_heads,
                sb["s_qact1"] ** 2 * cfg.attn_scale / sb["s_attn1"],
                sb["s_attn1"],
                sb["s_qact1"] / sb["s_qact2a"],
                lis=lis,
                interpret=interpret,
            )
        elif use_pallas:
            h2 = mm(
                h.reshape(-1, c),
                qkv["w_q"],
                qkv["s_act"] * qkv["sw"] / sb["s_qact1"],
                qkv["bias"] / sb["s_qact1"],
                **mm_kw,
            ).reshape(b, n_tok, 3 * c)
            # fused attention over the (B, N, 3C) codes: head slicing happens
            # inside the kernel, so no split/merge transposes hit HBM
            h = lis_attention_fused(
                h2, cfg.num_heads,
                sb["s_qact1"] ** 2 * cfg.attn_scale / sb["s_attn1"],
                sb["s_attn1"],
                sb["s_qact1"] / sb["s_qact2a"],
                lis=lis,
                interpret=interpret,
            )
        else:
            h2 = mm(
                h.reshape(-1, c),
                qkv["w_q"],
                qkv["s_act"] * qkv["sw"] / sb["s_qact1"],
                qkv["bias"] / sb["s_qact1"],
                **mm_kw,
            ).reshape(b, n_tok, 3 * c)
            hd = cfg.head_dim
            qkv_c = h2.reshape(b, n_tok, 3, cfg.num_heads, hd).transpose(2, 0, 3, 1, 4)
            av = lis_attention_ref(
                qkv_c[0].reshape(b * cfg.num_heads, n_tok, hd),
                qkv_c[1].reshape(b * cfg.num_heads, n_tok, hd),
                qkv_c[2].reshape(b * cfg.num_heads, n_tok, hd),
                sb["s_qact1"] ** 2 * cfg.attn_scale / sb["s_attn1"],
                sb["s_attn1"],
                sb["s_qact1"] / sb["s_qact2a"],
                lis=lis,
            )
            h = (
                av.reshape(b, cfg.num_heads, n_tok, hd)
                .transpose(0, 2, 1, 3)
                .reshape(b, n_tok, c)
            )
        pr = sb["proj"]
        fc1 = sb["mlp_fc1"]
        # proj matmul + residual junction + int-LN2 in ONE kernel: outputs
        # the qact2 residual carrier AND the mlp's qact0 input codes
        xc2, h = _junction(
            mm, mm_res_ln, mm_kw, resln,
            h.reshape(-1, c),
            pr["w_q"],
            sb["s_qact2a"] * pr["sw"] / sb["s_qact3"],
            pr["bias"] / sb["s_qact3"],
            xc.reshape(-1, c),
            sb["s_qact3"], s_prev, sb["s_res1"],
            sb["norm2_w"], sb["norm2_b"],
            fc1["s_act"] * sb["norm2_cs"], sb["norm2_ratio"],
        )
        xc = xc2.reshape(b, n_tok, c)
        h = mm(
            h,
            fc1["w_q"],
            fc1["s_act"] * fc1["sw"],
            fc1["bias"],
            out_inv=1.0 / sb["s_mq1"],
            gelu=True,
            **mm_kw,
        )
        # fc2 + residual + the NEXT LayerNorm (next block's LN1, or the
        # final encoder norm after the last block)
        if bi + 1 < n_blocks:
            nb = s["blocks"][bi + 1]
            nqkv = nb["qkv"]
            ln_w, ln_b = nb["norm1_w"], nb["norm1_b"]
            ln_out, ratio = nqkv["s_act"] * nqkv["cs"], 1.0
        else:
            ln_w, ln_b = s["norm_w"], s["norm_b"]
            ln_out, ratio = s["s_qact2"], 1.0
        fc2 = sb["fc2"]
        xc2, h = _junction(
            mm, mm_res_ln, mm_kw, resln,
            h,
            fc2["w_q"],
            sb["s_mq1"] * fc2["sw"] / sb["s_mq2"],
            fc2["bias"] / sb["s_mq2"],
            xc.reshape(-1, c),
            sb["s_mq2"], sb["s_res1"], sb["s_res2"],
            ln_w, ln_b, ln_out, ratio,
        )
        xc = xc2.reshape(b, n_tok, c)
        h = h.reshape(b, n_tok, c)
        s_prev = sb["s_res2"]

    # the last fusion already produced the final-norm codes
    return head_logits(s, h, use_pallas=use_pallas, interpret=interpret)
