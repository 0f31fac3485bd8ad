"""Fully-quantized ViT/DeiT — TPU-native rebuild of the P²-ViT model.

Rebuild of /root/reference/models/vit_fquant.py (1074 LoC of stateful
nn.Modules with mutable quant/calibrate flags) as three pure functions:

  * ``fp_forward(params, cfg, x)``          — plain fp forward (baseline eval,
    Hessian sensitivity, data-free generation).
  * ``calibrate(params, cfg, policy, x)``   — one pass over a calibration
    batch producing a serializable ``QuantState`` pytree (scales, PoT
    exponents, PTF masks, per-bit smoothquant caches) + the mixed-precision
    artifacts (FLOPs cost vector, per-bit weight distances). Replaces the
    reference's model_open_calibrate/model_open_last_calibrate mutation
    protocol (vit_fquant.py:797-828).
  * ``quant_forward(params, qstate, cfg, policy, x, bit_idx)`` — the fully
    quantized forward. JIT-compiled ONCE: the per-layer bit widths arrive as
    a traced int32 index vector, so the evolutionary mixed-precision search
    evaluates every candidate config with the same executable (the reference
    instead rebinds quantizer.bit_type per call, layers.py:204-207).

Quantization-node placement matches SURVEY §2.1 / vit_fquant.py exactly:
qact_input → patch-embed (conv-as-matmul) → qact → [cls; x] → qact_embed →
+qact_pos(pos) → qact1(PTF) → 12× Block{int-LN1 → Attention{/cs → qact0 →
qkv → qact1 → q@kᵀ → qact_attn1 → LIS → @v → qact2 → proj → qact3(PTF)} →
residual → qact2(PTF) → int-LN2 → Mlp{/cs → qact0 → fc1 → GELU → qact1 →
fc2 → qact2(PTF)} → residual → qact4(PTF)} → int-LN → [:,0] → qact2 → head
→ act_out.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

from ..config import QuantPolicy
from ..quant.bit_type import BIT_TYPE_DICT, EVAL_BIT_POOL
from ..quant.fake_quant import fake_quant, fake_quant_dyn, lp_loss
from ..quant.intops import int_layernorm, log_int_softmax
from ..quant.smoothquant import ATTN_ALPHA_POOL, MLP_ALPHA_POOL, pot_smooth_channel_scale
from ..quant.solve import accumulate_act_stats, solve_act, solve_weight_all_bits
from .common import (
    ViTConfig,
    extract_patches,
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_qkv,
    trunc_normal,
    vit_flops,
)

INT8 = BIT_TYPE_DICT["int8"]

# Dynamic-bit bounds, indexed by the eval bit index (0 → int4, 1 → int8);
# the weight-scale dic row for eval bit j is 2 + j (rows are
# [uint3, uint4, int4, int8], bit_type.py WEIGHT_CALIB_BIT_TYPES order).
EVAL_QMIN = jnp.array([-8.0, -128.0], dtype=jnp.float32)
EVAL_QMAX = jnp.array([7.0, 127.0], dtype=jnp.float32)
N_EVAL_BITS = len(EVAL_BIT_POOL)


def bits_to_idx(bit_config) -> jnp.ndarray:
    """Map a reference-style bit_config list (e.g. [4]*50,
    test_quant.py:467) to the int32 index vector quant_forward consumes."""
    lut = {b: i for i, b in enumerate(EVAL_BIT_POOL)}
    bad = sorted({int(b) for b in bit_config} - set(lut))
    if bad:
        raise ValueError(
            f"unsupported bit widths {bad}: the calibrated per-bit caches "
            f"cover {sorted(lut)} only (reference bit_pool, vit_fquant.py:38)"
        )
    return jnp.array([lut[int(b)] for b in bit_config], dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(key, cfg: ViTConfig) -> dict:
    """Random init (trunc normal σ=0.02, vit_fquant.py:771-782)."""
    c, h, p = cfg.embed_dim, cfg.hidden_dim, cfg.patch_size
    keys = iter(jax.random.split(key, 8 + 6 * cfg.depth))

    def lin(o, i):
        return {"w": trunc_normal(next(keys), (o, i)), "b": jnp.zeros((o,))}

    def ln():
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}

    blocks = []
    for _ in range(cfg.depth):
        blocks.append(
            {
                "norm1": ln(),
                "qkv": lin(3 * c, c),
                "proj": lin(c, c),
                "norm2": ln(),
                "fc1": lin(h, c),
                "fc2": lin(c, h),
            }
        )
    return {
        "cls_token": trunc_normal(next(keys), (1, 1, c)),
        "pos_embed": trunc_normal(next(keys), (1, cfg.seq_len, c)),
        "patch_embed": lin(c, cfg.in_chans * p * p),
        "blocks": blocks,
        "norm": ln(),
        "head": lin(cfg.num_classes, c),
    }


# ---------------------------------------------------------------------------
# Plain fp forward (baseline / Hessian / data-free generation)
# ---------------------------------------------------------------------------


def fp_forward(params, cfg: ViTConfig, x, attn_tap=None):
    """fp32/bf16 ViT forward. With all Q-nodes passing through, the reference
    model degenerates to exactly this graph (SURVEY §3.5).

    Args:
      attn_tap: optional list; when given, each block's (attn @ v) output
        (B, N, C) is appended — the MatMul hook surface that PSAQ-ViT's
        data-free generator taps (/root/reference/utils/build_model.py:78-80).
    """
    eps = cfg.ln_eps
    b = x.shape[0]
    x = extract_patches(x, cfg.patch_size)
    x = linear(x, params["patch_embed"]["w"], params["patch_embed"]["b"])
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    for blk in params["blocks"]:
        h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
        h = linear(h, blk["qkv"]["w"], blk["qkv"]["b"])
        q, k, v = split_qkv(h, cfg.num_heads)
        attn = (q @ k.transpose(0, 1, 3, 2)) * cfg.attn_scale
        attn = jax.nn.softmax(attn, axis=-1)
        h = merge_heads(attn @ v)
        if attn_tap is not None:
            attn_tap.append(h)
        h = linear(h, blk["proj"]["w"], blk["proj"]["b"])
        x = x + h
        h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
        h = linear(h, blk["fc1"]["w"], blk["fc1"]["b"])
        h = gelu(h)
        h = linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
        x = x + h
    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps)[:, 0]
    return linear(x, params["head"]["w"], params["head"]["b"])


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CalibResult:
    """Serializable calibration artifacts (fixes the reference's
    never-serialized quantization state, SURVEY §5 checkpoint gap)."""

    qstate: dict
    flops: list  # length num_matmuls; the mixed-precision size proxy
    global_distance: jnp.ndarray  # (num_matmuls - 1, 4) per-bit L2 errors


def _qact(method, x, bit_type=INT8, prev=None):
    """Solve one activation node; returns its qstate dict entry.

    ``prev``: running MinMaxStats accumulated over earlier calibration
    batches (multi-batch mode); the node's solve then uses the merged
    range but searches on THIS (last) batch's tensor — the reference's
    last-calibrate semantics (minmax.py:34-40 reads self.max_val, the
    accumulated state, while round_x reconstructs outputs from x).
    """
    out = solve_act(method, x, bit_type, stats=accumulate_act_stats(method, x, prev))
    if len(out) == 3:
        scale, zp, mask = out
        return {"scale": scale, "zp": zp, "mask": mask}
    scale, zp = out
    return {"scale": scale, "zp": zp}


def _smooth_calibrate(x, w, bias, alpha_pool, policy, distances, prev_q0=None):
    """Shared qkv/fc1 PoT-SmoothQuant calibration.

    Mirrors vit_fquant.py:232-333 (attention, α-pool [0.35]) and
    layers_quant.py:255-347 (MLP fc1, α-pool [0.5]): per α, smooth, observe
    qact0 + per-bit weight scales, then per eval bit measure the fp-vs-quant
    L2 loss of the layer output and keep the best α's caches.

    ``prev_q0``: running qact0 stats over earlier batches' smoothed inputs
    (each batch smoothed by its OWN per-batch channel scale, matching the
    reference's non-last calibrate branch which recomputes channel_scale
    per forward, vit_fquant.py:233-333). The qact0 observer accumulates
    across the α pool too, like the reference's single observer updated
    per α. Weight observers see only the last batch's smoothed weight:
    across batches the reference's single weight observer flips between
    channel- and layer-wise modes, collapsing every channel's range to the
    global max from batch 2 on (minmax.py:15-32) — a degenerate
    accumulation we deliberately do not replicate.

    Returns (state_dict, gt) where gt (the smoothed fp output of the LAST α,
    vit_fquant.py:333) flows onward through calibration.
    """
    c = x.shape[-1]
    cs_pool, act_s, act_zp, wsc_pool, losses = [], [], [], [], []
    gt = None
    dist_last = None
    running_q0 = prev_q0
    for alpha in alpha_pool:
        cs = pot_smooth_channel_scale(x, w, alpha)
        x_sm = x / cs
        w_sm = w * cs[None, :]
        gt = linear(x_sm, w_sm, bias)
        running_q0 = accumulate_act_stats(policy.observer_a, x_sm, running_q0)
        out = solve_act(policy.observer_a, x_sm, INT8, stats=running_q0)
        q = {"scale": out[0], "zp": out[1]}
        wscale, dist = solve_weight_all_bits(w_sm, x_sm.reshape(-1, c))
        dist_last = dist
        cs_pool.append(cs)
        act_s.append(q["scale"])
        act_zp.append(q["zp"])
        wsc_pool.append(wscale)
        per_bit = []
        for j in range(N_EVAL_BITS):
            xq = fake_quant(x_sm, q["scale"], q["zp"], INT8)
            wq = fake_quant_dyn(w_sm, wscale[2 + j][:, None], 0.0, EVAL_QMIN[j], EVAL_QMAX[j])
            per_bit.append(lp_loss(gt, linear(xq, wq, bias)))
        losses.append(per_bit)
    # reference appends ONE distance row per α iteration; a >1 α pool would
    # break its length-49 assert (test_quant.py:319) so only the last row is
    # recorded here (identical when len(alpha_pool) == 1, the shipped value)
    distances.append(dist_last)
    loss_mat = jnp.stack([jnp.stack(pb) for pb in losses])  # [n_alpha, n_bits]
    # traced per-eval-bit argmin over the α pool (keeps calibrate jittable)
    best = jnp.argmin(loss_mat, axis=0)  # [n_bits]
    state = {
        "channel_scale": jnp.stack(cs_pool)[best],
        "qact0_scale": jnp.stack([jnp.asarray(s) for s in act_s])[best],
        "qact0_zp": jnp.stack([jnp.asarray(z) for z in act_zp])[best],
        "wscale": jnp.stack(wsc_pool)[best],
    }
    return state, gt


def calibrate(params, cfg: ViTConfig, policy: QuantPolicy, x, stats=None) -> CalibResult:
    """Calibration pass (stats + param solve, quant off).

    JIT-compiled end to end (cfg/policy static, frozen dataclasses): the
    whole PoT/PTF/smoothquant decision procedure — argmins included — runs
    as one XLA program on device instead of thousands of eager op
    dispatches. Returns a CalibResult whose qstate/distances are device
    arrays.

    ``stats``: optional running activation statistics from earlier
    calibration batches (``collect_stats``). Default None = single-batch
    calibration, the reference driver's actual behavior
    (/root/reference/test_quant.py:306-307).
    """
    qs, dists = _calibrate_jit(params, cfg, policy, x, stats)
    return CalibResult(qstate=qs, flops=vit_flops(cfg), global_distance=dists)


def collect_stats(params, cfg: ViTConfig, policy: QuantPolicy, x, prev=None):
    """Observe one calibration batch: the multi-batch stats pass.

    The reference's calibrate-but-not-last forward (observer.update only,
    no param solve; LIS falls back to fp softmax because no scale exists
    yet, layers.py:429-447). Feed the result of the last batch's
    ``collect_stats`` into ``calibrate(..., stats=...)``:

        stats = None
        for b in batches[:-1]:
            stats = collect_stats(params, cfg, policy, b, stats)
        calib = calibrate(params, cfg, policy, batches[-1], stats=stats)
    """
    return _collect_stats_jit(params, cfg, policy, x, prev)


def _sget(stats, *path):
    """Navigate the stats pytree; None stays None (single-batch mode)."""
    if stats is None:
        return None
    node = stats
    for p in path:
        node = node[p]
    return node


@functools.partial(jax.jit, static_argnums=(1, 2))
def _calibrate_jit(params, cfg: ViTConfig, policy: QuantPolicy, x, stats):
    """Traced body of ``calibrate``.

    Follows the reference calibration forward (SURVEY §3.1) node for node;
    all activations flowing between nodes are the raw fp values (quant=False
    during calibration), except that smoothquant blocks forward their
    smoothed fp output ``gt`` (vit_fquant.py:333).
    """
    a, a_ln = policy.observer_a, policy.observer_a_ln
    eps = cfg.ln_eps
    dists: list = []
    qs: dict = {}

    qs["qact_input"] = _qact(a, x, prev=_sget(stats, "qact_input"))
    # patch embed: conv-as-matmul; PoT search sees the im2col'd input
    patches = extract_patches(x, cfg.patch_size)
    pw, pb = params["patch_embed"]["w"], params["patch_embed"]["b"]
    p2 = patches.reshape(-1, patches.shape[-1])
    patch_wscale, _ = solve_weight_all_bits(pw, p2)  # QConv2d appends no distance
    x = linear(patches, pw, pb)
    qs["patch"] = {
        "wscale": patch_wscale,
        "qact": _qact(a, x, prev=_sget(stats, "patch", "qact")),
    }

    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    qs["qact_embed"] = _qact(a, x, prev=_sget(stats, "qact_embed"))
    qs["qact_pos"] = _qact(a, params["pos_embed"], prev=_sget(stats, "qact_pos"))
    x = x + params["pos_embed"]
    qs["qact1"] = _qact(a_ln, x, prev=_sget(stats, "qact1"))

    qs["blocks"] = []
    for i, blk in enumerate(params["blocks"]):
        sb = _sget(stats, "blocks", i)
        bq: dict = {}
        # --- attention ---
        h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
        if policy.smoothquant:
            attn_state, h = _smooth_calibrate(
                h, blk["qkv"]["w"], blk["qkv"]["b"], ATTN_ALPHA_POOL, policy,
                dists, prev_q0=_sget(sb, "attn", "qact0"),
            )
        else:
            q0 = _qact(a, h, prev=_sget(sb, "attn", "qact0"))
            wscale, dist = solve_weight_all_bits(
                blk["qkv"]["w"], h.reshape(-1, cfg.embed_dim)
            )
            dists.append(dist)
            attn_state = {
                "channel_scale": jnp.ones((N_EVAL_BITS, cfg.embed_dim)),
                "qact0_scale": jnp.stack([q0["scale"]] * N_EVAL_BITS),
                "qact0_zp": jnp.stack([q0["zp"]] * N_EVAL_BITS),
                "wscale": jnp.stack([wscale] * N_EVAL_BITS),
            }
            h = linear(h, blk["qkv"]["w"], blk["qkv"]["b"])
        attn_state["qact1"] = _qact(a, h, prev=_sget(sb, "attn", "qact1"))
        q, k, v = split_qkv(h, cfg.num_heads)
        attn = (q @ k.transpose(0, 1, 3, 2)) * cfg.attn_scale
        attn_state["qact_attn1"] = _qact(a, attn, prev=_sget(sb, "attn", "qact_attn1"))
        if policy.int_softmax:
            # scale is already solved within this forward, so calibration
            # sees the LIS output exactly like the reference (layers.py:419)
            attn = log_int_softmax(
                attn, attn_state["qact_attn1"]["scale"], policy.bit_type_s
            )
        else:
            attn = jax.nn.softmax(attn, axis=-1)
        h = merge_heads(attn @ v)
        attn_state["qact2"] = _qact(a, h, prev=_sget(sb, "attn", "qact2"))
        proj_wscale, dist = solve_weight_all_bits(
            blk["proj"]["w"], h.reshape(-1, cfg.embed_dim)
        )
        dists.append(dist)
        attn_state["proj_wscale"] = proj_wscale
        h = linear(h, blk["proj"]["w"], blk["proj"]["b"])
        attn_state["qact3"] = _qact(a_ln, h, prev=_sget(sb, "attn", "qact3"))
        bq["attn"] = attn_state
        x = x + h
        bq["qact2"] = _qact(a_ln, x, prev=_sget(sb, "qact2"))
        # --- mlp ---
        h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
        if policy.smoothquant:
            mlp_state, h = _smooth_calibrate(
                h, blk["fc1"]["w"], blk["fc1"]["b"], MLP_ALPHA_POOL, policy,
                dists, prev_q0=_sget(sb, "mlp", "qact0"),
            )
        else:
            q0 = _qact(a, h, prev=_sget(sb, "mlp", "qact0"))
            wscale, dist = solve_weight_all_bits(
                blk["fc1"]["w"], h.reshape(-1, cfg.embed_dim)
            )
            dists.append(dist)
            mlp_state = {
                "channel_scale": jnp.ones((N_EVAL_BITS, cfg.embed_dim)),
                "qact0_scale": jnp.stack([q0["scale"]] * N_EVAL_BITS),
                "qact0_zp": jnp.stack([q0["zp"]] * N_EVAL_BITS),
                "wscale": jnp.stack([wscale] * N_EVAL_BITS),
            }
            h = linear(h, blk["fc1"]["w"], blk["fc1"]["b"])
        h = gelu(h)
        mlp_state["qact1"] = _qact(a, h, prev=_sget(sb, "mlp", "qact1"))
        fc2_wscale, dist = solve_weight_all_bits(
            blk["fc2"]["w"], h.reshape(-1, cfg.hidden_dim)
        )
        dists.append(dist)
        mlp_state["fc2_wscale"] = fc2_wscale
        h = linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
        mlp_state["qact2"] = _qact(a_ln, h, prev=_sget(sb, "mlp", "qact2"))
        bq["mlp"] = mlp_state
        x = x + h
        bq["qact4"] = _qact(a_ln, x, prev=_sget(sb, "qact4"))
        qs["blocks"].append(bq)

    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps)[:, 0]
    qs["qact2"] = _qact(a, x, prev=_sget(stats, "qact2"))
    head_wscale, dist = solve_weight_all_bits(params["head"]["w"], x)
    dists.append(dist)
    qs["head_wscale"] = head_wscale
    x = linear(x, params["head"]["w"], params["head"]["b"])
    qs["act_out"] = _qact(a, x, prev=_sget(stats, "act_out"))

    return qs, jnp.stack(dists)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _collect_stats_jit(params, cfg: ViTConfig, policy: QuantPolicy, x, prev):
    """Stats-only calibration forward (the reference's non-last calibrate
    batches): same graph as ``_calibrate_jit`` with fp values flowing, but
    each activation node only merges its min/max into the running stats.
    Smoothquant nodes observe the batch smoothed by the batch's OWN channel
    scale and forward the smoothed fp output (vit_fquant.py:233-333); LIS
    uses the fp-softmax fallback (no scale solved yet, layers.py:429-447).
    """
    a, a_ln = policy.observer_a, policy.observer_a_ln
    eps = cfg.ln_eps
    st: dict = {}

    def smooth_collect(h, w, bias, alpha_pool, prev_q0):
        running = prev_q0
        gt = None
        for alpha in alpha_pool:
            cs = pot_smooth_channel_scale(h, w, alpha)
            x_sm = h / cs
            gt = linear(x_sm, w * cs[None, :], bias)
            running = accumulate_act_stats(a, x_sm, running)
        return running, gt

    st["qact_input"] = accumulate_act_stats(a, x, _sget(prev, "qact_input"))
    patches = extract_patches(x, cfg.patch_size)
    x = linear(patches, params["patch_embed"]["w"], params["patch_embed"]["b"])
    st["patch"] = {
        "qact": accumulate_act_stats(a, x, _sget(prev, "patch", "qact"))
    }

    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    st["qact_embed"] = accumulate_act_stats(a, x, _sget(prev, "qact_embed"))
    st["qact_pos"] = accumulate_act_stats(
        a, params["pos_embed"], _sget(prev, "qact_pos")
    )
    x = x + params["pos_embed"]
    st["qact1"] = accumulate_act_stats(a_ln, x, _sget(prev, "qact1"))

    st["blocks"] = []
    for i, blk in enumerate(params["blocks"]):
        pb = _sget(prev, "blocks", i)
        bs: dict = {"attn": {}, "mlp": {}}
        h = layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], eps)
        if policy.smoothquant:
            bs["attn"]["qact0"], h = smooth_collect(
                h, blk["qkv"]["w"], blk["qkv"]["b"], ATTN_ALPHA_POOL,
                _sget(pb, "attn", "qact0"),
            )
        else:
            bs["attn"]["qact0"] = accumulate_act_stats(
                a, h, _sget(pb, "attn", "qact0")
            )
            h = linear(h, blk["qkv"]["w"], blk["qkv"]["b"])
        bs["attn"]["qact1"] = accumulate_act_stats(a, h, _sget(pb, "attn", "qact1"))
        q, k, v = split_qkv(h, cfg.num_heads)
        attn = (q @ k.transpose(0, 1, 3, 2)) * cfg.attn_scale
        bs["attn"]["qact_attn1"] = accumulate_act_stats(
            a, attn, _sget(pb, "attn", "qact_attn1")
        )
        attn = jax.nn.softmax(attn, axis=-1)  # no LIS scale yet (non-last)
        h = merge_heads(attn @ v)
        bs["attn"]["qact2"] = accumulate_act_stats(a, h, _sget(pb, "attn", "qact2"))
        h = linear(h, blk["proj"]["w"], blk["proj"]["b"])
        bs["attn"]["qact3"] = accumulate_act_stats(
            a_ln, h, _sget(pb, "attn", "qact3")
        )
        x = x + h
        bs["qact2"] = accumulate_act_stats(a_ln, x, _sget(pb, "qact2"))
        h = layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], eps)
        if policy.smoothquant:
            bs["mlp"]["qact0"], h = smooth_collect(
                h, blk["fc1"]["w"], blk["fc1"]["b"], MLP_ALPHA_POOL,
                _sget(pb, "mlp", "qact0"),
            )
        else:
            bs["mlp"]["qact0"] = accumulate_act_stats(
                a, h, _sget(pb, "mlp", "qact0")
            )
            h = linear(h, blk["fc1"]["w"], blk["fc1"]["b"])
        h = gelu(h)
        bs["mlp"]["qact1"] = accumulate_act_stats(a, h, _sget(pb, "mlp", "qact1"))
        h = linear(h, blk["fc2"]["w"], blk["fc2"]["b"])
        bs["mlp"]["qact2"] = accumulate_act_stats(
            a_ln, h, _sget(pb, "mlp", "qact2")
        )
        x = x + h
        bs["qact4"] = accumulate_act_stats(a_ln, x, _sget(pb, "qact4"))
        st["blocks"].append(bs)

    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps)[:, 0]
    st["qact2"] = accumulate_act_stats(a, x, _sget(prev, "qact2"))
    x = linear(x, params["head"]["w"], params["head"]["b"])
    st["act_out"] = accumulate_act_stats(a, x, _sget(prev, "act_out"))
    return st


def synthetic_qstate(cfg: ViTConfig) -> dict:
    """A structurally-correct QuantState with placeholder PoT scales.

    For compile checks and kernel benchmarking where real calibration is not
    needed — the compiled graph is identical to one built from a calibrated
    state (same shapes/dtypes), only the values differ.
    """
    c, h3, hid = cfg.embed_dim, 3 * cfg.embed_dim, cfg.hidden_dim

    def act(chan=None):
        s = jnp.full((chan,), 0.125) if chan else jnp.asarray(0.125)
        d = {"scale": s, "zp": jnp.zeros_like(s)}
        if chan:
            d["mask"] = jnp.ones((chan,))
        return d

    def wdic(o):
        return jnp.full((4, o), 0.0625)

    def smooth(o):
        return {
            "channel_scale": jnp.ones((N_EVAL_BITS, c)),
            "qact0_scale": jnp.full((N_EVAL_BITS,), 0.125),
            "qact0_zp": jnp.zeros((N_EVAL_BITS,)),
            "wscale": jnp.stack([wdic(o)] * N_EVAL_BITS),
        }

    blocks = []
    for _ in range(cfg.depth):
        attn = smooth(h3)
        attn.update(
            qact1=act(), qact_attn1=act(), qact2=act(),
            proj_wscale=wdic(c), qact3=act(c),
        )
        mlp = smooth(hid)
        mlp.update(qact1=act(), fc2_wscale=wdic(c), qact2=act(c))
        blocks.append({"attn": attn, "qact2": act(c), "mlp": mlp, "qact4": act(c)})
    return {
        "qact_input": act(),
        "patch": {"wscale": wdic(c), "qact": act()},
        "qact_embed": act(),
        "qact_pos": act(),
        "qact1": act(c),
        "blocks": blocks,
        "qact2": act(),
        "head_wscale": wdic(cfg.num_classes),
        "act_out": act(),
    }


# ---------------------------------------------------------------------------
# Quantized forward (jittable)
# ---------------------------------------------------------------------------


def _fq(x, q):
    """Fake-quant an activation with a solved node (int8, scalar or PTF [C]
    scale broadcast on the channel-last axis)."""
    return fake_quant(x, q["scale"], q["zp"], INT8)


def _fq_weight(w, wscale_dic, bit, per_out_axis=True):
    """Weight fake-quant with the traced eval bit: pick the dic row
    (2 + bit → int4/int8) and the matching clamp bounds."""
    scale = wscale_dic[2 + bit]
    return fake_quant_dyn(w, scale[:, None], 0.0, EVAL_QMIN[bit], EVAL_QMAX[bit])


def _intln_or_ln(x, ln_params, policy, in_q, out_scale, eps):
    """LN in 'int' mode when INT_NORM else plain fp LN
    (/root/reference/models/ptq/layers.py:276-339)."""
    if policy.int_norm:
        return int_layernorm(
            x, ln_params["w"], ln_params["b"], in_q["scale"], out_scale
        )
    return layer_norm(x, ln_params["w"], ln_params["b"], eps)


def quant_forward(params, qstate, cfg: ViTConfig, policy: QuantPolicy, x, bit_idx,
                  block_tap=None):
    """Fully-quantized forward. ``bit_idx`` is the int32 [num_matmuls] index
    vector from ``bits_to_idx`` — traced, so the compiled executable serves
    every mixed-precision config (SURVEY §7 design translation).

    ``block_tap``: optional list; each block's residual-stream output (the
    qact4 node, matching the reference Block.forward return) is appended —
    the debugging/analysis tap used by divergence localization.
    """
    eps = cfg.ln_eps
    b = x.shape[0]
    x = _fq(x, qstate["qact_input"])

    patches = extract_patches(x, cfg.patch_size)
    pw = _fq_weight(params["patch_embed"]["w"], qstate["patch"]["wscale"], bit_idx[0])
    x = linear(patches, pw, params["patch_embed"]["b"])
    x = _fq(x, qstate["patch"]["qact"])

    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = _fq(x, qstate["qact_embed"])
    x = x + _fq(params["pos_embed"], qstate["qact_pos"])
    x = _fq(x, qstate["qact1"])

    last_q = qstate["qact1"]
    for i, blk in enumerate(params["blocks"]):
        bq = qstate["blocks"][i]
        aq, mq = bq["attn"], bq["mlp"]
        bit_qkv = bit_idx[1 + 4 * i]
        bit_proj = bit_idx[2 + 4 * i]
        bit_fc1 = bit_idx[3 + 4 * i]
        bit_fc2 = bit_idx[4 + 4 * i]

        # --- attention ---
        cs = aq["channel_scale"][bit_qkv]
        q0_scale = aq["qact0_scale"][bit_qkv]
        # int-LN1 folds the smoothing division into its output requant:
        # out_scale = qact0.scale * channel_scale (layers.py:304-306)
        h = _intln_or_ln(
            x, blk["norm1"], policy, last_q, q0_scale * cs, eps
        )
        if policy.smoothquant:
            h = h / cs
        h = fake_quant(h, q0_scale, aq["qact0_zp"][bit_qkv], INT8)
        w_sm = blk["qkv"]["w"] * cs[None, :] if policy.smoothquant else blk["qkv"]["w"]
        wq = _fq_weight(w_sm, aq["wscale"][bit_qkv], bit_qkv)
        h = linear(h, wq, blk["qkv"]["b"])
        h = _fq(h, aq["qact1"])
        q, k, v = split_qkv(h, cfg.num_heads)
        attn = (q @ k.transpose(0, 1, 3, 2)) * cfg.attn_scale
        attn = _fq(attn, aq["qact_attn1"])
        if policy.int_softmax:
            attn = log_int_softmax(attn, aq["qact_attn1"]["scale"], policy.bit_type_s)
        else:
            attn = jax.nn.softmax(attn, axis=-1)
        h = merge_heads(attn @ v)
        h = _fq(h, aq["qact2"])
        wq = _fq_weight(blk["proj"]["w"], aq["proj_wscale"], bit_proj)
        h = linear(h, wq, blk["proj"]["b"])
        h = _fq(h, aq["qact3"])
        x = x + h
        x = _fq(x, bq["qact2"])

        # --- mlp ---
        cs_m = mq["channel_scale"][bit_fc1]
        q0m_scale = mq["qact0_scale"][bit_fc1]
        # reference quirk: Block.forward passes attn.channel_scale (not
        # mlp.channel_scale) as norm2's out_quantizer_scale
        # (vit_fquant.py:561-570); replicated behind the compat flag
        norm2_cs = cs if policy.norm2_attn_channel_scale_compat else cs_m
        h = _intln_or_ln(
            x, blk["norm2"], policy, bq["qact2"], q0m_scale * norm2_cs, eps
        )
        if policy.smoothquant:
            h = h / cs_m
        h = fake_quant(h, q0m_scale, mq["qact0_zp"][bit_fc1], INT8)
        w_sm = blk["fc1"]["w"] * cs_m[None, :] if policy.smoothquant else blk["fc1"]["w"]
        wq = _fq_weight(w_sm, mq["wscale"][bit_fc1], bit_fc1)
        h = linear(h, wq, blk["fc1"]["b"])
        h = gelu(h)
        h = _fq(h, mq["qact1"])
        wq = _fq_weight(blk["fc2"]["w"], mq["fc2_wscale"], bit_fc2)
        h = linear(h, wq, blk["fc2"]["b"])
        h = _fq(h, mq["qact2"])
        x = x + h
        x = _fq(x, bq["qact4"])
        last_q = bq["qact4"]
        if block_tap is not None:
            block_tap.append(x)

    x = _intln_or_ln(
        x, params["norm"], policy, last_q, qstate["qact2"]["scale"], eps
    )[:, 0]
    x = _fq(x, qstate["qact2"])
    wq = _fq_weight(params["head"]["w"], qstate["head_wscale"], bit_idx[-1])
    x = linear(x, wq, params["head"]["b"])
    return _fq(x, qstate["act_out"])
