"""Tensor-parallel int8 Swin serving: the megatron row/column design of
parallel/tensor.py ported to the windowed family (VERDICT r4 item 3).

The reference is single-GPU (SURVEY §0) and its Swin path crashes as-is;
this is beyond-parity TPU scale-out. The splits mirror tensor.py exactly —
what changes is the geometry bookkeeping (per-stage head counts and
channel widths) and which junction kernels run replicated:

  * **qkv — column-parallel, head-aligned** per stage: the (3C_k, C_k)
    weight rows are pre-permuted head-major (tensor._qkv_tp_perm at the
    stage's head count) so each device's contiguous shard is a valid
    fused-qkv weight at ``heads_k/tp`` local heads. Per-channel requant
    epilogue → complete channels → unmodified kernels, bitwise.
  * **window attention — head-parallel.** Windows AND heads are
    independent; each device runs the unmodified fused window kernel
    (ops/attention_lis.swin_lis_attention) on its local heads with the
    matching rows of the rel-pos-bias VALUES (per-head) — masks are
    head-independent and replicate. The XLA fallback shares
    serving_swin._window_attention_codes_vals the same way.
  * **proj / fc2 — row-parallel with int32-exact reduction**: partial
    int32 accumulators over the in-feature shard, ``psum`` (exact), then
    the SHARED epilogue twins — ops/matmul_int8.requant_epilogue_ref for
    proj (its junction is the standalone res+LN kernel, which the window
    reorder keeps out of the matmul), ops/matmul_ln.res_ln_epilogue_ref
    for fc2 (the fused next-norm junction, ViT's treatment). The
    head-aligned qkv permutation makes each device's attention output
    channels exactly the contiguous in-feature block of its w_proj shard.
  * **fc1 — column-parallel** with the fused GELU epilogue.
  * stem, patch-merging reductions, attention-side res+LN junctions, int
    LNs, and the head run REPLICATED along "model": they are a small
    slice of serving time (itemized by tools/ceiling_swin_icept.py), and
    the merges sit between differently-sharded stages — replicating
    trades that sliver for zero extra collectives. No sequence-parallel
    mode: Swin's token count shrinks 4× per stage, so SP's row-sharded
    residual stream would need a re-shard at every stage boundary and at
    every window roll (documented decision; ViT keeps SP).

TP divisibility: tp must divide every stage's head count — heads are
(3,6,12,24) for tiny/small → tp ∈ {1, 3}; (4,8,16,32) for base →
tp ∈ {1, 2, 4}. (mlp hidden 4·C_k is divisible by both 3 and 4 for every
zoo member; ``check_tp`` validates both.)

Bitwise contract: every sharded op either computes complete output
channels with unmodified kernels or reduces exact int32 partials before
the shared epilogue, so TP logits equal single-device
``serving_swin.serving_forward`` (fuse_res default path) bit for bit —
pinned on the 8-virtual-device CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import serving_swin
from ..models.swin import (
    SwinConfig,
    _merge_patches,
    _patches,
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from . import mesh as mesh_mod
from .tensor import _qkv_tp_perm
from ..ops.attention_lis import swin_lis_attention
from ..ops.intln import int_res_ln_requant, int_res_ln_requant_ref
from ..ops.matmul_int8 import (
    int8_matmul_requant,
    int8_matmul_requant_ref,
    requant_epilogue_ref,
)
from ..ops.matmul_ln import res_ln_epilogue_ref

_I8 = (-128, 127)


def check_tp(cfg: SwinConfig, tp: int) -> None:
    """Raise unless tp divides every stage's heads and mlp hidden width."""
    for k, heads in enumerate(cfg.num_heads):
        if heads % tp:
            raise ValueError(
                f"stage {k} heads={heads} not divisible by model axis "
                f"{tp} (Swin TP needs tp | heads at EVERY stage; "
                f"tiny/small admit tp=3, base tp in {{2,4}})"
            )
        if int(cfg.embed_dim * 2**k * cfg.mlp_ratio) % tp:
            raise ValueError(f"stage {k} mlp hidden not divisible by {tp}")


def _build_tp_state(s, qstate, cfg: SwinConfig, tp: int):
    """(tp state pytree, matching PartitionSpec pytree, static shifts).

    Precomputes per block: head-permuted qkv consts, dequantized rel-pos
    bias VALUES (per-head — the shardable axis), raw shift masks, the
    post-psum epilogue consts, and the scalar scale chain (``s_prev`` per
    block), so the shard_map body is pure compute. ``shifts[i][j]`` is
    the block's static roll amount (Python int — control flow)."""
    rep = lambda t: jax.tree.map(lambda _: P(), t)
    st_out, sp_out, shifts = [], [], []
    s_prev = qstate["patch_qact"]["scale"]
    for i, st in enumerate(s["stages"]):
        res = cfg.stage_res(i)
        ws = min(cfg.window_size, res)
        n = ws * ws
        heads = cfg.num_heads[i]
        c = cfg.embed_dim * 2**i
        sqs = qstate["stages"][i]
        perm = _qkv_tp_perm(c, heads, tp)
        blocks, bspecs, bshifts = [], [], []
        nblk = len(st["blocks"])
        for j, sb in enumerate(st["blocks"]):
            bq = sqs["blocks"][j]
            aq = bq["attn"]
            shift = 0 if (j % 2 == 0 or res <= cfg.window_size) else ws // 2
            mask = (jnp.asarray(shift_attn_mask(res, res, ws, shift))
                    if shift else None)
            hd = c // heads
            # fc2 fused-LN junction target (next norm1 / the final norm),
            # mirroring serving_forward's fuse_res rule
            last_stage = i == len(s["stages"]) - 1
            if j + 1 < nblk:
                ln_p = st["blocks"][j + 1]["norm1"]
                ln_out = sqs["blocks"][j + 1]["qact1"]["scale"]
            elif last_stage and "downsample" not in st:
                ln_p = s["norm"]
                ln_out = qstate["qact2"]["scale"]
            else:
                ln_p, ln_out = None, None
            blk = {
                "mask": mask, "s_prev": s_prev,
                "norm1": sb["norm1"],
                "s_qact1": bq["qact1"]["scale"],
                "w_qkv": sb["qkv"]["w_q"][perm, :],
                "r_qkv": (bq["qact1"]["scale"] * sb["qkv"]["sw"]
                          / aq["qact1"]["scale"])[perm],
                "b_qkv": (sb["qkv_b"] / aq["qact1"]["scale"])[perm],
                "bias_val": serving_swin._bias_values(sb, aq, ws, n, heads),
                "s_attn_q": aq["qact1"]["scale"],
                "s_attn1": aq["qact_attn1"]["scale"],
                "s_attn2": aq["qact2"]["scale"],
                "s_attn3": aq["qact3"]["scale"],
                "score_requant": (aq["qact1"]["scale"] ** 2 * hd**-0.5
                                  / aq["qact_attn1"]["scale"]),
                "out_requant": aq["qact1"]["scale"] / aq["qact3"]["scale"],
                "w_proj": sb["proj"]["w_q"],
                "r_proj": (aq["qact3"]["scale"] * sb["proj"]["sw"]
                           / aq["qact4"]["scale"]),
                "b_proj": sb["proj_b"] / aq["qact4"]["scale"],
                "s_qact4_attn": aq["qact4"]["scale"],
                "norm2": sb["norm2"],
                "s_qact3": bq["qact3"]["scale"],
                "w_fc1": sb["fc1"]["w_q"],
                "r_fc1": bq["qact3"]["scale"] * sb["fc1"]["sw"],
                "b_fc1": sb["fc1_b"],
                "f1inv": 1.0 / bq["mlp_qact1"]["scale"],
                "w_fc2": sb["fc2"]["w_q"],
                "r_fc2": (bq["mlp_qact1"]["scale"] * sb["fc2"]["sw"]
                          / bq["mlp_qact2"]["scale"]),
                "b_fc2": sb["fc2_b"] / bq["mlp_qact2"]["scale"],
                "s_mlp_q2": bq["mlp_qact2"]["scale"],
                "s_blk_q2": bq["qact2"]["scale"],
                "s_blk_q4": bq["qact4"]["scale"],
                "ln_next": ln_p, "ln_next_out": ln_out,
            }
            spec = {
                "mask": None if mask is None else P(),
                "s_prev": P(),
                "norm1": rep(sb["norm1"]),
                "s_qact1": P(),
                "w_qkv": P("model", None),
                "r_qkv": P("model"),
                "b_qkv": P("model"),
                "bias_val": P("model", None, None),
                "s_attn_q": P(), "s_attn1": P(), "s_attn2": P(),
                "s_attn3": P(), "score_requant": P(), "out_requant": P(),
                "w_proj": P(None, "model"),
                "r_proj": P(), "b_proj": P(),
                "s_qact4_attn": P(),
                "norm2": rep(sb["norm2"]),
                "s_qact3": P(),
                "w_fc1": P("model", None),
                "r_fc1": P("model"), "b_fc1": P("model"), "f1inv": P(),
                "w_fc2": P(None, "model"),
                "r_fc2": P(), "b_fc2": P(),
                "s_mlp_q2": P(), "s_blk_q2": P(), "s_blk_q4": P(),
                "ln_next": None if ln_p is None else rep(ln_p),
                "ln_next_out": None if ln_out is None else P(),
            }
            blocks.append(blk)
            bspecs.append(spec)
            bshifts.append(shift)
            s_prev = bq["qact4"]["scale"]
        stage = {"blocks": blocks}
        sspec = {"blocks": bspecs}
        if "downsample" in st:
            dq = sqs["downsample"]
            stage["downsample"] = {
                "s_prev": s_prev,
                "norm": st["downsample"]["norm"],
                "s_q1": dq["qact1"]["scale"],
                "w_red": st["downsample"]["red"]["w_q"],
                "r_red": (dq["qact1"]["scale"]
                          * st["downsample"]["red"]["sw"]
                          / dq["qact2"]["scale"]),
            }
            sspec["downsample"] = {
                "s_prev": P(), "norm": rep(st["downsample"]["norm"]),
                "s_q1": P(), "w_red": P(), "r_red": P(),
            }
            s_prev = dq["qact2"]["scale"]
        st_out.append(stage)
        sp_out.append(sspec)
        shifts.append(bshifts)
    tps = {
        "stages": st_out,
        "s_input": s["s_input"], "zp_input": s["zp_input"],
        "patch": s["patch"], "patch_b": s["patch_b"],
        "patch_norm": s["patch_norm"],
        "s_patch_bn": qstate["patch_qact_bn"]["scale"],
        "s_patch": qstate["patch_qact"]["scale"],
        "final_s_prev": s_prev,
        "norm": s["norm"],
        "s_q2": qstate["qact2"]["scale"],
        "s_q3": qstate["qact3"]["scale"],
        "head": s["head"], "head_b": s["head_b"],
        "s_out": qstate["act_out"]["scale"],
    }
    specs = {
        "stages": sp_out,
        "s_input": P(), "zp_input": P(),
        "patch": rep(s["patch"]), "patch_b": P(),
        "patch_norm": rep(s["patch_norm"]),
        "s_patch_bn": P(), "s_patch": P(),
        "final_s_prev": P(),
        "norm": rep(s["norm"]),
        "s_q2": P(), "s_q3": P(),
        "head": rep(s["head"]), "head_b": P(),
        "s_out": P(),
    }
    if "u8" in s:
        tps["u8"] = s["u8"]
        specs["u8"] = rep(s["u8"])
    return tps, specs, shifts


def _put_tree(tree, spec, mesh):
    """device_put each leaf with its NamedSharding — distribute the state
    ONCE at build time, not per batch (tensor.py's rule: without explicit
    puts the jitted call re-shards every constant on EVERY invocation)."""
    if isinstance(spec, P):
        return jax.device_put(tree, NamedSharding(mesh, spec))
    if tree is None:
        return None
    if isinstance(tree, dict):
        return {k: _put_tree(tree[k], spec[k], mesh) for k in tree}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_put_tree(t, sp, mesh)
                          for t, sp in zip(tree, spec))
    raise TypeError(f"unexpected state node {type(tree).__name__}")


def _tp_block(blk, shift, xc, h_ln, *, res, ws, heads_local, lis,
              use_pallas, interpret):
    """One Swin block on codes, per model-shard (shard_map body helper).

    Mirrors serving_swin.serving_forward's fuse_res default path with the
    TP splits of the module docstring. ``xc``: (B_local, L, C) residual
    codes, replicated along "model"; ``h_ln``: next-norm codes carried out
    of the previous block's fused fc2 junction (or None). Local leaves:
    w_qkv (3C/tp, C) head-permuted, bias_val (H/tp, N, N), w_proj
    (C, C/tp), w_fc1 (hid/tp, C), w_fc2 (C, hid/tp)."""
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    res_ln = int_res_ln_requant if use_pallas else int_res_ln_requant_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    rl_kw = {"interpret": interpret} if use_pallas else {}
    bs, l, c = xc.shape
    c3l = blk["w_qkv"].shape[0]
    c_local = c3l // 3
    shortcut = xc
    if h_ln is None:
        h = serving_swin._iln(xc, blk["s_prev"], blk["norm1"],
                              blk["s_qact1"], interpret=interpret,
                              use_pallas=use_pallas)
    else:
        h = h_ln
    h = h.reshape(bs, res, res, c)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    hw = window_partition(h, ws)
    n = ws * ws
    hw = mm(hw.reshape(-1, c), blk["w_qkv"], blk["r_qkv"], blk["b_qkv"],
            **mm_kw).reshape(-1, n, c3l)
    if use_pallas:
        hw = swin_lis_attention(
            hw, blk["bias_val"],
            None if blk["mask"] is None else blk["mask"] / blk["s_attn2"],
            heads_local, (res // ws) ** 2,
            blk["score_requant"], blk["s_attn1"], blk["s_attn2"],
            blk["out_requant"], lis=lis, interpret=interpret,
        )
    else:
        hw = serving_swin._window_attention_codes_vals(
            hw, blk["bias_val"], blk["mask"], lis, heads_local,
            blk["s_attn_q"], blk["s_attn1"], blk["s_attn2"],
            blk["s_attn3"],
        )
    # proj (row-parallel): the local attention output channels are exactly
    # the w_proj shard's in-feature block (head-aligned permutation) —
    # partial int32 → exact psum → the kernel's own requant epilogue
    acc = jax.lax.dot_general(
        hw.reshape(-1, c_local), blk["w_proj"],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    hw = requant_epilogue_ref(
        jax.lax.psum(acc, "model"), blk["r_proj"], blk["b_proj"],
    ).reshape(-1, n, c)
    h = window_reverse(hw, ws, res, res)
    if shift:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    h = h.reshape(bs, l, c)
    # attention-side junction (replicated: the window reorder keeps it out
    # of any matmul epilogue — single-device runs the same standalone op)
    xc_f, h2 = res_ln(
        shortcut.reshape(-1, c), blk["s_prev"], h.reshape(-1, c),
        blk["s_qact4_attn"], blk["s_blk_q2"],
        blk["norm2"]["w"], blk["norm2"]["b"], blk["s_qact3"], 1.0, **rl_kw,
    )
    xc = xc_f.reshape(bs, l, c)
    # fc1 (column-parallel, fused GELU) → fc2 (row-parallel)
    hm = mm(h2, blk["w_fc1"], blk["r_fc1"], blk["b_fc1"],
            out_inv=blk["f1inv"], gelu=True, **mm_kw)
    acc2 = jax.lax.dot_general(
        hm, blk["w_fc2"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc2 = jax.lax.psum(acc2, "model")
    if blk["ln_next"] is not None:
        # fc2 + residual + next-LN fused epilogue (ViT's junction)
        xc_f, h_f = res_ln_epilogue_ref(
            acc2, blk["r_fc2"], blk["b_fc2"], xc.reshape(-1, c),
            blk["s_mlp_q2"], blk["s_blk_q2"], blk["s_blk_q4"],
            blk["ln_next"]["w"], blk["ln_next"]["b"],
            blk["ln_next_out"], 1.0,
        )
        return xc_f.reshape(bs, l, c), h_f.reshape(bs, l, c)
    # plain fc2 + unfused residual requant (the pre-downsample block form)
    h3 = requant_epilogue_ref(acc2, blk["r_fc2"], blk["b_fc2"])
    val = (xc.astype(jnp.float32) * blk["s_blk_q2"]
           + h3.astype(jnp.float32).reshape(bs, l, c) * blk["s_mlp_q2"])
    xc = jnp.clip(jnp.round(val / blk["s_blk_q4"]), *_I8).astype(jnp.int8)
    return xc, None


def tp_serving_fn(s, qstate, cfg: SwinConfig, mesh: Mesh, *,
                  lis: bool = True, use_pallas: bool = True,
                  interpret: bool = False):
    """Per-batch callable: DP×TP int8 Swin serving over ("data", "model").

    Returns f32 logits bitwise-equal to single-device
    ``serving_swin.serving_forward`` (the fuse_res default path) —
    tests/test_parallel.py pins it on the CPU mesh. See the module
    docstring for the splits and the tp-divisibility matrix."""
    tp = int(mesh.shape["model"])
    check_tp(cfg, tp)
    lis = bool(lis)
    tps, specs, shifts = _build_tp_state(s, qstate, cfg, tp)
    tps = _put_tree(tps, specs, mesh)

    def run(tp_state, x):
        b = x.shape[0]
        if x.dtype == jnp.uint8:
            x = serving_swin._u8_dequant(tp_state, x)
        q0 = jnp.clip(jnp.round(x / tp_state["s_input"]
                                + tp_state["zp_input"]), *_I8)
        x = (q0 - tp_state["zp_input"]) * tp_state["s_input"]
        pw = (tp_state["patch"]["w_q"].astype(jnp.float32)
              * tp_state["patch"]["sw"][:, None])
        px = _patches(x, cfg.patch_size)
        hh = px @ pw.T + tp_state["patch_b"]
        xc = jnp.clip(jnp.round(hh / tp_state["s_patch_bn"]),
                      *_I8).astype(jnp.int8)
        xc = serving_swin._iln(xc, tp_state["s_patch_bn"],
                               tp_state["patch_norm"], tp_state["s_patch"],
                               interpret=interpret, use_pallas=use_pallas)
        mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
        mm_kw = {"interpret": interpret} if use_pallas else {}
        final_ln = None
        for i, stage in enumerate(tp_state["stages"]):
            res = cfg.stage_res(i)
            ws = min(cfg.window_size, res)
            heads_local = cfg.num_heads[i] // tp
            h_ln = None
            for j, blk in enumerate(stage["blocks"]):
                xc, h_ln = _tp_block(
                    blk, shifts[i][j], xc, h_ln, res=res, ws=ws,
                    heads_local=heads_local, lis=lis,
                    use_pallas=use_pallas, interpret=interpret,
                )
            if "downsample" in stage:
                ds = stage["downsample"]
                xm = _merge_patches(xc, res)
                xm = serving_swin._iln(
                    xm, ds["s_prev"], ds["norm"], ds["s_q1"], expand=4,
                    interpret=interpret, use_pallas=use_pallas)
                c2 = xm.shape[-1]
                xc = mm(xm.reshape(-1, c2), ds["w_red"], ds["r_red"],
                        jnp.zeros((c2 // 2,)), **mm_kw
                        ).reshape(b, -1, c2 // 2)
            elif h_ln is not None:
                final_ln = h_ln
        if final_ln is None:
            final_ln = serving_swin._iln(
                xc, tp_state["final_s_prev"], tp_state["norm"],
                tp_state["s_q2"], interpret=interpret,
                use_pallas=use_pallas)
        mean_val = (final_ln.astype(jnp.float32).mean(axis=1)
                    * tp_state["s_q2"])
        c3 = jnp.clip(jnp.round(mean_val / tp_state["s_q3"]),
                      *_I8).astype(jnp.int8)
        logits_c = mm(
            c3, tp_state["head"]["w_q"],
            tp_state["s_q3"] * tp_state["head"]["sw"] / tp_state["s_out"],
            tp_state["head_b"] / tp_state["s_out"], **mm_kw,
        )
        return logits_c.astype(jnp.float32) * tp_state["s_out"]

    sharded = jax.shard_map(
        run, mesh=mesh, in_specs=(specs, P("data")), out_specs=P("data"),
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    nd = int(mesh.shape["data"])

    def fn(x):
        b = x.shape[0]
        pad = (-b) % nd
        if pad:  # eval loops yield a short final batch (dp_serving_fn's rule)
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
            )
        with mesh:
            out = jitted(tps, mesh_mod.shard_batch(mesh, x))
        return out[:b]

    return fn
