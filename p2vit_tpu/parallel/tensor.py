"""Tensor-parallel int8 serving: megatron-style TP over the "model" axis.

The reference is single-GPU (SURVEY §0); its paper's accelerator serves one
chip. The TPU-native scale-out for SERVING (latency regime / weights beyond
one chip's HBM) shards the encoder across the ("data", "model") mesh of
parallel/mesh.py:

  * **qkv — column-parallel, head-aligned.** Weight rows are pre-permuted
    head-major (``_qkv_tp_perm``) so each device's contiguous row shard is
    ``[q_heads_d; k_heads_d; v_heads_d]`` — exactly the fused-qkv layout the
    attention kernels expect, at ``heads/tp`` local heads. The requant
    epilogue is per-output-channel, so every sharded channel is computed by
    the identical kernel math as the full matmul: bitwise.
  * **attention — head-parallel.** Heads are independent
    (ops/attention_lis.py processes them in a per-head loop already); each
    device runs the unmodified kernel on its local heads.
  * **proj / fc2 — row-parallel with int32-exact reduction.** Each device
    contracts its in-feature shard to a PARTIAL int32 accumulator, the mesh
    ``psum``s the int32 partials (integer addition is associative and
    overflow-free: |acc| < 2^26 at ViT shapes), and the residual+LN requant
    epilogue (``ops.matmul_ln.res_ln_epilogue_ref`` — the fused kernel's
    own post-dot chain) runs on the replicated full accumulator. This is
    the quantized-serving twist on megatron row-parallelism: the collective
    must happen on the raw accumulator BEFORE the requant round/clip, or
    the mid-node codes would be computed from partial sums.
  * **fc1 — column-parallel** with the fused GELU epilogue, per-channel as
    qkv.
  * embed prologue and classifier head are replicated along "model" (each
    model shard computes them identically; they are a few percent of the
    FLOPs) and sharded along "data".

Because every sharded op either (a) computes complete output channels with
the unmodified kernels or (b) reduces exact int32 partials before the
epilogue, TP logits are BITWISE equal to single-device
``serving.serving_forward`` — pinned by tests/test_parallel.py on the
8-virtual-device CPU mesh, composing with DP (data axis) in the same jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import serving
from ..models.common import ViTConfig
from . import mesh as mesh_mod
from ..ops.attention_lis import (
    lis_attention_fused,
    lis_attention_qkv_fused,
    lis_attention_ref,
)
from ..ops.matmul_int8 import int8_matmul_requant, int8_matmul_requant_ref
from ..ops.matmul_ln import res_ln_epilogue_ref


def _qkv_tp_perm(c: int, num_heads: int, tp: int) -> np.ndarray:
    """Row permutation of the (3C, C) qkv weight for head-aligned TP.

    Global rows are [q(all heads); k(all); v(all)]; the permuted order is,
    per device shard d, [q(heads of d); k(heads of d); v(heads of d)] — so
    a contiguous axis-split over "model" hands each device a valid local
    fused-qkv weight at heads/tp heads (heads stay in global ascending
    order inside the shard, matching the column order of the proj weight's
    in-feature shard)."""
    hd = c // num_heads
    idx = np.arange(3 * c).reshape(3, num_heads // tp * tp, hd)
    idx = idx.reshape(3, tp, num_heads // tp, hd)
    return idx.transpose(1, 0, 2, 3).reshape(-1)


# PartitionSpec per entry of serving.stack_layer_consts's 29-tuple
# (leading axis is always depth L, never sharded).
_LAYER_SPECS = (
    P(None, "model", None),  # w_qkv   (L, 3C, C)  column-parallel (permuted)
    P(None, "model"),        # qr      (L, 3C)
    P(None, "model"),        # qb      (L, 3C)
    P(None),                 # srq     (L,)
    P(None),                 # sat     (L,)
    P(None),                 # oro     (L,)
    P(None, None, "model"),  # w_proj  (L, C, C)   row-parallel (in-features)
    P(None, None),           # prr     (L, C)   — post-psum epilogue, replicated
    P(None, None),           # prb
    P(None, None),           # smid
    P(None, None),           # sprev
    P(None, None),           # sres1
    P(None, None),           # ln2w
    P(None, None),           # ln2b
    P(None, None),           # ln2o
    P(None, None),           # ln2r
    P(None, "model", None),  # w_fc1   (L, hid, C) column-parallel
    P(None, "model"),        # f1r     (L, hid)
    P(None, "model"),        # f1b     (L, hid)
    P(None),                 # f1inv   (L,)
    P(None, None, "model"),  # w_fc2   (L, C, hid) row-parallel
    P(None, None),           # f2r — post-psum epilogue, replicated
    P(None, None),           # f2b
    P(None, None),           # smid2
    P(None, None),           # sres2
    P(None, None),           # lnnw
    P(None, None),           # lnnb
    P(None, None),           # lnno
    P(None, None),           # lnnr
)


def _embed_head_state(s) -> dict:
    """The (small) replicated slice of the serving state that the embed
    prologue and classifier head read — everything else lives only in the
    sharded layer-consts stack, so TP genuinely shards the weights."""
    b0 = s["blocks"][0]
    es = {
        "s_input": s["s_input"],
        "patch": s["patch"],
        "cls_codes": s["cls_codes"],
        "s_embed": s["s_embed"],
        "pos_codes": s["pos_codes"],
        "s_pos": s["s_pos"],
        "s_qact1": s["s_qact1"],
        "blocks": [
            {
                "norm1_w": b0["norm1_w"],
                "norm1_b": b0["norm1_b"],
                "qkv": {"s_act": b0["qkv"]["s_act"], "cs": b0["qkv"]["cs"]},
            }
        ],
        "norm_w": s["norm_w"],
        "norm_b": s["norm_b"],
        "s_qact2": s["s_qact2"],
        "head": s["head"],
        "s_out": s["s_out"],
    }
    if "u8" in s:  # raw-uint8 ingestion constants (serving.attach_u8_ingest)
        es["u8"] = s["u8"]
    return es


def _tp_layer(heads_local: int, layer, h, xc, *, lis, use_pallas, interpret,
              sp=False, fuse_qkv=True):
    """One encoder layer on codes, per model-shard (shard_map body helper).

    Mirrors serving.apply_unfused_layer's op order with the TP splits
    described in the module docstring. ``h`` is replicated along "model"
    ((B_local, N, C) full-width codes); ``xc`` is replicated too unless
    ``sp`` (sequence-parallel epilogues), in which case it rides
    ROW-SHARDED over "model" ((B_local·N/tp, C)) between layers.

    ``sp`` is the megatron-SP analogue for the two row-parallel junctions:
    the epilogue (requant + residual + int-LN) is row-independent, so
    instead of ``psum``-ing the int32 accumulator and running the epilogue
    replicated on every model shard, ``psum_scatter`` hands each device
    1/tp of the rows (same exact integer reduction), the epilogue runs on
    the shard (tp× less VPU work — the serving-critical resource,
    BENCH.md), and the ``all_gather`` back to full rows moves int8 CODES —
    4× fewer bytes than the int32 accumulator an all-reduce would move.
    Identical values in, identical math per row: still bitwise."""
    (w_qkv, qr, qb, srq, sat, oro, w_proj, prr, prb, smid, sprev,
     sres1, ln2w, ln2b, ln2o, ln2r, w_fc1, f1r, f1b, f1inv, w_fc2,
     f2r, f2b, smid2, sres2, lnnw, lnnb, lnno, lnnr) = layer
    mm = int8_matmul_requant if use_pallas else int8_matmul_requant_ref
    mm_kw = {"interpret": interpret} if use_pallas else {}
    b, n_tok, c = h.shape
    c3l = w_qkv.shape[0]
    c_local = c3l // 3
    hd = c_local // heads_local

    def _reduce(a):
        if sp:
            return jax.lax.psum_scatter(a, "model", scatter_dimension=0,
                                        tiled=True)
        return jax.lax.psum(a, "model")

    def _rows(codes):
        return (jax.lax.all_gather(codes, "model", axis=0, tiled=True)
                if sp else codes)

    # qkv (column-parallel, complete channels) → head-local attention.
    # The qkv-fused kernel shards cleanly: the head-aligned permutation
    # makes the local (3C/tp, C) weight a valid fused-qkv weight at
    # heads_local heads, so the production kernel runs unmodified.
    if use_pallas and fuse_qkv:
        attn = lis_attention_qkv_fused(
            h, w_qkv, qr, qb, heads_local, srq, sat, oro, lis=lis,
            interpret=interpret,
        )
    elif use_pallas:
        h2 = mm(h.reshape(-1, c), w_qkv, qr, qb, **mm_kw).reshape(
            b, n_tok, c3l
        )
        attn = lis_attention_fused(h2, heads_local, srq, sat, oro, lis=lis,
                                   interpret=interpret)
    else:
        h2 = mm(h.reshape(-1, c), w_qkv, qr, qb, **mm_kw).reshape(
            b, n_tok, c3l
        )
        qkv_c = h2.reshape(b, n_tok, 3, heads_local, hd).transpose(
            2, 0, 3, 1, 4
        )
        av = lis_attention_ref(
            qkv_c[0].reshape(b * heads_local, n_tok, hd),
            qkv_c[1].reshape(b * heads_local, n_tok, hd),
            qkv_c[2].reshape(b * heads_local, n_tok, hd),
            srq, sat, oro, lis=lis,
        )
        attn = (
            av.reshape(b, heads_local, n_tok, hd)
            .transpose(0, 2, 1, 3)
            .reshape(b, n_tok, c_local)
        )

    # proj (row-parallel): partial int32 → reduce → res+LN epilogue
    acc = jax.lax.dot_general(
        attn.reshape(-1, c_local), w_proj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    res1 = xc if sp else xc.reshape(-1, c)
    xc2, h1 = res_ln_epilogue_ref(
        _reduce(acc), prr, prb, res1, smid, sprev, sres1,
        ln2w, ln2b, ln2o, ln2r,
    )

    # fc1 (column-parallel, fused GELU) → fc2 (row-parallel)
    hm = mm(_rows(h1), w_fc1, f1r, f1b, out_inv=f1inv, gelu=True, **mm_kw)
    acc2 = jax.lax.dot_general(
        hm, w_fc2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    xc3, h3 = res_ln_epilogue_ref(
        _reduce(acc2), f2r, f2b, xc2, smid2, sres1, sres2,
        lnnw, lnnb, lnno, lnnr,
    )
    h3 = _rows(h3).reshape(b, n_tok, c)
    return h3, (xc3 if sp else xc3.reshape(b, n_tok, c))


def tp_serving_fn(s, cfg: ViTConfig, mesh: Mesh, *, lis: bool = True,
                  use_pallas: bool = True, interpret: bool = False,
                  fuse_embed: bool = True, fuse_qkv: bool = True,
                  seq_parallel: bool = False):
    """Per-batch callable: DP×TP int8 serving over a ("data", "model") mesh.

    Returns f32 logits bitwise-equal to single-device
    ``serving.serving_forward`` (tests/test_parallel.py). ``fuse_qkv``
    runs the production qkv-fused attention kernel per shard (the
    head-aligned permutation makes the local weight a valid fused-qkv
    weight — same default as single-device serving); the whole-layer
    kernel takes full-width weights and stays single-device-only.

    ``seq_parallel`` additionally row-shards the two requant+res+LN
    epilogues per layer over "model" (``psum_scatter`` the int32
    accumulator, epilogue on the token shard, ``all_gather`` int8 codes) —
    tp× less epilogue VPU work and ~half the collective bytes per
    junction, still bitwise (see ``_tp_layer``). The residual codes stream
    stays row-sharded across the whole encoder depth.
    """
    tp = mesh.shape["model"]
    c = cfg.embed_dim
    if cfg.num_heads % tp:
        raise ValueError(
            f"num_heads={cfg.num_heads} not divisible by model axis {tp}"
        )
    hidden = s["blocks"][0]["mlp_fc1"]["w_q"].shape[0]
    if hidden % tp:
        raise ValueError(f"mlp hidden {hidden} not divisible by {tp}")
    heads_local = cfg.num_heads // tp

    consts = list(serving.stack_layer_consts(s, cfg))
    perm = _qkv_tp_perm(c, cfg.num_heads, tp)
    consts[0] = consts[0][:, perm, :]
    consts[1] = consts[1][:, perm]
    consts[2] = consts[2][:, perm]
    # Distribute the state ONCE, here — not per batch: without explicit
    # device_puts the jitted call would re-shard every layer constant from
    # the default device on EVERY fn() invocation (ViT-L: ~300 MB/batch of
    # host-side resharding on the serving hot path).
    consts = tuple(
        jax.device_put(c_, NamedSharding(mesh, spec))
        for c_, spec in zip(consts, _LAYER_SPECS)
    )
    es = jax.device_put(_embed_head_state(s), NamedSharding(mesh, P()))

    def run(es_, layers, x):
        h, xc = serving.embed_codes(
            es_, cfg, x, use_pallas=use_pallas, interpret=interpret,
            fuse_embed=fuse_embed,
        )
        if seq_parallel:
            # enter the row-sharded residual stream: device i of the
            # "model" axis owns row block i (psum_scatter's block order)
            xcf = xc.reshape(-1, c)
            rows_per = xcf.shape[0] // tp
            xc = jax.lax.dynamic_slice_in_dim(
                xcf, jax.lax.axis_index("model") * rows_per, rows_per, 0
            )

        def body(carry, layer):
            return _tp_layer(heads_local, layer, *carry, lis=lis,
                             use_pallas=use_pallas, interpret=interpret,
                             sp=seq_parallel, fuse_qkv=fuse_qkv), None

        (h, xc), _ = jax.lax.scan(body, (h, xc), layers)
        return serving.head_logits(es_, h, use_pallas=use_pallas,
                                   interpret=interpret)

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), _LAYER_SPECS, P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    nd = int(mesh.shape["data"])
    # SP needs each data shard's token-row count divisible by tp; padding
    # the batch to nd·tp multiples guarantees it for any sequence length
    # (197 is prime — rows only factor through the local batch).
    quantum = nd * tp if seq_parallel else nd

    def fn(x):
        b = x.shape[0]
        pad = (-b) % quantum
        if pad:  # eval loops yield a short final batch (dp_serving_fn's rule)
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
            )
        with mesh:
            out = jitted(es, consts, mesh_mod.shard_batch(mesh, x))
        return out[:b]

    return fn
