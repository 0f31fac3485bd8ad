"""Small-batch serving latency A/B (round 4).

Why: the 2026-08-19 bench added batch-1 latency and int8 serving LOSES to
bf16 XLA there (0.528 vs 0.285 ms — 0.54×). At M=197 tokens the MXU is
starved and per-kernel fixed costs (launch, prologue DMA, per-row VPU
chains that don't shrink with M) dominate — the exact regime where
``fuse_layer=True`` (ONE Pallas kernel per encoder layer, a measured null
at batch 256 because inter-kernel DMA was already hidden) could win by
collapsing 4 kernel launches + 3 HBM round trips per layer into 1.

Arms (deit_small unless argv says otherwise), each at batch {1, 8, 32}:
  bf16        the XLA baseline forward (same one bench.py ratios against)
  int8        serving defaults (fuse_qkv + fuse_embed)
  int8_fl     fuse_layer=True
  int8_loff   lis=False
  int8_fl_loff  fuse_layer + lis off
  wonly       weight-only mode (serving.weight_only_params -> bf16 XLA
              forward with the quantized weight codes as constants) —
              should time ~= bf16 by construction; the measurement pins it

Decision rule: if fuse_layer wins ≥5% at batch 1 AND is not worse at batch
32, flip the serving default to fuse_layer for small M (auto-select by
token count); otherwise record the measured numbers as the honest
batch-1 story (int8-over-bf16 on this chip is a throughput play).

Swin names run a reduced arm set (bf16 / int8 / int8_loff — Swin has no
fuse_layer mode): the windowed family carries ~16x more tokens per image
at batch 1, so its int8-over-bf16 crossover sits far below the ViT
family's (the deployment rule in RESULTS.md needs both numbers).

Usage: python tools/latency_ab.py [deit_small deit_base swin_tiny ...]
       [--batches 64,128]   (override the default 1,8,32 sweep — e.g. to
       locate the int8-over-bf16 crossover batch between 32 and 256)
Repo root, real chip (interpret-mode smoke under JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

from bench import _time_fn
from p2vit_tpu.config import make_policy
from p2vit_tpu.models import SWIN_ZOO, VIT_ZOO, vit
from p2vit_tpu.models import swin as swin_mod
from p2vit_tpu import serving, serving_swin

from tools._zoo import ALIAS
# iters scale inversely with batch so every timed run amortizes the ~30 ms
# fixed tunnel overhead (BENCH.md methodology)
ITERS = {1: 200, 8: 100, 32: 50}


def _run_swin(name, batches, policy, on_accel, res):
    """Swin arm set: bf16 / int8 / int8_loff (no fuse_layer mode)."""
    cfg = SWIN_ZOO[name]
    params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
    x8 = jax.random.normal(jax.random.PRNGKey(2),
                           (8, 3, cfg.img_size, cfg.img_size), jnp.float32)
    calib = swin_mod.calibrate(params, cfg, policy, x8)
    ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
    _b16 = lambda p: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)
    pb16 = _b16(params)
    # weight-only mode: same XLA program as bf16, quantized-weight consts
    pw16 = _b16(serving_swin.weight_only_params(
        params, calib.qstate, cfg, policy, 8))
    skw = {"use_pallas": on_accel}
    for batch in batches:
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (batch, 3, cfg.img_size, cfg.img_size),
                              jnp.float32)
        iters = ITERS.get(batch, max(20, 6400 // batch)) if on_accel else 1
        row = {}
        row["bf16_ms"] = _time_fn(
            lambda xx, p: swin_mod.fp_forward(p, cfg,
                                              xx.astype(jnp.bfloat16)),
            x, pb16, iters=iters) * 1e3
        for arm, lis in (("int8", True), ("int8_loff", False)):
            row[arm + "_ms"] = _time_fn(
                lambda xx, s, q, lis=lis: serving_swin.serving_forward(
                    s, q, cfg, policy, xx, lis=lis, **skw),
                x, ss, calib.qstate, iters=iters) * 1e3
        row["wonly_ms"] = _time_fn(
            lambda xx, p: swin_mod.fp_forward(p, cfg,
                                              xx.astype(jnp.bfloat16)),
            x, pw16, iters=iters) * 1e3
        res[f"{name}@b{batch}"] = {k: round(v, 4) for k, v in row.items()}
        best = min(("int8", "int8_loff", "wonly"),
                   key=lambda a: row[a + "_ms"])
        print(f"  {name} b={batch:3}: bf16 {row['bf16_ms']:7.3f} | "
              f"int8 {row['int8_ms']:7.3f} | "
              f"int8_loff {row['int8_loff_ms']:7.3f} | "
              f"wonly {row['wonly_ms']:7.3f}  best={best}")


def main():
    from p2vit_tpu.profiling import require_tpu

    require_tpu()
    args = sys.argv[1:]
    batches = None
    if "--batches" in args:
        i = args.index("--batches")
        batches = tuple(int(b) for b in args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    names = [ALIAS.get(n, n) for n in args] or ["deit_small_patch16_224"]
    policy = make_policy()
    on_accel = jax.devices()[0].platform != "cpu"
    if batches is None:
        batches = (1, 8, 32) if on_accel else (1,)
    print(f"== latency_ab platform={jax.devices()[0].platform}")
    kw = {"use_pallas": True} if on_accel else {
        "use_pallas": True, "interpret": True}
    arms = {
        "int8": {},
        "int8_fl": {"fuse_layer": True},
        "int8_loff": {"lis": False},
        "int8_fl_loff": {"fuse_layer": True, "lis": False},
    }
    res = {}
    for name in names:
        if name in SWIN_ZOO:
            _run_swin(name, batches, policy, on_accel, res)
            continue
        cfg = VIT_ZOO[name]
        params = vit.init_params(jax.random.PRNGKey(0), cfg)
        qstate = vit.synthetic_qstate(cfg)
        sstate = serving.convert(params, qstate, cfg, policy,
                                 [8] * cfg.num_matmuls)
        _b16 = lambda p: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, p)
        pb16 = _b16(params)
        # weight-only mode: bf16 XLA program, quantized-weight constants
        pw16 = _b16(serving.weight_only_params(
            params, qstate, cfg, policy, [8] * cfg.num_matmuls))
        for batch in batches:
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (batch, 3, cfg.img_size, cfg.img_size),
                                  jnp.float32)
            iters = ITERS.get(batch, max(20, 6400 // batch)) if on_accel else 1
            row = {}
            row["bf16_ms"] = _time_fn(
                lambda xx, p: vit.fp_forward(p, cfg,
                                             xx.astype(jnp.bfloat16)),
                x, pb16, iters=iters) * 1e3
            for arm, akw in arms.items():
                row[arm + "_ms"] = _time_fn(
                    lambda xx, s, a=dict(akw): serving.serving_forward(
                        s, cfg, xx, **a, **kw),
                    x, sstate, iters=iters) * 1e3
            row["wonly_ms"] = _time_fn(
                lambda xx, p: vit.fp_forward(p, cfg,
                                             xx.astype(jnp.bfloat16)),
                x, pw16, iters=iters) * 1e3
            # argmax parity of the fuse_layer arm against the default arm
            # at this batch (documented bit-identical; cheap to re-pin at
            # the small shapes this tool exists for)
            la = serving.serving_forward(sstate, cfg, x, **kw)
            lb = serving.serving_forward(sstate, cfg, x, fuse_layer=True,
                                         **kw)
            row["fl_argmax_agree"] = float(
                (jnp.argmax(la, -1) == jnp.argmax(lb, -1)).mean())
            res[f"{name}@b{batch}"] = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in row.items()}
            best = min(list(arms) + ["wonly"], key=lambda a: row[a + "_ms"])
            print(f"  {name} b={batch:3}: bf16 {row['bf16_ms']:7.3f} | "
                  + " | ".join(f"{a} {row[a + '_ms']:7.3f}" for a in arms)
                  + f" | wonly {row['wonly_ms']:7.3f}"
                  + f"  best={best} agree={row['fl_argmax_agree']}")
    print("\n" + json.dumps(res))


if __name__ == "__main__":
    main()
