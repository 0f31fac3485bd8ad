#!/usr/bin/env python
"""On-chip A/B harness for the pending kernel variants (BENCH.md).

Run the moment the axon tunnel is alive:

    python tools/ab_tpu.py            # all sections
    python tools/ab_tpu.py vit swin   # subset

Measures (DeiT-S batch 256, Swin-T batch 64, on-device fori_loop timing —
see BENCH.md methodology; host timing through the tunnel measures RTT):

  vit:   bf16 XLA baseline; int8 serving LIS-on / LIS-off; fuse_qkv on/off
         (qkv projection inside the attention kernel vs the two-step path).
  swin:  int8 Swin serving with XLA window attention vs the fused Pallas
         window-attention kernel (pallas_attn=True), plus a parity check.
  calib: one-shot jitted full-calibration latency (100-image batch).

Prints one human-readable line per measurement plus a final JSON summary
for BENCH.md bookkeeping.
"""

import json
import sys

sys.path.insert(0, ".")  # run from the repo root

import numpy as np
import jax

# persistent compile cache: Mosaic kernel compiles through the tunnel run
# ~30-40 s each (the fused-layer kernel worse); cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

from p2vit_tpu.config import make_policy
from p2vit_tpu.models import MODEL_ZOO, SWIN_ZOO, VIT_ZOO
from p2vit_tpu.models import swin as swin_mod
from p2vit_tpu.models import vit
from p2vit_tpu import serving, serving_swin
from p2vit_tpu.profiling import device_time

RESULTS: dict = {}


def _t(fn, x, iters=20, repeats=3):
    # iters ≥ 20: the tunnel adds ~30 ms fixed overhead per timed run
    return device_time(fn, x, iters=iters, repeats=repeats)


def section_vit():
    policy = make_policy()
    cfg = VIT_ZOO["deit_small_patch16_224"]
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    sst = serving.convert(params, qstate, cfg, policy, [8] * cfg.num_matmuls)
    batch = 256
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224))

    pbf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    f_bf16 = jax.jit(lambda xx: vit.fp_forward(pbf16, cfg, xx.astype(jnp.bfloat16)))
    variants = {
        "bf16_xla": f_bf16,
        # defaults: fuse_qkv=True, fuse_layer=False (the A/B winners)
        "int8_lis_on": jax.jit(
            lambda xx: serving.serving_forward(sst, cfg, xx, use_pallas=True)
        ),
        "int8_lis_on_two_step": jax.jit(
            lambda xx: serving.serving_forward(
                sst, cfg, xx, use_pallas=True, fuse_qkv=False
            )
        ),
        "int8_lis_on_fuse_layer": jax.jit(
            lambda xx: serving.serving_forward(
                sst, cfg, xx, use_pallas=True, fuse_layer=True
            )
        ),
        "int8_lis_off": jax.jit(
            lambda xx: serving.serving_forward(sst, cfg, xx, use_pallas=True, lis=False)
        ),
    }
    # parity spot check before timing
    a = np.asarray(variants["int8_lis_on"](x[:8]))
    for other in ("int8_lis_on_two_step", "int8_lis_on_fuse_layer"):
        b = np.asarray(variants[other](x[:8]))
        assert (a == b).all(), f"{other} must be bit-identical"
    print("fuse_qkv / fuse_layer parity on chip: bit-identical")
    for name, fn in variants.items():
        ips = batch / _t(fn, x)
        RESULTS[f"vit_{name}_img_s"] = round(ips, 1)
        print(f"deit-small {name}: {ips:.1f} img/s")


def section_swin():
    policy = make_policy()
    cfg = SWIN_ZOO["swin_tiny_patch4_window7_224"]
    params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
    batch = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224))
    calib = swin_mod.calibrate(params, cfg, policy, x[:8])
    ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)

    f_xla = jax.jit(lambda xx: serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, xx, use_pallas=True,
        pallas_attn=False))
    f_pal = jax.jit(lambda xx: serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, xx, use_pallas=True, pallas_attn=True))
    f_nofuse = jax.jit(lambda xx: serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, xx, use_pallas=True, fuse_res=False))
    # fuse_stem defaults OFF (A/B'd a wash) — pass True so this arm really
    # exercises the fused stem kernel (don't repeat the xla_attn mistake of
    # passing the default on both arms)
    f_stem = jax.jit(lambda xx: serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, xx, use_pallas=True, fuse_stem=True))
    # fold_windows: in-VMEM windowing (no partition/reverse copies) —
    # bit-identical to the two-step path by construction, A/B'd here
    f_fold = jax.jit(lambda xx: serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, xx, use_pallas=True,
        fold_windows=True))
    # int_stem: int8 MXU patch stem on the input codes (legal since the
    # qact_input parity fix) vs the fp stem — knife-edge-only differences
    f_istem = jax.jit(lambda xx: serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, xx, use_pallas=True, int_stem=True))
    a, b = np.asarray(f_xla(x[:8])), np.asarray(f_pal(x[:8]))
    agree = float((a.argmax(1) == b.argmax(1)).mean())
    rel = float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9))
    print(f"swin attn parity on chip: rel={rel:.2e} argmax_agree={agree}")
    # fold_windows is bit-identical by construction (exact); the other arms
    # are documented to differ at rounding knife edges — allow one near-tie
    # argmax flip in the batch of 8 rather than killing the whole A/B run.
    # Per-arm try/except: a Mosaic lowering refusal (fold_windows' strip
    # relayout, measured 2026-08-19: "infer-vector-layout: unsupported
    # shape cast" on the (ws, g·ws)→(g, ws·ws) sublane split) must be
    # RECORDED, not abort the other arms' decisions.
    dead = set()
    # arm names here MUST match the timing loop's below: `dead` is keyed by
    # them, and a Mosaic refusal writes its failure marker under the same
    # RESULTS key the timing loop would (round-4 self-review: the old
    # "fuse_res"/"fuse_stem" names defeated the per-arm resilience for
    # those two arms and misplaced their failure markers).
    for other, fn_o, min_agree in (
            ("fuse_res_off", f_nofuse, 0.875), ("fuse_stem_on", f_stem, 0.875),
            ("fold_windows", f_fold, 1.0), ("int_stem", f_istem, 0.875)):
        try:
            c = np.asarray(fn_o(x[:8]))
        except Exception as e:
            dead.add(other)
            RESULTS[f"swin_{other}_img_s"] = f"lowering failed: {type(e).__name__}"
            print(f"swin {other}: LOWERING FAILED on chip — "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        agree = float((b.argmax(1) == c.argmax(1)).mean())
        rel = float(np.linalg.norm(b - c) / max(np.linalg.norm(c), 1e-9))
        print(f"swin {other} parity on chip: rel={rel:.2e} "
              f"argmax_agree={agree}")
        assert agree >= min_agree, (other, agree)
    for name, fn in (("xla_attn", f_xla), ("pallas_attn", f_pal),
                     ("fuse_res_off", f_nofuse), ("fuse_stem_on", f_stem),
                     ("fold_windows", f_fold), ("int_stem", f_istem)):
        if name in dead:
            continue
        ips = batch / _t(fn, x)
        RESULTS[f"swin_{name}_img_s"] = round(ips, 1)
        print(f"swin-tiny {name}: {ips:.1f} img/s")


def _zoo_one(name, batch=8):
    """Convert + compile + run the int8 serving path for one zoo config on
    the REAL chip and assert serving-vs-sim argmax parity."""
    policy = make_policy()
    cfg = MODEL_ZOO[name]
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224))
    # NOTE: serving_forward is already jitted with the ServingState as a
    # RUNTIME argument. Wrapping it in jax.jit(lambda xx: ...) would close
    # over the weights and inline them as HLO constants — ViT-L's ~1.2 GB
    # of literals blew the tunnel's compile-request size cap (HTTP 413).
    if name in SWIN_ZOO:
        params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
        calib = swin_mod.calibrate(params, cfg, policy, x)
        ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
        on = np.asarray(serving_swin.serving_forward(
            ss, calib.qstate, cfg, policy, x, use_pallas=True,
            pallas_attn=True))
        sim = np.asarray(serving_swin.serving_forward(
            ss, calib.qstate, cfg, policy, x, use_pallas=False))
        # candidate-default option set at THIS geometry: if the Swin-T A/B
        # flips a default, Swin-S/B must already have compiled +
        # argmax-matched on chip (the C=1536 VMEM incident rule: interpret
        # mode cannot vouch for Mosaic). int_stem is knife-edge inexact →
        # allow one flip in the batch of 8. fold_windows is EXCLUDED since
        # 2026-08-19: Mosaic refuses its strip relayout on chip
        # ("unsupported shape cast" on the (ws, g·ws)→(g, ws·ws) sublane
        # split) — it stays an interpret-verified experiment, never a
        # default candidate.
        opts = np.asarray(serving_swin.serving_forward(
            ss, calib.qstate, cfg, policy, x, use_pallas=True,
            pallas_attn=True, int_stem=True))
        oagree = float((opts.argmax(1) == sim.argmax(1)).mean())
        RESULTS[f"zoo_{name}_opts_argmax_agree"] = oagree
        print(f"zoo {name} (int_stem): argmax_agree={oagree}")
        assert oagree >= 0.875, f"{name}: option set diverges ({oagree})"
    else:
        params = vit.init_params(jax.random.PRNGKey(0), cfg)
        qstate = vit.synthetic_qstate(cfg)
        ss = serving.convert(params, qstate, cfg, policy, [8] * cfg.num_matmuls)
        on = np.asarray(serving.serving_forward(ss, cfg, x, use_pallas=True))
        sim = np.asarray(serving.serving_forward(ss, cfg, x, use_pallas=False))
    agree = float((on.argmax(1) == sim.argmax(1)).mean())
    rel = float(np.linalg.norm(on - sim) / max(np.linalg.norm(sim), 1e-9))
    RESULTS[f"zoo_{name}_argmax_agree"] = agree
    print(f"zoo {name}: serving-vs-sim argmax_agree={agree} rel={rel:.2e}")
    assert agree == 1.0, f"{name}: on-chip serving diverges from sim"


def section_zoo():
    """On-chip smoke of ALL 8 zoo configs (VERDICT r2 item 3): interpret-
    mode tests cannot catch Mosaic lowering/VMEM failures (the Swin C=1536
    scoped-VMEM cap, the row-slice gather bug), so every geometry must
    compile + run + argmax-match its simulation on the real chip.
    `python tools/ab_tpu.py zoo:<model>` runs one config."""
    for name in MODEL_ZOO:
        _zoo_one(name)


def section_u8():
    """uint8 ingestion on chip: prove both device ingestion forms against
    the host golden table by enumeration (the TPU's f32 divide/FMA rounding
    is exactly what the CPU proof can't vouch for), check whole-model logits
    parity, and time f32 vs u8 entry at the bench batch."""
    policy = make_policy()
    cfg = VIT_ZOO["deit_small_patch16_224"]
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    qstate = vit.synthetic_qstate(cfg)
    sst = serving.convert(params, qstate, cfg, policy, [8] * cfg.num_matmuls)
    serving.attach_u8_ingest(sst)
    batch = 256
    u8 = jax.random.randint(
        jax.random.PRNGKey(2), (batch, 3, 224, 224), 0, 256, dtype=jnp.uint8
    )
    mean, std = sst["u8"]["mean"], sst["u8"]["std"]
    xf = (u8.astype(jnp.float32) / jnp.float32(255.0)
          - mean[:, None, None]) / std[:, None, None]

    exact = serving.u8_ingest_exact(sst)
    aff = serving.u8_ingest_exact(sst, affine=True)
    RESULTS["u8_exact_on_chip"] = exact
    RESULTS["u8_affine_exact_on_chip"] = aff
    print(f"u8 ingestion enumeration on chip: literal={exact} affine={aff}")

    f_f32 = jax.jit(lambda xx: serving.serving_forward(sst, cfg, xx))
    f_u8 = jax.jit(lambda xx: serving.serving_forward(sst, cfg, xx))
    f_u8a = jax.jit(
        lambda xx: serving.serving_forward(sst, cfg, xx, u8_affine=True)
    )
    a = np.asarray(f_f32(xf[:8]))
    # only demand argmax identity where the just-run enumeration proved the
    # ingest form exact on this backend; an inexact affine form (FMA knife
    # edge) is recorded above, not a reason to kill the bench run
    for name, fn, proven in (("u8", f_u8, exact), ("u8_affine", f_u8a, aff)):
        b = np.asarray(fn(u8[:8]))
        same = bool((a == b).all())
        agree = float((a.argmax(1) == b.argmax(1)).mean())
        print(f"{name} vs f32 logits on chip: bit_equal={same} "
              f"argmax_agree={agree}")
        if proven:
            assert agree == 1.0, (name, agree)
    for name, fn, xx in (("f32_entry", f_f32, xf), ("u8_entry", f_u8, u8),
                         ("u8_affine_entry", f_u8a, u8)):
        ips = batch / _t(fn, xx)
        RESULTS[f"vit_{name}_img_s"] = round(ips, 1)
        print(f"deit-small {name}: {ips:.1f} img/s")


def section_calib():
    policy = make_policy()
    cfg = VIT_ZOO["deit_small_patch16_224"]
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    xc = jax.random.normal(jax.random.PRNGKey(7), (100, 3, 224, 224))

    def calib_step(xx):
        qs, _ = vit._calibrate_jit(params, cfg, policy, xx, None)
        return jnp.stack(
            [jnp.asarray(l, jnp.float32).sum() for l in jax.tree.leaves(qs)]
        ).sum()[None]

    s = _t(jax.jit(calib_step), xc, iters=1, repeats=4)
    RESULTS["calib_s_100img"] = round(s, 3)
    print(f"calibration (100 img, one jitted solve): {s:.3f} s")


if __name__ == "__main__":
    from p2vit_tpu.profiling import require_tpu

    require_tpu()  # fail fast on a dead tunnel (no-op under JAX_PLATFORMS=cpu)
    sections = sys.argv[1:] or ["vit", "swin", "calib"]
    print("devices:", jax.devices())
    for name in sections:
        if name.startswith("zoo:"):
            _zoo_one(name.split(":", 1)[1])
        else:
            globals()[f"section_{name}"]()
    print(json.dumps(RESULTS))
