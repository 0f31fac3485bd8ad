"""In-situ decomposition of the residual+int-LN junction cost (round 4).

Why: the additive ceiling's res+LN term came from STANDALONE differential
pairs (mm±res/LN at the same shapes), the only term without an in-situ
probe — and the round-4 independent cross-check (tools/roofline_xcheck.py)
measured its pure in-VMEM compute at less than HALF the standalone charge
(DeiT-S 0.294 vs 0.610 ms/layer). This tool settles which number the real
pipeline pays, with end-to-end serving deltas (depth-amortized, so every
Mosaic overlap effect is included):

  resln=True     production fused junction kernels (ops/matmul_ln.py)
  resln="novpu"  same kernel I/O, junction chains' VPU work skipped
                 -> t(True) - t(novpu)  = in-situ VPU cost of the chains
  resln="nodma"  bare requant matmul, no res operand, one output
                 -> t(novpu) - t(nodma) = in-situ DMA exposure of the
                                          res read + second output write

Decision rule (BENCH.md round-4 cross-check): if the in-situ total
(True - nodma) lands near the pure-compute number, the additive table's
0.61/0.69 terms overstate the junction and the reopened DeiT-S gap is
attribution error, not reclaimable time; if it lands near the standalone
differential, the junction DMA is real exposed time and a packed-transport
kernel is the next experiment.

Usage: python tools/resln_insitu.py [deit_small deit_base ...]
Repo root, real chip.
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
from p2vit_tpu.models import VIT_ZOO, vit
from p2vit_tpu import serving

from tools._zoo import ALIAS, BATCH
# the additive-model 2x res+LN terms and the pure in-VMEM marginals
# (BENCH.md round-4 cross-check table), ms/layer, for the printed verdict
PRIOR = {"deit_tiny_patch16_224": (0.450, 0.218),
         "deit_small_patch16_224": (0.610, 0.294),
         "deit_base_patch16_224": (0.690, 0.220)}


def main():
    from p2vit_tpu.profiling import require_tpu

    require_tpu()
    names = [ALIAS.get(n, n) for n in sys.argv[1:]] or [
        "deit_small_patch16_224", "deit_base_patch16_224"]
    policy = make_policy()
    on_accel = jax.devices()[0].platform != "cpu"
    print(f"== resln_insitu platform={jax.devices()[0].platform}")
    res = {}
    for name in names:
        cfg = VIT_ZOO[name]
        batch = BATCH.get(name, 64)
        params = vit.init_params(jax.random.PRNGKey(0), cfg)
        qstate = vit.synthetic_qstate(cfg)
        sstate = serving.convert(params, qstate, cfg, policy,
                                 [8] * cfg.num_matmuls)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (batch, 3, cfg.img_size, cfg.img_size),
                              jnp.float32)
        # the probe arms exist only in the Pallas kernels (guarded), so the
        # CPU smoke path runs them in interpret mode
        kw = {"use_pallas": True} if on_accel else {
            "use_pallas": True, "interpret": True}
        t = {}
        for arm in (True, "novpu", "nodma"):
            t[arm] = _time_fn(
                lambda xx, s, arm=arm: serving.serving_forward(
                    s, cfg, xx, resln=arm, **kw),
                x, sstate)
            print(f"  {name} resln={arm!s:6}  {t[arm]*1e3:9.3f} ms")
        d = cfg.depth
        vpu = (t[True] - t["novpu"]) / d * 1e3
        dma = (t["novpu"] - t["nodma"]) / d * 1e3
        tot = (t[True] - t["nodma"]) / d * 1e3
        standalone, pure = PRIOR.get(name, (float("nan"),) * 2)
        print(f"  {name}: IN-SITU per-layer (2 junctions): "
              f"VPU {vpu:.3f} + DMA {dma:.3f} = {tot:.3f} ms "
              f"[standalone-differential prior {standalone:.3f}, "
              f"pure in-VMEM {pure:.3f}]")
        res[name] = {"batch": batch, "t_full_ms": round(t[True] * 1e3, 3),
                     "t_novpu_ms": round(t["novpu"] * 1e3, 3),
                     "t_nodma_ms": round(t["nodma"] * 1e3, 3),
                     "vpu_ms_layer": round(vpu, 4),
                     "dma_ms_layer": round(dma, 4),
                     "total_ms_layer": round(tot, 4)}
    print("\n" + json.dumps(res))


if __name__ == "__main__":
    main()
