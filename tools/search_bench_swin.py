"""End-to-end Swin mixed-precision search wall-time on chip (VERDICT r4
item 7).

The Swin search path — LIVE Hutchinson Hessian traces (hessian.py; the
reference's hardcoded table covers ViT only, test_quant.py:207-257) +
mixed_layout-coupled Pareto sampling + quant_forward_mixed with a TRACED
bit vector — is CPU-tested (tests/test_swin_model.py, test_search.py) but
was never timed on the TPU the way deit_base was (tools/search_bench.py).
This times the real thing at full swin_tiny size: calibration, Hessian
traces, Pareto top-5 + the bounded evolutionary run on a synthetic val
set, and proves zero recompiles by reading the jit cache after the last
candidate (the executable serves every config because bit_idx is traced).

Usage: python tools/search_bench_swin.py [model] [--val-batches N]
[--batch B] [--hessian-batches H]. Repo root, real chip.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from p2vit_tpu import search
from p2vit_tpu.config import make_policy
from p2vit_tpu.hessian import hessian_traces, normalized_mean_hessian
from p2vit_tpu.models import SWIN_ZOO, swin, vit


def main():
    from p2vit_tpu.profiling import require_tpu

    require_tpu()  # fail fast on a dead tunnel (no-op under JAX_PLATFORMS=cpu)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    model = args[0] if args else "swin_tiny_patch4_window7_224"

    def opt(name, default):
        if name in sys.argv:
            return int(sys.argv[sys.argv.index(name) + 1])
        return default

    n_batches = opt("--val-batches", 2)
    batch = opt("--batch", 64)
    n_hess = opt("--hessian-batches", 2)
    cfg = SWIN_ZOO[model]
    policy = make_policy()
    print(f"== search_bench_swin {model} "
          f"platform={jax.devices()[0].platform} val={n_batches}x{batch} "
          f"hessian={n_hess}x32")

    params = swin.init_params(jax.random.PRNGKey(0), cfg)
    s = cfg.img_size
    xc = jax.random.normal(jax.random.PRNGKey(7), (100, 3, s, s))

    t0 = time.perf_counter()
    calib = swin.calibrate(params, cfg, policy, xc)
    # force a HOST FETCH, not block_until_ready: the axon tunnel's
    # block_until_ready returns before the computation finishes (CLAUDE.md)
    float(jnp.asarray(jax.tree_util.tree_leaves(calib.qstate)[0],
                      jnp.float32).sum())
    t_calib = time.perf_counter() - t0
    t0 = time.perf_counter()
    calib = swin.calibrate(params, cfg, policy, xc)
    float(jnp.asarray(jax.tree_util.tree_leaves(calib.qstate)[0],
                      jnp.float32).sum())
    t_calib_steady = time.perf_counter() - t0
    print(f"  calibration (100 img, jitted solve): {t_calib:.2f} s wall "
          f"incl. compile; steady {t_calib_steady:.3f} s")

    # live Hessian traces — the CLI's --live-hessian loop at calib batch 32
    fp = jax.jit(lambda p, x: swin.fp_forward(p, cfg, x))
    t0 = time.perf_counter()
    traces = []
    for i in range(n_hess):
        xh = jax.random.normal(jax.random.PRNGKey(50 + i), (32, 3, s, s))
        yh = jnp.asarray(np.asarray(jnp.argmax(fp(params, xh), axis=-1)))
        traces.append(hessian_traces(params, cfg, xh, yh,
                                     jax.random.PRNGKey(i)))
    mean_hessian = normalized_mean_hessian(traces)
    float(jnp.asarray(mean_hessian[0]).sum() if hasattr(
        mean_hessian[0], "sum") else mean_hessian[0])
    t_hess = time.perf_counter() - t0
    print(f"  live Hessian traces ({n_hess} batches x 16 probes): "
          f"{t_hess:.1f} s wall incl. compile "
          f"({len(mean_hessian)} weight layers)")

    # synthetic val set: labels = the FP model's argmax
    xs, ys = [], []
    for i in range(n_batches):
        x = jax.random.normal(jax.random.PRNGKey(100 + i), (batch, 3, s, s))
        xs.append(x)
        ys.append(np.asarray(jnp.argmax(fp(params, x), axis=-1)))

    fwd = jax.jit(
        lambda p, q, x, bi: swin.quant_forward_mixed(p, q, cfg, policy, x, bi)
    )
    times = []

    def validate_fn(bit_config):
        t0 = time.perf_counter()
        bi = vit.bits_to_idx(bit_config)
        correct = total = 0
        for x, y in zip(xs, ys):
            pred = np.asarray(jnp.argmax(fwd(params, calib.qstate, x, bi),
                                         axis=-1))
            correct += int((pred == y).sum())
            total += len(y)
        times.append(time.perf_counter() - t0)
        return 100.0 * correct / total

    rng = random.Random(0)
    layout = swin.mixed_layout(cfg)[0]
    t0 = time.perf_counter()
    front = search.pareto_front(
        calib.flops, calib.global_distance, mean_hessian, rng,
        layout=layout, distances_include_patch=True,
    )
    t_pareto = time.perf_counter() - t0
    if not front:
        sys.exit("Pareto front is empty (search.sample_bit_configs headroom)")
    print(f"  Pareto sampling+Omega ranking ({len(front)} configs): "
          f"{t_pareto:.3f} s (pure host)")

    top5 = [(c, validate_fn(c)) for c, _ in front[:5]]
    n_top = len(top5)
    print(f"  top-{n_top} Pareto validated: best "
          f"{max(a for _, a in top5):.2f}% "
          f"(first candidate incl. compile: {times[0]:.2f} s)")

    t0 = time.perf_counter()
    result = search.evolutionary_search(
        validate_fn, [c for c, _ in front], calib.flops, rng,
        pop_size=25, evo_iter=8,
    )
    t_evo = time.perf_counter() - t0
    n_val = len(times)
    steady = times[1:]
    cache = fwd._cache_size() if hasattr(fwd, "_cache_size") else None
    print(f"  evolutionary search (8 gens): {t_evo:.1f} s, "
          f"{n_val} total validations")
    print(f"  per-candidate: first {times[0]:.2f} s (compile), steady "
          f"median {np.median(steady):.3f} s / max {max(steady):.3f} s "
          f"-> {1 / np.median(steady):.2f} candidates/s at "
          f"{n_batches * batch} imgs each")
    print(f"  sim throughput inside search: "
          f"{n_batches * batch / np.median(steady):.0f} img/s")
    print(f"  jit cache size after {n_val} configs: {cache} "
          f"(zero-recompile claim holds iff 1)")
    wall = t_calib + t_hess + t_pareto + sum(times[:n_top]) + t_evo
    print(f"  END-TO-END --mixed --live-hessian wall "
          f"(calib + Hessian + Pareto + top-5 + evolution): {wall:.1f} s")
    best = result[0]
    print(f"  best config acc {best[1]:.2f}%  bits[:12]={best[0][:12]}")
    if cache is not None and cache != 1:
        print("  WARNING: >1 compiled executables — recompiles happened!")


if __name__ == "__main__":
    main()
