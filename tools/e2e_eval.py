"""End-to-end eval throughput: disk -> decode -> u8 ingest -> int8 logits.

VERDICT r4 item 4: the native loader is bit-exact and threaded, u8 ingest
is proven exact on chip, but nothing measured whether the HOST pipeline
keeps the chip fed on the reference's only real workload — the ImageNet-val
eval loop (/root/reference/test_quant.py:474-527). This measures, on the
real chip:

  1. loader-only throughput (native C++ decode -> raw u8 CHW batches) at a
     sweep of thread counts (this box has ONE host CPU — the sweep shows
     where it saturates),
  2. device-only serving throughput on a resident batch (the chip bound,
     measured with the on-device fori_loop discipline),
  3. the dispatch-path ceiling: per-batch jit dispatch + tiny host fetch
     through the tunnel on resident data (the ~30 ms fixed tunnel overhead
     per run, BENCH.md r2b — what a per-batch eval loop pays even with a
     free loader),
  4. e2e: iterate_batches(prefetch=2) feeding the serving jit, per-batch
     argmax fetch (the CLI's `--serve --u8-ingest --native-loader` path).

Verdict line says which bound binds. Synthetic val tree is generated once
at /tmp/e2e_imnet (ImageNet-val-shaped 500x375 JPEGs, quality 87).

Usage: python tools/e2e_eval.py [model] [--batch B] [--imgs N] [--f32]
(defaults deit_small_patch16_224, 256, 2048; --f32 times the host-normalize
f32 arm instead of raw u8). Repo root, real chip.

`--host-only` runs ONLY step 1 (the loader thread sweep) and skips the
tunnel entirely — the host half of the verdict is measurable with the
tunnel down, and on this 1-CPU box it alone usually decides host-bound
(compare loader img/s against the ledger's device img/s for the model).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

ROOT = "/tmp/e2e_imnet"


def ensure_dataset(n_imgs: int) -> str:
    """Synthetic ImageNet-val-shaped tree (8 classes), generated once."""
    from PIL import Image

    val = os.path.join(ROOT, "val")
    n_cls = 8
    per = (n_imgs + n_cls - 1) // n_cls
    marker = os.path.join(ROOT, f".complete_{n_cls}x{per}")
    if os.path.exists(marker):
        return val
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for c in range(n_cls):
        d = os.path.join(val, f"n{c:08d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per):
            arr = rng.randint(0, 255, (375, 500, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.jpg"),
                                      quality=87)
    open(marker, "w").close()
    print(f"  dataset: generated {n_cls * per} JPEGs in "
          f"{time.perf_counter() - t0:.1f} s at {val}")
    return val


def main():
    host_only = "--host-only" in sys.argv
    if host_only:
        # never touch the tunnel: the axon plugin inits its client even for
        # CPU-only requests (CLAUDE.md) — unregister it pre-backend-init,
        # same as tests/conftest.py and __graft_entry__.dryrun_multichip.
        # MUST run before the p2vit_tpu imports: models/vit.py materializes
        # module-level jnp constants, which initializes the backend.
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            xla_bridge._backend_factories.pop("axon", None)
            jax.config.update("jax_platforms", "cpu")
    from p2vit_tpu import data, serving, serving_swin
    from p2vit_tpu.config import make_policy
    from p2vit_tpu.models import MODEL_ZOO, SWIN_ZOO, swin, vit
    from p2vit_tpu.profiling import require_tpu

    if not host_only:
        require_tpu()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    model = args[0] if args else "deit_small_patch16_224"

    def opt(name, default):
        if name in sys.argv:
            return int(sys.argv[sys.argv.index(name) + 1])
        return default

    batch = opt("--batch", 256)
    n_imgs = opt("--imgs", 2048)
    raw = "--f32" not in sys.argv
    is_swin = model in SWIN_ZOO
    cfg = MODEL_ZOO[model]
    policy = make_policy()
    print(f"== e2e_eval {model} platform={jax.devices()[0].platform} "
          f"batch={batch} imgs={n_imgs} ingest={'u8' if raw else 'f32'}")
    val = ensure_dataset(n_imgs)

    # --- 1. loader-only: native C++ decode sweep over thread counts
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    best_thr, best_rate = 0, 0.0
    for thr in (1, 2, 4, 0):  # 0 = hardware_concurrency
        ds = data.NativeImageFolder(val, img_size=cfg.img_size, mean=mean,
                                    std=std, n_threads=thr, raw=raw)
        n = min(len(ds), n_imgs)
        # warm one batch (thread pool spin-up, page cache)
        ds.load_batch(np.arange(min(batch, n)))
        t0 = time.perf_counter()
        got = 0
        for imgs, _ in data.iterate_batches(ds, batch):
            got += imgs.shape[0]
            if got >= n:
                break
        dt = time.perf_counter() - t0
        rate = got / dt
        print(f"  loader-only n_threads={thr}: {rate:.1f} img/s "
              f"({got} imgs, {dt:.2f} s)")
        if rate > best_rate:
            best_rate, best_thr = rate, thr
    print(f"  loader bound: {best_rate:.1f} img/s (n_threads={best_thr})")
    if host_only:
        import json

        print(json.dumps({
            "model": model, "batch": batch, "ingest": "u8" if raw else "f32",
            "loader_img_s": round(best_rate, 1), "loader_threads": best_thr,
            "host_only": True,
        }))
        return

    # --- build the serving model (random init — no checkpoints, CLAUDE.md)
    family = swin if is_swin else vit
    params = family.init_params(jax.random.PRNGKey(0), cfg)
    s = cfg.img_size
    calib = family.calibrate(
        params, cfg, policy,
        jax.random.normal(jax.random.PRNGKey(7), (32, 3, s, s)))
    on_accel = jax.devices()[0].platform != "cpu"  # CPU smoke: jnp twins
    if is_swin:
        sstate = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
        if raw:
            serving_swin.attach_u8_ingest(sstate, mean, std)
        fwd = jax.jit(lambda st, x: serving_swin.serving_forward(
            st, calib.qstate, cfg, policy, x, use_pallas=on_accel))
    else:
        sstate = serving.convert(params, calib.qstate, cfg, policy,
                                 [8] * cfg.num_matmuls)
        if raw:
            serving.attach_u8_ingest(sstate, mean, std)
        fwd = jax.jit(lambda st, x: serving.serving_forward(
            st, cfg, x, use_pallas=on_accel))

    # --- 2. device-only bound (resident batch, on-device loop discipline)
    from p2vit_tpu.profiling import device_time_ms

    dt_dtype = jnp.uint8 if raw else jnp.float32
    xr = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (batch, 3, s, s)),
        dt_dtype) if raw else jax.random.normal(
            jax.random.PRNGKey(1), (batch, 3, s, s))
    if raw:
        # device_time chains iterations via x0 + 0*acc — needs float x;
        # time the u8 path by folding the cast into the step on a f32 x
        xf = xr.astype(jnp.float32)
        step = lambda x, st: fwd(st, x.astype(jnp.uint8))
    else:
        xf = xr
        step = lambda x, st: fwd(st, x)
    dev_ms = device_time_ms(step, xf, sstate, iters=20)
    dev_rate = batch / dev_ms * 1e3
    print(f"  device-only: {dev_ms:.3f} ms/batch = {dev_rate:.1f} img/s")

    # --- 3. dispatch-path ceiling: per-batch dispatch + argmax fetch on
    # RESIDENT data (isolates the tunnel's fixed per-run cost)
    pred_fn = jax.jit(lambda st, x: jnp.argmax(fwd(st, x), axis=-1))
    np.asarray(pred_fn(sstate, xr))  # compile + warm
    t0 = time.perf_counter()
    n_rep = 10
    for _ in range(n_rep):
        np.asarray(pred_fn(sstate, xr))
    disp_ms = (time.perf_counter() - t0) / n_rep * 1e3
    disp_rate = batch / disp_ms * 1e3
    print(f"  dispatch+fetch (resident batch): {disp_ms:.1f} ms/batch = "
          f"{disp_rate:.1f} img/s (tunnel fixed cost "
          f"{disp_ms - dev_ms:.1f} ms/batch)")

    # --- 4. e2e: loader (best threads, prefetch=2) -> device -> preds
    ds = data.NativeImageFolder(val, img_size=cfg.img_size, mean=mean,
                                std=std, n_threads=best_thr, raw=raw)
    n = min(len(ds), n_imgs)
    t0 = time.perf_counter()
    got = correct = 0
    for imgs, targets in data.iterate_batches(ds, batch, prefetch=2):
        preds = np.asarray(pred_fn(sstate, jnp.asarray(imgs)))
        correct += int((preds == targets).sum())
        got += imgs.shape[0]
        if got >= n:
            break
    dt = time.perf_counter() - t0
    e2e_rate = got / dt
    print(f"  E2E disk->logits: {e2e_rate:.1f} img/s ({got} imgs, "
          f"{dt:.2f} s; sanity acc {100.0 * correct / got:.2f}%)")
    bounds = {"host loader": best_rate, "device compute": dev_rate,
              "dispatch path": disp_rate}
    binding = min(bounds, key=bounds.get)
    print(f"  VERDICT: {binding}-bound "
          f"(loader {best_rate:.0f} / device {dev_rate:.0f} / "
          f"dispatch {disp_rate:.0f} img/s; e2e reaches "
          f"{100.0 * e2e_rate / bounds[binding]:.0f}% of the binding bound)")
    import json

    print(json.dumps({
        "model": model, "batch": batch, "ingest": "u8" if raw else "f32",
        "loader_img_s": round(best_rate, 1), "loader_threads": best_thr,
        "device_img_s": round(dev_rate, 1),
        "dispatch_img_s": round(disp_rate, 1),
        "tunnel_fixed_ms": round(disp_ms - dev_ms, 2),
        "e2e_img_s": round(e2e_rate, 1), "binding": binding,
    }))


if __name__ == "__main__":
    main()
