#!/usr/bin/env python
"""P²-ViT-TPU driver: PTQ calibration + (mixed-precision) ImageNet evaluation.

CLI-compatible rebuild of /root/reference/test_quant.py:18-66:

  python test_quant.py <arch> <data_dir> --quant --quant-method minmax
  python test_quant.py deit_base <data_dir> --quant --mixed

plus TPU-era extensions: --checkpoint (explicit local weights; no implicit
downloads), --save-quant-state/--load-quant-state (calibration results are a
first-class serializable artifact, unlike the reference which re-calibrates
every run — SURVEY §5), --limit-val (smoke runs), --live-hessian (compute
sensitivities on the fly instead of the reference's hardcoded tables,
test_quant.py:207-257).
"""

from __future__ import annotations

import argparse
import json
import random
import time

import numpy as np

MODEL_CHOICES = [
    "deit_tiny",
    "deit_small",
    "deit_base",
    "vit_base",
    "vit_large",
    "swin_tiny",
    "swin_small",
    "swin_base",
]

# reference CLI name -> zoo key (test_quant.py:69-81)
FULL_NAME = {
    "deit_tiny": "deit_tiny_patch16_224",
    "deit_small": "deit_small_patch16_224",
    "deit_base": "deit_base_patch16_224",
    "vit_base": "vit_base_patch16_224",
    "vit_large": "vit_large_patch16_224",
    "swin_tiny": "swin_tiny_patch4_window7_224",
    "swin_small": "swin_small_patch4_window7_224",
    "swin_base": "swin_base_patch4_window7_224",
}


def str2bool(v):
    """Real boolean parsing for --ptf/--lis.

    The reference declares these ``type=bool`` (test_quant.py:36-37), so
    ``--ptf False`` parses as True (any non-empty string is truthy) and the
    flags can never actually be turned off. SURVEY §5 directs surfacing them
    as real config; this accepts true/false/1/0/yes/no (case-insensitive).
    """
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("true", "1", "yes", "y", "on"):
        return True
    if s in ("false", "0", "no", "n", "off", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def build_parser():
    p = argparse.ArgumentParser(description="P2-ViT-TPU")
    p.add_argument("model", choices=MODEL_CHOICES)
    p.add_argument("data", metavar="DIR", help="dataset root (train/ + val/)")
    p.add_argument("--quant", action="store_true")
    p.add_argument("--ptf", default=True, type=str2bool,
                   help="Power-of-Two-Factor int LayerNorm (true/false)")
    p.add_argument("--lis", default=True, type=str2bool,
                   help="Log-Int-Softmax (true/false)")
    p.add_argument(
        "--quant-method",
        default="minmax",
        choices=["minmax", "ema", "omse", "percentile"],
    )
    p.add_argument("--mixed", action="store_true", help="mixed-precision search")
    p.add_argument("--calib-batchsize", default=100, type=int)
    p.add_argument(
        "--mode", default=0, type=int,
        help="calibration data: 0 real, 1 gaussian noise, 2 data-free generated",
    )
    p.add_argument(
        "--calib-iter", default=1, type=int,
        help="calibration batches: stats accumulate over N-1 batches, params "
             "solve on the last (the reference accepts 10 here but always "
             "calibrates on one batch, test_quant.py:285-307; default 1 "
             "keeps that single-batch behavior)",
    )
    p.add_argument("--val-batchsize", default=200, type=int)
    p.add_argument("--num-workers", default=16, type=int, help="accepted for CLI parity")
    p.add_argument("--device", default="tpu", type=str, help="informational; jax picks")
    p.add_argument("--print-freq", default=100, type=int)
    p.add_argument("--seed", default=0, type=int)
    # TPU-era extensions
    p.add_argument("--checkpoint", default=None, help="local pretrained weights path")
    p.add_argument("--random-init", action="store_true", help="skip pretrained load")
    p.add_argument("--save-quant-state", default=None, metavar="PATH.npz")
    p.add_argument("--load-quant-state", default=None, metavar="PATH.npz")
    p.add_argument("--limit-val", default=None, type=int, help="cap val batches")
    p.add_argument("--serve", action="store_true",
                   help="evaluate on the int8 Pallas serving path instead of "
                        "the fake-quant simulation (fixed bit config; Swin "
                        "uses its uniform-weight-bit pipeline)")
    p.add_argument("--serve-weight-only", action="store_true",
                   help="(with --quant) serve the quantized WEIGHTS through "
                        "the bf16 XLA forward — the measured fallback for "
                        "regimes below the int8-over-bf16 crossover "
                        "(batch <128 ViT / <4 Swin, C<384 ViTs at any "
                        "batch; p2vit_tpu/plan.py). Float activations: "
                        "quantization error is a subset of --serve's.")
    p.add_argument("--plot", action="store_true",
                   help="dump per-channel activation range plots to figs/ "
                        "(reference plot_distrib.py plumbing; ViT/DeiT)")
    p.add_argument("--live-hessian", action="store_true",
                   help="compute Hessian traces instead of hardcoded tables")
    p.add_argument("--hessian-batches", default=2, type=int)
    p.add_argument("--native-loader", action="store_true",
                   help="decode/preprocess batches in the C++ thread pool "
                        "(bit-exact with the PIL path; uses --num-workers "
                        "threads)")
    p.add_argument("--u8-ingest", action="store_true",
                   help="(with --serve) feed RAW uint8 batches and replay "
                        "normalize+quantize on device — bit-identical logits, "
                        "4x smaller host->device transfer")
    p.add_argument("--dp", default=0, type=int, metavar="N",
                   help="(with --serve) data-parallel serving eval over an "
                        "N-device ('data',) mesh — state replicated, batches "
                        "padded/sharded/trimmed; bitwise equal to single-"
                        "device (tests/test_parallel.py)")
    p.add_argument("--pp", default=0, type=int, metavar="S",
                   help="(with --serve, ViT/DeiT) pipeline the encoder over "
                        "S mesh stages (GPipe microbatching, parallel/"
                        "pipeline.py) — bitwise equal to single-device; "
                        "depth must divide by S. Swin is DP-only "
                        "(DESIGN.md: the token pyramid breaks PP's "
                        "fixed-wire-format premise)")
    p.add_argument("--pp-micro", default=2, type=int, metavar="M",
                   help="(with --pp) GPipe microbatches per eval batch")
    p.add_argument("--tp", default=0, type=int, metavar="T",
                   help="(with --serve, ViT/DeiT) megatron-style tensor-"
                        "parallel serving over a T-wide 'model' mesh axis "
                        "(parallel/tensor.py): qkv/fc1 column-parallel on "
                        "the unmodified fused kernels, attention head-"
                        "parallel, proj/fc2 row-parallel with the psum on "
                        "the raw int32 accumulator — bitwise equal to "
                        "single-device; num_heads and the MLP hidden width "
                        "must divide by T. Composes with --dp (data axis); "
                        "exclusive with --pp")
    p.add_argument("--sp", action="store_true",
                   help="(with --tp) sequence-parallel epilogues: "
                        "psum_scatter the int32 accumulator over token "
                        "rows, run the requant+res+LN epilogue on the "
                        "shard (T x less VPU work), all_gather int8 codes "
                        "(4x fewer collective bytes than the int32 "
                        "all-reduce); still bitwise")
    return p


def build_parallel_meshes(args, cfg, is_swin):
    """Resolve the --dp/--pp/--tp/--sp flags into at most ONE active mesh.

    Returns (dp_mesh, pp_mesh, tp_mesh); precedence pp > tp > dp, every
    rejected flag prints a one-line reason instead of raising mid-eval.
    Factored out of main() so the precedence/divisibility matrix is unit-
    testable (tests/test_pipeline.py::test_build_parallel_meshes)."""
    dp_mesh = None
    pp_mesh = None
    if args.pp and args.pp > 1:
        if not (args.quant and args.serve):
            print("--pp needs --quant --serve; ignoring")
        elif is_swin:
            print("--pp is ViT/DeiT-only (DESIGN.md: Swin's token pyramid "
                  "breaks the PP wire format); ignoring")
        elif args.dp and args.dp > 1:
            print("--pp and --dp are mutually exclusive (1-D meshes); "
                  "using --pp")
            args.dp = 0
        if args.quant and args.serve and not is_swin and args.pp > 1:
            from p2vit_tpu.parallel import pipeline as ppipe

            pp_mesh = ppipe.make_pipeline_mesh(args.pp)
            print(f"serving pipeline-parallel over {args.pp} stages, "
                  f"{args.pp_micro} microbatches")
    tp_mesh = None
    if args.tp and args.tp > 1:
        if not (args.quant and args.serve):
            print("--tp needs --quant --serve; ignoring")
        elif pp_mesh is not None:
            print("--tp and --pp are mutually exclusive; using --pp")
        elif is_swin:
            # Swin TP (parallel/tensor_swin.py): tp must divide every
            # stage's head count — tiny/small admit tp=3, base tp in {2,4}
            from p2vit_tpu.parallel import mesh as pmesh
            from p2vit_tpu.parallel import tensor_swin

            try:
                tensor_swin.check_tp(cfg, args.tp)
            except ValueError as e:
                print(f"--tp {args.tp}: {e}; ignoring")
            else:
                if args.sp:
                    print("--sp is ViT/DeiT-only (Swin's token count "
                          "shrinks 4x per stage — tensor_swin.py docstring);"
                          " ignoring")
                dp = args.dp if args.dp and args.dp > 1 else 1
                tp_mesh = pmesh.make_mesh(dp * args.tp,
                                          model_parallel=args.tp)
                print(f"serving tensor-parallel over {args.tp} model shards"
                      + (f" x {dp} data shards" if dp > 1 else ""))
        elif cfg.num_heads % args.tp:
            print(f"--tp {args.tp} does not divide {args.model}'s "
                  f"{cfg.num_heads} heads (try "
                  f"{[t for t in range(2, cfg.num_heads + 1) if cfg.num_heads % t == 0]}); "
                  "ignoring")
        elif cfg.hidden_dim % args.tp:
            print(f"--tp {args.tp} does not divide the MLP hidden width "
                  f"{cfg.hidden_dim}; ignoring")
        else:
            from p2vit_tpu.parallel import mesh as pmesh

            dp = args.dp if args.dp and args.dp > 1 else 1
            tp_mesh = pmesh.make_mesh(dp * args.tp, model_parallel=args.tp)
            print(f"serving tensor-parallel over {args.tp} model shards"
                  + (f" x {dp} data shards" if dp > 1 else "")
                  + (" with sequence-parallel epilogues" if args.sp else ""))
    if args.sp and tp_mesh is None:
        print("--sp needs an active --tp; ignoring")
    if args.dp and args.dp > 1 and tp_mesh is None:
        if args.quant and args.serve:
            from p2vit_tpu.parallel import mesh as pmesh

            dp_mesh = pmesh.make_mesh(args.dp, model_parallel=1)
            print(f"serving data-parallel over {args.dp} devices")
        else:
            print("--dp needs --quant --serve; ignoring")
    return dp_mesh, pp_mesh, tp_mesh


def accuracy(logits, target, topk=(1,)):
    """top-k accuracy in percent (test_quant.py:549-562)."""
    logits = np.asarray(logits)
    target = np.asarray(target)
    maxk = max(topk)
    pred = np.argsort(-logits, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    return [100.0 * correct[:, :k].any(axis=1).mean() for k in topk]


def main():
    args = build_parser().parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    from p2vit_tpu import checkpoints, data, search
    from p2vit_tpu.config import make_policy
    from p2vit_tpu.profiling import AverageMeter
    from p2vit_tpu.models import MODEL_ZOO, PREPROCESS
    from p2vit_tpu.models import vit

    name = FULL_NAME[args.model]
    if name not in MODEL_ZOO:
        raise NotImplementedError(f"{name} not yet in the TPU zoo")
    cfg = MODEL_ZOO[name]
    is_swin = args.model.startswith("swin")
    if is_swin:
        from p2vit_tpu.models import swin
    policy = make_policy(args.ptf, args.lis, args.quant_method)
    family = swin if is_swin else vit

    if args.random_init:
        params = family.init_params(jax.random.PRNGKey(args.seed), cfg)
        print("WARNING: random init (no pretrained weights)")
    else:
        params = checkpoints.load_pretrained(name, cfg, args.checkpoint)

    pp = PREPROCESS[args.model.split("_")[0]]
    tf = data.build_transform(cfg.img_size, pp["mean"], pp["std"], pp["crop_pct"])

    def make_dataset(split, raw=False):
        # raw=True (uint8 ingestion): host stops at resize+crop;
        # normalize+quantize replay on device (serving.attach_u8_ingest,
        # bit-identical)
        if args.native_loader:
            return data.NativeImageFolder(
                f"{args.data}/{split}", cfg.img_size, pp["mean"], pp["std"],
                pp["crop_pct"], n_threads=args.num_workers, raw=raw,
            )
        if raw:
            return data.ImageFolder(
                f"{args.data}/{split}",
                data.build_transform(cfg.img_size, pp["mean"], pp["std"],
                                     pp["crop_pct"], raw=True),
            )
        return data.ImageFolder(f"{args.data}/{split}", tf)

    calib = None
    if args.quant:
        if args.load_quant_state:
            calib = checkpoints.load_quant_state(args.load_quant_state)
            print(f"Loaded quantization state from {args.load_quant_state}")
        else:
            stats = None  # noise/data-free calibrate on their one synthetic batch
            if args.mode == 1:
                print("Calibrating with Gaussian noise...")
                cal = np.asarray(
                    jax.random.normal(
                        jax.random.PRNGKey(args.seed),
                        (args.calib_batchsize, 3, cfg.img_size, cfg.img_size),
                    )
                )
            elif args.mode == 2:
                print("Generating data...")
                from p2vit_tpu.datafree import generate_data

                cal = np.asarray(
                    generate_data(params, cfg, batch_size=args.calib_batchsize,
                                  seed=args.seed)
                )
                print("Calibrating with generated data...")
            else:
                print("Calibrating with real data...")
                train = make_dataset("train")
                it = data.iterate_batches(
                    train, args.calib_batchsize, shuffle=True, seed=args.seed,
                    drop_last=True,
                )
                batches = []
                for imgs, _ in it:
                    batches.append(imgs)
                    if len(batches) >= args.calib_iter:
                        break
                if len(batches) > 1:
                    for bi, imgs in enumerate(batches[:-1]):
                        stats = family.collect_stats(
                            params, cfg, policy, jnp.asarray(imgs), stats
                        )
                        print(f"  stats batch {bi + 1}/{len(batches)}")
                cal = batches[-1]
            calib = family.calibrate(params, cfg, policy, jnp.asarray(cal), stats=stats)
            if args.save_quant_state:
                checkpoints.save_quant_state(args.save_quant_state, calib)
                print(f"Saved quantization state to {args.save_quant_state}")

    u8 = args.u8_ingest and args.quant and args.serve
    if args.u8_ingest and not u8:
        print("--u8-ingest needs --quant --serve; ignoring")
    val = make_dataset("val", raw=u8)

    dp_mesh, pp_mesh, tp_mesh = build_parallel_meshes(args, cfg, is_swin)
    if dp_mesh is not None:
        from p2vit_tpu.parallel import mesh as pmesh
    if pp_mesh is not None:
        from p2vit_tpu.parallel import pipeline as ppipe

    if args.quant and args.serve_weight_only:
        if args.serve:
            raise SystemExit(
                "--serve and --serve-weight-only are mutually exclusive")
        if args.dp or args.pp > 1 or args.tp > 1:
            print("--dp/--pp/--tp apply to --serve; ignoring for weight-only")
        from p2vit_tpu import serving as _srv
        from p2vit_tpu import serving_swin as _srv_swin

        _wo_cache = {}
        # params as a RUNTIME ARG, not a closure: closures inline HLO
        # constants and big-model programs exceed the tunnel's
        # remote-compile cap (HTTP 413) — and one executable then serves
        # every bit_config (same shapes → jit cache hit).
        _wo_jit = jax.jit(lambda p, x: family.fp_forward(
            p, cfg, x.astype(jnp.bfloat16)).astype(jnp.float32))

        def _wo_params(key):
            if key not in _wo_cache:
                if is_swin:
                    pw = _srv_swin.weight_only_params(
                        params, calib.qstate, cfg, policy, list(key))
                else:
                    pw = _srv.weight_only_params(
                        params, calib.qstate, cfg, policy, list(key))
                _wo_cache[key] = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, pw)
            return _wo_cache[key]

        def model_fn(x, bit_config):
            key = tuple(int(b) for b in bit_config)
            return _wo_jit(_wo_params(key), x)
    elif args.quant and is_swin and args.serve:
        from p2vit_tpu import serving_swin

        on_accel = jax.devices()[0].platform != "cpu"
        _sw_cache = {}

        def _sw_fwd(key):
            # convert/replicate OUTSIDE any shard_map trace, once per config
            if key not in _sw_cache:
                s = serving_swin.convert(
                    params, calib.qstate, cfg, policy, list(key)
                )
                if u8:
                    serving_swin.attach_u8_ingest(s, pp["mean"], pp["std"])
                if tp_mesh is not None:
                    from p2vit_tpu.parallel import tensor_swin

                    fwd = tensor_swin.tp_serving_fn(
                        s, calib.qstate, cfg, tp_mesh,
                        lis=policy.int_softmax, use_pallas=on_accel,
                    )
                else:
                    if dp_mesh is not None:
                        s = pmesh.replicate(s, dp_mesh)
                    fwd = lambda x, s=s: serving_swin.serving_forward(
                        s, calib.qstate, cfg, policy, x,
                        use_pallas=on_accel,
                    )
                    if dp_mesh is not None:
                        fwd = pmesh.dp_serving_fn(fwd, dp_mesh)
                _sw_cache[key] = fwd
            return _sw_cache[key]

        def model_fn(x, bit_config):
            return _sw_fwd(tuple(int(b) for b in bit_config))(x)
    elif args.quant and is_swin:
        # per-layer bit simulation (quant_forward_mixed serves uniform and
        # mixed configs with one executable — beyond the reference, whose
        # Swin never wired bit_config at all, SURVEY §2 ⚠)
        def model_fn(x, bit_config):
            return swin.quant_forward_mixed(
                params, calib.qstate, cfg, policy, x, vit.bits_to_idx(bit_config)
            )
    elif args.quant and args.serve:
        from p2vit_tpu import serving

        on_accel = jax.devices()[0].platform != "cpu"
        _sstate_cache = {}

        def _vit_fwd(key):
            # convert/replicate/wrap OUTSIDE any shard_map trace, once per
            # bit config
            if key not in _sstate_cache:
                s = serving.convert(params, calib.qstate, cfg, policy,
                                    list(key))
                if u8:
                    serving.attach_u8_ingest(s, pp["mean"], pp["std"])
                if pp_mesh is not None:
                    # the GPipe stage body is the fused-layer Pallas kernel
                    # (no jnp twin) — interpret it off-accelerator
                    fwd = ppipe.pp_serving_fn(
                        s, cfg, pp_mesh, n_micro=args.pp_micro,
                        lis=policy.int_softmax, use_pallas=True,
                        interpret=not on_accel,
                    )
                elif tp_mesh is not None:
                    from p2vit_tpu.parallel import tensor as ptensor

                    fwd = ptensor.tp_serving_fn(
                        s, cfg, tp_mesh, lis=policy.int_softmax,
                        use_pallas=on_accel, seq_parallel=args.sp,
                    )
                else:
                    if dp_mesh is not None:
                        s = pmesh.replicate(s, dp_mesh)
                    fwd = lambda x, s=s: serving.serving_forward(
                        s, cfg, x, use_pallas=on_accel,
                        lis=policy.int_softmax,
                    )
                    if dp_mesh is not None:
                        fwd = pmesh.dp_serving_fn(fwd, dp_mesh)
                _sstate_cache[key] = fwd
            return _sstate_cache[key]

        def model_fn(x, bit_config):
            return _vit_fwd(tuple(int(b) for b in bit_config))(x)
    elif args.quant:
        fwd = jax.jit(
            lambda p, q, x, bi: vit.quant_forward(p, q, cfg, policy, x, bi)
        )

        def model_fn(x, bit_config):
            return fwd(params, calib.qstate, x, vit.bits_to_idx(bit_config))
    else:
        fp = jax.jit(lambda p, x: family.fp_forward(p, cfg, x))

        def model_fn(x, bit_config):
            return fp(params, x)

    if args.quant and (args.serve or args.serve_weight_only):
        # measured deployment rule (p2vit_tpu/plan.py): warn when the
        # chosen path disagrees with the measured crossover tables
        from p2vit_tpu import plan as _plan

        rec = _plan.recommend(cfg, args.val_batchsize)
        if args.serve and rec.path != "int8":
            print(f"[plan] {rec.reason}")
        elif args.serve_weight_only and rec.path == "int8":
            print(f"[plan] int8 serving (--serve) beats bf16 here: "
                  f"{rec.reason}")

    if args.plot:
        if is_swin:
            print("--plot is ViT/DeiT-only (reference plots vit_base); skipping")
        else:
            from p2vit_tpu import analysis

            imgs, _ = next(data.iterate_batches(val, min(args.val_batchsize, 8)))
            imgs = jnp.asarray(imgs)
            if u8:
                # --u8-ingest makes val yield RAW uint8; the fp activation
                # taps expect normalized f32, so replay the normalize here
                mean = jnp.asarray(pp["mean"], jnp.float32)[:, None, None]
                std = jnp.asarray(pp["std"], jnp.float32)[:, None, None]
                imgs = (imgs.astype(jnp.float32) / 255.0 - mean) / std
            acts = analysis.collect_activations(params, cfg, imgs)
            paths = analysis.plot_distribution(acts, args.model, args.quant)
            print(f"wrote {len(paths)} activation plots to figs/")

    def validate(bit_config):
        batch_time, top1, top5 = AverageMeter(), AverageMeter(), AverageMeter()
        end = time.time()
        for i, (imgs, targets) in enumerate(
            data.iterate_batches(val, args.val_batchsize, prefetch=2)
        ):
            if args.limit_val is not None and i >= args.limit_val:
                break
            logits = model_fn(jnp.asarray(imgs), bit_config)
            p1, p5 = accuracy(logits, targets, topk=(1, 5))
            top1.update(p1, len(targets))
            top5.update(p5, len(targets))
            batch_time.update(time.time() - end)
            end = time.time()
            if i % args.print_freq == 0:
                print(
                    f"Test: [{i}]\tTime {batch_time.val:.3f} ({batch_time.avg:.3f})"
                    f"\tPrec@1 {top1.val:.3f} ({top1.avg:.3f})"
                    f"\tPrec@5 {top5.val:.3f} ({top5.avg:.3f})"
                )
        print(f" * Prec@1 {top1.avg:.3f} Prec@5 {top5.avg:.3f}")
        return top1.avg, top5.avg

    if args.mixed:
        assert args.quant, "--mixed requires --quant"
        n = cfg.num_matmuls
        if args.live_hessian:
            from p2vit_tpu.hessian import hessian_traces, normalized_mean_hessian

            print("Calculating sensitivities via the averaged Hessian trace...")
            train = make_dataset("train")
            traces = []
            for i, (imgs, targets) in enumerate(
                data.iterate_batches(train, args.calib_batchsize, shuffle=True,
                                     seed=args.seed + 1, drop_last=True)
            ):
                if i >= args.hessian_batches:
                    break
                traces.append(
                    hessian_traces(
                        params, cfg, jnp.asarray(imgs), jnp.asarray(targets),
                        jax.random.PRNGKey(args.seed + i),
                    )
                )
            mean_hessian = normalized_mean_hessian(traces)
        else:
            from p2vit_tpu.hessian_tables import MEAN_HESSIAN

            if args.model not in MEAN_HESSIAN:
                raise SystemExit(
                    f"no hardcoded Hessian table for {args.model}; use --live-hessian"
                )
            mean_hessian = MEAN_HESSIAN[args.model]
        # ViT distances omit the patch row (QConv2d appends none); Swin's
        # calibration records one per weight layer including patch
        dist_inc_patch = is_swin
        layout = swin.mixed_layout(cfg)[0] if is_swin else None
        expected_rows = n if dist_inc_patch else n - 1
        assert len(calib.flops) == n
        assert len(calib.global_distance) == expected_rows
        assert len(mean_hessian) == n - 1

        print("Pareto Frontier.......")
        rng = random.Random(args.seed)
        front = search.pareto_front(
            calib.flops, calib.global_distance, mean_hessian, rng,
            layout=layout, distances_include_patch=dist_inc_patch,
        )
        print("Hessian-Based Validating...")
        for cfg_bits, om in front[:5]:
            print(cfg_bits)
            validate(cfg_bits)

        print("Start Evolutionary.......")
        result = search.evolutionary_search(
            lambda bc: validate(bc)[0],
            [c for c, _ in front],
            calib.flops,
            rng,
        )
        print("Best mixed-precision configs:")
        for cfg_bits, prec1 in result[:5]:
            print(json.dumps({"bit_config": cfg_bits, "prec1": prec1}))
    else:
        bit_config = [4] * cfg.num_matmuls
        print(bit_config)
        validate(bit_config)


if __name__ == "__main__":
    main()
