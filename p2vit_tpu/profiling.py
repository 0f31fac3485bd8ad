"""Tracing / profiling utilities (SURVEY §5 aux subsystem).

The reference's only instrumentation is wall-clock batch timing
(/root/reference/test_quant.py:475-527) plus the analytical FLOPs
accumulator threaded through forward (vit_fquant.py:369,399,921). The
TPU-native equivalents here:

* ``device_time`` — trustworthy per-iteration device timing. On the
  axon-tunneled TPU, ``jax.block_until_ready`` does NOT synchronize and
  every eager dispatch costs a host round trip, so host-side loops measure
  RTT instead of compute. The harness loops ON DEVICE (``lax.fori_loop``
  inside one jit, iterations serialized through an f32 data dependency —
  integer ``*0`` chains get constant-folded) and fetches one scalar.
* ``trace`` — context manager around the XLA profiler for TensorBoard /
  xprof dumps where the platform supports it.
* ``cost_model`` — the analytical per-matmul multiply counts used as the
  model-size proxy by the mixed-precision search (kept as pure data, one
  entry per bit_config slot).
* ``AverageMeter`` — running mean for eval loops, mirroring the
  reference's meter semantics (test_quant.py:530-546).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def require_tpu(max_wait_s: float = 240.0) -> None:
    """Fail FAST when the axon tunnel is dead instead of hanging forever.

    The axon plugin initializes its tunnel client inside ``jax.devices()``;
    a dead tunnel blocks in make_c_api_client with ~0 CPU, so an on-chip
    tool that just calls jax.devices() hangs until an outer ``timeout``
    kills it (90 min per queue slot). The on-chip tools are meaningless on
    CPU, so unlike bench.py's CPU fallback this probes in a SUBPROCESS
    (parent import state untouched) and ``sys.exit``s on failure. No-op
    when the caller explicitly requested CPU (JAX_PLATFORMS=cpu — the
    tests' smoke path).

    A healthy-but-cold probe measures ~50-60 s (fresh process + first eager
    compile through the tunnel), so the window must fit at least two cold
    attempts — 120 s proved too tight in practice (2026-08-19).
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
        return
    # Queue runs override the window via env: right after a heavy client
    # disconnects, the tunnel can refuse/starve new probes for several
    # minutes while staying healthy (measured 2026-08-19: ab_tpu's probe
    # failed for a full 240 s window at 09:55, the very next tool's probe
    # succeeded at 09:59), so back-to-back tools need a wider window.
    env_wait = os.environ.get("P2VIT_REQUIRE_TPU_WAIT_S")
    if env_wait:
        # a typo in the env var must not abort a queue slot before the
        # probe even runs — fall back to the default window (advisor r4)
        try:
            max_wait_s = float(env_wait)
        except ValueError:
            print(f"require_tpu: ignoring malformed "
                  f"P2VIT_REQUIRE_TPU_WAIT_S={env_wait!r}; "
                  f"using {max_wait_s}s", file=sys.stderr)
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; d = jax.devices(); "
                 "assert d[0].platform != 'cpu', d; "
                 "assert float(jnp.ones((8, 8)).sum()) == 64.0"],
                timeout=min(90, max(15, deadline - time.monotonic())),
                check=True, capture_output=True,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.monotonic() >= deadline:
                sys.exit(
                    "axon tunnel unresponsive (subprocess probe under "
                    "timeout failed); this tool needs the real chip — "
                    "aborting instead of hanging"
                )
            time.sleep(10)


def device_time(step, x, *consts, iters: int = 10, repeats: int = 3) -> float:
    """Best-of-``repeats`` seconds per call of ``step(x, *consts) -> array``.

    ``step`` must be jit-compatible; the returned array's sum is used as the
    serializing data dependency between iterations.

    ``consts`` (pytrees) are passed through as RUNTIME arguments. Pass big
    state (weights) here rather than closing over it: a closure inlines the
    arrays as HLO constants, and on the tunneled TPU a ViT-L-sized program
    exceeds the remote-compile request cap (HTTP 413).
    """

    @jax.jit
    def run(x0, *cs):
        def body(_, acc):
            y = step(x0 + (0.0 * acc).astype(x0.dtype), *cs)
            return y.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(x, *consts))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(x, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def device_time_ms(fn, x, *consts, iters: int = 20, repeats: int = 3) -> float:
    """``device_time`` adapter shared by the tools/ benches: sums tuple
    outputs into the serializing data dependency and returns MILLISECONDS.
    One definition so a timing-methodology fix lands everywhere at once."""

    def step(xx, *cs):
        out = fn(xx, *cs)
        if isinstance(out, tuple):
            out = sum(o.sum().astype(jnp.float32) for o in out)
        return out

    return device_time(step, x, *consts, iters=iters, repeats=repeats) * 1e3


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace (view with TensorBoard/xprof).

    No-op-with-warning on platforms whose PJRT client doesn't implement the
    profiler API (the tunneled axon platform may not).
    """
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - platform dependent
        print(f"[profiling] trace unavailable on this platform: {e}")
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def cost_model(cfg) -> list:
    """Per-matmul multiply counts, one entry per bit_config slot.

    Dispatches on config type (ViT vs Swin); the ViT variant mirrors the
    reference's FLOPs list exactly (see models/common.py::vit_flops).
    """
    from .models.common import ViTConfig, vit_flops

    if isinstance(cfg, ViTConfig):
        return vit_flops(cfg)
    # Swin: patch stem + per block [qkv, proj, fc1, fc2] + per-stage
    # downsample reduction + head, matching models/swin.py's matmul order.
    flops = [cfg.in_chans * cfg.patch_size**2 * cfg.embed_dim
             * (cfg.img_size // cfg.patch_size) ** 2]
    for i, depth in enumerate(cfg.depths):
        c = cfg.embed_dim * (2**i)
        res = cfg.stage_res(i)
        n = res * res
        h = int(c * cfg.mlp_ratio)
        for _ in range(depth):
            flops += [n * c * 3 * c, n * c * c, n * c * h, n * h * c]
        if i < len(cfg.depths) - 1:
            flops.append((n // 4) * (4 * c) * (2 * c))
    flops.append(cfg.embed_dim * (2 ** (len(cfg.depths) - 1)) * cfg.num_classes)
    return flops


class AverageMeter:
    """Running average (reference test_quant.py:530-546 semantics)."""

    def __init__(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
