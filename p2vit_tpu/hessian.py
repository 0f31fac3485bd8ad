"""Hessian sensitivity engine (Hutchinson trace via jvp-of-grad).

TPU-native rebuild of pyhessian (/root/reference/pyhessian/hessian.py:36-289,
utils.py:27-110). The reference runs one create_graph backward then, per
parameter, up to 150 Rademacher probes of v^T H v with a 5e-3 relative
tolerance (hessian.py:167-217). Here the Hessian-vector product is the
forward-over-reverse ``jax.jvp(jax.grad(loss), ...)`` — one HVP yields Hv
for ALL tracked weights simultaneously, so probes are batched across
parameters (identical estimator, far fewer passes; the per-parameter
early-stop is replaced by a fixed probe budget).

Tracked parameters replicate get_params_grad's filter
(/root/reference/pyhessian/utils.py:69-79): norm/bias/cls_token/pos_embed/
patch_embed excluded → exactly the qkv/proj/fc1/fc2 weights of every block
plus the head — 49 weights for depth-12, in global_distance order
(test_quant.py:319 asserts the alignment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .models.common import ViTConfig
from .models import vit


def tracked_weights(params) -> list:
    """(path, array) list in bit_config order: per block qkv, proj, fc1,
    fc2; then head. (Patch embed is excluded, matching the reference
    filter.)"""
    out = []
    for i, blk in enumerate(params["blocks"]):
        for name in ("qkv", "proj", "fc1", "fc2"):
            out.append(((i, name), blk[name]["w"]))
    out.append((("head", "head"), params["head"]["w"]))
    return out


def _with_weights(params, ws):
    """Rebuild the params pytree with the tracked weights replaced."""
    new = jax.tree.map(lambda a: a, params)  # shallow copy of structure
    k = 0
    for i in range(len(params["blocks"])):
        for name in ("qkv", "proj", "fc1", "fc2"):
            new["blocks"][i][name] = dict(new["blocks"][i][name], w=ws[k])
            k += 1
    new["head"] = dict(new["head"], w=ws[k])
    return new


def tracked_weights_swin(params) -> list:
    """Swin (path, array) list in bit-config slot order 1..n-1: per stage
    (per block qkv, proj, fc1, fc2), downsample reduction, then head —
    aligned with swin.mixed_layout / swin_flops[1:]. The reference's
    get_params_grad filter never met a working Swin (SURVEY §2 ⚠); this
    extends its 'matmul weights only' rule to Swin's geometry."""
    out = []
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage["blocks"]):
            for name in ("qkv", "proj", "fc1", "fc2"):
                out.append(((si, bi, name), blk[name]["w"]))
        if "downsample" in stage:
            out.append(((si, "downsample"), stage["downsample"]["reduction"]["w"]))
    out.append((("head",), params["head"]["w"]))
    return out


def _with_weights_swin(params, ws):
    new = jax.tree.map(lambda a: a, params)
    k = 0
    for si, stage in enumerate(params["stages"]):
        for bi in range(len(stage["blocks"])):
            for name in ("qkv", "proj", "fc1", "fc2"):
                new["stages"][si]["blocks"][bi][name] = dict(
                    new["stages"][si]["blocks"][bi][name], w=ws[k]
                )
                k += 1
        if "downsample" in stage:
            new["stages"][si]["downsample"]["reduction"] = dict(
                new["stages"][si]["downsample"]["reduction"], w=ws[k]
            )
            k += 1
    new["head"] = dict(new["head"], w=ws[k])
    return new


def _family(cfg):
    """(fp_forward, tracked, rebuild) for the model family of ``cfg``."""
    if isinstance(cfg, ViTConfig):
        return vit.fp_forward, tracked_weights, _with_weights
    from .models import swin

    return swin.fp_forward, tracked_weights_swin, _with_weights_swin


def hessian_traces(
    params,
    cfg,
    x,
    labels,
    key,
    n_probes: int = 16,
) -> jnp.ndarray:
    """Per-weight Hutchinson Hessian-trace estimates of the CE loss.

    The loss is the fp forward + cross-entropy (the reference's criterion,
    test_quant.py:148; smoothquant disabled during Hessian statistics,
    vit_fquant.py:232 hessian_statistic=True — the fp path here is exactly
    that graph). Returns [n_weights] traces (mean over probes of v^T H v).
    ``cfg`` may be a ViTConfig or a SwinConfig; tracked weights follow the
    family's bit-config slot order.
    """
    forward, tracked, rebuild = _family(cfg)
    ws = [w for _, w in tracked(params)]

    def loss_fn(ws_):
        logits = forward(rebuild(params, ws_), cfg, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    grad_fn = jax.grad(loss_fn)

    def one_probe(k):
        vs = [
            jax.random.rademacher(kk, w.shape, dtype=w.dtype)
            for kk, w in zip(jax.random.split(k, len(ws)), ws)
        ]
        _, hvs = jax.jvp(grad_fn, (ws,), (vs,))
        return jnp.stack([jnp.vdot(v, hv) for v, hv in zip(vs, hvs)])

    keys = jax.random.split(key, n_probes)
    vthv = jax.lax.map(one_probe, keys)  # [n_probes, n_weights]
    return vthv.mean(axis=0)


def _flat_hvp(params, cfg, x, labels):
    """(z0, hvp, dim): CE-loss Hessian-vector product over the tracked
    weights flattened to one vector — the joint Hessian the reference's
    eigenvalue/density methods operate on (pyhessian/hessian.py:115-289)."""
    from jax.flatten_util import ravel_pytree

    forward, tracked, rebuild = _family(cfg)
    ws = [w for _, w in tracked(params)]
    z0, unravel = ravel_pytree(ws)

    def loss_flat(z):
        logits = forward(rebuild(params, unravel(z)), cfg, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    grad_flat = jax.grad(loss_flat)

    def hvp(v):
        return jax.jvp(grad_flat, (z0,), (v,))[1]

    return z0, hvp, z0.shape[0]


def hessian_eigenvalues(
    params, cfg: ViTConfig, x, labels, key, top_n: int = 1,
    max_iter: int = 100, tol: float = 1e-3,
):
    """Top-n Hessian eigenvalues by power iteration with deflation
    (pyhessian/hessian.py:115-165). Returns (eigenvalues, eigenvectors);
    eigenvectors is [n, dim] over the flattened tracked weights."""
    _, hvp, dim = _flat_hvp(params, cfg, x, labels)
    hvp_j = jax.jit(hvp)

    eigenvalues, eigenvectors = [], []
    for i in range(top_n):
        v = jax.random.normal(jax.random.fold_in(key, i), (dim,))
        v = v / jnp.linalg.norm(v)
        lam_prev = None
        for _ in range(max_iter):
            # deflate against converged eigenvectors (utils.py:103-110)
            for e in eigenvectors:
                v = v - jnp.vdot(e, v) * e
            v = v / jnp.linalg.norm(v)
            hv = hvp_j(v)
            lam = float(jnp.vdot(v, hv))
            v = hv / jnp.maximum(jnp.linalg.norm(hv), 1e-12)
            if lam_prev is not None and abs(lam - lam_prev) / (
                abs(lam_prev) + 1e-6
            ) < tol:
                break
            lam_prev = lam
        eigenvalues.append(lam)
        eigenvectors.append(v)
    return eigenvalues, jnp.stack(eigenvectors)


def hessian_density(
    params, cfg: ViTConfig, x, labels, key, n_iter: int = 50, n_runs: int = 1,
):
    """Eigenvalue spectral density by stochastic Lanczos quadrature
    (pyhessian/hessian.py:219-289): per run, n_iter Lanczos steps with full
    reorthogonalization build a tridiagonal T; its eigenvalues are the
    quadrature nodes and the squared first eigenvector components the
    weights. Returns (eigen_list [n_runs, n_iter], weight_list same)."""
    _, hvp, dim = _flat_hvp(params, cfg, x, labels)
    hvp_j = jax.jit(hvp)

    eig_list, weight_list = [], []
    for r in range(n_runs):
        v = jax.random.rademacher(
            jax.random.fold_in(key, r), (dim,), dtype=jnp.float32
        )
        v = v / jnp.linalg.norm(v)
        vs = [v]
        alphas, betas = [], []
        w = hvp_j(v)
        alpha = jnp.vdot(w, v)
        alphas.append(alpha)
        w = w - alpha * v
        for _ in range(n_iter - 1):
            beta = jnp.linalg.norm(w)
            betas.append(beta)
            if float(beta) == 0.0:
                v_next = jax.random.rademacher(
                    jax.random.fold_in(key, 7919 + len(vs)), (dim,),
                    dtype=jnp.float32,
                )
            else:
                v_next = w / beta
            # full reorthogonalization (hessian.py:256-261)
            for u in vs:
                v_next = v_next - jnp.vdot(u, v_next) * u
            v_next = v_next / jnp.maximum(jnp.linalg.norm(v_next), 1e-12)
            vs.append(v_next)
            w = hvp_j(v_next)
            alpha = jnp.vdot(w, v_next)
            alphas.append(alpha)
            w = w - alpha * v_next - betas[-1] * vs[-2]
        t = (
            jnp.diag(jnp.stack(alphas))
            + jnp.diag(jnp.stack(betas), 1)
            + jnp.diag(jnp.stack(betas), -1)
        )
        evals, evecs = jnp.linalg.eigh(t)
        eig_list.append([float(e) for e in evals])
        weight_list.append([float(c) ** 2 for c in evecs[0, :]])
    return eig_list, weight_list


def normalized_mean_hessian(trace_batches) -> list:
    """abs → per-batch min-max normalize → mean across batches.

    Mirrors the (commented-out but authoritative) live pipeline in the
    reference driver (/root/reference/test_quant.py:184-201) that produced
    the hardcoded mean_hessian tables (:207-257).
    """
    norm = []
    for tr in trace_batches:
        tr = jnp.abs(jnp.asarray(tr))
        lo, hi = tr.min(), tr.max()
        norm.append((tr - lo) / (hi - lo))
    return [float(v) for v in jnp.stack(norm).mean(axis=0)]
