"""Pipeline parallelism for the int8 serving path (GPipe-style over ICI).

The third parallelism axis next to DP/TP (parallel/mesh.py): encoder layers
are split into S contiguous stages over a 1-D ("stage",) mesh; microbatches
of (h, xc) int8 codes flow stage-to-stage via ``lax.ppermute`` rides on
ICI. The whole schedule lives inside one ``shard_map``, so XLA sees a
static SPMD program — no host round trips between ticks.

Design notes (TPU-first):
  * The stage payload is exactly the fused-layer kernel's boundary
    interface — (h, xc) int8 codes — the narrowest possible wire format
    (2·B·N·C bytes per hop vs 8× that for f32 activations).
  * Per-layer constants come from serving.stack_layer_consts with the
    depth axis sharded over "stage": each device holds only its own
    layers' weights (the point of PP — DeiT-B per-layer weights are
    ~7 MB int8; a 24-layer ViT-L fits chips it otherwise wouldn't).
  * Standard GPipe fill/drain: T = n_micro + S − 1 ticks, bubble fraction
    (S−1)/T; all stages execute every tick (SPMD), with stage-0 injection
    and last-stage collection masked by ``axis_index``.

The reference is single-process single-GPU (SURVEY §0); this module is
TPU-native scale-out with no reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.common import ViTConfig
from .. import serving


def make_pipeline_mesh(n_stages: int) -> Mesh:
    import numpy as np

    devs = jax.devices()
    if len(devs) < n_stages:
        # never truncate silently: a 1-chip host would otherwise run a
        # "1-stage pipeline" while the caller believes it asked for S
        raise ValueError(
            f"{n_stages}-stage pipeline needs {n_stages} devices; "
            f"only {len(devs)} available"
        )
    return Mesh(np.array(devs[:n_stages]), axis_names=("stage",))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "n_micro", "lis", "interpret",
                     "use_pallas"),
)
def pipeline_serving_forward(
    s,
    cfg: ViTConfig,
    x,
    mesh: Mesh,
    n_micro: int = 2,
    lis: bool = True,
    interpret: bool = False,
    use_pallas: bool = True,
):
    """Int8 serving with the encoder pipelined over the "stage" mesh axis.

    Bit-identical to ``serving_forward(fuse_layer=True)`` — the per-layer
    math is the same fused kernel; PP only changes WHERE each layer runs.
    Embed and head run replicated (they are <2% of the FLOPs).
    """
    S = mesh.shape["stage"]
    L = len(s["blocks"])
    b = x.shape[0]
    assert L % S == 0, f"depth {L} not divisible by {S} stages"
    assert b % n_micro == 0, f"batch {b} not divisible by {n_micro} microbatches"

    h, xc = serving.embed_codes(s, cfg, x, use_pallas=use_pallas,
                                interpret=interpret)
    consts = serving.stack_layer_consts(s, cfg)
    consts_s = jax.tree.map(
        lambda a: a.reshape(S, L // S, *a.shape[1:]), consts
    )
    h_m = h.reshape(n_micro, b // n_micro, *h.shape[1:])
    xc_m = xc.reshape(n_micro, b // n_micro, *xc.shape[1:])

    def pp(consts_local, h_mb, xc_mb):
        sidx = jax.lax.axis_index("stage")
        my_layers = jax.tree.map(lambda a: a[0], consts_local)
        state = (jnp.zeros_like(h_mb[0]), jnp.zeros_like(xc_mb[0]))
        outs = []
        perm = [(i, i + 1) for i in range(S - 1)]
        for t in range(n_micro + S - 1):
            if S > 1:
                recv = tuple(
                    jax.lax.ppermute(v, "stage", perm) for v in state
                )
            else:
                recv = state
            mi = min(t, n_micro - 1)  # stage 0 re-injects the last
            # microbatch during drain; its output is never collected
            cur = tuple(
                jnp.where(sidx == 0, inj, rcv)
                for inj, rcv in zip((h_mb[mi], xc_mb[mi]), recv)
            )

            def body(carry, layer):
                return (
                    serving.apply_fused_layer(
                        cfg, layer, *carry, lis=lis, interpret=interpret
                    ),
                    None,
                )

            state, _ = jax.lax.scan(body, cur, my_layers)
            outs.append(state[0])
        # microbatch m leaves the last stage at tick m + S - 1
        hs = jnp.stack(outs[S - 1 :]).astype(jnp.int32)
        hs = jax.lax.psum(jnp.where(sidx == S - 1, hs, 0), "stage")
        return hs.astype(jnp.int8)

    hs = jax.shard_map(
        pp,
        mesh=mesh,
        in_specs=(P("stage"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(consts_s, h_m, xc_m)
    h_out = hs.reshape(b, *h.shape[1:])
    return serving.head_logits(s, h_out, use_pallas=use_pallas,
                               interpret=interpret)


def pp_serving_fn(s, cfg: ViTConfig, mesh: Mesh, n_micro: int = 2,
                  lis: bool = True, use_pallas: bool = True,
                  interpret: bool = False):
    """Per-batch callable for pipeline-parallel serving eval — the CLI's
    ``--pp S`` glue (test_quant.py), mirroring mesh.dp_serving_fn: pad the
    batch to a microbatch multiple (eval loops yield a short final batch),
    run the GPipe schedule, trim the pad rows off the logits."""
    assert cfg.depth % mesh.shape["stage"] == 0, (
        f"depth {cfg.depth} not divisible by {mesh.shape['stage']} stages")

    def fn(x):
        b = x.shape[0]
        pad = (-b) % n_micro
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
            )
        out = pipeline_serving_forward(
            s, cfg, x, mesh, n_micro=n_micro, lis=lis,
            use_pallas=use_pallas, interpret=interpret,
        )
        return out[:b]

    return fn
