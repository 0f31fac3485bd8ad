"""Device-mesh parallelism: DP + TP sharding for eval/serving/calibration.

The reference is single-process single-GPU (SURVEY §0: no torch.distributed,
multi-GPU via independent processes, test.sh:9-11). The TPU-native scale-out
design (SURVEY §5) is:

  * a 2-D ``Mesh`` with axes ("data", "model") over ICI;
  * batch sharded over "data" (eval / serving / calibration);
  * the large matmul weights sharded over "model" (megatron-style: qkv/fc1
    column-parallel on the out-features axis, proj/fc2 row-parallel on the
    in-features axis) — XLA GSPMD inserts the all-gather/reduce-scatter
    collectives from the sharding annotations;
  * calibration min/max statistics reduced across "data" with pmin/pmax
    (observers.mesh_reduce_minmax) — the entire communication backend this
    workload needs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.observers import MinMaxStats


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def _leaf_spec(path: str, shape) -> P:
    """Megatron-style placement for a ViT param leaf.

    qkv/fc1 (out, in): shard out-features over "model" (column parallel);
    proj/fc2 (out, in): shard in-features (row parallel); everything else
    (LN, biases, embeddings, head) replicated.
    """
    if path.endswith("qkv.w") or path.endswith("fc1.w"):
        return P("model", None)
    if path.endswith("proj.w") or path.endswith("fc2.w"):
        return P(None, "model")
    if path.endswith("qkv.b") or path.endswith("fc1.b"):
        return P("model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a ViT params pytree."""

    def one(path, leaf):
        keys = ".".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        return NamedSharding(mesh, _leaf_spec(keys, leaf.shape))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_batch(mesh: Mesh, x):
    """Place a host batch sharded over the "data" axis (leading dim)."""
    spec = P("data") if x.ndim == 1 else P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def data_parallel_eval(forward, mesh: Mesh, params, *args):
    """Jit ``forward(params, *args, x, bit_idx)``-style callables with the
    params placed per ``param_shardings`` and outputs gathered on host.

    XLA GSPMD propagates the batch sharding through the whole network and
    rides ICI for the TP collectives; nothing manual is needed here beyond
    the placement — the scaling-book recipe.
    """
    params = jax.device_put(params, param_shardings(params, mesh))
    jitted = jax.jit(forward)

    def run(x, *rest):
        return jitted(params, *args, shard_batch(mesh, x), *rest)

    return run


def sharded_minmax_stats(mesh: Mesh, x) -> MinMaxStats:
    """Cross-device min/max of a "data"-sharded calibration batch.

    jnp reductions over a sharded array lower to psum/pmin/pmax collectives
    under GSPMD — this is the TPU realization of the observer ``update``
    running across a distributed calibration set (SURVEY §5 'communication
    backend').
    """
    xs = shard_batch(mesh, x)

    @jax.jit
    def stats(v):
        m = v.reshape(-1, v.shape[-1])
        return MinMaxStats(min_val=m.min(axis=0), max_val=m.max(axis=0))

    return stats(xs)


def dp_serving_fn(inner, mesh: Mesh):
    """Wrap a per-batch serving callable for data-parallel eval over the
    mesh's "data" axis: pad the batch to a device multiple (repeating the
    last example — eval loops yield a short final batch), shard, run under
    the mesh, trim the pad rows off the logits.

    ``inner(x, *args, **kwargs) -> logits`` must be per-example math (the
    int8 serving pipelines are — tests/test_parallel.py pins bitwise
    equality to single-device); the converted serving state it closes over
    should be placed with :func:`replicate`. This is the CLI's ``--dp N``
    glue (test_quant.py), kept here so it is unit-testable without the CLI.

    The shard runs inside ``shard_map`` — each device executes the WHOLE
    serving program on its batch shard — rather than a GSPMD-sharded jit:
    the Pallas kernels lower to opaque tpu_custom_calls the SPMD
    partitioner cannot split, so sharded-jit would all-gather at the first
    kernel (N× wasted compute) or fail to compile. Under shard_map the
    kernels never see the mesh (the pipeline module's approach)."""
    n = int(mesh.shape["data"])  # pad to the DATA axis, not device count

    def fn(x, *args, **kwargs):
        b = x.shape[0]
        pad = (-b) % n
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
            )
        run = jax.shard_map(
            lambda xx: inner(xx, *args, **kwargs),
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P("data"),
            check_vma=False,
        )
        with mesh:
            out = run(shard_batch(mesh, x))
        return out[:b]

    return fn
