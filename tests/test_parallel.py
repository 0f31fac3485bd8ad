"""Multi-device (8 virtual CPU devices, conftest) numeric parity: DP/TP
sharded execution must reproduce single-device results.

Covers the SURVEY §5 'distributed communication backend' design — batch
sharded over "data", megatron-style TP over "model", calibration min/max
reduced across the mesh — with actual numeric cross-checks (previously only
__graft_entry__.dryrun_multichip shape-asserted this path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p2vit_tpu import serving
from p2vit_tpu.config import make_policy
from p2vit_tpu.models import vit
from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.parallel import mesh as pmesh
from p2vit_tpu.quant.observers import collect_minmax

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=10, embed_dim=16, depth=2, num_heads=2
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


@pytest.fixture(scope="module")
def calibrated():
    policy = make_policy(True, True, "minmax")
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32))
    calib = vit.calibrate(params, TINY, policy, x)
    return policy, params, x, calib


def test_sharded_minmax_stats_equal_global(calibrated):
    """Cross-device min/max of a "data"-sharded batch == the global
    single-device observer stats, exactly (min/max is associative)."""
    _, _, x, _ = calibrated
    m = pmesh.make_mesh(8, model_parallel=1)
    with m:
        sharded = pmesh.sharded_minmax_stats(m, x)
    ref = collect_minmax(x, "activation", layer_wise=False)
    np.testing.assert_array_equal(np.asarray(sharded.min_val), np.asarray(ref.min_val))
    np.testing.assert_array_equal(np.asarray(sharded.max_val), np.asarray(ref.max_val))


def test_dp_quant_forward_matches_single_device(calibrated):
    """Pure data parallelism: per-example math is untouched by the batch
    sharding, so the sharded quantized forward is bitwise identical."""
    policy, params, x, calib = calibrated
    bit_idx = vit.bits_to_idx([8] * TINY.num_matmuls)
    single = np.asarray(
        vit.quant_forward(params, calib.qstate, TINY, policy, x, bit_idx)
    )

    m = pmesh.make_mesh(8, model_parallel=1)
    with m:
        run = pmesh.data_parallel_eval(
            lambda p, xx, bi: vit.quant_forward(p, calib.qstate, TINY, policy, xx, bi),
            m, params,
        )
        out = np.asarray(run(x, bit_idx))
    np.testing.assert_array_equal(out, single)


def test_dp_tp_quant_forward_matches_single_device(calibrated):
    """DP×TP (4×2 mesh, megatron qkv/fc1 column- and proj/fc2 row-parallel):
    row-parallel partial sums change the f32 reduction order, so agreement
    is within one LSB of the output quantizer's grid, argmax-equal."""
    policy, params, x, calib = calibrated
    bit_idx = vit.bits_to_idx([8] * TINY.num_matmuls)
    single = np.asarray(
        vit.quant_forward(params, calib.qstate, TINY, policy, x, bit_idx)
    )

    m = pmesh.make_mesh(8, model_parallel=2)
    with m:
        run = pmesh.data_parallel_eval(
            lambda p, xx, bi: vit.quant_forward(p, calib.qstate, TINY, policy, xx, bi),
            m, params,
        )
        out = np.asarray(run(x, bit_idx))
    lsb = float(np.asarray(calib.qstate["act_out"]["scale"]))
    assert np.abs(out - single).max() <= lsb * 1.0001
    assert (out.argmax(1) == single.argmax(1)).all()


def test_dp_serving_matches_single_device(calibrated):
    """The int8 serving pipeline under the mesh (state replicated, batch
    DP-sharded): integer code arithmetic is per-example — bitwise equal."""
    policy, params, x, calib = calibrated
    sstate = serving.convert(
        params, calib.qstate, TINY, policy, [8] * TINY.num_matmuls
    )
    single = np.asarray(serving.serving_forward(sstate, TINY, x, use_pallas=False))

    m = pmesh.make_mesh(8, model_parallel=1)
    with m:
        rstate = pmesh.replicate(sstate, m)
        out = np.asarray(
            jax.jit(
                lambda xx: serving.serving_forward(rstate, TINY, xx, use_pallas=False)
            )(pmesh.shard_batch(m, x))
        )
    np.testing.assert_array_equal(out, single)


def test_sharded_calibration_matches_single_device(calibrated):
    """Calibrating on a "data"-sharded batch: GSPMD turns every observer
    reduction into mesh collectives; the solved PoT/PTF scales must equal
    the single-device decisions (min/max and the candidate losses reduce
    over the same values)."""
    policy, params, x, calib = calibrated
    m = pmesh.make_mesh(8, model_parallel=1)
    with m:
        xs = pmesh.shard_batch(m, x)
        rp = pmesh.replicate(params, m)
        calib_sharded = vit.calibrate(rp, TINY, policy, xs)

    flat_a = jax.tree_util.tree_flatten_with_path(calib.qstate)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(calib_sharded.qstate)[0]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=0, err_msg=name
        )


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pipeline_serving_matches_single_device(calibrated, n_micro):
    """GPipe-style pipeline over a ("stage",) mesh (parallel/pipeline.py)
    reproduces the fused-layer serving bitwise: same fused kernel per
    layer, only placement and microbatching differ (both are row/image
    local)."""
    from p2vit_tpu.parallel import pipeline as pp

    policy, params, x, calib = calibrated
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    single = np.asarray(
        serving.serving_forward(ss, TINY, x, use_pallas=True, interpret=True,
                                fuse_layer=True)
    )
    m = pp.make_pipeline_mesh(2)  # depth 2 -> one layer per stage
    piped = np.asarray(
        pp.pipeline_serving_forward(ss, TINY, x, m, n_micro=n_micro,
                                    interpret=True)
    )
    np.testing.assert_array_equal(single, piped)


def test_swin_dp_serving_matches_single_device():
    """Swin scale-out rides the ("data",) mesh axis (DESIGN.md: the token
    pyramid breaks the PP premises): int8 Swin serving with the state
    replicated and the batch DP-sharded is bitwise equal per example —
    including the fused residual-junction kernels' twins."""
    from p2vit_tpu import serving_swin
    from p2vit_tpu.models import swin as swin_mod

    cfg = swin_mod.SwinConfig(
        img_size=32, patch_size=4, num_classes=10, embed_dim=16,
        depths=(2, 2), num_heads=(2, 2), window_size=4,
    )
    policy = make_policy()
    params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32))
    calib = swin_mod.calibrate(params, cfg, policy, x)
    ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
    single = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, x, use_pallas=False))

    m = pmesh.make_mesh(8, model_parallel=1)
    with m:
        rstate = pmesh.replicate(ss, m)
        rq = pmesh.replicate(calib.qstate, m)
        out = np.asarray(jax.jit(
            lambda xx: serving_swin.serving_forward(
                rstate, rq, cfg, policy, xx, use_pallas=False)
        )(pmesh.shard_batch(m, x)))
    np.testing.assert_array_equal(out, single)


def test_dp_serving_fn_pads_and_trims(calibrated):
    """dp_serving_fn (the CLI --dp glue): an UNEVEN batch (6 examples on a
    4-device data axis) is padded to the device multiple, served under the
    mesh, and trimmed back — logits bitwise equal to single-device, shape
    preserved."""
    policy, params, x, calib = calibrated
    sstate = serving.convert(
        params, calib.qstate, TINY, policy, [8] * TINY.num_matmuls
    )
    x6 = x[:6]
    single = np.asarray(
        serving.serving_forward(sstate, TINY, x6, use_pallas=False)
    )

    m = pmesh.make_mesh(4, model_parallel=1)
    rstate = pmesh.replicate(sstate, m)
    fn = pmesh.dp_serving_fn(
        lambda xx: serving.serving_forward(rstate, TINY, xx,
                                           use_pallas=False), m
    )
    out = np.asarray(fn(x6))
    assert out.shape == single.shape
    np.testing.assert_array_equal(out, single)

    # the PALLAS serving program must run unchanged inside the shard_map
    # shard — the kernels lower to custom calls GSPMD cannot partition, so
    # dp_serving_fn deliberately never exposes them to the mesh partitioner
    fn_pal = pmesh.dp_serving_fn(
        lambda xx: serving.serving_forward(rstate, TINY, xx,
                                           use_pallas=True, interpret=True),
        m,
    )
    np.testing.assert_array_equal(np.asarray(fn_pal(x6)), single)


def test_pp_serving_fn_pads_and_trims(calibrated):
    """pp_serving_fn (the CLI --pp glue): an UNEVEN batch (x[:5] with
    n_micro=2) is padded to the microbatch multiple, GPipe-scheduled, and
    trimmed back — logits bitwise equal to fused-layer single-device."""
    from p2vit_tpu.parallel import pipeline as pp

    policy, params, x, calib = calibrated
    ss = serving.convert(params, calib.qstate, TINY, policy,
                         [8] * TINY.num_matmuls)
    x5 = x[:5]
    single = np.asarray(
        serving.serving_forward(ss, TINY, x5, use_pallas=True,
                                interpret=True, fuse_layer=True)
    )
    m = pp.make_pipeline_mesh(2)
    fn = pp.pp_serving_fn(ss, TINY, m, n_micro=2, interpret=True)
    out = np.asarray(fn(x5))
    assert out.shape == single.shape
    np.testing.assert_array_equal(out, single)


def test_make_pipeline_mesh_requires_devices():
    """make_pipeline_mesh must fail loudly when fewer devices exist than
    stages requested — silent truncation ran a '1-stage pipeline' on
    single-chip hosts while the caller believed it asked for S."""
    from p2vit_tpu.parallel import pipeline as pp

    with pytest.raises(ValueError, match="devices"):
        pp.make_pipeline_mesh(len(jax.devices()) + 1)


def test_tp_serving_matches_single_device(calibrated):
    """Megatron-style TP int8 serving (parallel/tensor.py) on a 4×2
    ("data","model") mesh: qkv/fc1 column-parallel (complete output
    channels → unchanged per-channel requant), attention head-parallel,
    proj/fc2 row-parallel with the psum on the RAW int32 accumulator
    (exact: integer addition) before the shared requant+res+LN epilogue —
    so logits are BITWISE equal to single-device serving_forward."""
    from p2vit_tpu.parallel import tensor as ptensor

    policy, params, x, calib = calibrated
    sstate = serving.convert(
        params, calib.qstate, TINY, policy, [8] * TINY.num_matmuls
    )
    single = np.asarray(
        serving.serving_forward(sstate, TINY, x, use_pallas=False)
    )

    m = pmesh.make_mesh(8, model_parallel=2)
    fn = ptensor.tp_serving_fn(sstate, TINY, m, use_pallas=False)
    out = np.asarray(fn(x))
    np.testing.assert_array_equal(out, single)

    # uneven batch: 6 examples on a 4-wide data axis → pad + trim
    out6 = np.asarray(fn(x[:6]))
    assert out6.shape == single[:6].shape
    np.testing.assert_array_equal(out6, single[:6])

    # W4: weight codes are int4-valued int8 through the same kernels —
    # the TP splits are bit-width-agnostic
    s4 = serving.convert(
        params, calib.qstate, TINY, policy, [4] * TINY.num_matmuls
    )
    single4 = np.asarray(
        serving.serving_forward(s4, TINY, x, use_pallas=False)
    )
    fn4 = ptensor.tp_serving_fn(s4, TINY, m, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fn4(x)), single4)

    # RAW uint8 ingestion rides the TP shard_map unchanged (the "u8"
    # constants live in the replicated embed/head slice)
    serving.attach_u8_ingest(sstate)
    xu8 = jax.random.randint(jax.random.PRNGKey(5), x.shape, 0, 256,
                             dtype=jnp.uint8)
    single_u8 = np.asarray(
        serving.serving_forward(sstate, TINY, xu8, use_pallas=False)
    )
    fnu8 = ptensor.tp_serving_fn(sstate, TINY, m, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fnu8(xu8)), single_u8)


def test_tp_serving_pallas_kernels_in_shard(calibrated):
    """The TP path must run the real Pallas kernels on each model shard
    (local heads, sharded channels) — interpret mode on the CPU mesh, and
    the head-aligned qkv permutation hands each device a valid local
    fused-qkv weight. Bitwise vs the single-device Pallas program."""
    from p2vit_tpu.parallel import tensor as ptensor

    policy, params, x, calib = calibrated
    sstate = serving.convert(
        params, calib.qstate, TINY, policy, [8] * TINY.num_matmuls
    )
    single = np.asarray(
        serving.serving_forward(sstate, TINY, x, use_pallas=True,
                                interpret=True)
    )

    m = pmesh.make_mesh(8, model_parallel=2)
    for fq in (True, False):  # qkv-fused kernel per shard / four-kernel path
        fn = ptensor.tp_serving_fn(sstate, TINY, m, use_pallas=True,
                                   interpret=True, fuse_qkv=fq)
        np.testing.assert_array_equal(np.asarray(fn(x)), single)


def test_tp_seq_parallel_serving_bitwise(calibrated):
    """Sequence-parallel epilogues (tp_serving_fn(seq_parallel=True)): the
    row-parallel junctions psum_scatter the int32 accumulator over token
    rows, run the requant+res+LN epilogue on the shard, and all_gather the
    int8 codes; the residual stream stays row-sharded across the depth.
    Same integer reduction, same per-row math — bitwise vs single-device,
    including a short batch that exercises the nd·tp padding quantum."""
    from p2vit_tpu.parallel import tensor as ptensor

    policy, params, x, calib = calibrated
    sstate = serving.convert(
        params, calib.qstate, TINY, policy, [8] * TINY.num_matmuls
    )
    single = np.asarray(
        serving.serving_forward(sstate, TINY, x, use_pallas=False)
    )

    m = pmesh.make_mesh(8, model_parallel=2)
    fn = ptensor.tp_serving_fn(sstate, TINY, m, use_pallas=False,
                               seq_parallel=True)
    np.testing.assert_array_equal(np.asarray(fn(x)), single)
    np.testing.assert_array_equal(np.asarray(fn(x[:5])), single[:5])


def test_dp_generation_grad_matches_single_device(calibrated):
    """The data-free generation gradient (the framework's training-style
    step) under DP sharding: the KDE entropy term couples images across
    the batch, so GSPMD must insert real collectives inside grad — and
    the result must match the single-device gradient (tolerance: the
    collective reduction may reassociate float sums)."""
    from p2vit_tpu import datafree

    _, params, _, _ = calibrated
    img = jax.random.normal(jax.random.PRNGKey(5), (8, 3, 32, 32))
    labels = jnp.arange(8) % TINY.num_classes
    args = (labels, jnp.float32(2750.0), jnp.asarray(2), jnp.asarray(True))

    gfn = jax.jit(jax.grad(datafree.generation_loss),
                  static_argnames=("cfg",))
    single = np.asarray(gfn(img, params, TINY, *args))

    m = pmesh.make_mesh(8, model_parallel=1)
    with m:
        sharded = np.asarray(
            gfn(pmesh.shard_batch(m, img), pmesh.replicate(params, m),
                TINY, *args)
        )
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-6)


@pytest.fixture(scope="module")
def swin_calibrated():
    from p2vit_tpu import serving_swin
    from p2vit_tpu.models import swin as swin_mod

    cfg = swin_mod.SwinConfig(
        img_size=32, patch_size=4, num_classes=10, embed_dim=16,
        depths=(2, 2), num_heads=(2, 2), window_size=4,
    )
    policy = make_policy()
    params = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32))
    calib = swin_mod.calibrate(params, cfg, policy, x)
    ss = serving_swin.convert(params, calib.qstate, cfg, policy, 8)
    return cfg, policy, params, x, calib, ss


def test_swin_tp_serving_matches_single_device(swin_calibrated):
    """Megatron TP for Swin (parallel/tensor_swin.py) on a 4×2
    ("data","model") mesh: per-stage head-aligned column-parallel qkv,
    head-parallel window attention (bias values sharded by head),
    row-parallel proj/fc2 with the psum on the RAW int32 accumulator
    before the shared epilogue twins — logits BITWISE equal to
    single-device serving_forward (fuse_res default path), both LIS
    arms, plus an uneven batch through the pad/trim path."""
    from p2vit_tpu import serving_swin
    from p2vit_tpu.parallel import tensor_swin

    cfg, policy, params, x, calib, ss = swin_calibrated
    m = pmesh.make_mesh(8, model_parallel=2)
    for lis in (True, False):
        single = np.asarray(serving_swin.serving_forward(
            ss, calib.qstate, cfg, policy, x, use_pallas=False, lis=lis))
        fn = tensor_swin.tp_serving_fn(
            ss, calib.qstate, cfg, m, use_pallas=False, lis=lis)
        np.testing.assert_array_equal(np.asarray(fn(x)), single)
        if lis:
            out6 = np.asarray(fn(x[:6]))  # uneven batch: pad + trim
            np.testing.assert_array_equal(out6, single[:6])


def test_swin_tp_serving_pallas_kernels_in_shard(swin_calibrated):
    """The Swin TP path must run the real Pallas kernels on each model
    shard (local heads, sharded channels) — interpret mode on the CPU
    mesh. Bitwise vs the single-device Pallas program."""
    from p2vit_tpu import serving_swin
    from p2vit_tpu.parallel import tensor_swin

    cfg, policy, params, x, calib, ss = swin_calibrated
    single = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, cfg, policy, x, use_pallas=True, interpret=True))
    m = pmesh.make_mesh(8, model_parallel=2)
    fn = tensor_swin.tp_serving_fn(ss, calib.qstate, cfg, m,
                                   use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(fn(x)), single)


def test_swin_tp_w4_and_divisibility(swin_calibrated):
    """W4 weight codes ride the same TP splits (bit-width-agnostic), and
    check_tp rejects a tp that does not divide every stage's heads."""
    from p2vit_tpu import serving_swin
    from p2vit_tpu.parallel import tensor_swin

    cfg, policy, params, x, calib, ss = swin_calibrated
    s4 = serving_swin.convert(params, calib.qstate, cfg, policy, 4)
    single = np.asarray(serving_swin.serving_forward(
        s4, calib.qstate, cfg, policy, x, use_pallas=False))
    m = pmesh.make_mesh(8, model_parallel=2)
    fn = tensor_swin.tp_serving_fn(s4, calib.qstate, cfg, m,
                                   use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fn(x)), single)

    with pytest.raises(ValueError, match="heads"):
        tensor_swin.check_tp(cfg, 3)  # heads (2,2): tp=3 cannot divide
