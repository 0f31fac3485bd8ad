"""Full-model golden parity: reference quantized ViT vs our rebuild.

Instantiates the ACTUAL reference model (models/vit_fquant.VisionTransformer,
CPU, .cuda() neutralized), loads OUR random weights into it, runs the
reference's calibration protocol (model_open_calibrate →
model_open_last_calibrate → one forward) and quantized evaluation, and
compares against our jitted ``calibrate`` + ``quant_forward``:

  * every activation quantizer scale and PTF mask,
  * every per-bit weight scale dic,
  * smoothquant channel scales,
  * the final W8A8/W4A8 quantized logits.

Scale comparisons are exact; logits allow f32 reduction-order slack
(torch CPU vs XLA sum orders differ inside matmuls).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not mounted"
)

torch = pytest.importorskip("torch")

from p2vit_tpu.config import make_policy
from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.models import vit

TINY = ViTConfig(
    img_size=32, patch_size=8, num_classes=10, embed_dim=16, depth=2, num_heads=2
)


@pytest.fixture(scope="module")
def ref_setup():
    sys.path.insert(0, REF)
    orig_t, orig_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    from functools import partial

    from config import Config
    from models.ptq import QIntLayerNorm
    from models.vit_fquant import VisionTransformer

    cfg_ref = Config(True, True, "minmax")
    model = VisionTransformer(
        img_size=TINY.img_size,
        patch_size=TINY.patch_size,
        num_classes=TINY.num_classes,
        embed_dim=TINY.embed_dim,
        depth=TINY.depth,
        num_heads=TINY.num_heads,
        qkv_bias=True,
        norm_layer=partial(QIntLayerNorm, eps=1e-6),  # vit_fquant.py:952
        input_quant=True,
        cfg=cfg_ref,
    )
    yield model
    torch.Tensor.cuda, torch.nn.Module.cuda = orig_t, orig_m
    sys.path.remove(REF)


def _load_our_params(model, params, cfg=None):
    """Copy our pytree into the reference model's modules."""
    cfg = cfg or TINY
    t = lambda a: torch.from_numpy(np.asarray(a, dtype=np.float32))
    sd = model.state_dict()
    sd["cls_token"] = t(params["cls_token"])
    sd["pos_embed"] = t(params["pos_embed"])
    sd["patch_embed.proj.weight"] = t(params["patch_embed"]["w"]).reshape(
        cfg.embed_dim, 3, cfg.patch_size, cfg.patch_size
    )
    sd["patch_embed.proj.bias"] = t(params["patch_embed"]["b"])
    names = {"norm1": "norm1", "qkv": "attn.qkv", "proj": "attn.proj",
             "norm2": "norm2", "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    for i, blk in enumerate(params["blocks"]):
        for ours, theirs in names.items():
            sd[f"blocks.{i}.{theirs}.weight"] = t(blk[ours]["w"])
            sd[f"blocks.{i}.{theirs}.bias"] = t(blk[ours]["b"])
    sd["norm.weight"] = t(params["norm"]["w"])
    sd["norm.bias"] = t(params["norm"]["b"])
    sd["head.weight"] = t(params["head"]["w"])
    sd["head.bias"] = t(params["head"]["b"])
    model.load_state_dict(sd)


@pytest.fixture(scope="module")
def calibrated(ref_setup):
    """Reference model calibrated on a fixed batch + our calibration of the
    same weights/batch (runs once per module)."""
    model = ref_setup
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    _load_our_params(model, params)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32)), dtype=np.float32
    )

    # ---- reference calibration (SURVEY §3.1 protocol) ----
    model.eval()
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(torch.from_numpy(x))
    model.model_close_calibrate()
    model.model_quant()

    # ---- our calibration ----
    policy = make_policy(True, True, "minmax")
    calib = vit.calibrate(params, TINY, policy, jnp.asarray(x))
    return model, params, x, policy, calib


def _ref_quant_logits(model, x, bit_config):
    with torch.no_grad():
        out = model(torch.from_numpy(x), bit_config=bit_config)
    return out[0].numpy() if isinstance(out, tuple) else out.numpy()


def test_full_model_parity(calibrated):
    model, params, x, policy, calib = calibrated
    qs = calib.qstate

    def close(ours, theirs, name, exact=True):
        a = np.asarray(ours).reshape(-1)
        b = theirs.detach().numpy().reshape(-1)
        if exact:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=name)

    # model-level activation quantizers (PoT scales must match exactly)
    close(qs["qact_input"]["scale"], model.qact_input.quantizer.scale, "qact_input")
    close(qs["patch"]["qact"]["scale"], model.patch_embed.qact.quantizer.scale,
          "patch qact")
    close(qs["qact_embed"]["scale"], model.qact_embed.quantizer.scale, "qact_embed")
    close(qs["qact_pos"]["scale"], model.qact_pos.quantizer.scale, "qact_pos")
    # PTF scales: float (not PoT) → reduction-order slack
    close(qs["qact1"]["scale"], model.qact1.quantizer.scale, "qact1 PTF",
          exact=False)
    close(qs["qact2"]["scale"], model.qact2.quantizer.scale, "final qact2")

    for i, blk in enumerate(model.blocks):
        bq = qs["blocks"][i]
        aq, mq = bq["attn"], bq["mlp"]
        # smoothquant channel scale (PoT, exact) and per-bit weight dics
        close(aq["channel_scale"][1], blk.attn.channel_scale, f"b{i} attn cs")
        close(mq["channel_scale"][1], blk.mlp.channel_scale, f"b{i} mlp cs")
        for j, bname in enumerate(["uint3", "uint4", "int4", "int8"]):
            close(
                aq["wscale"][1][j],
                blk.attn.qkv.quantizer.dic_scale[bname]
                * torch.ones(3 * TINY.embed_dim),
                f"b{i} qkv wscale {bname}",
            )
            close(
                aq["proj_wscale"][j],
                blk.attn.proj.quantizer.dic_scale[bname]
                * torch.ones(TINY.embed_dim),
                f"b{i} proj wscale {bname}",
            )
        close(aq["qact0_scale"][1], blk.attn.qact0.quantizer.scale, f"b{i} qact0")
        close(aq["qact1"]["scale"], blk.attn.qact1.quantizer.scale, f"b{i} a.qact1")
        close(aq["qact_attn1"]["scale"], blk.attn.qact_attn1.quantizer.scale,
              f"b{i} attn1")
        close(aq["qact2"]["scale"], blk.attn.qact2.quantizer.scale, f"b{i} a.qact2")
        close(aq["qact3"]["scale"], blk.attn.qact3.quantizer.scale, f"b{i} a.qact3",
              exact=False)
        close(bq["qact2"]["scale"], blk.qact2.quantizer.scale, f"b{i} qact2",
              exact=False)
        close(bq["qact4"]["scale"], blk.qact4.quantizer.scale, f"b{i} qact4",
              exact=False)
        close(mq["qact1"]["scale"], blk.mlp.qact1.quantizer.scale, f"b{i} m.qact1")
        close(mq["qact2"]["scale"], blk.mlp.qact2.quantizer.scale, f"b{i} m.qact2",
              exact=False)

    # ---- quantized logits ----
    n = TINY.num_matmuls
    for bits in (8, 4):
        bit_config = [bits] * n
        ref_logits = _ref_quant_logits(model, x, bit_config)
        ours = np.asarray(
            vit.quant_forward(
                params, qs, TINY, policy, jnp.asarray(x), vit.bits_to_idx(bit_config)
            )
        )
        rel = np.linalg.norm(ours - ref_logits) / max(
            np.linalg.norm(ref_logits), 1e-9
        )
        assert rel < 2e-2, f"W{bits}A8 logits diverge from reference: rel={rel}"
        assert (ours.argmax(1) == ref_logits.argmax(1)).all()


def test_decision_import_reproduces_reference_logits(calibrated):
    """Decision-import mode (VERDICT item 3): ingest the reference model's
    calibrated quantizer state (scale/zero_point/dic_scale/smoothquant
    caches) and reproduce its quantized logits WITHOUT running our own
    calibration — killing the preprocessing/batch-order identity risk
    (SURVEY §7 hard parts)."""
    from p2vit_tpu import checkpoints

    model, params, x, policy, calib = calibrated
    imported = checkpoints.import_reference_state(model, TINY)
    qs = imported.qstate

    # imported state must agree with our independently-calibrated state
    # (PoT/weight scales exact; PTF float scales up to reduction order).
    # PTF masks are compared up to a global PoT factor: the importer derives
    # them as round(scale/scale.min()) — the only form anything consumes —
    # which differs from the stored {1,2,4,8} mask by min(mask) when no
    # channel used multiplier 1 (see import_reference_state docstring).
    ours_flat, ours_def = jax.tree_util.tree_flatten_with_path(calib.qstate)
    imp_flat, imp_def = jax.tree_util.tree_flatten_with_path(qs)
    assert [p for p, _ in ours_flat] == [p for p, _ in imp_flat], (
        "imported QuantState has a different tree structure"
    )
    for (path, a), (_, b) in zip(ours_flat, imp_flat):
        a = np.asarray(a, dtype=np.float32).reshape(-1)
        b = np.asarray(b, dtype=np.float32).reshape(-1)
        name = jax.tree_util.keystr(path)
        if name.endswith("['mask']"):
            ratio = a / b
            np.testing.assert_allclose(ratio, ratio[0], rtol=1e-6, err_msg=name)
            assert float(np.log2(ratio[0])) == int(np.log2(ratio[0])), name
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=name)

    # and reproduce the reference's quantized logits end to end
    for bits in (8, 4):
        bit_config = [bits] * TINY.num_matmuls
        ref_logits = _ref_quant_logits(model, x, bit_config)
        ours = np.asarray(
            vit.quant_forward(
                params, qs, TINY, policy, jnp.asarray(x), vit.bits_to_idx(bit_config)
            )
        )
        rel = np.linalg.norm(ours - ref_logits) / max(np.linalg.norm(ref_logits), 1e-9)
        assert rel < 2e-2, f"imported-state W{bits}A8 logits diverge: rel={rel}"
        assert (ours.argmax(1) == ref_logits.argmax(1)).all()

    # imported state round-trips through the .npz serialization
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        checkpoints.save_quant_state(f.name, imported)
        loaded = checkpoints.load_quant_state(f.name)
    for a, b in zip(jax.tree_util.tree_leaves(qs),
                    jax.tree_util.tree_leaves(loaded.qstate)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _full_size_parity(vcfg: ViTConfig, eval_batch: int, check_import: bool,
                      bits_list=(8, 4), ptf_base_tol: float = 1e-4,
                      cs_flip_frac: float = 0.0):
    """Shared full-size golden-parity body (called under -m slow).

    Calibrates the ACTUAL reference model and our rebuild on the same
    2-image batch at real 224² geometry, checks every decision (scales,
    masks, caches) and then evaluates parity on a FRESH ``eval_batch``-image
    batch (VERDICT r2 item 2c: 2 images of argmax agreement has little
    statistical power; the quantizers are frozen after calibration, so the
    eval batch need not be the calibration batch — mirroring the
    reference's own calibrate-then-validate split, test_quant.py:262-313).
    """
    from functools import partial

    from config import Config  # reference modules (sys.path set by ref_setup)
    from models.ptq import QIntLayerNorm
    from models.vit_fquant import VisionTransformer

    model = VisionTransformer(
        img_size=224, patch_size=16, num_classes=1000,
        embed_dim=vcfg.embed_dim, depth=vcfg.depth, num_heads=vcfg.num_heads,
        qkv_bias=True, norm_layer=partial(QIntLayerNorm, eps=1e-6),
        input_quant=True, cfg=Config(True, True, "minmax"),
    )
    params = vit.init_params(jax.random.PRNGKey(0), vcfg)
    _load_our_params(model, params, vcfg)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224)),
        dtype=np.float32,
    )
    x_eval = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (eval_batch, 3, 224, 224)),
        dtype=np.float32,
    )

    model.eval()
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(torch.from_numpy(x))
    model.model_close_calibrate()
    model.model_quant()

    policy = make_policy(True, True, "minmax")
    calib = vit.calibrate(params, vcfg, policy, jnp.asarray(x))
    qs = calib.qstate

    # every PoT activation scale and per-bit weight-scale dic, all 12 blocks
    def exact(ours, theirs, name):
        np.testing.assert_array_equal(
            np.asarray(ours).reshape(-1),
            theirs.detach().numpy().reshape(-1),
            err_msg=name,
        )

    def pot_rows(ours, theirs, name, max_flip_frac=0.005):
        """Per-bit weight PoT rows: exact, except knife-edge argmin ties.

        The 4-candidate output-aware search argmins an f32 L2 computed with
        different reduction orders in torch vs XLA; a near-tie between ANY
        two of the four candidates can flip. Measured instance (DeiT-B,
        b5 proj int4, channel 760/768): candidates 2 PoT steps apart whose
        f64 losses agree to 6 ppm (1.0460806e-4 vs 1.0460868e-4) — ~50 f32
        ulps, inside the cross-framework sum-order noise over the 98k-term
        reduction. Allow only that signature: a ≤0.5% channel fraction,
        each a power-of-two step within the 4-candidate window. Anything
        else is a real divergence."""
        o = np.asarray(ours).reshape(-1)
        t = theirs.detach().numpy().reshape(-1)
        neq = o != t
        if not neq.any():
            return
        ratio = o[neq] / t[neq]
        assert np.all(np.isin(ratio, [0.125, 0.25, 0.5, 2.0, 4.0, 8.0])), (
            f"{name}: non-candidate PoT mismatch (ratios {np.unique(ratio)})"
        )
        assert neq.mean() <= max_flip_frac, (
            f"{name}: {neq.sum()}/{neq.size} candidate flips — beyond the "
            f"knife-edge envelope"
        )

    exact(qs["qact_input"]["scale"], model.qact_input.quantizer.scale, "qact_input")
    exact(qs["patch"]["qact"]["scale"], model.patch_embed.qact.quantizer.scale,
          "patch qact")
    exact(qs["qact2"]["scale"], model.qact2.quantizer.scale, "final qact2")
    def cs_check(ours, theirs, name):
        """SmoothQuant channel_scale: exact at DeiT-T/S/B; at ViT-L depth
        the round_to_pot(ratio) lands on an f32 knife edge for isolated
        channels and flips to the ADJACENT power of two (measured,
        2026-08-18, random-weight ViT-L calibration: exactly one channel —
        b20 attn, 1/1024, ratio 2.0 — across all 48 per-block tensors;
        everything else exact). cs_flip_frac=0 keeps the strict form."""
        if cs_flip_frac == 0.0:
            return exact(ours, theirs, name)
        o = np.asarray(ours).reshape(-1)
        t = theirs.detach().numpy().reshape(-1)
        neq = o != t
        if not neq.any():
            return
        ratio = o[neq] / t[neq]
        assert np.all(np.isin(ratio, [0.5, 2.0])), (
            f"{name}: non-adjacent-PoT channel_scale mismatch "
            f"(ratios {np.unique(ratio)})"
        )
        assert neq.mean() <= cs_flip_frac, (
            f"{name}: {neq.sum()}/{neq.size} channel_scale flips — beyond "
            f"the measured knife-edge envelope"
        )

    for i, blk in enumerate(model.blocks):
        bq = qs["blocks"][i]
        aq, mq = bq["attn"], bq["mlp"]
        cs_check(aq["channel_scale"][1], blk.attn.channel_scale, f"b{i} attn cs")
        cs_check(mq["channel_scale"][1], blk.mlp.channel_scale, f"b{i} mlp cs")
        exact(aq["qact0_scale"][1], blk.attn.qact0.quantizer.scale, f"b{i} qact0")
        exact(aq["qact1"]["scale"], blk.attn.qact1.quantizer.scale, f"b{i} a.qact1")
        exact(aq["qact_attn1"]["scale"], blk.attn.qact_attn1.quantizer.scale,
              f"b{i} attn1")
        exact(aq["qact2"]["scale"], blk.attn.qact2.quantizer.scale, f"b{i} a.qact2")
        exact(mq["qact1"]["scale"], blk.mlp.qact1.quantizer.scale, f"b{i} m.qact1")
        for j, bname in enumerate(["uint3", "uint4", "int4", "int8"]):
            pot_rows(
                aq["proj_wscale"][j],
                blk.attn.proj.quantizer.dic_scale[bname]
                * torch.ones(vcfg.embed_dim),
                f"b{i} proj wscale {bname}",
            )
            pot_rows(
                mq["fc2_wscale"][j],
                blk.mlp.fc2.quantizer.dic_scale[bname]
                * torch.ones(vcfg.embed_dim),
                f"b{i} fc2 wscale {bname}",
            )
        # PTF float scales (the one scale family that is NOT PoT-rounded, so
        # it exposes the raw cross-framework fp-forward drift). Two measured
        # noise modes at DeiT-S geometry (scripted sweep, 2026-08-17):
        #   * the layer-global base scale drifts with depth — torch-vs-XLA
        #     ulp noise in the calibration forward compounds to |Δ|≈1.2e-5
        #     relative by block 10 (PoT scales bucket this away);
        #   * 0-1 channels per block flip their {1,2,4,8} mask by exactly ×2
        #     — the argmin over 4 candidate L2 losses lands on an f32 knife
        #     edge (same tie-flip class as the LIS knife edges, DESIGN.md §8).
        # Any base drift >1e-4, >1% flipped channels, or a non-PoT flip
        # ratio is a real divergence.
        ours_s = np.asarray(aq["qact3"]["scale"]).reshape(-1).astype(np.float64)
        ref_s = (
            blk.attn.qact3.quantizer.scale.detach().numpy().reshape(-1)
            .astype(np.float64)
        )
        ratio = ours_s / ref_s
        base = np.median(ratio)
        # ptf_base_tol: geometry-dependent — the layer-global float base
        # compounds fp-forward drift with depth×width (1.2e-5 by b10 at
        # DeiT-S; 9.3e-4 by b10 at DeiT-B). The per-channel mask check
        # below is NOT loosened: r2 = ratio/base is an exact integer-mask
        # ratio, independent of the base drift.
        assert abs(base - 1.0) < ptf_base_tol, (
            f"b{i} qact3 PTF base scale: {base}"
        )
        r2 = ratio / base
        flipped = np.abs(r2 - 1.0) > 1e-4
        assert flipped.mean() <= 0.01, (
            f"b{i} qact3 PTF: {flipped.sum()}/{ratio.size} channels diverge"
        )
        if flipped.any():
            pot = 2.0 ** np.round(np.log2(r2[flipped]))
            np.testing.assert_allclose(
                r2[flipped], pot, rtol=1e-4,
                err_msg=f"b{i} qact3 PTF: non-PoT scale divergence",
            )
            assert np.all((pot >= 0.25) & (pot <= 4.0)), (
                f"b{i} qact3 PTF: flip beyond one mask step {pot}"
            )

    # Decision import at full size (VERDICT r2 item 2b): ingest the
    # reference's calibrated quantizer state and reproduce its quantized +
    # serving logits without running our own calibration.
    qstates = {"calibrated": qs}
    if check_import:
        from p2vit_tpu import checkpoints

        qstates["imported"] = checkpoints.import_reference_state(model, vcfg).qstate

    # Quantized logits at full size. Exact value parity with torch f32 is
    # unattainable by construction at this scale: torch and XLA f32 matmul/
    # LN arithmetic differ at the ulp level, ~0.03% of integer-LN M·2^-N
    # outputs and ~0.3% of post-matmul requant codes land on opposite sides
    # of a round() knife edge, and the LIS log-domain quantizer turns each
    # flip into a factor-2 attention-weight change — compounding to ~0.3%
    # residual-stream drift per block (measured; both sides are equally
    # 'wrong' w.r.t. exact f64). The decision layer above — every scale,
    # mask and smoothquant cache — is EXACT, so we pin: bounded per-block
    # drift, bounded logits drift (random-init logits are ~N(0, 0.23), the
    # worst case for relative error), and argmax agreement.
    for bits in bits_list:
        bit_config = [bits] * vcfg.num_matmuls
        ref_logits = _ref_quant_logits(model, x_eval, bit_config)
        with torch.no_grad():
            ref_taps = []
            hooks = [
                blk.register_forward_hook(
                    lambda m, i, o, t=ref_taps: t.append(o.detach().numpy())
                )
                for blk in model.blocks
            ]
            model(torch.from_numpy(x_eval), bit_config=bit_config)
            for h in hooks:
                h.remove()
        for qs_name, qs_i in qstates.items():
            taps: list = []
            ours = np.asarray(
                vit.quant_forward(
                    params, qs_i, vcfg, policy, jnp.asarray(x_eval),
                    vit.bits_to_idx(bit_config), block_tap=taps,
                )
            )
            for bi, (a, r) in enumerate(zip(taps, ref_taps)):
                a = np.asarray(a)
                drift = np.linalg.norm(a - r) / max(np.linalg.norm(r), 1e-9)
                assert drift < 0.01 * (bi + 2), (
                    f"[{qs_name}] W{bits} block {bi} residual drift {drift} "
                    "beyond the cross-framework f32 noise envelope — "
                    "semantic divergence"
                )
            rel = np.linalg.norm(ours - ref_logits) / max(
                np.linalg.norm(ref_logits), 1e-9
            )
            assert rel < 0.3, f"[{qs_name}] full-size W{bits}A8 diverges: rel={rel}"
            # Argmax agreement at batch 16: random-init logits are ~N(0,0.23)
            # over 1000 classes, so per-image top-2 gaps routinely sit INSIDE
            # the ~0.3-rel cross-framework drift envelope — a strict 100%
            # bar is unattainable by construction at this geometry (measured:
            # 14/16 at DeiT-S; trained weights separate classes by far more
            # than the drift). Bound: >=80% agreement, and every flip must be
            # a near-tie (our pick inside the reference's top-5), never a
            # gross divergence.
            am_o, am_r = ours.argmax(1), ref_logits.argmax(1)
            agree = float((am_o == am_r).mean())
            assert agree >= 0.8, (
                f"[{qs_name}] full-size W{bits}A8 argmax agreement {agree} "
                f"over {eval_batch} images"
            )
            top5 = np.argsort(-ref_logits, axis=1)[:, :5]
            for img in np.where(am_o != am_r)[0]:
                assert am_o[img] in top5[img], (
                    f"[{qs_name}] W{bits} image {img}: flipped argmax "
                    f"{am_o[img]} is not a reference near-tie (top-5)"
                )

            # the int8 serving pipeline at full size: codes end-to-end must
            # track the fake-quant simulation (argmax + bounded drift) — the
            # deploy path's accuracy evidence at real geometry
            from p2vit_tpu import serving

            sstate = serving.convert(params, qs_i, vcfg, policy, bit_config)
            srv = np.asarray(
                serving.serving_forward(sstate, vcfg, jnp.asarray(x_eval),
                                        use_pallas=False)
            )
            srel = np.linalg.norm(srv - ours) / max(np.linalg.norm(ours), 1e-9)
            assert srel < 0.3, f"[{qs_name}] full-size W{bits} serving: rel={srel}"
            # serving (exact int32 accumulation) vs sim (f32) differ at
            # round-to-nearest knife edges only; at random-init logit
            # spacing that flips the argmax of the odd near-tie image
            # (measured 15/16 at DeiT-S). Same bound as above.
            am_s = srv.argmax(1)
            s_agree = float((am_s == am_o).mean())
            assert s_agree >= 0.8, (
                f"[{qs_name}] W{bits} serving argmax agreement {s_agree}"
            )
            ours_top5 = np.argsort(-ours, axis=1)[:, :5]
            for img in np.where(am_s != am_o)[0]:
                assert am_s[img] in ours_top5[img], (
                    f"[{qs_name}] W{bits} image {img}: serving flip is not "
                    "a near-tie"
                )


@pytest.mark.slow
def test_full_size_deit_tiny_parity(ref_setup):
    """Golden parity at REAL DeiT-Tiny geometry (224x224, depth 12, dim 192,
    197 tokens — the regime where int-LN M*2^-N ranges, int-exp windows and
    f32 reduction order actually bite; VERDICT r1 item 2). Random weights,
    CPU; the strongest accuracy evidence obtainable without ImageNet or
    checkpoints in the environment. Includes the full-size decision-import
    round trip (VERDICT r2 item 2b) and a 16-image eval batch (item 2c).

    Ref: /root/reference/models/vit_fquant.py:942-966 (deit_tiny geometry).
    """
    _full_size_parity(
        ViTConfig(img_size=224, patch_size=16, num_classes=1000,
                  embed_dim=192, depth=12, num_heads=3),
        eval_batch=16, check_import=True,
    )


@pytest.mark.slow
def test_full_size_deit_small_parity(ref_setup):
    """Golden parity at DeiT-Small geometry (dim 384, 6 heads — the PTF
    masks, int-LN in_scale alignment and head slicing all change regime
    with C; VERDICT r2 item 2a). W8 only: the W4 path's bit-independent
    machinery is covered at tiny geometry, and the torch-eager reference
    calibration dominates this test's minutes.

    Ref: /root/reference/models/vit_fquant.py:969-993 (deit_small geometry).
    """
    _full_size_parity(
        ViTConfig(img_size=224, patch_size=16, num_classes=1000,
                  embed_dim=384, depth=12, num_heads=6),
        eval_batch=16, check_import=False, bits_list=(8,),
    )


@pytest.mark.slow
def test_full_size_deit_base_parity(ref_setup):
    """Golden parity at DeiT-Base geometry (dim 768, 12 heads, hidden 3072
    — the widest PTF/int-LN channel regime in the DeiT family; rounds out
    the tiny/small coverage). W8 only, with the same fresh 16-image eval
    batch as the other full-size tests (the torch-eager reference
    CALIBRATION dominates this test's minutes, so trimming the eval batch
    would buy nothing; cross-framework decision equality is the point, the
    drift envelope is pinned at tiny/small).

    Ref: /root/reference/models/vit_fquant.py:996-1020 (deit_base geometry).
    """
    _full_size_parity(
        ViTConfig(img_size=224, patch_size=16, num_classes=1000,
                  embed_dim=768, depth=12, num_heads=12),
        eval_batch=16, check_import=False, bits_list=(8,),
        ptf_base_tol=3e-3,
    )


@pytest.mark.xslow
@pytest.mark.slow  # so -m "not slow" (which replaces the addopts -m) skips it
def test_full_size_vit_large_parity(ref_setup):
    """Golden parity at ViT-Large geometry (dim 1024, 16 heads, depth 24 —
    the only zoo geometry no other golden test covers; twice the depth
    doubles the knife-edge drift accumulation the deit_base envelope was
    sized for). Extra-slow anchor (torch-eager reference calibration at
    ViT-L on CPU): deselected by default, run with -m xslow.

    Ref: /root/reference/models/vit_fquant.py:1050-1074 (vit_large
    geometry: patch 16, embed 1024, depth 24, heads 16, mlp_ratio 4).
    """
    _full_size_parity(
        ViTConfig(img_size=224, patch_size=16, num_classes=1000,
                  embed_dim=1024, depth=24, num_heads=16),
        eval_batch=16, check_import=False, bits_list=(8,),
        ptf_base_tol=3e-3, cs_flip_frac=0.002,
    )
