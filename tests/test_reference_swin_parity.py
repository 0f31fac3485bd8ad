"""Full-model golden parity: reference quantized Swin vs our rebuild.

The reference Swin path (models/swin_quant.py) is STALE and cannot run
as-is (SURVEY §2 ⚠); this test reconstructs its INTENT with three minimal,
documented shims and then uses the ACTUAL reference modules as the oracle:

  1. ``patch_embed(x)`` (swin_quant.py:886) predates the P²-ViT PatchEmbed
     signature ``forward(x, FLOPs, bit_config)`` (layers_quant.py:462) —
     the shim supplies FLOPs=[] and bit_config=8.
  2. ``self.mlp(...)`` (swin_quant.py:442-445) predates
     ``Mlp.forward(x, FLOPs, global_distance, ffn_bit_config, ...)``
     (layers_quant.py:225-236) — the shim supplies dummies, ffn bits
     [8, 8], and smoothquant=False (P²-ViT never wired SmoothQuant into
     Swin; the FQ-ViT-era Swin predates it). The Mlp's smoothquant-only
     ``qact0`` double-quantize node is neutralized at eval for the same
     reason.
  3. PatchMerging passes ``4`` positionally into QIntLayerNorm's
     ``out_quantizer_scale`` slot (swin_quant.py:520 vs layers.py:276-283)
     where ``in_scale_expand=4`` is required: the previous quantizer is
     channel-wise PTF (block qact4, CALIBRATION_MODE_A_LN), so its [C]
     scale cannot broadcast over the 4C-channel concat at all —
     ``in_scale_expand`` exists in the reference solely for this call site
     and is referenced nowhere else. The shim routes the int there.
  4. PatchMerging's ``reduction`` is the only bias-less QLinear
     (swin_quant.py:484-493) and the only caller that would ever hand the
     channel-wise PoT search ``others=[None]`` — which crashes on
     ``others[0][j]`` (minmax.py:87). The shim gives it an explicit zero
     bias: ``F.linear(x, w, zeros)`` is bit-identical to ``bias=None``.

Weight bits: QLinears the stale graph never passes bit_config to
(qkv/proj/reduction/head) evaluate at the calibration loop's LAST bit
type — int8, layer-wise (ptq/layers.py:60-74 ends on int8;
bit_type.py:42-56 order) — so the reconstructed reference is uniform W8
and is compared against our ``quant_forward(w_bit=8)``.
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
from p2vit_tpu.models import swin

STINY = swin.SwinConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=16,
    depths=(2, 2), num_heads=(2, 2), window_size=4,
)
BITS = ["uint3", "uint4", "int4", "int8"]


@pytest.fixture(scope="module")
def ref_env():
    sys.path.insert(0, REF)
    orig_t, orig_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import models.layers_quant as lq
    from config import Config
    from models.ptq.layers import QIntLayerNorm as RefLN
    from models.swin_quant import SwinTransformer

    orig_pe, orig_mlp, orig_ln = lq.PatchEmbed.forward, lq.Mlp.forward, RefLN.forward

    def pe_fwd(self, x, FLOPs=None, bit_config=8):  # shim 1
        return orig_pe(self, x, [] if FLOPs is None else FLOPs, bit_config)

    def mlp_fwd(self, x, FLOPs=None, global_distance=None,
                ffn_bit_config=None, **kw):  # shim 2
        kw.setdefault("smoothquant", False)
        return orig_mlp(self, x, [] if FLOPs is None else FLOPs,
                        [] if global_distance is None else global_distance,
                        ffn_bit_config or [8, 8], **kw)

    def ln_fwd(self, x, in_quantizer=None, out_quantizer=None,
               out_quantizer_scale=None, in_scale_expand=1):  # shim 3
        if isinstance(out_quantizer_scale, int):
            in_scale_expand, out_quantizer_scale = out_quantizer_scale, None
        return orig_ln(self, x, in_quantizer, out_quantizer,
                       out_quantizer_scale, in_scale_expand)

    lq.PatchEmbed.forward = pe_fwd
    lq.Mlp.forward = mlp_fwd
    RefLN.forward = ln_fwd

    env = {"lq": lq, "Config": Config, "RefLN": RefLN,
           "SwinTransformer": SwinTransformer}
    yield env
    lq.PatchEmbed.forward, lq.Mlp.forward, RefLN.forward = orig_pe, orig_mlp, orig_ln
    torch.Tensor.cuda, torch.nn.Module.cuda = orig_t, orig_m
    sys.path.remove(REF)


def _build_ref_model(env, scfg):
    return env["SwinTransformer"](
        img_size=scfg.img_size, patch_size=scfg.patch_size,
        num_classes=scfg.num_classes, embed_dim=scfg.embed_dim,
        depths=scfg.depths, num_heads=scfg.num_heads,
        window_size=scfg.window_size, drop_path_rate=0.0,
        norm_layer=env["RefLN"],  # swin_quant.py:929 (torch default eps)
        input_quant=True, cfg=env["Config"](True, True, "minmax"),
    )


def _load_our_params(model, params, scfg=STINY):
    t = lambda a: torch.from_numpy(np.asarray(a, dtype=np.float32))
    sd = model.state_dict()
    sd["patch_embed.proj.weight"] = t(params["patch_embed"]["w"]).reshape(
        scfg.embed_dim, 3, scfg.patch_size, scfg.patch_size
    )
    sd["patch_embed.proj.bias"] = t(params["patch_embed"]["b"])
    sd["patch_embed.norm.weight"] = t(params["patch_norm"]["w"])
    sd["patch_embed.norm.bias"] = t(params["patch_norm"]["b"])
    for i, stage in enumerate(params["stages"]):
        for j, blk in enumerate(stage["blocks"]):
            p = f"layers.{i}.blocks.{j}."
            for ours, theirs in (("norm1", "norm1"), ("qkv", "attn.qkv"),
                                 ("proj", "attn.proj"), ("norm2", "norm2"),
                                 ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
                sd[p + theirs + ".weight"] = t(blk[ours]["w"])
                sd[p + theirs + ".bias"] = t(blk[ours]["b"])
            sd[p + "attn.relative_position_bias_table"] = t(blk["bias_table"])
        if "downsample" in stage:
            ds = stage["downsample"]
            sd[f"layers.{i}.downsample.norm.weight"] = t(ds["norm"]["w"])
            sd[f"layers.{i}.downsample.norm.bias"] = t(ds["norm"]["b"])
            sd[f"layers.{i}.downsample.reduction.weight"] = t(ds["reduction"]["w"])
    sd["norm.weight"] = t(params["norm"]["w"])
    sd["norm.bias"] = t(params["norm"]["b"])
    sd["head.weight"] = t(params["head"]["w"])
    sd["head.bias"] = t(params["head"]["b"])
    model.load_state_dict(sd)


def _calibrate_pair(env, scfg, calib_batch):
    """Build the shimmed reference + our rebuild on the same weights, run
    both calibrations on the same batch. Returns (model, params, x, policy,
    calib)."""
    model = _build_ref_model(env, scfg)
    params = swin.init_params(jax.random.PRNGKey(0), scfg)
    _load_our_params(model, params, scfg)
    for layer in model.layers:  # shim 4: zero bias for the bias-less QLinear
        if layer.downsample is not None:
            red = layer.downsample.reduction
            red.bias = torch.nn.Parameter(torch.zeros(red.out_features))
    x = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(1), (calib_batch, 3, scfg.img_size, scfg.img_size)
        ),
        dtype=np.float32,
    )

    # reference calibration protocol (SURVEY §3.1)
    model.eval()
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(torch.from_numpy(x))
    model.model_close_calibrate()
    model.model_quant()
    for m in model.modules():  # neutralize the smoothquant-only qact0
        if isinstance(m, env["lq"].Mlp):
            m.qact0.quant = False

    policy = make_policy(True, True, "minmax")
    calib = swin.calibrate(params, scfg, policy, jnp.asarray(x))
    return model, params, x, policy, calib


@pytest.fixture(scope="module")
def calibrated(ref_env):
    return _calibrate_pair(ref_env, STINY, 4)


def test_swin_full_model_parity(calibrated):
    model, params, x, policy, calib = calibrated
    qs = calib.qstate

    def close(ours, theirs, name, exact=True):
        a = np.asarray(ours).reshape(-1)
        b = theirs.detach().numpy().reshape(-1)
        if b.size == 1 and a.size > 1:
            b = np.full_like(a, b[0])
        if exact:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=name)

    close(qs["qact_input"]["scale"], model.qact_input.quantizer.scale, "qact_input")
    close(qs["patch_qact_bn"]["scale"],
          model.patch_embed.qact_before_norm.quantizer.scale, "patch qact_bn")
    close(qs["patch_qact"]["scale"], model.patch_embed.qact.quantizer.scale,
          "patch qact")

    for i, layer in enumerate(model.layers):
        sq = qs["stages"][i]
        for j, blk in enumerate(layer.blocks):
            bq = sq["blocks"][j]
            aq = bq["attn"]
            tag = f"s{i}b{j}"
            close(bq["qact1"]["scale"], blk.qact1.quantizer.scale, f"{tag} qact1")
            close(aq["qact1"]["scale"], blk.attn.qact1.quantizer.scale,
                  f"{tag} a.qact1")
            close(aq["qact_attn1"]["scale"], blk.attn.qact_attn1.quantizer.scale,
                  f"{tag} attn1")
            close(aq["qact_table"]["scale"], blk.attn.qact_table.quantizer.scale,
                  f"{tag} table")
            close(aq["qact2"]["scale"], blk.attn.qact2.quantizer.scale,
                  f"{tag} a.qact2")
            close(aq["qact3"]["scale"], blk.attn.qact3.quantizer.scale,
                  f"{tag} a.qact3")
            close(aq["qact4"]["scale"], blk.attn.qact4.quantizer.scale,
                  f"{tag} a.qact4")
            # PTF (A_LN) nodes: float scales -> reduction-order slack
            close(bq["qact2"]["scale"], blk.qact2.quantizer.scale,
                  f"{tag} qact2 PTF", exact=False)
            close(bq["qact3"]["scale"], blk.qact3.quantizer.scale, f"{tag} qact3")
            close(bq["mlp_qact1"]["scale"], blk.mlp.qact1.quantizer.scale,
                  f"{tag} m.qact1")
            close(bq["mlp_qact2"]["scale"], blk.mlp.qact2.quantizer.scale,
                  f"{tag} m.qact2 PTF", exact=False)
            close(bq["qact4"]["scale"], blk.qact4.quantizer.scale,
                  f"{tag} qact4 PTF", exact=False)
            # per-bit weight scale dics (PoT, exact)
            for k, bname in enumerate(BITS):
                close(aq["qkv_wscale"][k],
                      blk.attn.qkv.quantizer.dic_scale[bname],
                      f"{tag} qkv wscale {bname}")
                close(aq["proj_wscale"][k],
                      blk.attn.proj.quantizer.dic_scale[bname],
                      f"{tag} proj wscale {bname}")
                close(bq["fc1_wscale"][k],
                      blk.mlp.fc1.quantizer.dic_scale[bname],
                      f"{tag} fc1 wscale {bname}")
                close(bq["fc2_wscale"][k],
                      blk.mlp.fc2.quantizer.dic_scale[bname],
                      f"{tag} fc2 wscale {bname}")
        if layer.downsample is not None:
            dq = sq["downsample"]
            close(dq["qact1"]["scale"], layer.downsample.qact1.quantizer.scale,
                  f"s{i} ds.qact1")
            close(dq["qact2"]["scale"], layer.downsample.qact2.quantizer.scale,
                  f"s{i} ds.qact2 PTF", exact=False)
            for k, bname in enumerate(BITS):
                close(dq["red_wscale"][k],
                      layer.downsample.reduction.quantizer.dic_scale[bname],
                      f"s{i} reduction wscale {bname}")

    close(qs["qact2"]["scale"], model.qact2.quantizer.scale, "final qact2")
    close(qs["qact3"]["scale"], model.qact3.quantizer.scale, "final qact3")
    close(qs["act_out"]["scale"], model.act_out.quantizer.scale, "act_out")
    for k, bname in enumerate(BITS):
        close(qs["patch_wscale"][k],
              model.patch_embed.proj.quantizer.dic_scale[bname],
              f"patch wscale {bname}")
        close(qs["head_wscale"][k], model.head.quantizer.dic_scale[bname],
              f"head wscale {bname}")

    # quantized logits: the reconstructed reference is uniform W8 (see
    # module docstring) -> our quant_forward(w_bit=8)
    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        swin.quant_forward(params, qs, STINY, policy, jnp.asarray(x), 8)
    )
    rel = np.linalg.norm(ours - ref_logits) / max(np.linalg.norm(ref_logits), 1e-9)
    assert rel < 2e-2, f"W8A8 Swin logits diverge from reference: rel={rel}"
    assert (ours.argmax(1) == ref_logits.argmax(1)).all()


def test_swin_serving_matches_reference_argmax(calibrated):
    """The int8 serving pipeline (code domain) must agree with the
    reconstructed reference's quantized eval at the decision level."""
    from p2vit_tpu import serving_swin

    model, params, x, policy, calib = calibrated
    ss = serving_swin.convert(params, calib.qstate, STINY, policy, 8)
    srv = np.asarray(serving_swin.serving_forward(
        ss, calib.qstate, STINY, policy, jnp.asarray(x), use_pallas=False))
    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x)).numpy()
    assert (srv.argmax(1) == ref_logits.argmax(1)).all()


@pytest.mark.parametrize(
    "zoo_name",
    [
        pytest.param("swin_tiny_patch4_window7_224", marks=pytest.mark.slow),
        # small/base add ~10 min of CPU torch+XLA each: golden anchors for
        # the RESULTS.md zoo rows, run explicitly with -m xslow. They also
        # carry `slow` so a command-line -m "not slow" (which REPLACES the
        # addopts -m, last value wins) still excludes them.
        pytest.param("swin_small_patch4_window7_224",
                     marks=[pytest.mark.xslow, pytest.mark.slow]),
        pytest.param("swin_base_patch4_window7_224",
                     marks=[pytest.mark.xslow, pytest.mark.slow]),
    ],
)
def test_full_size_swin_parity(ref_env, zoo_name):
    """Golden parity at REAL Swin geometry (tiny: 224², C=96, depths
    2/2/6/2, heads 3/6/12/24, window 7; small: depth-18 stage 2; base:
    C=128, heads 4/8/16/32) — the reference Swin cannot run unshimmed at
    all. Same evidence structure as the full-size ViT tests
    (test_reference_model_parity.py): decisions exact up to measured
    knife-edge envelopes, logits drift bounded, argmax agreement on a
    fresh 16-image batch, serving tracks the simulation."""
    from p2vit_tpu.models import SWIN_ZOO

    scfg = SWIN_ZOO[zoo_name]
    model, params, x, policy, calib = _calibrate_pair(ref_env, scfg, 2)
    qs = calib.qstate
    x_eval = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (16, 3, 224, 224)),
        dtype=np.float32,
    )

    def exact(ours, theirs, name):
        np.testing.assert_array_equal(
            np.asarray(ours).reshape(-1), theirs.detach().numpy().reshape(-1),
            err_msg=name,
        )

    def pot_rows(ours, theirs, name, max_flip_frac=0.005):
        """Per-bit weight PoT rows: exact up to 4-candidate argmin knife
        edges (see test_reference_model_parity.py::pot_rows for the
        measured envelope)."""
        o = np.asarray(ours).reshape(-1)
        t = theirs.detach().numpy().reshape(-1)
        if t.size == 1 and o.size > 1:
            t = np.full_like(o, t[0])
        neq = o != t
        if not neq.any():
            return
        ratio = o[neq] / t[neq]
        assert np.all(np.isin(ratio, [0.125, 0.25, 0.5, 2.0, 4.0, 8.0])), (
            f"{name}: non-candidate PoT mismatch (ratios {np.unique(ratio)})"
        )
        assert neq.mean() <= max_flip_frac, (
            f"{name}: {neq.sum()}/{neq.size} candidate flips"
        )

    def ptf(ours, theirs, name, base_tol=1e-4):
        """PTF float scales: layer-global base drift + rare exact-PoT mask
        flips (the full-size ViT envelope, test_reference_model_parity.py)."""
        o = np.asarray(ours).reshape(-1).astype(np.float64)
        t = theirs.detach().numpy().reshape(-1).astype(np.float64)
        ratio = o / t
        base = np.median(ratio)
        assert abs(base - 1.0) < base_tol, f"{name}: base drift {base}"
        r2 = ratio / base
        flipped = np.abs(r2 - 1.0) > 1e-4
        assert flipped.mean() <= 0.01, (
            f"{name}: {flipped.sum()}/{ratio.size} channels diverge"
        )
        if flipped.any():
            pot = 2.0 ** np.round(np.log2(r2[flipped]))
            np.testing.assert_allclose(r2[flipped], pot, rtol=1e-4,
                                       err_msg=f"{name}: non-PoT flip")
            assert np.all((pot >= 0.25) & (pot <= 4.0)), name

    exact(qs["qact_input"]["scale"], model.qact_input.quantizer.scale,
          "qact_input")
    exact(qs["patch_qact_bn"]["scale"],
          model.patch_embed.qact_before_norm.quantizer.scale, "patch qact_bn")
    exact(qs["patch_qact"]["scale"], model.patch_embed.qact.quantizer.scale,
          "patch qact")
    exact(qs["qact2"]["scale"], model.qact2.quantizer.scale, "final qact2")
    exact(qs["qact3"]["scale"], model.qact3.quantizer.scale, "final qact3")
    for i, layer in enumerate(model.layers):
        sq = qs["stages"][i]
        for j, blk in enumerate(layer.blocks):
            bq, aq, tag = sq["blocks"][j], sq["blocks"][j]["attn"], f"s{i}b{j}"
            exact(bq["qact1"]["scale"], blk.qact1.quantizer.scale,
                  f"{tag} qact1")
            exact(aq["qact1"]["scale"], blk.attn.qact1.quantizer.scale,
                  f"{tag} a.qact1")
            exact(aq["qact_attn1"]["scale"],
                  blk.attn.qact_attn1.quantizer.scale, f"{tag} attn1")
            exact(aq["qact_table"]["scale"],
                  blk.attn.qact_table.quantizer.scale, f"{tag} table")
            exact(aq["qact2"]["scale"], blk.attn.qact2.quantizer.scale,
                  f"{tag} a.qact2")
            exact(bq["qact3"]["scale"], blk.qact3.quantizer.scale,
                  f"{tag} qact3")
            ptf(bq["qact2"]["scale"], blk.qact2.quantizer.scale,
                f"{tag} qact2 PTF")
            ptf(bq["qact4"]["scale"], blk.qact4.quantizer.scale,
                f"{tag} qact4 PTF")
            ptf(bq["mlp_qact2"]["scale"], blk.mlp.qact2.quantizer.scale,
                f"{tag} m.qact2 PTF")
            for k, bname in enumerate(BITS):
                pot_rows(aq["qkv_wscale"][k],
                         blk.attn.qkv.quantizer.dic_scale[bname],
                         f"{tag} qkv wscale {bname}")
                pot_rows(bq["fc1_wscale"][k],
                         blk.mlp.fc1.quantizer.dic_scale[bname],
                         f"{tag} fc1 wscale {bname}")
        if layer.downsample is not None:
            dq = sq["downsample"]
            exact(dq["qact1"]["scale"], layer.downsample.qact1.quantizer.scale,
                  f"s{i} ds.qact1")
            ptf(dq["qact2"]["scale"], layer.downsample.qact2.quantizer.scale,
                f"s{i} ds.qact2 PTF")
            for k, bname in enumerate(BITS):
                pot_rows(dq["red_wscale"][k],
                         layer.downsample.reduction.quantizer.dic_scale[bname],
                         f"s{i} reduction wscale {bname}")

    # quantized logits on a FRESH 16-image batch (full-size value parity is
    # unattainable by construction — see test_reference_model_parity.py's
    # measured drift taxonomy; decisions above are the exact layer)
    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x_eval)).numpy()
    ours = np.asarray(
        swin.quant_forward(params, qs, scfg, policy, jnp.asarray(x_eval), 8)
    )
    rel = np.linalg.norm(ours - ref_logits) / max(np.linalg.norm(ref_logits), 1e-9)
    assert rel < 0.3, f"full-size Swin-T W8A8 diverges: rel={rel}"
    am_o, am_r = ours.argmax(1), ref_logits.argmax(1)
    agree = float((am_o == am_r).mean())
    assert agree >= 0.8, f"argmax agreement {agree} over 16 images"
    top5 = np.argsort(-ref_logits, axis=1)[:, :5]
    for img in np.where(am_o != am_r)[0]:
        assert am_o[img] in top5[img], (
            f"image {img}: flipped argmax is not a reference near-tie"
        )

    # int8 serving at full size tracks the simulation
    from p2vit_tpu import serving_swin

    ss = serving_swin.convert(params, qs, scfg, policy, 8)
    srv = np.asarray(serving_swin.serving_forward(
        ss, qs, scfg, policy, jnp.asarray(x_eval), use_pallas=False))
    srel = np.linalg.norm(srv - ours) / max(np.linalg.norm(ours), 1e-9)
    assert srel < 0.3, f"full-size Swin serving: rel={srel}"
    am_s = srv.argmax(1)
    s_agree = float((am_s == am_o).mean())
    assert s_agree >= 0.8, f"serving argmax agreement {s_agree}"
    ours_top5 = np.argsort(-ours, axis=1)[:, :5]
    for img in np.where(am_s != am_o)[0]:
        assert am_s[img] in ours_top5[img], (
            f"image {img}: serving flip is not a near-tie"
        )


def test_swin_decision_import_reproduces_reference_logits(calibrated):
    """import_reference_state_swin: ingest the reference-calibrated Swin
    quantizer state and reproduce its quantized logits WITHOUT running our
    calibration (the ViT decision-import capability, now for Swin)."""
    from p2vit_tpu import checkpoints, serving_swin

    model, params, x, policy, calib = calibrated
    imported = checkpoints.import_reference_state_swin(model, STINY)

    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        swin.quant_forward(params, imported.qstate, STINY, policy,
                           jnp.asarray(x), 8)
    )
    rel = np.linalg.norm(ours - ref_logits) / max(np.linalg.norm(ref_logits), 1e-9)
    assert rel < 2e-2, f"imported-state Swin logits diverge: rel={rel}"
    assert (ours.argmax(1) == ref_logits.argmax(1)).all()

    # the imported state must also round-trip through the serializer and
    # drive the serving pipeline
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        checkpoints.save_quant_state(f.name, imported)
        loaded = checkpoints.load_quant_state(f.name)
    ss = serving_swin.convert(params, loaded.qstate, STINY, policy, 8)
    srv = np.asarray(serving_swin.serving_forward(
        ss, loaded.qstate, STINY, policy, jnp.asarray(x), use_pallas=False))
    assert (srv.argmax(1) == ref_logits.argmax(1)).all()
