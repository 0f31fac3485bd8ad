"""Golden parity of the PSAQ data-free losses vs the ACTUAL reference.

datafree.py was previously pinned only against hand-transcribed formulas;
these tests load the reference's own utils/kde.py and generate_data.py
(spec-loaded directly — the utils package __init__ pulls timm, which this
environment lacks, but kde.py itself needs only numpy/torch) and compare:

  * total_variation vs get_image_prior_losses (generate_data.py:146-157),
  * kde_differential_entropy vs the full reference pipeline:
    KernelDensityEstimator(GaussianKernel(0.01)) on the batch-shared
    10-point linspace + differential_entropy (:111-143, kde.py:86-100).

The attention-tap COMPOSITION is deliberately different (our tap is the
merged (B, N, C) tensor; the reference hooks before head-merge and means
over heads — datafree.py docstring) so only the loss primitives are
compared, bit-tight.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "utils")), reason="reference not mounted"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_gen():
    """Spec-load utils/kde.py + generate_data.py without the timm-importing
    utils package __init__."""
    spec = importlib.util.spec_from_file_location(
        "ref_kde", os.path.join(REF, "utils/kde.py"))
    kde = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kde)
    stub = types.ModuleType("utils")
    for n in dir(kde):
        if not n.startswith("_"):
            setattr(stub, n, getattr(kde, n))
    saved = sys.modules.get("utils")
    sys.modules["utils"] = stub
    try:
        spec2 = importlib.util.spec_from_file_location(
            "ref_gen", os.path.join(REF, "generate_data.py"))
        gen = importlib.util.module_from_spec(spec2)
        spec2.loader.exec_module(gen)
        yield gen, kde
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)


def test_total_variation_matches_reference(ref_gen):
    from p2vit_tpu.datafree import total_variation

    gen, _ = ref_gen
    x = np.random.RandomState(0).randn(3, 3, 17, 17).astype(np.float32)
    ref = float(gen.get_image_prior_losses(torch.from_numpy(x)))
    ours = float(total_variation(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_kde_differential_entropy_matches_reference(ref_gen):
    from p2vit_tpu.datafree import kde_differential_entropy

    gen, kde = ref_gen
    rng = np.random.RandomState(1)
    b, m = 4, 36
    sims = np.clip(rng.randn(b, m) * 0.3, -1, 1).astype(np.float32)

    t = torch.from_numpy(sims)
    est = kde.KernelDensityEstimator(t.view(b, -1))
    x_plot = torch.linspace(
        float(t.min()), float(t.max()), steps=10).repeat(b, 1)
    ref = float(gen.differential_entropy(est(x_plot), x_plot))
    ours = float(kde_differential_entropy(jnp.asarray(sims)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cosine_sims_match_reference_shape_semantics(ref_gen):
    """Our patch_similarity_entropy's cosine-sims step vs torch
    cosine_similarity on the SAME (already merged) tensor — pins the
    normalization floor and pairwise structure; the head-mean tap
    divergence stays documented in datafree.py."""
    from p2vit_tpu.datafree import kde_differential_entropy

    rng = np.random.RandomState(2)
    b, n, c = 2, 9, 16
    a = rng.randn(b, n, c).astype(np.float32)

    t = torch.from_numpy(a)[:, 1:, :]
    sims_ref = torch.cosine_similarity(
        t.unsqueeze(1), t.unsqueeze(2), dim=3)

    p = jnp.asarray(a)[:, 1:, :]
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
    sims = jnp.einsum("bnc,bmc->bnm", p, p)
    np.testing.assert_allclose(
        np.asarray(sims), sims_ref.numpy(), rtol=1e-5, atol=1e-6)
