"""Shared zoo-name aliasing + canonical bench batches for the tools/.

One copy instead of four (round-4 self-review finding): resln_insitu,
latency_ab, zoo_bench, and roofline_xcheck each carried their own
short-name ALIAS map, and two carried per-model batch tables, maintained
independently — the next model addition or batch retune would land in one
copy and the others would silently bench the wrong geometry.

``BATCH`` is the canonical per-model bench batch (HBM-bounded at the big
geometries; the same values bench.py/BENCH.md report against).
ceiling_bench/ceiling_swin keep local copies on purpose: their tables are
sweep configs bundled with MXU_TOPS priors, and both scripts sit in
on-chip queue slots where an import-graph change risks the tunnel window.
"""

ALIAS = {
    "deit_tiny": "deit_tiny_patch16_224",
    "deit_small": "deit_small_patch16_224",
    "deit_base": "deit_base_patch16_224",
    "vit_base": "vit_base_patch16_224",
    "vit_large": "vit_large_patch16_224",
    "swin_tiny": "swin_tiny_patch4_window7_224",
    "swin_small": "swin_small_patch4_window7_224",
    "swin_base": "swin_base_patch4_window7_224",
}

BATCH = {
    "deit_tiny_patch16_224": 256,
    "deit_small_patch16_224": 256,
    "deit_base_patch16_224": 128,
    "vit_base_patch16_224": 128,
    "vit_large_patch16_224": 64,
    "swin_tiny_patch4_window7_224": 64,
    "swin_small_patch4_window7_224": 64,
    "swin_base_patch4_window7_224": 32,
}


def resolve(name: str) -> str:
    """Accept either a short zoo alias or a full model name."""
    return ALIAS.get(name, name)


def short(name: str) -> str:
    """Inverse of resolve for display keys ('deit_small_patch16_224' ->
    'deit_small'); full names without an alias pass through."""
    for s, full in ALIAS.items():
        if full == name:
            return s
    return name
