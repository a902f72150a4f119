"""Vendored data files (pore models, test/bench fixtures) with fallback.

The reference ships its goldens in-repo (/root/reference/models,
/root/reference/tests/test_npReads, /root/reference/tests/test_hdp); this
repo vendors the same ~1.7 MB so tests and bench are self-contained:

- ``models/`` (repo root): the two ONT pore models (the reference's
  models/ directory layout).
- ``tests/fixtures/``: the Zymo golden read + reference and the HDP
  Gibbs fixture.

``fixture_path`` prefers the vendored copy and falls back to the
read-only reference checkout, so a stale clone still works and the
vendored files can be diffed against their origin.
"""

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REFERENCE = "/root/reference"

# name -> (repo-relative vendored path, reference-relative fallback)
_FILES = {
    "template_median68pA.model": (
        "models/template_median68pA.model",
        "models/template_median68pA.model"),
    "complement_median68pA_pop2.model": (
        "models/complement_median68pA_pop2.model",
        "models/complement_median68pA_pop2.model"),
    "ZymoRef.txt": (
        "tests/fixtures/ZymoRef.txt",
        "tests/test_npReads/ZymoRef.txt"),
    "ZymoC_ch_1_file1.npRead": (
        "tests/fixtures/ZymoC_ch_1_file1.npRead",
        "tests/test_npReads/ZymoC_ch_1_file1.npRead"),
    "test_hdp/data.txt": (
        "tests/fixtures/test_hdp/data.txt",
        "tests/test_hdp/data.txt"),
    "test_hdp/dps.txt": (
        "tests/fixtures/test_hdp/dps.txt",
        "tests/test_hdp/dps.txt"),
}
# the zymo fasta quintet (reference tests/test_sequences)
for _n in ("zymo_sequence", "zymo_-r-", "zymo_-r", "zymo_r-", "zymo_r-r"):
    _FILES[f"{_n}.fasta"] = (f"tests/fixtures/{_n}.fasta",
                             f"tests/test_sequences/{_n}.fasta")


def fixture_path(name: str) -> str:
    """Absolute path of a vendored data file.

    Falls back to the read-only reference checkout only when the vendored
    copy is missing AND ``CPECAN_TPU_NO_REFERENCE`` is unset — setting that
    env var proves self-containment (the full test suite and bench must
    pass without /root/reference; see README)."""
    vendored_rel, ref_rel = _FILES[name]
    vendored = os.path.join(_REPO, vendored_rel)
    if os.path.exists(vendored):
        return vendored
    if os.environ.get("CPECAN_TPU_NO_REFERENCE"):
        raise FileNotFoundError(
            f"vendored fixture missing: {vendored} "
            "(reference fallback disabled by CPECAN_TPU_NO_REFERENCE)")
    return os.path.join(_REFERENCE, ref_rel)


TEMPLATE_MODEL = fixture_path("template_median68pA.model")
COMPLEMENT_MODEL = fixture_path("complement_median68pA_pop2.model")
ZYMO_REF = fixture_path("ZymoRef.txt")
ZYMO_NPREAD = fixture_path("ZymoC_ch_1_file1.npRead")
