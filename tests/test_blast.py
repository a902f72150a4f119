"""lastz anchoring tests, incl. the repeat-masked two-level recursion.

Ports test_getBlastPairs / test_getBlastPairsWithRecursion
(/root/reference/tests/pairwiseAlignerTest.c:492-593) with the reference's
checkBlastPairs invariants.  The recursion test adds a constructed case
that provably exercises the un-repeat-masked re-anchoring branch (the
reference's random sequences only fire it by chance): a softmasked middle
segment is invisible to the masked top-level pass, leaving an inter-anchor
gap bigger than repeatMaskMatrixBiggerThanThis, and the recursion must
recover anchors inside it from the unmasked sequence.
"""

import numpy as np
import pytest

from cpecan_tpu.align import AlignmentParams
from cpecan_tpu.ops.blast import (find_lastz, get_blast_pairs,
                                  get_blast_pairs_for_pairwise_alignment_parameters)

pytestmark = pytest.mark.skipif(find_lastz() is None,
                                reason="cPecanLastz binary not found")

BASES = "ACGT"


def _random_sequence(rng, n):
    return "".join(rng.choice(list(BASES), n)) if n else ""


def _evolve(rng, seq):
    """sonLib evolveSequence equivalent: point mutations + indels."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < 0.05:
            continue                      # deletion
        if r < 0.15:
            out.append(rng.choice(list(BASES)))   # substitution
        else:
            out.append(ch)
        if rng.random() < 0.05:
            out.append(rng.choice(list(BASES)))   # insertion
    return "".join(out)


def _check_blast_pairs(pairs, l_x, l_y, check_non_overlapping):
    """checkBlastPairs (pairwiseAlignerTest.c:467-490)."""
    p_x = p_y = -1
    for x, y in pairs:
        assert 0 <= x < l_x
        assert 0 <= y < l_y
        if check_non_overlapping:
            assert x > p_x
            assert y > p_y
        p_x, p_y = x, y


def test_get_blast_pairs_random():
    """test_getBlastPairs (pairwiseAlignerTest.c:492-512): random evolved
    pairs, random trim, both repeat-mask modes; in-range pairs sorted by
    anti-diagonal."""
    rng = np.random.default_rng(20260820)
    for test in range(6):
        s_x = _random_sequence(rng, int(rng.integers(0, 6000)))
        s_y = _evolve(rng, s_x)
        if not s_x or not s_y:
            continue
        trim = int(rng.integers(0, 5))
        repeat_mask = bool(rng.random() > 0.5)
        pairs = get_blast_pairs(s_x, s_y, trim, repeat_mask)
        _check_blast_pairs(pairs, len(s_x), len(s_y), False)
        diag = [x + y for x, y in pairs]
        assert diag == sorted(diag)


def test_get_blast_pairs_with_recursion_random():
    """test_getBlastPairsWithRecursion (pairwiseAlignerTest.c:571-589)."""
    rng = np.random.default_rng(7)
    p = AlignmentParams()
    for test in range(4):
        s_x = _random_sequence(rng, int(rng.integers(0, 8000)))
        s_y = _evolve(rng, s_x)
        pairs = get_blast_pairs_for_pairwise_alignment_parameters(s_x, s_y, p)
        _check_blast_pairs(pairs, max(len(s_x), 1), max(len(s_y), 1), True)


def test_recursion_branch_runs_on_big_gaps(monkeypatch):
    """The two-level re-anchoring (impl/pairwiseAligner.c:1279-1330) must
    recurse into every >500^2 inter-anchor gap with repeat masking OFF
    (sequences uppercased) on exactly the gap slices.

    Two evolved flanks separated by unrelated junk leave one big interior
    gap; an instrumented get_blast_pairs records the sub-calls the
    recursion makes against the real lastz binary."""
    import cpecan_tpu.ops.blast as blast_mod

    rng = np.random.default_rng(13)
    left = _random_sequence(rng, 900)
    junk_x = _random_sequence(rng, 1200).lower()
    junk_y = _random_sequence(rng, 1200).lower()
    right = _random_sequence(rng, 900)
    s_x = left + junk_x + right
    s_y = _evolve(rng, left) + junk_y + _evolve(rng, right)
    p = AlignmentParams()

    calls = []
    real = blast_mod.get_blast_pairs

    def spy(seq_x, seq_y, trim, repeat_mask, lastz_path=None):
        calls.append((len(seq_x), len(seq_y), repeat_mask))
        return real(seq_x, seq_y, trim, repeat_mask, lastz_path)

    monkeypatch.setattr(blast_mod, "get_blast_pairs", spy)
    combined = blast_mod.get_blast_pairs_for_pairwise_alignment_parameters(
        s_x, s_y, p)
    _check_blast_pairs(combined, len(s_x), len(s_y), True)

    # first call: the masked top-level pass over the full sequences
    assert calls[0] == (len(s_x), len(s_y), True)
    # the junk gap (> 500^2 cells) must have triggered >= 1 unmasked
    # sub-call on a slice that covers it but not the full sequences
    subs = [c for c in calls[1:] if not c[2]]
    assert subs, "recursion never fired on a >500^2 gap"
    assert any(lx * ly > p.repeat_mask_matrix_bigger_than_this
               and lx < len(s_x) and ly < len(s_y)
               for lx, ly, _ in subs), f"sub-call slices wrong: {subs}"


def test_recursion_offsets_and_merges_sub_anchors(monkeypatch):
    """Pin the gap-slice offset arithmetic of the recursion
    (impl/pairwiseAligner.c:1294-1307): synthetic sub-anchors injected
    into one interior gap and the terminal gap must come back shifted by
    the gap origin and merged in monotone order."""
    import cpecan_tpu.ops.blast as blast_mod

    rng = np.random.default_rng(3)
    left = _random_sequence(rng, 900)
    junk_x = _random_sequence(rng, 1200)
    junk_y = _random_sequence(rng, 1200)
    right = _random_sequence(rng, 900)
    s_x = left + junk_x + right
    s_y = _evolve(rng, left) + junk_y + _evolve(rng, right)
    p = AlignmentParams()

    real = blast_mod.get_blast_pairs
    injected = []

    def fake(seq_x, seq_y, trim, repeat_mask, lastz_path=None):
        if repeat_mask:
            return real(seq_x, seq_y, trim, repeat_mask, lastz_path)
        # unmasked sub-call on a gap slice: return a synthetic monotone
        # mini-chain in slice-local coordinates
        n = min(len(seq_x), len(seq_y))
        pairs = [(n // 2 + i, n // 2 + i) for i in range(3)]
        injected.append((len(seq_x), len(seq_y), pairs))
        return pairs

    monkeypatch.setattr(blast_mod, "get_blast_pairs", fake)
    combined = blast_mod.get_blast_pairs_for_pairwise_alignment_parameters(
        s_x, s_y, p)
    assert injected, "recursion never fired"
    _check_blast_pairs(combined, len(s_x), len(s_y), True)
    n_injected = sum(len(pr) for _, _, pr in injected)
    # injected pairs sit in gap interiors, so they are the combined pairs
    # that the masked top-level pass did not produce
    masked_top = real(s_x, s_y, p.constraint_diagonal_trim, True)
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    top_set = set(filter_to_remove_overlap(sorted(masked_top)))
    extras = [xy for xy in combined if xy not in top_set]
    assert len(extras) == n_injected, (len(extras), n_injected)


def test_blast_pairs_zymo_fixture_quintet():
    """Deterministic pinning on the vendored zymo fasta quintet
    (/root/reference/tests/test_sequences/): every masked/unmasked variant
    pair anchors cleanly and the parameterized two-level path returns a
    valid non-overlapping chain."""
    from cpecan_tpu.fixtures import fixture_path

    def load(name):
        with open(fixture_path(name)) as fh:
            return "".join(l.strip() for l in fh if not l.startswith(">"))

    seqs = {n: load(f"{n}.fasta") for n in
            ("zymo_sequence", "zymo_-r-", "zymo_-r", "zymo_r-", "zymo_r-r")}
    base = seqs["zymo_sequence"]
    p = AlignmentParams()
    for name, other in seqs.items():
        if name == "zymo_sequence":
            continue
        pairs = get_blast_pairs(base, other, 0, False)
        _check_blast_pairs(pairs, len(base), len(other), False)
        assert len(pairs) > 300, f"{name}: too few anchors ({len(pairs)})"
        two_level = get_blast_pairs_for_pairwise_alignment_parameters(
            base, other, p)
        _check_blast_pairs(two_level, len(base), len(other), True)
