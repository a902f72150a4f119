"""Signal (nanopore) alignment golden tests on the Zymo fixture.

Mirrors test_strawMan_getAlignedPairsWithBanding
(tests/signalPairwiseTest.c:1112-1179): the unbanded strawMan 3-state
alignment of the Zymo template read must yield exactly 986 aligned pairs at
the default threshold (0.01); the banded run (lastz anchors) exactly 987.
"""

import numpy as np
import pytest

from cpecan_tpu.align import AlignmentParams, get_aligned_pairs_without_banding
from cpecan_tpu.constants import KMER_LENGTH
from cpecan_tpu.io.poremodel import scale_model
from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman


def _check_aligned_pairs(pairs, l_x, l_y):
    """checkAlignedPairs (tests/signalPairwiseTest.c): unique, in-range,
    score in (0, 1e7]."""
    seen = set()
    for score, x, y in pairs:
        assert 0 < score <= 10_000_000
        assert 0 <= x < l_x
        assert 0 <= y < l_y
        assert (x, y) not in seen
        seen.add((x, y))


@pytest.mark.slow
def test_strawman_unbanded_golden_986(zymo_reference_seq, zymo_npread,
                                      template_model):
    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    sm = StateMachine3SignalStrawman(model)
    pairs = get_aligned_pairs_without_banding(
        sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
        AlignmentParams())
    _check_aligned_pairs(pairs, l_x, l_y)
    assert len(pairs) == 986


@pytest.mark.slow
def test_strawman_banded_golden_987(zymo_reference_seq, zymo_npread,
                                    template_model):
    """Banded run with lastz anchors remapped through the template event map
    (tests/signalPairwiseTest.c:1112-1160): exactly 987 aligned pairs."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    if find_lastz() is None:
        pytest.skip("cPecanLastz binary not available")

    params = AlignmentParams()
    anchors = get_blast_pairs_for_pairwise_alignment_parameters(
        zymo_reference_seq, zymo_npread.twod_read, params)
    remapped = remap_anchor_pairs(anchors, zymo_npread.template_event_map)
    filtered = filter_to_remove_overlap(remapped)

    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    sm = StateMachine3SignalStrawman(model)
    pairs = get_aligned_pairs_using_anchors(
        sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
        filtered, params)
    _check_aligned_pairs(pairs, l_x, l_y)
    assert len(pairs) == 987
