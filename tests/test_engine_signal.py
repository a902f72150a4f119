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


SMALL_SX = "ACGATACGGACAT"
SMALL_SY = np.array([
    [58.743435, 0.887833, 0.0571],
    [53.604965, 0.816836, 0.0571],
    [58.432015, 0.735143, 0.0571],
    [63.684352, 0.795437, 0.0571],
    [58.921430, 0.812959, 0.0571],
    [59.895882, 0.740952, 0.0571],
    [61.684303, 0.722332, 0.0571],
])


def test_strawman_small_fixture_pair_set(template_model):
    """test_strawMan_diagonalDPCalculations (tests/signalPairwiseTest.c:580-684):
    8 pairs within the expected set (unscaled model, threshold 0.2)."""
    sm = StateMachine3SignalStrawman(template_model)
    l_x = len(SMALL_SX) - (KMER_LENGTH - 1)
    pairs = get_aligned_pairs_without_banding(
        sm, SMALL_SX, SMALL_SY, l_x, 7, AlignmentParams(threshold=0.2))
    got = {(x, y) for _, x, y in pairs}
    expected = {(0, 0), (1, 1), (2, 2), (3, 3), (4, 3), (5, 4), (6, 5), (7, 6)}
    assert got <= expected
    assert len(pairs) == 8


@pytest.mark.slow
def test_sm4_zymo_golden_988(zymo_reference_seq, zymo_npread, template_model):
    """test_stateMachine4_getAlignedPairsWithBanding
    (tests/signalPairwiseTest.c:1181-1243): 988 banded, 988 unbanded."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.models.state_machines import StateMachine4
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    sm = StateMachine4(model)
    params = AlignmentParams()

    pairs2 = get_aligned_pairs_without_banding(
        sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y, params,
        ragged_left=True, ragged_right=True)
    _check_aligned_pairs(pairs2, l_x, l_y)
    assert len(pairs2) == 988

    if find_lastz() is not None:
        anchors = get_blast_pairs_for_pairwise_alignment_parameters(
            zymo_reference_seq, zymo_npread.twod_read, params)
        filtered = filter_to_remove_overlap(
            remap_anchor_pairs(anchors, zymo_npread.template_event_map))
        pairs = get_aligned_pairs_using_anchors(
            sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered, params, ragged_left=True, ragged_right=True)
        _check_aligned_pairs(pairs, l_x, l_y)
        assert len(pairs) == 988


@pytest.mark.slow
def test_vanilla_zymo_golden(zymo_reference_seq, zymo_npread, template_model):
    """test_vanilla_getAlignedPairsWithBanding
    (tests/signalPairwiseTest.c:1245-1309): 999 banded, 953 unbanded."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.models.state_machines import StateMachine3Vanilla
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    sm = StateMachine3Vanilla(model)
    params = AlignmentParams()

    pairs2 = get_aligned_pairs_without_banding(
        sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y, params)
    _check_aligned_pairs(pairs2, l_x, l_y)
    assert len(pairs2) == 953

    if find_lastz() is not None:
        anchors = get_blast_pairs_for_pairwise_alignment_parameters(
            zymo_reference_seq, zymo_npread.twod_read, params)
        filtered = filter_to_remove_overlap(
            remap_anchor_pairs(anchors, zymo_npread.template_event_map))
        pairs = get_aligned_pairs_using_anchors(
            sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered, params)
        _check_aligned_pairs(pairs, l_x, l_y)
        assert len(pairs) == 999


@pytest.mark.slow
def test_echelon_zymo_golden(zymo_reference_seq, zymo_npread, template_model):
    """test_echelon_getAlignedPairsWithBanding
    (tests/signalPairwiseTest.c:1382-1448): threshold 0.15, 857 banded,
    1000 unbanded (multi-state posterior extraction)."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    sm = StateMachineEchelon(model)
    params = AlignmentParams(threshold=0.15)

    pairs2 = get_aligned_pairs_without_banding(
        sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y, params)
    assert len(pairs2) == 1000

    if find_lastz() is not None:
        anchors = get_blast_pairs_for_pairwise_alignment_parameters(
            zymo_reference_seq, zymo_npread.twod_read, params)
        filtered = filter_to_remove_overlap(
            remap_anchor_pairs(anchors, zymo_npread.template_event_map))
        pairs = get_aligned_pairs_using_anchors(
            sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered, params)
        assert len(pairs) == 857


@pytest.mark.slow
def test_echelon_b_variant(template_model):
    """StateMachineEchelonB (stateMachineEchelonB_cellCalculate,
    impl/stateMachine.c:1461-1510): with alpha == beta == the bin value it
    must reproduce echelon A exactly; decoupling alpha changes the
    alignment."""
    import numpy as np
    from cpecan_tpu.align import get_aligned_pairs_without_banding
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import (StateMachineEchelon,
                                                  StateMachineEchelonB)

    rng = np.random.default_rng(4)
    ref = "".join(rng.choice(list("ACGT"), 40))
    l_x = 40 - (KMER_LENGTH - 1)
    kidx = seq_to_kmer_indices(ref)
    mm = template_model.match_model
    events = np.zeros((l_x, 3))
    for i in range(l_x):
        events[i, 0] = mm[kidx[i], 0] + rng.normal(0, 0.5)
        events[i, 1] = max(mm[kidx[i], 2], 0.1)
        events[i, 2] = 0.01
    params = AlignmentParams(threshold=0.15)

    import dataclasses
    model_c = dataclasses.replace(template_model,
                                  skip_bins=np.full(30, 0.3))
    sm_a = StateMachineEchelon(model_c)
    sm_b = StateMachineEchelonB(model_c, match_to_skip=0.3,
                                skip_continue=0.3)
    pairs_a = get_aligned_pairs_without_banding(
        sm_a, ref, events, l_x, l_x, params)
    pairs_b = get_aligned_pairs_without_banding(
        sm_b, ref, events, l_x, l_x, params)
    assert sorted(pairs_a) == sorted(pairs_b)
    assert len(pairs_a) > 0

    # decoupled alpha (keep skipping) must change the result
    sm_b2 = StateMachineEchelonB(model_c, match_to_skip=0.3,
                                 skip_continue=0.85)
    pairs_b2 = get_aligned_pairs_without_banding(
        sm_b2, ref, events, l_x, l_x, params)
    assert sorted(pairs_b2) != sorted(pairs_a)


@pytest.mark.slow
def test_batched_echelon_matches_single(template_model):
    """Echelon through the vmapped BatchedAligner (multi-state posteriors)
    vs the per-read engine."""
    import numpy as np
    import jax.numpy as jnp
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.engine import extract_aligned_pairs
    from cpecan_tpu.parallel.batch import BatchedAligner

    rng = np.random.default_rng(6)
    mm = template_model.match_model
    reads = []
    for r in range(3):
        n = 40 + 10 * r
        ref = "".join(rng.choice(list("ACGT"), n))
        l_x = n - (KMER_LENGTH - 1)
        kidx = seq_to_kmer_indices(ref)
        events = np.zeros((l_x, 3))
        for i in range(l_x):
            events[i, 0] = mm[kidx[i], 0] + rng.normal(0, 0.5)
            events[i, 1] = max(mm[kidx[i], 2], 0.1)
            events[i, 2] = 0.01
        anchors = [(j, j) for j in range(6, l_x - 6, 9)]
        reads.append((ref, events, l_x, l_x, anchors))

    sm = StateMachineEchelon(template_model)
    params = AlignmentParams(threshold=0.15)
    ba = BatchedAligner(params, strict=True, dtype=jnp.float64)
    out = ba.run(sm, reads)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(reads):
        want = get_aligned_pairs_using_anchors(sm, ref, events, l_x, l_y,
                                               anchors, params)
        got = extract_aligned_pairs(
            {k: np.asarray(out[k][i]) for k in
             ("posteriors", "totals", "step_d", "step_base")},
            params.threshold, multi=True)
        assert sorted(got) == sorted(want), i
