"""Baum-Welch EM tests: monotone likelihood over 10 iterations.

Mirrors test_HmmDiscrete_em (tests/pairwiseAlignerTest.c:856-942) and
test_continuousPairHmm_em (tests/signalPairwiseTest.c:1615-1725), including
the reference's `pLikelihood <= likelihood * 0.95` assertion.
"""

import math
from cpecan_tpu.fixtures import fixture_path

import numpy as np
import pytest

from cpecan_tpu.align import (AlignmentParams, get_expectations_using_anchors)
from cpecan_tpu.constants import KMER_LENGTH
from cpecan_tpu.io.poremodel import scale_model
from cpecan_tpu.models.hmm import ContinuousPairHmm, HmmDiscrete
from cpecan_tpu.models.state_machines import (StateMachine3SignalStrawman,
                                              StateMachine5)


def _random_dna(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_discrete_em_monotone_likelihood():
    rng = np.random.default_rng(11)
    params = AlignmentParams()
    for trial in range(2):
        seq_x = _random_dna(rng, int(rng.integers(20, 60)))
        # evolve with substitutions
        seq_y = "".join(c if rng.random() > 0.2 else rng.choice(list("ACGT"))
                        for c in seq_x)
        hmm = HmmDiscrete(5, 4)
        hmm.randomize(rng)
        p_lik = -math.inf
        for it in range(10):
            p, match_t, gap_x, gap_y = hmm.to_sm5_params_symmetric()
            sm = StateMachine5(params=p, match_table=match_t,
                               gap_x_table=gap_x, gap_y_table=gap_y)
            acc = get_expectations_using_anchors(
                sm, seq_x, seq_y, len(seq_x), len(seq_y), [], params)
            hmm = HmmDiscrete(5, 4, pseudocount=1e-12)
            hmm.add_expectations(acc)
            hmm.normalize()
            assert p_lik <= hmm.likelihood * 0.95
            p_lik = hmm.likelihood


def _zymo_template_anchors(zymo_reference_seq, zymo_npread, params):
    """lastz anchors remapped through the template event map, as every
    signal EM test in the reference does (signalPairwiseTest.c:1777-1782)."""
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)
    if find_lastz() is None:
        return []
    anchors = get_blast_pairs_for_pairwise_alignment_parameters(
        zymo_reference_seq, zymo_npread.twod_read, params)
    return filter_to_remove_overlap(
        remap_anchor_pairs(anchors, zymo_npread.template_event_map))


@pytest.mark.slow
def test_vanilla_hmm_em(zymo_reference_seq, zymo_npread, template_model):
    """test_vanillaHmm_em (tests/signalPairwiseTest.c:1727-1826): 10 EM
    iterations of the kmer-skip bins on the Zymo fixture from a random
    start, monotone likelihood (pLikelihood <= likelihood * 0.95)."""
    from cpecan_tpu.models.hmm import VanillaHmm
    from cpecan_tpu.models.state_machines import StateMachine3Vanilla

    params = AlignmentParams()
    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    filtered = _zymo_template_anchors(zymo_reference_seq, zymo_npread, params)

    rng = np.random.default_rng(13)
    hmm = VanillaHmm()
    hmm.randomize(rng)
    p_lik = -math.inf
    for it in range(10):
        sm = StateMachine3Vanilla(model, strand="template",
                                  skip_bin_probs=hmm.kmer_skip_bins)
        acc = get_expectations_using_anchors(
            sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered, params)
        hmm = VanillaHmm()
        hmm.implant_match_models(model)
        hmm.add_expectations({"skip_bins": acc["skip_bins"],
                              "likelihood": acc["likelihood"]})
        hmm.normalize()
        assert p_lik <= hmm.likelihood * 0.95
        p_lik = hmm.likelihood
    assert np.isfinite(p_lik)


@pytest.mark.slow
def test_hdp_hmm_em(zymo_reference_seq, zymo_npread, template_model):
    """test_hdpHmm_em (tests/nanoporeHdpTests.c:928-1040): 10 EM iterations
    of the transitions under HDP emission densities on descaled Zymo
    template events, monotone likelihood.  The reference trains its NHDP
    from an alignment tsv outside the repo; here the flat NHDP is trained
    from (kmer, model-level) assignments over the same reference sequence,
    which serves the same role (fixed emission densities across EM)."""
    from cpecan_tpu.hdp.nanopore_hdp import flat_hdp_model
    from cpecan_tpu.io.npread import descale_events
    from cpecan_tpu.models.hmm import HdpHmm
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3Hdp

    params = AlignmentParams()
    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    # nanopore_descaleEvents (nanoporeHdpTests.c:940-942)
    events = descale_events(zymo_npread.template_events, tp.scale, tp.shift)
    filtered = _zymo_template_anchors(zymo_reference_seq, zymo_npread, params)

    model_path = fixture_path("template_median68pA.model")
    nhdp = flat_hdp_model("ACGT", KMER_LENGTH, 1.0, 1.0, 40.0, 100.0, 100,
                          model_path)
    rng = np.random.default_rng(17)
    kidx = seq_to_kmer_indices(zymo_reference_seq)
    kmers_train, signals = [], []
    for p in range(l_x):
        kmer = zymo_reference_seq[p:p + KMER_LENGTH]
        if "N" in kmer.upper():
            continue
        for _ in range(2):
            kmers_train.append(kmer)
            signals.append(template_model.match_model[kidx[p], 0]
                           + rng.normal(0, 1.0))
    nhdp.update_from_assignments(kmers_train, signals)
    nhdp.execute_gibbs_sampling(num_samples=10, burn_in=500, thinning=50)
    nhdp.finalize_distributions()

    hmm = HdpHmm(threshold=params.threshold)
    hmm.randomize(rng)
    p_lik = -math.inf
    for it in range(10):
        sm_params, gap_x = hmm.to_sm3_params()
        sm = StateMachine3Hdp(nhdp, params=sm_params,
                              gap_x_log_probs=gap_x)
        acc = get_expectations_using_anchors(
            sm, zymo_reference_seq, events, l_x, l_y, filtered, params)
        hmm = HdpHmm(threshold=params.threshold)
        hmm.add_expectations(acc)
        hmm.normalize()
        assert p_lik <= hmm.likelihood * 0.95
        p_lik = hmm.likelihood
    assert np.isfinite(p_lik)


@pytest.mark.slow
def test_continuous_pair_hmm_em(zymo_reference_seq, zymo_npread,
                                template_model):
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    params = AlignmentParams()
    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)

    if find_lastz() is not None:
        anchors = get_blast_pairs_for_pairwise_alignment_parameters(
            zymo_reference_seq, zymo_npread.twod_read, params)
        filtered = filter_to_remove_overlap(
            remap_anchor_pairs(anchors, zymo_npread.template_event_map))
    else:
        filtered = []

    rng = np.random.default_rng(12)
    hmm = ContinuousPairHmm()
    hmm.randomize(rng)
    p_lik = -math.inf
    for it in range(10):
        sm_params, gap_x = hmm.to_sm3_params()
        sm = StateMachine3SignalStrawman(model, params=sm_params,
                                         gap_x_log_probs=gap_x)
        acc = get_expectations_using_anchors(
            sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered, params)
        hmm = ContinuousPairHmm()
        hmm.add_expectations(acc)
        hmm.normalize()
        assert p_lik <= hmm.likelihood * 0.95
        p_lik = hmm.likelihood
    assert np.isfinite(p_lik)


def test_hmm_discrete_asymmetric_container_roundtrip(tmp_path):
    """test_hmmDiscrete_5StateAsymmetric_symbols
    (pairwiseAlignerTest.c:845-847): the container round-trips with the
    fiveStateAsymmetric type tag and randomize/normalize invariants."""
    from cpecan_tpu.models.hmm import (HmmDiscrete,
                                       TYPE_FIVE_STATE_ASYMMETRIC)
    rng = np.random.default_rng(5)
    hmm = HmmDiscrete(5, 4, type_=TYPE_FIVE_STATE_ASYMMETRIC)
    hmm.randomize(rng)
    np.testing.assert_allclose(hmm.transitions.sum(axis=1), 1.0, rtol=1e-12)
    np.testing.assert_allclose(hmm.emissions.sum(axis=(1, 2)), 1.0,
                               rtol=1e-12)
    path = tmp_path / "asym.hmm"
    with open(path, "w") as fh:
        hmm.write(fh)
    hmm2 = HmmDiscrete.load(str(path))
    assert hmm2.type == TYPE_FIVE_STATE_ASYMMETRIC
    # the text format prints %f (6 decimals) -> absolute tolerance
    np.testing.assert_allclose(hmm2.transitions, hmm.transitions, atol=1e-6)
    np.testing.assert_allclose(hmm2.emissions, hmm.emissions, atol=1e-6)


def test_hdp_hmm_roundtrip_without_assignments(tmp_path):
    """test_hdpHmmWithoutAssignments (nanoporeHdpTests.c:812-905): the
    HdpHmm file format round-trips with an empty assignment list."""
    from cpecan_tpu.models.hmm import HdpHmm
    hmm = HdpHmm(threshold=0.02)
    hmm.transitions[:] = np.arange(9).reshape(3, 3) + 0.5
    path = tmp_path / "hdp0.hmm"
    with open(path, "w") as fh:
        hmm.write(fh)
    hmm2 = HdpHmm.load(str(path))
    assert hmm2.number_of_assignments == 0
    assert hmm2.threshold == 0.02
    np.testing.assert_allclose(hmm2.transitions, hmm.transitions, atol=1e-6)


@pytest.mark.slow
def test_sm4_em_monotone_likelihood(zymo_reference_seq, zymo_npread,
                                    template_model):
    """fourState Baum-Welch from a randomized start on the Zymo fixture:
    monotone likelihood (the reference wires
    cell_signal_updateTransAndKmerSkipExpectations into SM4,
    impl/stateMachine.c:986,1800-1810, but ships no fourState EM driver;
    the M-step here is the SM4 analogue of
    continuousPairHmm_loadTransitionsAndKmerGapProbs)."""
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.models.state_machines import StateMachine4
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    params = AlignmentParams()
    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)

    if find_lastz() is not None:
        anchors = get_blast_pairs_for_pairwise_alignment_parameters(
            zymo_reference_seq, zymo_npread.twod_read, params)
        filtered = filter_to_remove_overlap(
            remap_anchor_pairs(anchors, zymo_npread.template_event_map))
    else:
        filtered = []

    rng = np.random.default_rng(21)
    hmm = ContinuousPairHmm(state_number=4)
    hmm.randomize(rng)
    p_lik = -math.inf
    for it in range(6):
        sm_params, gap_x = hmm.to_sm4_params()
        sm = StateMachine4(model, params=sm_params, gap_x_log_probs=gap_x)
        acc = get_expectations_using_anchors(
            sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered, params)
        hmm = ContinuousPairHmm(state_number=4)
        hmm.add_expectations(acc)
        hmm.normalize()
        assert p_lik <= hmm.likelihood * 0.95
        p_lik = hmm.likelihood
    assert np.isfinite(p_lik)
