"""Pipeline tests: DNA EM (cPecanEm-equivalent) and signal training."""

import io
import random

import numpy as np
import pytest

from cpecan_tpu.io.cigar import parse_cigar_line
from cpecan_tpu.pipeline.em import (EmOptions, PipelineHmm,
                                    expectation_maximisation,
                                    make_blast_scoring_matrix,
                                    write_lastz_scoring_matrix)


def _make_alignment_case(rng, n=120):
    seq_x = "".join(rng.choice("ACGT") for _ in range(n))
    seq_y = "".join(c if rng.random() > 0.15 else rng.choice("ACGT")
                    for c in seq_x)
    cig = (f"cigar: s2 0 {len(seq_y)} + s1 0 {len(seq_x)} + 0 M {len(seq_x)}")
    return seq_x, seq_y, parse_cigar_line(cig)


def test_em_pipeline_monotone(tmp_path):
    rng = random.Random(21)
    seqs = {}
    alns = []
    for i in range(3):
        sx, sy, aln = _make_alignment_case(rng)
        aln.contig1 = f"x{i}"
        aln.contig2 = f"y{i}"
        seqs[f"x{i}"] = sx
        seqs[f"y{i}"] = sy
        alns.append(aln)
    options = EmOptions(iterations=4, train_emissions=True)
    hmm = expectation_maximisation(seqs, alns, options, rng)
    liks = hmm.running_likelihoods
    assert len(liks) == 4
    for prev, cur in zip(liks, liks[1:]):
        assert prev <= cur * 0.95
    # round-trip the cPecanEm text format
    path = tmp_path / "model.hmm"
    hmm.write(str(path))
    hmm2 = PipelineHmm.load(str(path))
    np.testing.assert_allclose(hmm2.transitions, hmm.transitions, rtol=1e-12)


def _make_asymmetric_case(rng, n_blocks=5, block=25, ins=5):
    """Pair where all indels are insertions in Y: an asymmetric model must
    learn gap-open-into-Y >> gap-open-into-X."""
    from cpecan_tpu.io.cigar import PairwiseAlignment
    seq_x = seq_y = ""
    ops = []
    for b in range(n_blocks):
        blockseq = "".join(rng.choice("ACGT") for _ in range(block))
        seq_x += blockseq
        seq_y += blockseq
        if ops and ops[-1][0] == "M":
            ops[-1] = ("M", ops[-1][1] + block)
        else:
            ops.append(("M", block))
        if b < n_blocks - 1:
            seq_y += "".join(rng.choice("ACGT") for _ in range(ins))
            ops.append(("I", ins))
    return seq_x, seq_y, PairwiseAlignment(
        "x0", 0, len(seq_x), True, "y0", 0, len(seq_y), True, 0.0, ops)


def test_em_asymmetric_model_type_trains_asymmetric():
    """fiveStateAsymmetric must load via stateMachine5_loadAsymmetric
    (impl/stateMachine.c:1052-1100), learning different X and Y gap
    transitions on Y-insertion-only data; fiveState stays symmetric by
    construction on the same data."""
    rng = random.Random(33)
    sx, sy, aln = _make_asymmetric_case(rng)
    seqs = {"x0": sx, "y0": sy}
    results = {}
    for model_type in ("fiveState", "fiveStateAsymmetric"):
        options = EmOptions(model_type=model_type, iterations=4,
                            train_emissions=True)
        hmm = expectation_maximisation(seqs, [aln], options,
                                       random.Random(7))
        liks = hmm.running_likelihoods
        for prev, cur in zip(liks, liks[1:]):
            assert prev <= cur * 0.95
        results[model_type] = hmm.to_state_machine()
    sym, asym = results["fiveState"], results["fiveStateAsymmetric"]
    # symmetric load copies X params into Y (impl/stateMachine.c:1143-1150)
    assert sym.p["gap_short_open_y"] == sym.p["gap_short_open_x"]
    # asymmetric load keeps the sides separate; Y gaps dominate this data
    assert asym.p["gap_short_open_y"] > asym.p["gap_short_open_x"] + 0.5


def test_em_three_state_type_rejected():
    """getStateMachine5 has no branch for threeState types
    (impl/stateMachine.c:1769-1772); loading must fail loudly, not fall
    back to a symmetric 5-state model."""
    hmm = PipelineHmm("threeState")
    hmm.equalise()
    with pytest.raises(ValueError):
        hmm.to_state_machine()


def _write_plausible_model(path):
    """A realistically-shaped starting model (sharp diagonal emissions,
    match-dominated transitions) like the trained models cPecanEm's
    --updateTheBand is used with."""
    hmm = PipelineHmm("fiveState")
    hmm.transitions = np.array(
        [[0.96, 0.013, 0.013, 0.007, 0.007],
         [0.28, 0.70, 0.005, 0.01, 0.005],
         [0.28, 0.005, 0.70, 0.005, 0.01],
         [0.05, 0.01, 0.005, 0.93, 0.005],
         [0.05, 0.005, 0.01, 0.005, 0.93]]).ravel()
    hmm.set_emissions_to_jukes_cantor(0.05)
    hmm.normalise()
    hmm.write(path)


def test_em_update_the_band_recovers_shifted_alignment(tmp_path):
    """updateTheBand (cPecanEm.py:206-214): with a guide cigar that misses
    a 15-base Y insertion and a band expansion of 10, fixed-band EM can
    never reach the true alignment; band-updated EM re-aligns each
    iteration so the banding constraints drift onto the insertion and the
    final likelihood must beat the fixed-band run."""
    from cpecan_tpu.io.cigar import PairwiseAlignment
    rng = random.Random(9)
    block = 60
    ins = 15
    left = "".join(rng.choice("ACGT") for _ in range(block))
    right = "".join(rng.choice("ACGT") for _ in range(block))
    insert = "".join(rng.choice("ACGT") for _ in range(ins))
    seqs = {"x0": left + right, "y0": left + insert + right}
    # guide cigar pretends there is no insertion: M over min length
    guide = PairwiseAlignment("x0", 0, 2 * block, True,
                              "y0", 0, 2 * block, True, 0.0,
                              [("M", 2 * block)])
    model_path = str(tmp_path / "start.hmm")
    _write_plausible_model(model_path)
    liks = {}
    for update in (False, True):
        options = EmOptions(iterations=4, train_emissions=True,
                            input_model=model_path,
                            update_the_band=update)
        import copy
        hmm = expectation_maximisation(seqs, [copy.deepcopy(guide)],
                                       options, random.Random(3))
        liks[update] = hmm.running_likelihoods[-1]
    assert liks[True] >= liks[False]


def test_em_pallas_engine_matches_scan():
    """cPecanEm E-step through the 5-state wavefront kernel: same trained
    model (transitions + emissions) as the scan engine, monotone
    likelihood."""
    rng = random.Random(21)
    seqs = {}
    alns = []
    for i in range(3):
        sx, sy, aln = _make_alignment_case(rng)
        aln.contig1 = f"x{i}"
        aln.contig2 = f"y{i}"
        seqs[f"x{i}"] = sx
        seqs[f"y{i}"] = sy
        alns.append(aln)
    hmms = {}
    for engine in ("scan", "pallas"):
        options = EmOptions(iterations=3, train_emissions=True,
                            engine=engine)
        hmms[engine] = expectation_maximisation(seqs, list(alns), options,
                                                random.Random(5))
        liks = hmms[engine].running_likelihoods
        for prev, cur in zip(liks, liks[1:]):
            assert prev <= cur * 0.95
    np.testing.assert_allclose(hmms["pallas"].transitions,
                               hmms["scan"].transitions, rtol=5e-3,
                               atol=1e-4)
    np.testing.assert_allclose(hmms["pallas"].emissions,
                               hmms["scan"].emissions, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(hmms["pallas"].likelihood,
                               hmms["scan"].likelihood, rtol=1e-3)


def test_blast_scoring_matrix(tmp_path):
    rng = random.Random(5)
    hmm = PipelineHmm("fiveState")
    hmm.randomise(rng)
    # make it look like a trained model: strong diagonal emissions
    e = hmm.emissions.reshape(5, 4, 4)
    e[0] += np.eye(4) * 2
    hmm.emissions = e.ravel()
    hmm.normalise()
    probs, gap_open, gap_extend = make_blast_scoring_matrix(
        hmm, ["ACGTACGTGGCC"])
    assert len(probs) == 16
    out = io.StringIO()
    write_lastz_scoring_matrix(out, probs, gap_open, gap_extend)
    text = out.getvalue()
    assert "gap_open_penalty" in text and "gap_extend_penalty" in text
    assert len(text.splitlines()) == 7


@pytest.mark.slow
@pytest.mark.parametrize("sm_type", ["threeState", "vanilla"])
def test_train_models_pallas_engine_matches_scan(tmp_path,
                                                 zymo_reference_seq,
                                                 zymo_npread, sm_type):
    """trainModels E-step through the wavefront kernel vs the scan engine:
    same M-step fixed point (normalized transitions) on the Zymo read."""
    from cpecan_tpu.io.cigar import parse_cigar_line
    from cpecan_tpu.models.hmm import ContinuousPairHmm
    from cpecan_tpu.pipeline.train_models import TrainOptions, train
    from tests.test_signal_cli import _guide_cigar, NPREAD, TMODEL, CMODEL

    guide = parse_cigar_line(
        _guide_cigar(tmp_path, zymo_reference_seq, zymo_npread))
    ref_file = tmp_path / "ref.seq"
    ref_file.write_text(zymo_reference_seq + "\n")
    pairs = [(NPREAD, guide)]

    from cpecan_tpu.models.hmm import VanillaHmm

    results = {}
    for engine in ("scan", "pallas"):
        opts = TrainOptions(sm_type=sm_type, iterations=2, engine=engine)
        out_t = tmp_path / f"t_{sm_type}_{engine}.hmm"
        out_c = tmp_path / f"c_{sm_type}_{engine}.hmm"
        t_hmm, c_hmm, traj = train(str(ref_file), pairs, TMODEL, CMODEL,
                                   str(out_t), str(out_c), opts,
                                   log=lambda m: None)
        loader = VanillaHmm if sm_type == "vanilla" else ContinuousPairHmm
        results[engine] = (loader.load(str(out_t)), loader.load(str(out_c)))
        assert len(traj) == 2
    if sm_type == "vanilla":
        for strand_i in (0, 1):  # template AND complement must match
            ps = results["pallas"][strand_i].kmer_skip_bins
            ss = results["scan"][strand_i].kmer_skip_bins
            np.testing.assert_allclose(ps.sum(), ss.sum(), rtol=1e-4)
            big = ss > 1e-3
            np.testing.assert_allclose(ps[big], ss[big], rtol=0.1,
                                       atol=1e-3)
    else:
        for strand_i in (0, 1):
            pal, sc = results["pallas"][strand_i], results["scan"][strand_i]
            np.testing.assert_allclose(pal.transitions, sc.transitions,
                                       rtol=0.05, atol=5e-3)
            np.testing.assert_allclose(pal.kmer_gap_probs.sum(),
                                       sc.kmer_gap_probs.sum(), rtol=1e-4)
            top = np.argsort(sc.kmer_gap_probs)[-20:]
            np.testing.assert_allclose(pal.kmer_gap_probs[top],
                                       sc.kmer_gap_probs[top],
                                       rtol=0.1, atol=1e-4)
