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
