"""cPecanRealign-equivalent CLI end-to-end tests (lastz as oracle where
available, mirroring cPecanRealignTest.py)."""

import io
import random
import subprocess

import numpy as np
import pytest

from cpecan_tpu.cli.realign import main as realign_main
from cpecan_tpu.io.cigar import cigar_read_stream, parse_cigar_line
from cpecan_tpu.ops.blast import LASTZ_ARGS, find_lastz


def _mutate(rng, seq, sub=0.1, indel=0.05):
    out = []
    for ch in seq:
        r = rng.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(rng.choice("ACGT"))
        out.append(rng.choice("ACGT") if rng.random() < sub else ch)
    return "".join(out)


@pytest.fixture(scope="module")
def seq_pair(tmp_path_factory):
    rng = random.Random(9)
    seq_x = "".join(rng.choice("ACGT") for _ in range(300))
    seq_y = _mutate(rng, seq_x)
    d = tmp_path_factory.mktemp("realign")
    fa1 = d / "a.fa"
    fa2 = d / "b.fa"
    fa1.write_text(">seqX\n" + seq_x + "\n")
    fa2.write_text(">seqY\n" + seq_y + "\n")
    return str(fa1), str(fa2), seq_x, seq_y


def _lastz_cigar(fa1, fa2):
    lastz = find_lastz()
    if lastz is None:
        pytest.skip("lastz unavailable")
    res = subprocess.run([lastz] + LASTZ_ARGS + [fa1, fa2],
                         capture_output=True, text=True, check=True)
    lines = [l for l in res.stdout.splitlines() if l.startswith("cigar:")]
    assert lines
    return lines[0]


def test_realign_covers_same_subsequences(seq_pair):
    """cPecanRealignTest.py:33-43: the realigned cigar must cover the same
    subsequences as the input."""
    fa1, fa2, seq_x, seq_y = seq_pair
    cig = _lastz_cigar(fa1, fa2)
    out = io.StringIO()
    realign_main([fa1, fa2], stdin=io.StringIO(cig + "\n"), stdout=out)
    in_aln = parse_cigar_line(cig)
    outs = list(cigar_read_stream(io.StringIO(out.getvalue())))
    assert len(outs) == 1
    got = outs[0]
    assert (got.contig1, got.start1, got.end1, got.strand1) == \
        (in_aln.contig1, in_aln.start1, in_aln.end1, in_aln.strand1)
    assert (got.contig2, got.start2, got.end2, got.strand2) == \
        (in_aln.contig2, in_aln.start2, in_aln.end2, in_aln.strand2)


def test_rescore_original_alignment_preserves_cigar(seq_pair):
    """cPecanRealignTest.py:20-31: with --rescoreOriginalAlignment the output
    alignment equals the input (only the score changes)."""
    fa1, fa2, *_ = seq_pair
    cig = _lastz_cigar(fa1, fa2)
    out = io.StringIO()
    realign_main(["-x", "-j", fa1, fa2], stdin=io.StringIO(cig + "\n"),
                 stdout=out)
    in_aln = parse_cigar_line(cig)
    got = parse_cigar_line(out.getvalue().strip())
    assert got.operations == in_aln.operations
    assert 0.0 <= got.score <= 100.0


def test_expectations_mode(seq_pair, tmp_path):
    fa1, fa2, *_ = seq_pair
    cig = _lastz_cigar(fa1, fa2)
    exp_file = tmp_path / "exp.hmm"
    realign_main(["-v", str(exp_file), fa1, fa2],
                 stdin=io.StringIO(cig + "\n"), stdout=io.StringIO())
    from cpecan_tpu.models.hmm import HmmDiscrete
    hmm = HmmDiscrete.load(str(exp_file))
    assert hmm.state_number == 5 and hmm.symbol_set_size == 5
    assert hmm.transitions.sum() > 0
    assert np.isfinite(hmm.likelihood)


def _coverage(alignments, which, length):
    """cactus_coverage stand-in: per-base M-coverage depth of one side."""
    depth = np.zeros(length, dtype=int)
    for aln in alignments:
        pos1, pos2 = aln.start1, aln.start2
        sgn1 = 1 if aln.strand1 else -1
        sgn2 = 1 if aln.strand2 else -1
        for op, n in aln.operations:
            if op == "M":
                if which == 1:
                    lo = min(pos1, pos1 + sgn1 * n)
                    depth[max(lo, 0):max(lo, 0) + n] += 1
                else:
                    lo = min(pos2, pos2 + sgn2 * n)
                    depth[max(lo, 0):max(lo, 0) + n] += 1
            if op != "I":
                pos1 += sgn1 * n
            if op != "D":
                pos2 += sgn2 * n
    return depth


def test_split_indels_coverage_invariance(tmp_path):
    """testCPecanRealignSplitSequences (cPecanRealignTest.py:45-73): realign
    with --splitIndelsLongerThanThis must leave per-base match coverage on
    both sequences identical to the unsplit realign."""
    rng = random.Random(31)
    left = "".join(rng.choice("ACGT") for _ in range(150))
    right = "".join(rng.choice("ACGT") for _ in range(150))
    insert = "".join(rng.choice("ACGT") for _ in range(60))
    seq_x = left + right
    seq_y = left + insert + right
    fa1 = tmp_path / "a.fa"
    fa2 = tmp_path / "b.fa"
    fa1.write_text(">seqX\n" + seq_x + "\n")
    fa2.write_text(">seqY\n" + seq_y + "\n")
    cig = _lastz_cigar(str(fa1), str(fa2))
    outputs = {}
    for split_args in ([], ["-s", "20"]):
        out = io.StringIO()
        realign_main(split_args + [str(fa1), str(fa2)],
                     stdin=io.StringIO(cig + "\n"), stdout=out)
        outputs[bool(split_args)] = list(
            cigar_read_stream(io.StringIO(out.getvalue())))
    assert len(outputs[True]) > len(outputs[False]), \
        "the 60bp insertion must actually split"
    for which, length in ((1, len(seq_x)), (2, len(seq_y))):
        np.testing.assert_array_equal(
            _coverage(outputs[True], which, length),
            _coverage(outputs[False], which, length))


def test_realign_pallas_engine_matches_scan(tmp_path):
    """--engine pallas produces the same realigned cigars as the scan
    engine on random pairs."""
    import io
    import random
    from cpecan_tpu.cli.realign import main

    rng = random.Random(13)
    fasta = tmp_path / "seqs.fa"
    cigars = []
    with open(fasta, "w") as fh:
        for i in range(4):
            n = 80 + 20 * i
            sx = "".join(rng.choice("ACGT") for _ in range(n))
            sy = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                         for c in sx)
            fh.write(f">x{i}\n{sx}\n>y{i}\n{sy}\n")
            cigars.append(f"cigar: y{i} 0 {len(sy)} + x{i} 0 {n} + 0 M {n}")
    stdin_text = "\n".join(cigars) + "\n"

    outs = {}
    for engine in ("scan", "pallas"):
        out = io.StringIO()
        main([str(fasta), "--engine", engine],
             stdin=io.StringIO(stdin_text), stdout=out)
        outs[engine] = out.getvalue().splitlines()
    assert len(outs["pallas"]) == len(outs["scan"])
    same = sum(1 for a, b in zip(outs["pallas"], outs["scan"]) if a == b)
    # f32 kernel vs f64 engine: allow a rare one-pair decision fringe
    assert same >= len(outs["scan"]) - 1, (outs["pallas"], outs["scan"])
