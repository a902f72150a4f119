"""cPecanRealign-equivalent CLI.

Reads exonerate cigars on stdin + fasta files as arguments; realigns each
with the banded posterior engine and writes cigars to stdout.  Flags mirror
cPecanRealign.c:382-675, including the realign-specific parameter overrides
(trim 0, split 10, expansion 4, matchGamma 0.85).
"""

import argparse
import sys

import numpy as np

from ..align import AlignmentParams, get_aligned_pairs_using_anchors, \
    get_expectations_using_anchors
from ..constants import PAIR_ALIGNMENT_PROB_1
from ..io.cigar import (PairwiseAlignment, check_pairwise_alignment,
                        cigar_read_stream, cigar_write)
from ..io.fasta import reverse_complement, sequences_from_fastas
from ..models.hmm import HmmDiscrete
from ..models.state_machines import StateMachine5
from ..msa.multiple_aligner import \
    filter_pairwise_alignment_to_make_pairs_ordered
from ..ops.engine import extract_aligned_pairs  # noqa: F401 (API surface)


def convert_alignment_to_anchor_pairs(aln: PairwiseAlignment, trim):
    """convertPairwiseForwardStrandAlignmentToAnchorPairs
    (impl/pairwiseAligner.c:1088-1112)."""
    pairs = []
    j, k = aln.start1, aln.start2
    assert aln.strand1 and aln.strand2
    for op, length in aln.operations:
        if op == "M":
            for l in range(trim, length - trim):
                pairs.append((j + l, k + l))
        if op != "I":
            j += length
        if op != "D":
            k += length
    return pairs


def convert_aligned_pairs_to_pairwise_alignment(name1, name2, score, l1, l2,
                                                pairs):
    """convertAlignedPairsToPairwiseAlignment (cPecanRealign.c:59-101)."""
    ops = []
    p_x = p_y = -1
    m_l = 0
    for x, y in list(pairs) + [(l1, l2)]:
        if x - p_x > 0 and y - p_y > 0:
            if x - p_x > 1:
                if m_l > 0:
                    ops.append(("M", m_l))
                    m_l = 0
                ops.append(("D", x - p_x - 1))
            if y - p_y > 1:
                if m_l > 0:
                    ops.append(("M", m_l))
                    m_l = 0
                ops.append(("I", y - p_y - 1))
            m_l += 1
            p_x, p_y = x, y
    if m_l > 1:
        ops.append(("M", m_l - 1))
    return PairwiseAlignment(name1, 0, l1, True, name2, 0, l2, True, score,
                             ops)


def rebase_coordinates(aln, which, shift, flip):
    """rebasePairwiseAlignmentCoordinates (cPecanRealign.c:210-220)."""
    if which == 1:
        aln.start1 += shift
        aln.end1 += shift
        if flip:
            aln.strand1 = not aln.strand1
            aln.start1, aln.end1 = aln.end1, aln.start1
    else:
        aln.start2 += shift
        aln.end2 += shift
        if flip:
            aln.strand2 = not aln.strand2
            aln.start2, aln.end2 = aln.end2, aln.start2


def get_sub_sequence(seq, start, end, strand):
    """getSubSequence (cPecanRealign.c:222-230)."""
    if strand:
        return seq[start:end]
    return reverse_complement(seq[end:start])


def split_pairwise_alignment(aln, max_indel):
    """splitPairwiseAlignment (cPecanRealign.c:126-209): split at indel runs
    longer than max_indel, never ending an alignment with indels."""
    out = []
    cur_pos1, cur_pos2 = aln.start1, aln.start2
    run = 0
    cur_start1, cur_start2 = aln.start1, aln.start2
    cur_end1 = cur_end2 = 0
    cur_ops = []
    indel_ops = []
    sgn1 = 1 if aln.strand1 else -1
    sgn2 = 1 if aln.strand2 else -1
    for op, length in aln.operations:
        if op == "M":
            if run > max_indel and cur_ops:
                out.append(PairwiseAlignment(
                    aln.contig1, cur_start1, cur_end1, aln.strand1,
                    aln.contig2, cur_start2, cur_end2, aln.strand2,
                    aln.score, cur_ops))
                cur_ops = []
                indel_ops = []
                cur_start1, cur_start2 = cur_pos1, cur_pos2
                cur_end1, cur_end2 = cur_start1, cur_start2
            elif not cur_ops:
                indel_ops = []
                cur_start1, cur_start2 = cur_pos1, cur_pos2
                cur_end1, cur_end2 = cur_start1, cur_start2
            run = 0
            cur_ops.extend(indel_ops)
            indel_ops = []
            cur_pos1 += sgn1 * length
            cur_pos2 += sgn2 * length
            cur_end1, cur_end2 = cur_pos1, cur_pos2
            cur_ops.append((op, length))
        elif op == "D":  # indel in X (target advances)
            run += length
            cur_pos1 += sgn1 * length
            indel_ops.append((op, length))
        else:            # "I": indel in Y
            run += length
            cur_pos2 += sgn2 * length
            indel_ops.append((op, length))
    if cur_ops:
        out.append(PairwiseAlignment(
            aln.contig1, cur_start1, cur_end1, aln.strand1,
            aln.contig2, cur_start2, cur_end2, aln.strand2, aln.score,
            cur_ops))
    return out


def _matching(sub_x, sub_y, pairs):
    return sum(1 for _s, x, y in pairs
               if sub_x[x].upper() == sub_y[y].upper()
               and sub_x[x].upper() != "N")


def score_by_identity(sub_x, sub_y, pairs):
    m = _matching(sub_x, sub_y, pairs)
    l = len(sub_x) + len(sub_y)
    return 100.0 * (0 if l == 0 else 2.0 * m / l)


def score_by_identity_ignoring_gaps(sub_x, sub_y, pairs):
    return 100.0 * _matching(sub_x, sub_y, pairs) / max(len(pairs), 1)


def score_by_posterior_probability(l_x, l_y, pairs):
    total = sum(s for s, _, _ in pairs)
    l = l_x + l_y
    return 100.0 * (0 if l == 0 else 2.0 * total / (l * PAIR_ALIGNMENT_PROB_1))


def score_by_posterior_probability_ignoring_gaps(pairs):
    total = sum(s for s, _, _ in pairs)
    return 100.0 * total / (max(len(pairs), 1) * PAIR_ALIGNMENT_PROB_1)


def score_anchor_pairs(anchor_pairs, aligned_pairs):
    """scoreAnchorPairs (cPecanRealign.c:350-380)."""
    remaining = set(anchor_pairs)
    out = []
    for s, x, y in aligned_pairs:
        if (x, y) in remaining:
            out.append((s, x, y))
            remaining.discard((x, y))
    out.extend((0, x, y) for x, y in sorted(remaining))
    return out


def make_parser():
    p = argparse.ArgumentParser(prog="cpecan-realign", add_help=False)
    p.add_argument("fastas", nargs="+")
    p.add_argument("-a", "--logLevel", default=None)
    p.add_argument("-l", "--gapGamma", type=float, default=0.5)
    p.add_argument("-L", "--matchGamma", type=float, default=0.85)
    # default is the raw area 10; an explicit flag value j is squared
    # (cPecanRealign.c:388,453)
    p.add_argument("-o", "--splitMatrixBiggerThanThis", type=int, default=None)
    p.add_argument("-r", "--diagonalExpansion", type=int, default=4)
    p.add_argument("-t", "--constraintDiagonalTrim", type=int, default=0)
    p.add_argument("-w", "--alignAmbiguityCharacters", action="store_true")
    p.add_argument("-x", "--rescoreOriginalAlignment", action="store_true")
    p.add_argument("-i", "--rescoreByIdentity", action="store_true")
    p.add_argument("-j", "--rescoreByPosteriorProb", action="store_true")
    p.add_argument("-k", "--rescoreByIdentityIgnoringGaps", action="store_true")
    p.add_argument("-m", "--rescoreByPosteriorProbIgnoringGaps",
                   action="store_true")
    p.add_argument("-s", "--splitIndelsLongerThanThis", type=int, default=-1)
    p.add_argument("-u", "--outputPosteriorProbs", default=None)
    p.add_argument("-z", "--outputAllPosteriorProbs", default=None)
    p.add_argument("-v", "--outputExpectations", default=None)
    p.add_argument("-y", "--loadHmm", default=None)
    p.add_argument("--engine", default="scan", choices=["scan", "pallas"],
                   help="scan: reference-faithful per-cigar engine; "
                        "pallas: batched TPU wavefront kernel")
    p.add_argument("-h", "--help", action="help")
    return p


def write_posterior_probs(path, pairs):
    with open(path, "a") as fh:
        for s, x, y in pairs:
            fh.write(f"{x}\t{y}\t{s / PAIR_ALIGNMENT_PROB_1:f}\n")


def main(argv=None, stdin=None, stdout=None):
    args = make_parser().parse_args(argv)
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout

    if args.logLevel:
        # st_setLogLevelFromString (cPecanRealign.c:507)
        from ..utils.logging import set_log_level
        set_log_level(args.logLevel)

    params = AlignmentParams(
        gap_gamma=args.gapGamma,
        split_matrix_bigger_than_this=(
            10 if args.splitMatrixBiggerThanThis is None
            else args.splitMatrixBiggerThanThis ** 2),
        diagonal_expansion=args.diagonalExpansion,
        constraint_diagonal_trim=args.constraintDiagonalTrim)

    if args.loadHmm:
        from ..models.hmm import sm5_from_hmm
        hmm = HmmDiscrete.load(args.loadHmm)
        hmm.normalize()
        # getStateMachine5 dispatches on the hmm type (symmetric vs
        # asymmetric load, impl/stateMachine.c:1748-1773)
        sm = sm5_from_hmm(hmm)
    else:
        sm = StateMachine5()

    hmm_expectations = (HmmDiscrete(5, 5, pseudocount=1e-12)
                        if args.outputExpectations else None)

    sequences = sequences_from_fastas(args.fastas)

    # clear posterior prob files (we append per cigar)
    for path in (args.outputPosteriorProbs, args.outputAllPosteriorProbs):
        if path:
            open(path, "w").close()

    deferred = []
    for aln in cigar_read_stream(stdin):
        seq_x = sequences[aln.contig1]
        seq_y = sequences[aln.contig2]
        flip1, flip2 = not aln.strand1, not aln.strand2
        shift1 = aln.start1 if aln.strand1 else aln.end1
        shift2 = aln.start2 if aln.strand2 else aln.end2
        sub_x = get_sub_sequence(seq_x, aln.start1, aln.end1, aln.strand1)
        sub_y = get_sub_sequence(seq_y, aln.start2, aln.end2, aln.strand2)
        rebase_coordinates(aln, 1, -shift1, flip1)
        rebase_coordinates(aln, 2, -shift2, flip2)
        check_pairwise_alignment(aln)
        anchors = convert_alignment_to_anchor_pairs(
            aln, params.constraint_diagonal_trim)
        filtered_anchors = [
            (x, y) for x, y in anchors
            if sub_x[x].upper() == sub_y[y].upper() and sub_x[x].upper() != "N"]

        if hmm_expectations is not None:
            acc = get_expectations_using_anchors(
                sm, sub_x, sub_y, len(sub_x), len(sub_y), filtered_anchors,
                params, ragged_left=True, ragged_right=True)
            if acc is None:
                # anchor-free ragged gap larger than the split threshold:
                # getSplitPoints emits no regions
                continue
            # 5-symbol table: engine uses K=4; embed
            hmm_expectations.transitions += np.asarray(acc["trans"])
            emis = np.asarray(acc["emis"])
            hmm_expectations.emissions[:, :4, :4] += emis
            hmm_expectations.likelihood += float(acc["likelihood"])
            continue

        if args.engine == "pallas":
            # defer alignment: batch every cigar through the wavefront
            # kernel after the read loop
            deferred.append((aln, sub_x, sub_y, anchors, filtered_anchors,
                             shift1, flip1, shift2, flip2))
            continue

        aligned_pairs = get_aligned_pairs_using_anchors(
            sm, sub_x, sub_y, len(sub_x), len(sub_y), filtered_anchors,
            params, ragged_left=True, ragged_right=True)
        _finish_alignment(args, params, stdout, aln, sub_x, sub_y, anchors,
                          aligned_pairs, shift1, flip1, shift2, flip2)

    if args.engine == "pallas" and deferred:
        import jax
        from ..ops.anchors import get_split_points
        from ..ops.pallas_fb import Dna5PallasAligner, extract_pairs_auto

        # large-gap splitting happens host-side, same as the scan engine
        # (getPosteriorProbsWithBandingSplittingAlignmentsByLargeGaps);
        # each split region becomes its own kernel job
        jobs = []
        job_owner = []  # (deferred index, x1 offset, y1 offset)
        for di, (_aln, sub_x, sub_y, _a, fa, *_rest) in enumerate(deferred):
            split_points = get_split_points(
                fa, len(sub_x), len(sub_y),
                params.split_matrix_bigger_than_this, True, True)
            j = 0
            for (x1, y1, x2, y2) in split_points:
                sub_anchors = []
                while j < len(fa):
                    ax, ay = fa[j]
                    if ax + ay >= x2 + y2:
                        break
                    sub_anchors.append((ax - x1, ay - y1))
                    j += 1
                if x2 - x1 <= 0 or y2 - y1 <= 0:
                    continue  # degenerate region: no match cells exist
                jobs.append((sub_x[x1:x2], sub_y[y1:y2], x2 - x1, y2 - y1,
                             sub_anchors))
                job_owner.append((di, x1, y1))
        pa = Dna5PallasAligner(params,
                               interpret=jax.default_backend() == "cpu")
        out = pa.run(sm, jobs, ragged_left=True, ragged_right=True)
        if "compact" in out:  # tiled-routed batches compact per chunk
            out["compact"] = tuple(np.asarray(a) for a in out["compact"])
        per_aln = [[] for _ in deferred]
        for i, (di, x1, y1) in enumerate(job_owner):
            sub_pairs = extract_pairs_auto(
                out, i, out["prep"]["bands"][i].n_diag, params.threshold)
            per_aln[di].extend((s, x + x1, y + y1) for s, x, y in sub_pairs)
        for di, (aln, sub_x, sub_y, anchors, _fa, shift1, flip1, shift2,
                 flip2) in enumerate(deferred):
            _finish_alignment(args, params, stdout, aln, sub_x, sub_y,
                              anchors, per_aln[di], shift1, flip1,
                              shift2, flip2)

    if hmm_expectations is not None:
        with open(args.outputExpectations, "w") as fh:
            hmm_expectations.write(fh)


def _finish_alignment(args, params, stdout, aln, sub_x, sub_y, anchors,
                      aligned_pairs, shift1, flip1, shift2, flip2):
    """Post-alignment pipeline shared by the scan and pallas engines:
    reweight -> expected-accuracy filter -> rescore -> cigar out
    (cPecanRealign.c:591-666)."""
    aligned_pairs.sort(key=lambda t: (t[1], t[2]))

    if args.outputAllPosteriorProbs:
        write_posterior_probs(args.outputAllPosteriorProbs, aligned_pairs)

    if args.rescoreOriginalAlignment:
        aligned_pairs = score_anchor_pairs(anchors, aligned_pairs)
    else:
        from ..ops.reweight import reweight_aligned_pairs_2
        aligned_pairs = reweight_aligned_pairs_2(
            aligned_pairs, len(sub_x), len(sub_y), params.gap_gamma)
        aligned_pairs = filter_pairwise_alignment_to_make_pairs_ordered(
            aligned_pairs, sub_x, sub_y, args.matchGamma)

    if args.rescoreByPosteriorProb:
        aln.score = score_by_posterior_probability(
            len(sub_x), len(sub_y), aligned_pairs)
    elif args.rescoreByPosteriorProbIgnoringGaps:
        aln.score = score_by_posterior_probability_ignoring_gaps(aligned_pairs)
    elif args.rescoreByIdentity:
        aln.score = score_by_identity(sub_x, sub_y, aligned_pairs)
    elif args.rescoreByIdentityIgnoringGaps:
        aln.score = score_by_identity_ignoring_gaps(sub_x, sub_y,
                                                    aligned_pairs)

    if args.outputPosteriorProbs:
        write_posterior_probs(args.outputPosteriorProbs, aligned_pairs)

    coord_pairs = sorted((x, y) for _s, x, y in aligned_pairs)
    r_aln = convert_aligned_pairs_to_pairwise_alignment(
        aln.contig1, aln.contig2, aln.score, aln.end1, aln.end2,
        coord_pairs)
    rebase_coordinates(r_aln, 1, shift1, flip1)
    rebase_coordinates(r_aln, 2, shift2, flip2)
    check_pairwise_alignment(r_aln)
    if args.splitIndelsLongerThanThis != -1:
        for piece in split_pairwise_alignment(
                r_aln, args.splitIndelsLongerThanThis):
            stdout.write(cigar_write(piece) + "\n")
    else:
        stdout.write(cigar_write(r_aln) + "\n")


if __name__ == "__main__":
    main()
