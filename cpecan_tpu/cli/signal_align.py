"""vanillaAlign-equivalent CLI: nanopore signal-to-reference alignment.

Reads one guide cigar on stdin, an npRead (-q) and a reference (-r); aligns
template and complement event streams to the guide region and writes
signal-level aligned pairs as tsv (-u) or per-strand EM expectation files
(-t/-c).  Flags mirror vanillaAlign.c:326-612.
"""

import argparse
import sys
from functools import lru_cache as _lru_cache

import numpy as np

from ..align import (AlignmentParams, get_aligned_pairs_using_anchors,
                     get_aligned_pairs_without_banding,
                     get_expectations_using_anchors)
from ..constants import (COMPLEMENT, KMER_LENGTH, NB_EVENT_PARAMS,
                         PAIR_ALIGNMENT_PROB_1, TEMPLATE)
from ..io.cigar import check_pairwise_alignment, cigar_read_stream
from ..io.fasta import reverse_complement
from ..io.npread import load_npread, remap_anchor_pairs_with_offset
from ..io.poremodel import load_pore_model, scale_model
from ..models.hmm import ContinuousPairHmm, VanillaHmm
from ..models.kmers import kmer_index
from ..ops.anchors import filter_to_remove_overlap
from ..models.state_machines import (StateMachine3SignalStrawman,
                                     StateMachine3Vanilla, StateMachine4,
                                     StateMachineEchelon)
from .realign import convert_alignment_to_anchor_pairs, rebase_coordinates
from ..fixtures import fixture_path


def build_state_machine(model_file, npp, sm_type, strand, hmm_file=None):
    """buildStateMachine + loadHmmRoutine (vanillaAlign.c:104-138)."""
    model = load_pore_model(model_file)
    model = scale_model(model, npp.scale, npp.shift, npp.var, npp.scale_sd,
                        npp.var_sd)
    if sm_type == "vanilla":
        skip_bins = None
        if hmm_file:
            hmm = VanillaHmm.load(hmm_file)
            skip_bins = hmm.kmer_skip_bins
        return StateMachine3Vanilla(
            model, strand="template" if strand == TEMPLATE else "complement",
            skip_bin_probs=skip_bins)
    if sm_type == "threeState":
        params = gap_x = None
        if hmm_file:
            hmm = ContinuousPairHmm.load(hmm_file)
            params, gap_x = hmm.to_sm3_params()
        return StateMachine3SignalStrawman(model, params=params,
                                           gap_x_log_probs=gap_x)
    if sm_type == "fourState":
        return StateMachine4(model)
    if sm_type == "echelon":
        return StateMachineEchelon(model)
    raise ValueError(f"unknown state machine type {sm_type}")


def get_remapped_anchor_pairs(unmapped, event_map, map_offset):
    """getRemappedAnchorPairs (vanillaAlign.c:97-102)."""
    remapped = remap_anchor_pairs_with_offset(unmapped, event_map, map_offset)
    return filter_to_remove_overlap(remapped)


def make_event_slice(events, query_start, query_end, event_map):
    """makeEventSequenceFromPairwiseAlignment (vanillaAlign.c:272-287).

    The complement event map runs backwards along the read, so the
    reference's `endIdx - startIdx` length is negative there (undefined
    behaviour in the C).  We take the [min, max) event window instead —
    complement events in increasing index order correspond to the
    reverse-complemented reference in forward order.
    """
    start_idx = int(event_map[query_start])
    end_idx = int(event_map[query_end])
    lo, hi = min(start_idx, end_idx), max(start_idx, end_idx)
    return events[lo:hi], lo


_TSV_LIB = None


def _native_tsv():
    """Build/load the native tsv block formatter (native/tsv_format.cc);
    None when no C++ toolchain is available (Python path used instead)."""
    global _TSV_LIB
    if _TSV_LIB is None:
        import ctypes

        from ..native import load_library
        lib = load_library("tsv_format")
        if lib is not None:
            lib.tsv_format_rows.restype = ctypes.c_longlong
            lib.tsv_format_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_char_p, ctypes.c_longlong]
        _TSV_LIB = lib if lib is not None else False
    return _TSV_LIB or None


def _kmer_windows(seq):
    """All KMER_LENGTH-windows of ``seq`` as an array of byte strings
    (zero-copy byte view; str round-trips below are ASCII)."""
    codes = np.frombuffer(seq.encode(), np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(codes, KMER_LENGTH)
    return np.ascontiguousarray(win).view(f"S{KMER_LENGTH}").ravel()


@_lru_cache(maxsize=128)
def _target_columns(target):
    """Per-target tsv columns (kmer indices + kmer byte windows), cached:
    reads of a batch that map to the same guide region share them, and
    recomputing per read-strand was ~30% of the batch drain's host time."""
    from ..models.kmers import seq_to_kmer_indices
    return seq_to_kmer_indices(target, length=len(target)), \
        _kmer_windows(target)


@_lru_cache(maxsize=128)
def _rc_windows(target):
    return _kmer_windows(reverse_complement(target))


def write_posterior_probs(fh, read_label, match_model, scale, shift, events,
                          target, forward, contig, event_offset, ref_offset,
                          aligned_pairs, strand):
    """writePosteriorProbs (vanillaAlign.c:26-95).

    Fully vectorized (column math AND row formatting — per-row f-strings
    were the batch pipeline's dominant host cost at ~15ms/read); the
    emitted text is identical to the row-at-a-time version.
    ``aligned_pairs`` may be a list of (score, x, y) tuples or an [N, 3]
    int array."""
    if len(aligned_pairs) == 0:
        return
    strand_label = "t" if strand == TEMPLATE else "c"
    ap = np.asarray(aligned_pairs, dtype=np.int64)
    score, x_i, y0 = ap[:, 0], ap[:, 1], ap[:, 2]
    if (strand == TEMPLATE) == forward:
        x_adj = x_i + ref_offset
    else:
        ref_len = len(target)
        ref_len_in_events = ref_len - KMER_LENGTH
        x_adj = ref_len_in_events - (x_i + (ref_len - ref_offset))
    y = y0 + event_offset
    p = score / PAIR_ALIGNMENT_PROB_1
    ev = events[y]
    descaled_mean = (ev[:, 0] - shift) / scale
    kidx_all, kwin = _target_columns(target)
    k_idx = kidx_all[np.clip(x_i, 0, len(kidx_all) - 1)]
    ok = (k_idx >= 0) & (k_idx < match_model.shape[0])
    safe = np.clip(k_idx, 0, match_model.shape[0] - 1)
    e_level = np.where(ok, match_model[safe, 0], 0.0)
    e_noise = np.where(ok, match_model[safe, 2], 0.0)
    descaled_e_level = (e_level - shift) / scale
    L = len(target)
    k_bytes = kwin[x_i]
    if (strand == TEMPLATE) == forward:
        ref_bytes = k_bytes
    else:
        ref_bytes = _rc_windows(target)[L - x_i - KMER_LENGTH]

    n = len(ap)
    lib = _native_tsv()
    if lib is not None:
        # native block formatter (native/tsv_format.cc): identical bytes,
        # ~10x faster than the CPython %-format path below
        import ctypes
        cont = np.ascontiguousarray
        ev_c = cont(ev, dtype=np.float64)
        f64 = [cont(a, dtype=np.float64)
               for a in (e_level, e_noise, p, descaled_mean,
                         descaled_e_level)]
        frag0 = (contig + "\t").encode()
        frag2 = ("\t" + read_label + "\t" + strand_label + "\t").encode()
        cap = n * (160 + len(frag0) + len(frag2)) + 4096
        for _ in range(3):
            buf = ctypes.create_string_buffer(cap)
            m = lib.tsv_format_rows(
                frag0, frag2, n,
                cont(x_adj, dtype=np.int64).ctypes.data_as(
                    ctypes.c_void_p),
                cont(ref_bytes).ctypes.data_as(ctypes.c_void_p),
                ref_bytes.dtype.itemsize,
                cont(y, dtype=np.int64).ctypes.data_as(ctypes.c_void_p),
                ev_c.ctypes.data_as(ctypes.c_void_p),
                cont(k_bytes).ctypes.data_as(ctypes.c_void_p),
                k_bytes.dtype.itemsize,
                *(a.ctypes.data_as(ctypes.c_void_p) for a in f64),
                buf, cap)
            if m >= 0:
                fh.write(buf.raw[:m].decode("utf-8"))
                return
            cap *= 8  # snprintf fallback rows (huge magnitudes) blew cap

    # ONE printf-style pass over the whole block: the per-row format
    # string replicated n times, applied to the row-interleaved value
    # tuple.  ~3-4x faster than a per-row f-string loop (and np.char.mod
    # loops per element in Python — slower still); output text identical.
    k_col = k_bytes.astype("U")
    ref_col = k_col if ref_bytes is k_bytes else ref_bytes.astype("U")
    esc = str.maketrans({"%": "%%"})
    fmt = (f"{contig.translate(esc)}\t%d\t%s\t{read_label.translate(esc)}"
           f"\t{strand_label}\t%d\t%f\t%f\t%f\t%s\t%f\t%f\t%f\t%f\t%f\n")
    obj = np.empty((n, 12), object)
    for j, col in enumerate((x_adj, ref_col, y, ev[:, 0], ev[:, 1],
                             ev[:, 2], k_col, e_level, e_noise, p,
                             descaled_mean, descaled_e_level)):
        obj[:, j] = col
    fh.write((fmt * n) % tuple(obj.ravel().tolist()))


def perform_signal_alignment(sm, events_slice, event_map, map_offset, target,
                             params, unmapped_anchors, banded):
    """performSignalAlignment(P) (vanillaAlign.c:156-225)."""
    l_x = max(len(target) - (KMER_LENGTH - 1), 0)
    l_y = len(events_slice)
    if banded:
        anchors = get_remapped_anchor_pairs(unmapped_anchors, event_map,
                                            map_offset)
        return get_aligned_pairs_using_anchors(
            sm, target, events_slice, l_x, l_y, anchors, params,
            ragged_left=True, ragged_right=True)
    return get_aligned_pairs_without_banding(
        sm, target, events_slice, l_x, l_y, params,
        ragged_left=True, ragged_right=True)


def get_signal_expectations(model_file, in_hmm, sm_type, npp, events_slice,
                            event_map, map_offset, target, params,
                            unmapped_anchors, strand):
    """getSignalExpectations (vanillaAlign.c:289-324)."""
    sm = build_state_machine(model_file, npp, sm_type, strand, in_hmm)
    l_x = max(len(target) - (KMER_LENGTH - 1), 0)
    anchors = get_remapped_anchor_pairs(unmapped_anchors, event_map,
                                        map_offset)
    acc = get_expectations_using_anchors(
        sm, target, events_slice, l_x, len(events_slice), anchors, params,
        ragged_left=True, ragged_right=True)
    if sm_type == "vanilla":
        hmm = VanillaHmm(pseudocount=0.0001)
        hmm.implant_match_models(sm.model)
        hmm.kmer_skip_bins += np.asarray(acc["skip_bins"])
        hmm.likelihood += float(acc["likelihood"])
    else:
        hmm = ContinuousPairHmm(pseudocount=0.0001)
        hmm.add_expectations(acc)
    return hmm


def make_parser():
    p = argparse.ArgumentParser(prog="cpecan-signal-align", add_help=False)
    p.add_argument("-s", "--strawMan", action="store_true")
    p.add_argument("-f", "--fourState", action="store_true")
    p.add_argument("-e", "--echelon", action="store_true")
    p.add_argument("-b", "--banded", action="store_true")
    p.add_argument("-T", "--templateModel",
                   default=fixture_path("template_median68pA.model"))
    p.add_argument("-C", "--complementModel",
                   default=fixture_path("complement_median68pA_pop2.model"))
    p.add_argument("-L", "--readLabel", default="read")
    p.add_argument("-q", "--npRead", required=True)
    p.add_argument("-r", "--reference", required=True)
    p.add_argument("-u", "--posteriors", default=None)
    p.add_argument("-y", "--inTemplateHmm", default=None)
    p.add_argument("-z", "--inComplementHmm", default=None)
    p.add_argument("-t", "--templateExpectations", default=None)
    p.add_argument("-c", "--complementExpectations", default=None)
    p.add_argument("-x", "--diagonalExpansion", type=int, default=20)
    p.add_argument("-d", "--threshold", type=float, default=0.01)
    p.add_argument("-m", "--constraintTrim", type=int, default=14)
    p.add_argument("-h", "--help", action="help")
    return p


def main(argv=None, stdin=None, stdout=None):
    args = make_parser().parse_args(argv)
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    sm_type = ("threeState" if args.strawMan else
               "fourState" if args.fourState else
               "echelon" if args.echelon else "vanilla")

    with open(args.reference) as fh:
        reference_seq = fh.readline().strip()
    np_read = load_npread(args.npRead)
    params = AlignmentParams(threshold=args.threshold,
                             constraint_diagonal_trim=args.constraintTrim,
                             diagonal_expansion=args.diagonalExpansion)

    alns = list(cigar_read_stream(stdin))
    if not alns:
        raise SystemExit("no guide alignment on stdin")
    aln = alns[0]

    # trim reference to the guide region (vanillaAlign.c:482-486)
    if aln.strand1:
        trimmed_ref = reference_seq[aln.start1:aln.end1]
    else:
        trimmed_ref = reference_seq[aln.end1:aln.start1]
        trimmed_ref = reverse_complement(trimmed_ref)
    rc_trimmed_ref = reverse_complement(trimmed_ref)

    t_events, t_event_offset = make_event_slice(
        np_read.template_events, aln.start2, aln.end2,
        np_read.template_event_map)
    c_events, c_event_offset = make_event_slice(
        np_read.complement_events, aln.start2, aln.end2,
        np_read.complement_event_map)

    t_shift = t_event_offset
    c_shift = c_event_offset
    r_shift_t = aln.start1
    r_shift_c = aln.end1
    forward = aln.strand1
    map_offset = aln.start2

    # rebase the reference side, convert guide to anchors
    # (guideAlignmentToRebasedAnchorPairs, vanillaAlign.c:249-270)
    flip1 = not aln.strand1
    ref_shift = aln.start1 if aln.strand1 else aln.end1
    rebase_coordinates(aln, 1, -ref_shift, flip1)
    check_pairwise_alignment(aln)
    unfiltered = sorted(convert_alignment_to_anchor_pairs(
        aln, params.constraint_diagonal_trim))
    anchor_pairs = filter_to_remove_overlap(unfiltered)

    if args.templateExpectations and args.complementExpectations:
        if sm_type not in ("threeState", "vanilla"):
            raise SystemExit("expectations only supported for strawMan/vanilla")
        t_hmm = get_signal_expectations(
            args.templateModel, args.inTemplateHmm, sm_type,
            np_read.template_params, t_events, np_read.template_event_map,
            map_offset, trimmed_ref, params, anchor_pairs, TEMPLATE)
        with open(args.templateExpectations, "w") as fh:
            t_hmm.write(fh)
        c_hmm = get_signal_expectations(
            args.complementModel, args.inComplementHmm, sm_type,
            np_read.complement_params, c_events, np_read.complement_event_map,
            map_offset, rc_trimmed_ref, params, anchor_pairs, COMPLEMENT)
        with open(args.complementExpectations, "w") as fh:
            c_hmm.write(fh)
        return 0

    banded = args.banded
    for strand, events_slice, ev_offset, model_file, in_hmm, npp, target, \
            ref_shift_s, full_events, event_map in (
            (TEMPLATE, t_events, t_shift, args.templateModel,
             args.inTemplateHmm, np_read.template_params, trimmed_ref,
             r_shift_t, np_read.template_events, np_read.template_event_map),
            (COMPLEMENT, c_events, c_shift, args.complementModel,
             args.inComplementHmm, np_read.complement_params, rc_trimmed_ref,
             r_shift_c, np_read.complement_events,
             np_read.complement_event_map)):
        sm = build_state_machine(model_file, npp, sm_type, strand, in_hmm)
        pairs = perform_signal_alignment(
            sm, events_slice, event_map, map_offset, target, params,
            anchor_pairs, banded)
        score = (100.0 * sum(s for s, _, _ in pairs)
                 / (max(len(pairs), 1) * PAIR_ALIGNMENT_PROB_1))
        if strand == TEMPLATE:
            stdout.write(f"{args.readLabel} {len(anchor_pairs)}\t"
                         f"{len(pairs)}({score:f})\t")
        else:
            stdout.write(f"{len(pairs)}({score:f})\n")
        pairs.sort(key=lambda t: t[1] + t[2])
        if args.posteriors:
            with open(args.posteriors, "a") as fh:
                write_posterior_probs(
                    fh, args.readLabel, sm.model.match_model, npp.scale,
                    npp.shift, full_events, target, forward, aln.contig1,
                    ev_offset, ref_shift_s, pairs, strand)
    return 0


if __name__ == "__main__":
    main()
