"""Batch-driver CLIs: the L6 pipeline entry points.

Equivalents of the reference's orchestration scripts:
  - cpecan-signal-align-batch  <- scripts/signalAlign.py (batch signal
    alignment over a read directory)
  - cpecan-train-models        <- scripts/trainModels.py (signal-HMM
    Baum-Welch)
  - cpecan-em                  <- cPecanEm.py (DNA 5-state EM)

Guide alignments come from bwa when the binary is present (fast5 inputs) or
from a cigar file (one exonerate cigar per read, query name == read name) —
the reference always shells out to bwa (scripts/nanoporeLib.py:202-235).
"""

import argparse
import glob
import os
import sys

from ..io.cigar import parse_cigar_line
from ..fixtures import fixture_path


def _load_guides(path):
    """cigar file -> {query name: (line, PairwiseAlignment)}."""
    out = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            aln = parse_cigar_line(line)
            out[aln.contig2] = (line, aln)
    return out


def _collect_read_pairs(files_dir, guides, workdir, reference_fasta, log):
    """Directory of .npRead/.fast5 files -> [(npread_path, guide line)]."""
    from ..pipeline.signal_align_batch import prepare_fast5_reads

    npreads = sorted(glob.glob(os.path.join(files_dir, "*.npRead")))
    fast5s = sorted(glob.glob(os.path.join(files_dir, "*.fast5")))
    if npreads and not guides:
        raise SystemExit(
            f"{len(npreads)} .npRead files in {files_dir} but no --guides "
            "file: npRead inputs need guide cigars (bwa runs only on the "
            "fast5 path)")
    pairs = []
    for p in npreads:
        name = os.path.basename(p).replace(".npRead", "")
        if name in guides:
            pairs.append((p, guides[name][0]))
        else:
            log(f"no guide for {name}, skipping")
    if fast5s:
        guide_fn = None
        if guides:
            def guide_fn(_twod_fasta, name):
                return guides[name][0] if name in guides else False
        pairs += prepare_fast5_reads(fast5s, workdir,
                                     reference_fasta=reference_fasta,
                                     guide_fn=guide_fn, log=log)
    return pairs


def signal_align_batch_main(argv=None):
    p = argparse.ArgumentParser(
        prog="cpecan-signal-align-batch",
        description="Batch signal alignment (scripts/signalAlign.py "
                    "equivalent).")
    p.add_argument("--file_directory", "-d", required=True,
                   help="directory of .npRead and/or .fast5 files")
    p.add_argument("--ref", "-r", required=True,
                   help="reference fasta (or bare one-line sequence file)")
    p.add_argument("--output_location", "-o", required=True)
    p.add_argument("--stateMachineType", "-smt", default="vanilla",
                   choices=["vanilla", "threeState", "fourState", "echelon"])
    p.add_argument("--threshold", "-t", type=float, default=0.01)
    p.add_argument("--un-banded", "-ub", dest="banded", action="store_false")
    p.add_argument("--nb_files", "-n", type=int, default=None)
    p.add_argument("--guides", default=None,
                   help="exonerate cigar file keyed by read name "
                        "(alternative to running bwa)")
    p.add_argument("--target_regions", "-q", default=None)
    p.add_argument("--engine", default="scan", choices=["scan", "pallas"],
                   help="scan: per-read reference-faithful engine; pallas: "
                        "batched TPU wavefront kernel (threeState only)")
    p.add_argument("--templateModel", "-T",
                   default=fixture_path("template_median68pA.model"))
    p.add_argument("--complementModel", "-C",
                   default=fixture_path("complement_median68pA_pop2.model"))
    args = p.parse_args(argv)

    from ..io.fasta import read_fasta_file
    from ..pipeline.signal_align_batch import run_batch, run_batch_fast

    log = lambda m: print(m, file=sys.stderr)
    os.makedirs(args.output_location, exist_ok=True)
    # accept fasta or bare-sequence reference; run_batch wants a bare file
    ref_path = args.ref
    with open(args.ref) as fh:
        if fh.read(1) == ">":
            ref_path = os.path.join(args.output_location, "reference.seq")
            for _name, seq in read_fasta_file(args.ref):
                with open(ref_path, "w") as out:
                    print(seq, file=out)
                break
    guides = _load_guides(args.guides) if args.guides else None
    if args.target_regions and guides:
        from ..io.guide import TargetRegions
        tr = TargetRegions(args.target_regions)
        guides = {k: v for k, v in guides.items()
                  if tr.check_aligned_region(min(v[1].start1, v[1].end1),
                                             max(v[1].start1, v[1].end1))}
    pairs = _collect_read_pairs(args.file_directory, guides,
                                args.output_location, args.ref, log)
    if args.engine == "pallas":
        if args.stateMachineType not in ("threeState", "vanilla"):
            p.error("--engine pallas requires -smt threeState or vanilla")
        if args.nb_files is not None:
            # same seeded shuffle-then-slice as the scan path
            # (scripts/signalAlign.py culling semantics)
            import random as _random
            _random.Random(0).shuffle(pairs)
            pairs = pairs[:args.nb_files]
        results = run_batch_fast(
            ref_path, pairs, args.output_location,
            template_model_file=args.templateModel,
            complement_model_file=args.complementModel,
            threshold=args.threshold, log=log,
            sm_type=args.stateMachineType)
    else:
        results = run_batch(ref_path, pairs, args.output_location,
                            sm_type=args.stateMachineType,
                            banded=args.banded, threshold=args.threshold,
                            n_reads=args.nb_files, log=log)
    ok = sum(1 for _, s, _ in results if s)
    print(f"aligned {ok}/{len(results)} reads", file=sys.stderr)
    return 0 if ok else 1


def train_models_main(argv=None):
    p = argparse.ArgumentParser(
        prog="cpecan-train-models",
        description="Signal-HMM Baum-Welch (scripts/trainModels.py "
                    "equivalent).")
    p.add_argument("--file_directory", "-d", required=True)
    p.add_argument("--ref", "-r", required=True,
                   help="bare one-line reference sequence file")
    p.add_argument("--output_location", "-o", required=True)
    p.add_argument("--iterations", "-i", type=int, default=10)
    p.add_argument("--train_amount", "-a", type=int, default=1_000_000)
    p.add_argument("--stateMachineType", "-smt", default="threeState",
                   choices=["threeState", "vanilla"])
    p.add_argument("--threshold", "-t", type=float, default=0.01)
    p.add_argument("--templateModel", "-T", required=True,
                   help="template pore model file")
    p.add_argument("--complementModel", "-C", required=True)
    p.add_argument("--guides", required=True,
                   help="exonerate cigar file keyed by read name")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--engine", default="scan", choices=["scan", "pallas"],
                   help="E-step engine: per-read scan engine or the "
                        "batched TPU wavefront kernel (threeState only)")
    args = p.parse_args(argv)

    from ..pipeline.train_models import TrainOptions, train

    log = lambda m: print(m, file=sys.stderr)
    guides = _load_guides(args.guides)
    pairs = []
    for path in sorted(glob.glob(os.path.join(args.file_directory,
                                              "*.npRead"))):
        name = os.path.basename(path).replace(".npRead", "")
        if name in guides:
            pairs.append((path, guides[name][1]))
        else:
            log(f"no guide for {name}, skipping")
    if not pairs:
        p.error("no (npRead, guide) pairs found")
    os.makedirs(args.output_location, exist_ok=True)
    opts = TrainOptions(sm_type=args.stateMachineType,
                        iterations=args.iterations,
                        training_amount=args.train_amount,
                        threshold=args.threshold, engine=args.engine)
    t_hmm, c_hmm, trajectory = train(
        args.ref, pairs, args.templateModel, args.complementModel,
        os.path.join(args.output_location, "template_trained.hmm"),
        os.path.join(args.output_location, "complement_trained.hmm"),
        opts, log=log, checkpoint_dir=args.checkpoint_dir,
        resume=args.resume)
    for i, (t_lik, c_lik) in enumerate(trajectory):
        print(f"iteration {i}\t{t_lik}\t{c_lik}")
    return 0


def em_main(argv=None):
    p = argparse.ArgumentParser(
        prog="cpecan-em",
        description="DNA pair-HMM expectation maximisation (cPecanEm.py "
                    "equivalent).")
    p.add_argument("--sequences", required=True, nargs="+",
                   help="fasta files")
    p.add_argument("--alignments", required=True,
                   help="exonerate cigar file")
    p.add_argument("--outputModel", default="hmm.txt")
    p.add_argument("--modelType", default="fiveState",
                   choices=["fiveState", "threeState",
                            "threeStateAsymmetric"])
    p.add_argument("--inputModel", default=None)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--randomStart", action="store_true")
    p.add_argument("--useDefaultModelAsStart", action="store_true")
    p.add_argument("--setJukesCantorStartingEmissions", type=float,
                   default=None)
    p.add_argument("--trainEmissions", action="store_true")
    p.add_argument("--tieEmissions", action="store_true")
    p.add_argument("--maxAlignmentLengthPerJob", type=int,
                   default=1_000_000)
    p.add_argument("--maxAlignmentLengthToSample", type=int,
                   default=50_000_000)
    p.add_argument("--outputLastzScoringMatrix", default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    from ..io.fasta import sequences_from_fastas
    from ..pipeline.em import (EmOptions, expectation_maximisation,
                               expectation_maximisation_trials,
                               make_blast_scoring_matrix,
                               write_lastz_scoring_matrix)

    sequences = sequences_from_fastas(args.sequences)
    alignments = []
    with open(args.alignments) as fh:
        for line in fh:
            line = line.strip()
            if line:
                alignments.append(parse_cigar_line(line))
    opts = EmOptions(
        model_type=args.modelType, input_model=args.inputModel,
        iterations=args.iterations, trials=args.trials,
        random_start=args.randomStart,
        use_default_model_as_start=args.useDefaultModelAsStart,
        set_jukes_cantor_starting_emissions=
            args.setJukesCantorStartingEmissions,
        train_emissions=args.trainEmissions,
        tie_emissions=args.tieEmissions,
        max_alignment_length_per_job=args.maxAlignmentLengthPerJob,
        max_alignment_length_to_sample=args.maxAlignmentLengthToSample)
    if args.checkpoint_dir is not None:
        hmm = expectation_maximisation(sequences, alignments, opts,
                                       checkpoint_dir=args.checkpoint_dir,
                                       resume=args.resume)
    else:
        hmm = expectation_maximisation_trials(sequences, alignments, opts)
    hmm.write(args.outputModel)
    if args.outputLastzScoringMatrix:
        match_probs, gap_open, gap_extend = make_blast_scoring_matrix(
            hmm, sequences.values())
        with open(args.outputLastzScoringMatrix, "w") as fh:
            write_lastz_scoring_matrix(fh, match_probs, gap_open, gap_extend)
    print(f"final likelihood {hmm.likelihood}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(signal_align_batch_main())
