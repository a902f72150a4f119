"""trainModels-equivalent: signal-HMM Baum-Welch over a set of npReads.

Port of scripts/trainModels.py: per iteration, E-steps over a culled sample
of reads, merged expectations, normalize, write HMM, track likelihoods.
The reference fans out one vanillaAlign process per read
(scripts/trainModels.py:176-209); here reads run through the shared jitted
engine (and can be sharded over a device mesh via parallel.mesh).
"""

import os
import random
import sys
from dataclasses import dataclass, field

import numpy as np

from ..align import AlignmentParams
from ..cli.signal_align import get_signal_expectations
from ..constants import COMPLEMENT, TEMPLATE
from ..io.npread import load_npread
from ..models.hmm import ContinuousPairHmm, VanillaHmm


@dataclass
class TrainOptions:
    sm_type: str = "threeState"     # or "vanilla"
    iterations: int = 10
    training_amount: int = 1_000_000  # bases of training data per iteration
    threshold: float = 0.01
    params: AlignmentParams = field(default_factory=AlignmentParams)
    # 'scan' runs the reference-faithful per-read engine; 'pallas' batches
    # the whole E-step through the wavefront kernel (threeState/vanilla,
    # ~12x faster, no large-gap splitting inside one read)
    engine: str = "scan"


def cull_training_files(read_paths, training_amount, rng):
    """cull_training_files (scripts/trainModels.py:68-89): shuffle and take
    reads until the training amount is reached."""
    paths = list(read_paths)
    rng.shuffle(paths)
    out = []
    total = 0
    for p in paths:
        out.append(p)
        total += os.path.getsize(p)
        if total >= training_amount:
            break
    return out


def add_and_norm_expectations(hmms, sm_type):
    """add_and_norm_expectations (scripts/trainModels.py:108-115): merge
    per-read expectation containers and normalize (the M-step)."""
    merged = hmms[0]
    for h in hmms[1:]:
        if sm_type == "vanilla":
            merged.kmer_skip_bins += h.kmer_skip_bins
        else:
            merged.transitions += h.transitions
            merged.kmer_gap_probs += h.kmer_gap_probs
        merged.likelihood += h.likelihood
    likelihood = merged.likelihood
    merged.normalize()
    return merged, likelihood


def _pallas_strand_expectations(model_file, hmm_file, jobs, sps, options,
                                pa, strand, mesh=None):
    """Batched E-step for one strand through the wavefront kernel
    (run(expectations=True)): one kernel launch for the whole strand
    instead of a per-read engine pass; per-read model scaling happens on
    device.  ``pa`` is shared across EM iterations so its compiled-kernel
    and feature-assembly caches hit.

    With ``mesh`` the strand's read groups shard data-parallel over the
    device mesh and the accumulators come back already psum-reduced
    (run(mesh=...)), so the returned list holds ONE merged container —
    the collective replacement for the reference's per-read expectation
    files (scripts/trainModels.py:108-115)."""
    from ..io.poremodel import load_pore_model, scale_model
    from ..models.state_machines import (StateMachine3SignalStrawman,
                                         StateMachine3Vanilla)

    model = load_pore_model(model_file)
    if options.sm_type == "vanilla":
        skip_bins = None
        if hmm_file:
            skip_bins = VanillaHmm.load(hmm_file).kmer_skip_bins
        sm = StateMachine3Vanilla(
            model, skip_bin_probs=skip_bins,
            strand="template" if strand == TEMPLATE else "complement")
    else:
        params = gap_x = None
        if hmm_file:
            hmm = ContinuousPairHmm.load(hmm_file)
            params, gap_x = hmm.to_sm3_params()
        sm = StateMachine3SignalStrawman(model, params=params,
                                         gap_x_log_probs=gap_x)
    if mesh is not None:
        out = pa.run(sm, jobs, expectations=True,
                     scale_params=np.asarray(sps, np.float64),
                     ragged_left=True, ragged_right=True, mesh=mesh)
        red = {k: np.asarray(v)
               for k, v in out["expectations_reduced"].items()}
        if options.sm_type == "vanilla":
            h = VanillaHmm(pseudocount=0.0001)
            h.implant_match_models(scale_model(model, *sps[0]))
            h.kmer_skip_bins += red["skip_bins"]
            h.likelihood += float(red["likelihood"])
        else:
            h = ContinuousPairHmm(pseudocount=0.0001)
            h.add_expectations({"trans": red["trans"],
                                "kmer_gap": red["kmer_gap"],
                                "likelihood": red["likelihood"]})
        return [h]
    out = pa.run(sm, jobs, expectations=True,
                 scale_params=np.asarray(sps, np.float64),
                 ragged_left=True, ragged_right=True)
    exp = out["expectations"]
    accs = []
    for i in range(len(jobs)):
        if options.sm_type == "vanilla":
            h = VanillaHmm(pseudocount=0.0001)
            h.implant_match_models(scale_model(model, *sps[i]))
            h.kmer_skip_bins += np.asarray(exp["skip_bins"][i])
            h.likelihood += float(exp["likelihood"][i])
        else:
            h = ContinuousPairHmm(pseudocount=0.0001)
            h.add_expectations({"trans": exp["trans"][i],
                                "kmer_gap": exp["kmer_gap"][i],
                                "likelihood": exp["likelihood"][i]})
        accs.append(h)
    return accs


def train(reference_path, read_guide_pairs, template_model, complement_model,
          out_template_hmm, out_complement_hmm, options: TrainOptions,
          rng=None, log=print, checkpoint_dir=None, resume=False,
          mesh=None):
    """Main EM loop (scripts/trainModels.py:118-236).

    read_guide_pairs: list of (npread_path, guide PairwiseAlignment) — the
    guide normally comes from bwa (scripts/nanoporeLib.py:202-235); any
    cigar source works.
    Returns (template_hmm, complement_hmm, likelihood trajectory).

    ``mesh`` (engine='pallas' only): a 1-axis jax device mesh; each
    strand's E-step shards data-parallel over it with psum-reduced
    accumulators (the fast-path replacement for the reference's
    multiprocessing fan-out + expectation-file merge).
    """
    from ..cli.realign import convert_alignment_to_anchor_pairs, \
        rebase_coordinates
    from ..cli.signal_align import make_event_slice
    from ..io.fasta import reverse_complement
    from ..ops.anchors import filter_to_remove_overlap

    rng = rng or random.Random(0)
    with open(reference_path) as fh:
        reference_seq = fh.readline().strip()

    t_hmm_file = None
    c_hmm_file = None
    trajectory = []
    start_iteration = 0
    manager = None
    if checkpoint_dir is not None:
        from ..utils.checkpoint import CheckpointManager
        manager = CheckpointManager(checkpoint_dir)
        if resume:
            restored = manager.restore()
            if restored is not None:
                step, _, meta = restored
                start_iteration = step + 1
                trajectory = [tuple(t) for t in meta["trajectory"]]
                with open(out_template_hmm, "w") as fh:
                    fh.write(meta["template_hmm"])
                with open(out_complement_hmm, "w") as fh:
                    fh.write(meta["complement_hmm"])
                t_hmm_file = out_template_hmm
                c_hmm_file = out_complement_hmm
                log(f"resumed from checkpoint at iteration {step}")
    pallas_aligner = None
    if options.engine == "pallas":
        if options.sm_type not in ("threeState", "vanilla"):
            raise ValueError("engine='pallas' supports sm_type "
                             "'threeState' or 'vanilla'")
        import jax
        from ..ops.pallas_fb import (StrawmanPallasAligner,
                                     VanillaPallasAligner)
        cls = (VanillaPallasAligner if options.sm_type == "vanilla"
               else StrawmanPallasAligner)
        # default group (32 compiled / 8 interpret): the r3 band-local
        # expectation backward fits multi-kb reads at the full group size
        pallas_aligner = cls(options.params,
                             interpret=jax.default_backend() == "cpu")

    t_merged = c_merged = None
    for iteration in range(start_iteration, options.iterations):
        sample = read_guide_pairs
        t_accs, c_accs = [], []
        t_jobs, c_jobs, t_sp, c_sp = [], [], [], []
        for npread_path, guide in sample:
            import copy
            aln = copy.deepcopy(guide)
            np_read = load_npread(npread_path)
            if aln.strand1:
                trimmed = reference_seq[aln.start1:aln.end1]
            else:
                trimmed = reverse_complement(reference_seq[aln.end1:aln.start1])
            rc_trimmed = reverse_complement(trimmed)
            map_offset = aln.start2
            t_events, _ = make_event_slice(np_read.template_events,
                                           aln.start2, aln.end2,
                                           np_read.template_event_map)
            c_events, _ = make_event_slice(np_read.complement_events,
                                           aln.start2, aln.end2,
                                           np_read.complement_event_map)
            flip1 = not aln.strand1
            ref_shift = aln.start1 if aln.strand1 else aln.end1
            rebase_coordinates(aln, 1, -ref_shift, flip1)
            anchors = filter_to_remove_overlap(sorted(
                convert_alignment_to_anchor_pairs(
                    aln, options.params.constraint_diagonal_trim)))
            if options.engine == "pallas":
                from ..cli.signal_align import get_remapped_anchor_pairs
                from ..constants import KMER_LENGTH
                for jobs, sps, target, events, emap, npp in (
                        (t_jobs, t_sp, trimmed, t_events,
                         np_read.template_event_map,
                         np_read.template_params),
                        (c_jobs, c_sp, rc_trimmed, c_events,
                         np_read.complement_event_map,
                         np_read.complement_params)):
                    l_x = max(len(target) - (KMER_LENGTH - 1), 0)
                    remapped = get_remapped_anchor_pairs(anchors, emap,
                                                         map_offset)
                    jobs.append((target, events, l_x, len(events),
                                 remapped))
                    sps.append([npp.scale, npp.shift, npp.var,
                                npp.scale_sd, npp.var_sd])
                continue
            t_accs.append(get_signal_expectations(
                template_model, t_hmm_file, options.sm_type,
                np_read.template_params, t_events,
                np_read.template_event_map, map_offset, trimmed,
                options.params, anchors, TEMPLATE))
            c_accs.append(get_signal_expectations(
                complement_model, c_hmm_file, options.sm_type,
                np_read.complement_params, c_events,
                np_read.complement_event_map, map_offset, rc_trimmed,
                options.params, anchors, COMPLEMENT))
        if options.engine == "pallas":
            t_accs = _pallas_strand_expectations(
                template_model, t_hmm_file, t_jobs, t_sp, options,
                pallas_aligner, TEMPLATE, mesh=mesh)
            c_accs = _pallas_strand_expectations(
                complement_model, c_hmm_file, c_jobs, c_sp, options,
                pallas_aligner, COMPLEMENT, mesh=mesh)
        t_merged, t_lik = add_and_norm_expectations(t_accs, options.sm_type)
        c_merged, c_lik = add_and_norm_expectations(c_accs, options.sm_type)
        with open(out_template_hmm, "w") as fh:
            t_merged.write(fh)
        with open(out_complement_hmm, "w") as fh:
            c_merged.write(fh)
        t_hmm_file = out_template_hmm
        c_hmm_file = out_complement_hmm
        trajectory.append((t_lik, c_lik))
        log(f"iteration {iteration}: template likelihood {t_lik:.2f}, "
            f"complement likelihood {c_lik:.2f}")
        if manager is not None:
            with open(out_template_hmm) as fh:
                t_text = fh.read()
            with open(out_complement_hmm) as fh:
                c_text = fh.read()
            manager.save(iteration, meta={
                "trajectory": [list(t) for t in trajectory],
                "template_hmm": t_text, "complement_hmm": c_text})
    if t_merged is None and t_hmm_file is not None:
        # resumed past the final iteration: reload the written models
        loader = (VanillaHmm if options.sm_type == "vanilla"
                  else ContinuousPairHmm)
        t_merged = loader.load(t_hmm_file)
        c_merged = loader.load(c_hmm_file)
    return t_merged, c_merged, trajectory
