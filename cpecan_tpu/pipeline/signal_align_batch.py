"""signalAlign-equivalent batch driver.

Port of scripts/signalAlign.py: align a set of npReads to a reference,
writing per-read posterior tsvs.  The reference uses a multiprocessing pool
of vanillaAlign processes (scripts/signalAlign.py:101-141); here reads run
sequentially through the shared jitted engine (batched/TPU-sharded paths
live in parallel.batch / parallel.mesh).
"""

import io
import os
import random
import sys

from .. import align as _align
from ..cli.signal_align import main as signal_align_main


def prepare_fast5_reads(fast5_paths, workdir, reference_fasta=None,
                        guide_fn=None, log=print):
    """fast5 inputs -> (npread_path, guide cigar) pairs for run_batch.

    Mirrors SignalAlignment.run's per-read preprocessing
    (scripts/nanoporeLib.py:791-858): convert each fast5 to an npRead +
    2D-read fasta, then guide-align the 2D read.  ``guide_fn(twod_fasta,
    read_name) -> cigar line or False`` supplies the guide; by default it
    runs bwa against ``reference_fasta`` (requires the bwa binary).
    Unconvertible/unmapped reads are skipped, not fatal.
    """
    from ..io.fast5 import fast5_to_npread
    from ..io.guide import (bwa_available, exonerated_bwa,
                            exonerated_lastz, get_bwa_index)

    os.makedirs(workdir, exist_ok=True)
    if guide_fn is None:
        if reference_fasta is None:
            raise ValueError("need reference_fasta (or a guide_fn)")
        if bwa_available():
            index = get_bwa_index(reference_fasta, workdir)

            def guide_fn(twod_fasta, _name):
                cigar, _strand = exonerated_bwa(index, twod_fasta)
                return cigar
        else:
            # no bwa on this host: guide with the vendored lastz instead
            # (same exonerate-cigar contract; the reference hard-requires
            # bwa here, scripts/nanoporeLib.py:202-235)
            def guide_fn(twod_fasta, _name):
                cigar, _strand = exonerated_lastz(reference_fasta,
                                                  twod_fasta)
                return cigar

    pairs = []
    for f5 in fast5_paths:
        name = os.path.splitext(os.path.basename(f5))[0]
        npread = os.path.join(workdir, name + ".npRead")
        twod = os.path.join(workdir, name + ".2d.fa")
        try:
            fast5_to_npread(f5, npread, twod_fasta_path=twod,
                            log=lambda m: None)
        except Exception as exc:  # skip unreadable fast5s
            log(f"could not convert {f5}: {exc}")
            continue
        cigar = guide_fn(twod, name)
        if not cigar:
            log(f"no guide alignment for {name}, skipping")
            continue
        pairs.append((npread, cigar))
    return pairs


def run_batch_fast(reference_path, npread_guide_pairs, out_dir, *,
                   template_model_file, complement_model_file,
                   in_template_hmm=None, in_complement_hmm=None,
                   threshold=0.01, params=None, group=None, compact_k=4096,
                   log=print, interpret=None, aligner=None,
                   sm_type="threeState", chunk=64, mesh=None):
    """Batched signalAlign through the Pallas wavefront kernel — all four
    vanillaAlign machines ('threeState', 'vanilla' — the reference's
    default — 'fourState', and 'echelon'), one driver like the
    reference's (vanillaAlign.c:550-601):
    both strands of every read align in a handful of kernel launches with
    per-read model scaling on device, then the standard 15-column
    posterior tsvs are written per read.  Echelon's multi-state posterior
    windows expand host-side (state j emits j+1 pairs per cell,
    extract_echelon_pairs); its per-read scaling covers both the match
    model and the skip bins (recomputed from per-read scaled level means).

    Reads are dispatched in ``chunk``-sized slices and drained one chunk
    behind: chunk k's tsvs are written on the host while chunk k+1 is on
    the device (JAX async dispatch), so host post-processing and kernel
    time overlap instead of adding.  A shape hint pinned to the whole
    batch keeps every chunk on one compiled kernel.

    ``mesh``: a 1-axis jax device mesh; each chunk's read groups shard
    data-parallel over it (pa.run(mesh=...)), with per-device kernels and
    per-device posterior compaction — the fast-path replacement for the
    reference's per-read process pool (scripts/signalAlign.py:101-141).

    Same per-read preprocessing as cli.signal_align main (guide trimming,
    event slicing, anchor rebasing — vanillaAlign.c:463-530); posteriors
    are normalized by the exact per-read total rather than the reference's
    windowed-traceback estimates, so scores can differ from the scan
    engine in ~1e-3 while pair decisions match.
    """
    import dataclasses

    import jax
    import numpy as np

    from ..align import AlignmentParams
    from ..cli.realign import (convert_alignment_to_anchor_pairs,
                               rebase_coordinates)
    from ..cli.signal_align import (get_remapped_anchor_pairs,
                                    make_event_slice, write_posterior_probs)
    from ..constants import COMPLEMENT, KMER_LENGTH, TEMPLATE
    from ..io.cigar import parse_cigar_line
    from ..io.fasta import reverse_complement
    from ..io.npread import load_npread
    from ..io.poremodel import load_pore_model, scale_model
    from ..models.hmm import ContinuousPairHmm, VanillaHmm
    from ..models.state_machines import (StateMachine3SignalStrawman,
                                         StateMachine3Vanilla, StateMachine4,
                                         StateMachineEchelon)
    from ..ops.anchors import filter_to_remove_overlap
    from ..ops.pallas_fb import (EchelonPallasAligner, Sm4PallasAligner,
                                 StrawmanPallasAligner,
                                 VanillaPallasAligner,
                                 extract_echelon_pairs_chunk,
                                 extract_pairs_chunk)

    aligner_cls = {"threeState": StrawmanPallasAligner,
                   "vanilla": VanillaPallasAligner,
                   "fourState": Sm4PallasAligner,
                   "echelon": EchelonPallasAligner}
    if sm_type not in aligner_cls:
        raise ValueError("run_batch_fast supports sm_type 'threeState', "
                         "'vanilla', 'fourState' or 'echelon'")
    params = params or AlignmentParams(threshold=threshold)
    os.makedirs(out_dir, exist_ok=True)
    with open(reference_path) as fh:
        reference_seq = fh.readline().strip()

    jobs = {TEMPLATE: [], COMPLEMENT: []}
    sps = {TEMPLATE: [], COMPLEMENT: []}
    meta = []
    hint_lx = hint_nd = 0
    for npread_path, guide_cigar in npread_guide_pairs:
        label = os.path.basename(npread_path).replace(".npRead", "")
        try:
            np_read = load_npread(npread_path)
            aln = parse_cigar_line(guide_cigar.strip())
        except Exception as exc:
            log(f"could not load {label}: {exc}")
            continue
        if aln.strand1:
            trimmed = reference_seq[aln.start1:aln.end1]
        else:
            trimmed = reverse_complement(
                reference_seq[aln.end1:aln.start1])
        rc_trimmed = reverse_complement(trimmed)
        t_events, t_off = make_event_slice(
            np_read.template_events, aln.start2, aln.end2,
            np_read.template_event_map)
        c_events, c_off = make_event_slice(
            np_read.complement_events, aln.start2, aln.end2,
            np_read.complement_event_map)
        forward = aln.strand1
        contig = aln.contig1
        r_shift = {TEMPLATE: aln.start1, COMPLEMENT: aln.end1}
        map_offset = aln.start2
        # cheap copy (ops tuples are immutable; deepcopy cost ~2ms/read)
        aln2 = dataclasses.replace(aln, operations=list(aln.operations))
        flip1 = not aln2.strand1
        ref_shift = aln2.start1 if aln2.strand1 else aln2.end1
        rebase_coordinates(aln2, 1, -ref_shift, flip1)
        anchors = filter_to_remove_overlap(sorted(
            convert_alignment_to_anchor_pairs(
                aln2, params.constraint_diagonal_trim)))
        try:
            strand_jobs = []
            for strand, target, events, emap, npp in (
                    (TEMPLATE, trimmed, t_events,
                     np_read.template_event_map, np_read.template_params),
                    (COMPLEMENT, rc_trimmed, c_events,
                     np_read.complement_event_map,
                     np_read.complement_params)):
                l_x = max(len(target) - (KMER_LENGTH - 1), 0)
                remapped = get_remapped_anchor_pairs(anchors, emap,
                                                     map_offset)
                # cheap anchor/shape validation so one bad read can't
                # abort the whole strand batch inside the kernel prepare
                # (full band geometry is built once per strand below);
                # n_diag = l_x + l_y, so the batch-wide shape hint that
                # pins one compiled kernel needs no band construction
                a = np.asarray(remapped, np.int64).reshape(-1, 2)
                if len(a) and not (
                        np.all(np.diff(a[:, 0]) > 0)
                        and np.all(np.diff(a[:, 1]) > 0)
                        and a[0, 0] >= 0 and a[0, 1] >= 0
                        and a[-1, 0] < l_x and a[-1, 1] < len(events)):
                    raise ValueError("anchors must be strictly increasing "
                                     "and in range")
                if l_x + 130 >= 2 ** 15:
                    raise ValueError(f"reference length {l_x} exceeds the "
                                     "int16 band-metadata range")
                hint_lx = max(hint_lx, l_x)
                hint_nd = max(hint_nd, l_x + len(events))
                strand_jobs.append((strand, (target, events, l_x,
                                             len(events), remapped),
                                    [npp.scale, npp.shift, npp.var,
                                     npp.scale_sd, npp.var_sd]))
        except Exception as exc:  # skip unalignable reads, keep the batch
            log(f"skipping {label}: {exc}")
            continue
        for strand, job, sp in strand_jobs:
            jobs[strand].append(job)
            sps[strand].append(sp)
        meta.append(dict(label=label, np_read=np_read, forward=forward,
                         contig=contig, trimmed=trimmed,
                         rc_trimmed=rc_trimmed, r_shift=r_shift,
                         ev_off={TEMPLATE: t_off, COMPLEMENT: c_off}))

    if not meta:
        return []

    # band geometry, built ONCE per strand over the whole batch (the
    # batched make_bands is ~4x the per-read make_band; prepare reuses
    # these instead of rebuilding per chunk).  A geometric failure the
    # cheap per-read checks above missed falls back to per-read
    # construction to isolate and drop the offending reads.
    from ..ops.band import make_band, make_bands

    def build_bands():
        return {s: make_bands([j[4] for j in jobs[s]],
                              [j[2] for j in jobs[s]],
                              [j[3] for j in jobs[s]],
                              params.diagonal_expansion)
                for s in (TEMPLATE, COMPLEMENT)}

    try:
        bands_all = build_bands()
    except ValueError:
        bad = set()
        for i, m in enumerate(meta):
            for s in (TEMPLATE, COMPLEMENT):
                j = jobs[s][i]
                try:
                    make_band(j[4], j[2], j[3], params.diagonal_expansion)
                except ValueError as exc:
                    log(f"skipping {m['label']}: {exc}")
                    bad.add(i)
                    break
        keep = [i for i in range(len(meta)) if i not in bad]
        meta = [meta[i] for i in keep]
        for s in (TEMPLATE, COMPLEMENT):
            jobs[s] = [jobs[s][i] for i in keep]
            sps[s] = [sps[s][i] for i in keep]
        if not meta:
            return []
        bands_all = build_bands()

    if aligner is not None:
        pa = aligner  # reuse compiled kernels across batches
    else:
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        pa = aligner_cls[sm_type](params, interpret=interpret,
                                  group=group)

    def strand_sm(model_file, hmm_file, strand):
        model = load_pore_model(model_file)
        if sm_type == "vanilla":
            skip_bins = (VanillaHmm.load(hmm_file).kmer_skip_bins
                         if hmm_file else None)
            return StateMachine3Vanilla(
                model, skip_bin_probs=skip_bins,
                strand="template" if strand == TEMPLATE
                else "complement"), model
        if sm_type == "echelon":
            if hmm_file:
                # the reference defines no echelon EM (its expectation
                # hook is NULL, impl/stateMachine.c:1831)
                raise ValueError("echelon has no trainable HMM to load")
            return StateMachineEchelon(model), model
        p = gap_x = None
        if hmm_file:
            hmm = ContinuousPairHmm.load(hmm_file)
            p, gap_x = (hmm.to_sm4_params() if sm_type == "fourState"
                        else hmm.to_sm3_params())
        if sm_type == "fourState":
            return StateMachine4(model, params=p,
                                 gap_x_log_probs=gap_x), model
        return StateMachine3SignalStrawman(model, params=p,
                                           gap_x_log_probs=gap_x), model

    sms = {}
    models = {}
    for strand, model_file, hmm_file in (
            (TEMPLATE, template_model_file, in_template_hmm),
            (COMPLEMENT, complement_model_file, in_complement_hmm)):
        sms[strand], models[strand] = strand_sm(model_file, hmm_file,
                                                strand)

    # per-(strand, read-params) scaled match model, memoized — reads from
    # the same pore/run share scalings, and the tsv writer only needs the
    # scaled table, not a fresh copy per read-strand (worst case under
    # races: a duplicate compute, never a wrong value)
    _scaled_memo = {}

    def scaled_match_model(strand, npp):
        key = (strand, npp.scale, npp.shift, npp.var, npp.scale_sd,
               npp.var_sd)
        m = _scaled_memo.get(key)
        if m is None:
            m = scale_model(models[strand], npp.scale, npp.shift, npp.var,
                            npp.scale_sd, npp.var_sd).match_model
            _scaled_memo[key] = m
        return m

    results = []

    def chunk_outputs(idxs):
        outs = {}
        for strand in (TEMPLATE, COMPLEMENT):
            outs[strand] = pa.run(
                sms[strand], [jobs[strand][i] for i in idxs],
                compact_k=compact_k,
                scale_params=np.asarray([sps[strand][i] for i in idxs]),
                ragged_left=True, ragged_right=True,
                shape_hint=(hint_lx, hint_nd),
                bands=[bands_all[strand][i] for i in idxs], mesh=mesh)
            # start the pair download as soon as the kernels finish:
            # the template transfer rides under the complement kernels
            # (and both under the next chunk's), instead of serializing
            # their ~100-250 ms tunnel latencies at drain time
            if mesh is None:
                o = outs[strand]
                if "compact" in o:
                    for arr in o["compact"]:
                        arr.copy_to_host_async()
                else:  # tiled-routed long reads: per-chunk compactions
                    for _off, comp in o.get("compact_chunks", ()):
                        for arr in comp:
                            arr.copy_to_host_async()
        return outs

    def drain(idxs, outs):
        """Write the chunk's tsvs; returns result rows (transactional —
        the caller appends them only on full success, so the isolation
        retry can re-run a failed chunk without duplicating results)."""
        # one device->host transfer per strand-chunk (per-read slices of
        # device arrays would each pay the full transfer latency)
        for out in outs.values():
            if "compact" in out:
                out["compact"] = tuple(np.asarray(a)
                                       for a in out["compact"])

        # pair extraction is ONE vectorized pass per strand over the whole
        # chunk (per-read extract_pairs_auto calls were the drain's
        # dominant host cost); rows come back already in the tsv's
        # stable diagonal order
        extract = (extract_echelon_pairs_chunk if sm_type == "echelon"
                   else extract_pairs_chunk)
        aps = {}
        for strand in (TEMPLATE, COMPLEMENT):
            out = outs[strand]
            nds = [out["prep"]["bands"][rel].n_diag
                   for rel in range(len(idxs))]
            aps[strand] = extract(out, list(range(len(idxs))), nds,
                                  params.threshold)

        def write_read(rel, i):
            m = meta[i]
            tsv = os.path.join(out_dir, m["label"] + ".tsv")
            n_pairs = {}
            with open(tsv, "w") as fh:
                for strand in (TEMPLATE, COMPLEMENT):
                    ap = aps[strand][rel]
                    n_pairs[strand] = len(ap)
                    npp = (m["np_read"].template_params
                           if strand == TEMPLATE
                           else m["np_read"].complement_params)
                    full_events = (m["np_read"].template_events
                                   if strand == TEMPLATE
                                   else m["np_read"].complement_events)
                    target = (m["trimmed"] if strand == TEMPLATE
                              else m["rc_trimmed"])
                    write_posterior_probs(
                        fh, m["label"], scaled_match_model(strand, npp),
                        npp.scale,
                        npp.shift, full_events, target, m["forward"],
                        m["contig"], m["ev_off"][strand],
                        m["r_shift"][strand], ap, strand)
            return (m["label"], True,
                    f"t={n_pairs[TEMPLATE]} c={n_pairs[COMPLEMENT]}")

        # per-read tsvs are independent files: a small thread pool hides
        # the file open/write latency (IO and the native formatter both
        # release the GIL) behind the numpy extraction work.  Build/load
        # the native formatter once, serially — concurrent first calls
        # would race the on-demand g++ compile of the .so
        from concurrent.futures import ThreadPoolExecutor

        from ..cli.signal_align import _native_tsv
        _native_tsv()
        if len(idxs) > 1:
            with ThreadPoolExecutor(max_workers=8) as pool:
                rows = list(pool.map(write_read, range(len(idxs)), idxs))
        else:
            rows = [write_read(0, idxs[0])]
        return rows

    def drain_isolated(idxs, outs):
        """Chunk-level failure isolation (the reference's per-read
        try/except + jobTree retry, scripts/signalAlign.py:52-58): a
        kernel/extraction failure re-runs the chunk one read at a time,
        so one poisoned read costs one retry, not the batch; its failure
        is recorded in the results, never fatal."""
        try:
            results.extend(drain(idxs, outs))
            return
        except Exception as exc:
            log(f"chunk of {len(idxs)} failed ({exc}); isolating reads")
        for i in idxs:
            try:
                results.extend(drain([i], chunk_outputs([i])))
            except Exception as exc:
                results.append((meta[i]["label"], False, str(exc)))
                log(f"alignment failed for {meta[i]['label']}: {exc}")

    pending = None
    for i0 in range(0, len(meta), chunk):
        idxs = list(range(i0, min(i0 + chunk, len(meta))))
        outs = chunk_outputs(idxs)
        if pending is not None:
            # host tsv work overlaps this chunk's kernels
            drain_isolated(*pending)
        pending = (idxs, outs)
    if pending is not None:
        drain_isolated(*pending)
    return results


def run_batch(reference_path, npread_guide_pairs, out_dir, *, sm_type="vanilla",
              banded=False, threshold=0.01, n_reads=None, rng=None, log=print):
    """npread_guide_pairs: list of (npread_path, guide cigar line str)."""
    rng = rng or random.Random(0)
    pairs = list(npread_guide_pairs)
    rng.shuffle(pairs)
    if n_reads is not None:
        pairs = pairs[:n_reads]
    os.makedirs(out_dir, exist_ok=True)
    flags = {"threeState": ["-s"], "fourState": ["-f"], "echelon": ["-e"],
             "vanilla": []}[sm_type]
    if banded:
        flags.append("-b")
    results = []
    for npread_path, guide_cigar in pairs:
        label = os.path.basename(npread_path).replace(".npRead", "")
        posteriors = os.path.join(out_dir, label + ".tsv")
        out = io.StringIO()
        try:
            signal_align_main(
                flags + ["-q", npread_path, "-r", reference_path,
                         "-u", posteriors, "-L", label,
                         "-d", str(threshold)],
                stdin=io.StringIO(guide_cigar + "\n"), stdout=out)
            results.append((label, True, out.getvalue().strip()))
        except Exception as exc:  # per-read failures don't stop the batch
            # (scripts/signalAlign.py:52-58)
            results.append((label, False, str(exc)))
            log(f"alignment failed for {label}: {exc}")
    return results
