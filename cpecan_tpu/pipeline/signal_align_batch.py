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
    from ..io.guide import bwa_available, exonerated_bwa, get_bwa_index

    os.makedirs(workdir, exist_ok=True)
    if guide_fn is None:
        if reference_fasta is None:
            raise ValueError("need reference_fasta (or a guide_fn)")
        if not bwa_available():
            raise RuntimeError("bwa binary not found: pass guide_fn or "
                               "provide guide cigars directly")
        index = get_bwa_index(reference_fasta, workdir)

        def guide_fn(twod_fasta, _name):
            cigar, _strand = exonerated_bwa(index, twod_fasta)
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
