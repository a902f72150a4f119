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
