"""Event-duration collection.

Equivalent of scripts/duration_analysis.py (reference): sample a fraction
of the reads in each input directory and write per-strand event-duration
csv files (duration_analysis.py:12-40).  Works on npRead files (duration
is column 3 of each event triple) and, when h5py is present, on .fast5
files.
"""

import os
import sys
from argparse import ArgumentParser
from glob import glob
from math import floor
from random import Random

from ..io.npread import load_npread


def _npread_durations(path):
    npr = load_npread(path)
    return npr.template_events[:, 2], npr.complement_events[:, 2]


def _fast5_durations(path):
    from ..io.fast5 import Fast5Read
    with Fast5Read(path) as r:
        t, c = r.strands()
        return t.events[:, 3], c.events[:, 3]


def collect_event_durations(directories, destination, fraction=0.25,
                            rng=None, log=lambda m: print(m,
                                                          file=sys.stderr)):
    """Writes template_durations.csv / complement_durations.csv /
    all_durations.csv under `destination`; rows are (duration, strand).
    Returns the number of reads processed."""
    rng = rng or Random(0)
    os.makedirs(destination, exist_ok=True)
    t_fh = open(os.path.join(destination, "template_durations.csv"), "w")
    c_fh = open(os.path.join(destination, "complement_durations.csv"), "w")
    a_fh = open(os.path.join(destination, "all_durations.csv"), "w")
    n_reads = 0
    try:
        for directory in directories:
            files = sorted(glob(os.path.join(directory, "*.fast5"))
                           + glob(os.path.join(directory, "*.npRead")))
            k = min(max(1, int(floor(fraction * len(files)))), len(files))
            log(f"Found {len(files)} in folder {directory} sampling {k}")
            for f in rng.sample(files, k):
                try:
                    if f.endswith(".fast5"):
                        t_dur, c_dur = _fast5_durations(f)
                    else:
                        t_dur, c_dur = _npread_durations(f)
                except Exception as exc:  # skip unreadable reads, keep going
                    log(f"skipping {f}: {exc}")
                    continue
                n_reads += 1
                for d in t_dur:
                    print(f"{d},t", file=t_fh)
                    print(f"{d},t", file=a_fh)
                for d in c_dur:
                    print(f"{d},c", file=c_fh)
                    print(f"{d},c", file=a_fh)
    finally:
        t_fh.close()
        c_fh.close()
        a_fh.close()
    return n_reads


def main(argv=None):
    p = ArgumentParser(prog="cpecan-duration-analysis", description=__doc__)
    p.add_argument("directories", nargs="+",
                   help="read directories, then the destination directory")
    p.add_argument("--fraction", type=float, default=0.25)
    args = p.parse_args(argv)
    if len(args.directories) < 2:
        p.error("need at least one source directory and a destination")
    collect_event_durations(args.directories[:-1], args.directories[-1],
                            fraction=args.fraction)
    return 0


if __name__ == "__main__":
    sys.exit(main())
