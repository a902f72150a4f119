"""signalAlign posterior tsv -> EventAlign-type file.

Equivalent of scripts/process_posteriors.py (reference): the reference
re-opens each read's fast5 to recover event observations and model
expectations for every aligned pair (process_posteriors.py:66-137); our
posterior tsv (cli.signal_align.write_posterior_probs, mirroring
vanillaAlign.c:26-95) already carries all of those columns, so the
conversion is a projection plus filename-derived metadata.

Input tsv columns (0-based):
  0 contig, 1 ref_pos, 2 ref_kmer, 3 read, 4 strand, 5 event_idx,
  6 event_mean, 7 event_noise, 8 event_duration, 9 kmer, 10 E(level),
  11 E(noise), 12 posterior, 13 descaled_mean, 14 descaled E(level)
"""

import os
import sys
from argparse import ArgumentParser

HEADER = ("#F/B\tRefPos\trefKmer\tRead\tstrand\teMean\teNoise\teDuration\t"
          "posterior\tE(Mean)\tE(noise)")


def _split_name(filename):
    """signalAlign tsv names look like <read>.<model>.<orientation>.tsv;
    recover (model, orientation) the way the reference slices the name
    (process_posteriors.py:64-67).  Falls back to '-' fields."""
    parts = os.path.basename(filename).split(".")
    if len(parts) >= 4:
        return parts[-3], parts[-2]
    return "-", "-"


def eventalign_rows(tsv_path, model=None, orientation=None):
    """Yield EventAlign-type rows from one posterior tsv."""
    if model is None or orientation is None:
        model, orientation = _split_name(tsv_path)
    with open(tsv_path) as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            if len(c) < 13:
                continue
            yield (model, orientation, int(c[1]), c[2], c[3], c[4],
                   float(c[6]), float(c[7]), float(c[8]), float(c[12]),
                   float(c[10]), float(c[11]))


def process_posteriors(tsv_dir, out=sys.stdout, log=None):
    """Concatenate all .tsv files in tsv_dir into one EventAlign-type
    stream on `out`."""
    print(HEADER, file=out)
    n = 0
    for f in sorted(os.listdir(tsv_dir)):
        if not f.endswith(".tsv"):
            continue
        if log:
            log(f"Processing: {f}")
        for row in eventalign_rows(os.path.join(tsv_dir, f)):
            print("\t".join(str(v) for v in row), file=out)
            n += 1
    return n


def main(argv=None):
    p = ArgumentParser(prog="cpecan-process-posteriors",
                       description=__doc__)
    p.add_argument("--file_directory", "-d", dest="files_dir", required=True,
                   help="directory with tsv files from signal alignment")
    args = p.parse_args(argv)
    process_posteriors(args.files_dir,
                       log=lambda m: print(m, file=sys.stderr))
    return 0


if __name__ == "__main__":
    sys.exit(main())
