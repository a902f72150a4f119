"""Pairwise comparison of two alignment-output sets.

Equivalent of scripts/summarize_alignments.py (reference): match reads
between two output directories, filter aligned pairs by posterior
threshold, outer-merge on (ref_pos, event_idx, strand), and report the
Jaccard index plus the intersection/unique posterior distributions
(summarize_alignments.py:100-183).
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np
import pandas as pd

_COLS = dict(usecols=(1, 4, 5, 12), header=None,
             names=["ref_pos", "strand", "event_idx", "prob"],
             dtype={"ref_pos": np.int64, "strand": str,
                    "event_idx": np.int64, "prob": np.float64})


def hash_reads_to_paths(path_to_files, forward):
    """Map read name -> tsv path for one orientation
    (summarize_alignments.py:35-47)."""
    suffix = ".forward.tsv" if forward else ".backward.tsv"
    out = {}
    for f in os.listdir(path_to_files):
        full = os.path.join(path_to_files, f)
        if f.endswith(suffix) and os.stat(full).st_size != 0:
            out[f.split("_strand")[0]] = full
    return out


def get_paired_alignments(set1_dir, set2_dir, forward):
    t1 = hash_reads_to_paths(set1_dir, forward)
    t2 = hash_reads_to_paths(set2_dir, forward)
    return [(t1[r], t2[r]) for r in sorted(set(t1) & set(t2))]


def _load(tsv, threshold):
    df = pd.read_table(tsv, **_COLS)
    return df[df.prob >= threshold]


def compare_alignment_sets(set1_dir, set2_dir, threshold=0.01,
                           out_path=None, set1_label="set1",
                           set2_label="set2"):
    """Returns a report dict; when out_path is given, also writes the four
    posterior-distribution pickles the reference writes
    (summarize_alignments.py:177-183)."""
    total_pairs = 0
    total_intersecting = 0
    inter1, inter2, uniq1, uniq2 = [], [], [], []

    for forward in (True, False):
        for x, y in get_paired_alignments(set1_dir, set2_dir, forward):
            d1 = _load(x, threshold)
            d2 = _load(y, threshold)
            union = pd.merge(d1, d2, how="outer",
                             on=["ref_pos", "event_idx", "strand"],
                             indicator=True)
            both = union[union._merge == "both"]
            uniq1.append(union[union._merge == "left_only"]["prob_x"])
            uniq2.append(union[union._merge == "right_only"]["prob_y"])
            inter1.append(both["prob_x"])
            inter2.append(both["prob_y"])
            total_pairs += union.shape[0]
            total_intersecting += both.shape[0]

    def _cat(parts):
        return (pd.concat(parts, ignore_index=True) if parts
                else pd.Series(dtype=np.float64))

    inter1, inter2 = _cat(inter1), _cat(inter2)
    uniq1, uniq2 = _cat(uniq1), _cat(uniq2)
    jaccard = total_intersecting / total_pairs if total_pairs else 0.0
    report = {
        "jaccard": jaccard,
        "intersection": total_intersecting,
        "total_pairs": total_pairs,
        f"{set1_label}_unique": int(uniq1.shape[0]),
        f"{set2_label}_unique": int(uniq2.shape[0]),
        f"{set1_label}_intersection_mean_posterior":
            float(inter1.mean()) if len(inter1) else float("nan"),
        f"{set2_label}_intersection_mean_posterior":
            float(inter2.mean()) if len(inter2) else float("nan"),
    }
    if out_path is not None:
        os.makedirs(out_path, exist_ok=True)
        uniq1.to_pickle(os.path.join(
            out_path, f"{set1_label}_unique_posteriors.pkl"))
        inter1.to_pickle(os.path.join(
            out_path, f"{set1_label}_intersection_posteriors.pkl"))
        uniq2.to_pickle(os.path.join(
            out_path, f"{set2_label}_unique_posteriors.pkl"))
        inter2.to_pickle(os.path.join(
            out_path, f"{set2_label}_intersection_posteriors.pkl"))
    return report


def main(argv=None):
    p = ArgumentParser(prog="cpecan-summarize-alignments",
                       description=__doc__)
    p.add_argument("--set1", "-s1", required=True)
    p.add_argument("--set2", "-s2", required=True)
    p.add_argument("--threshold", "-t", type=float, default=0.2)
    p.add_argument("--out", "-o", default="./")
    p.add_argument("--set1_label", "-s1l", default="set1")
    p.add_argument("--set2_label", "-s2l", default="set2")
    args = p.parse_args(argv)
    report = compare_alignment_sets(
        args.set1, args.set2, threshold=args.threshold, out_path=args.out,
        set1_label=args.set1_label, set2_label=args.set2_label)
    for k, v in report.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
