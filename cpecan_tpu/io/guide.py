"""Guide-alignment utilities: bwa wrapper, SAM->exonerate cigar conversion,
and target-region filtering.

Equivalents of the reference's nanoporeLib helpers:
  - parse_cigar            (scripts/nanoporeLib.py:166-199)
  - exonerated_bwa         (scripts/nanoporeLib.py:202-235)
  - TargetRegions          (scripts/nanoporeLib.py:246-270)
  - get_bwa_index          (scripts/nanoporeLib.py:47-51)
  - make_temp_sequence     (scripts/nanoporeLib.py:155-163)
  - get_proceding_kmers    (scripts/nanoporeLib.py:238-243)

The reference splits bwa's whole SAM output on tabs and indexes into it
(scripts/nanoporeLib.py:207-226); here the SAM record is parsed properly
(header lines skipped, fields by position within the first alignment line)
while producing the same exonerate-format guide cigar line.
"""

import os
import re
import shutil
import subprocess
import sys

import numpy as np

from .fasta import read_fasta_file, reverse_complement

_CIGAR_OP = re.compile(r"([0-9]+)([MIDNSHPX=])")


def bwa_available():
    return shutil.which("bwa") is not None


def parse_cigar(cigar_string, ref_start):
    """SAM cigar + 1-based ref pos -> (query_start, query_end,
    reference_start, reference_end, exonerate-op string).  Soft/hard clips
    become the query offset; only M/I/D ops are kept
    (scripts/nanoporeLib.py:166-199)."""
    ops = _CIGAR_OP.findall(cigar_string)
    clipping = {"S", "H"}
    keep = {"M", "I", "D"}
    query_start = 0
    past_start = False
    query_end = 0
    reference_start = ref_start - 1  # fence-post adjustment
    reference_end = 0
    exonerated = " ".join(f"{op} {int(length)}" for length, op in ops
                          if op in keep)
    for length, op in ops:
        if op in clipping and not past_start:
            query_start += int(length)
        if op in ("M", "D"):
            reference_end += int(length)
            past_start = True
        if op in ("M", "I"):
            query_end += int(length)
            past_start = True
    return (query_start, query_end + query_start, reference_start,
            reference_end + reference_start, exonerated)


def sam_to_guide_cigar(sam_text, target_regions=None):
    """First alignment record of a SAM -> (exonerate cigar line, strand) or
    (False, False) when unmapped/filtered — the contract of exonerated_bwa
    (scripts/nanoporeLib.py:210-235)."""
    record = None
    for line in sam_text.splitlines():
        if line and not line.startswith("@"):
            record = line.split("\t")
            break
    if record is None or len(record) < 11:
        return False, False
    qname, flag, rname, pos, _mapq, cigar = record[:6]
    flag = int(flag)
    if cigar == "*" or rname == "*":
        return False, False
    q_start, q_end, r_start, r_end, ops = parse_cigar(cigar, int(pos))
    if flag == 16:
        strand = "-"
        r_start, r_end = r_end, r_start
    elif flag == 0:
        strand = "+"
    else:
        print("unknown alignment flag, exiting", file=sys.stderr)
        return False, False
    if target_regions is not None:
        lo, hi = (r_start, r_end) if strand == "+" else (r_end, r_start)
        if not target_regions.check_aligned_region(lo, hi):
            return False, False
    guide = (f"cigar: {qname} {q_start} {q_end} + {rname} {r_start} "
             f"{r_end} {strand} 1 {ops}")
    return guide, strand


def exonerated_bwa(bwa_index, query_fasta, target_regions=None):
    """Run `bwa mem -x ont2d` and convert the alignment to an exonerate
    guide cigar (scripts/nanoporeLib.py:202-235).  Requires the bwa binary
    on PATH."""
    if not bwa_available():
        raise RuntimeError("bwa binary not found on PATH; supply a guide "
                           "cigar directly or install bwa")
    sam = subprocess.check_output(
        ["bwa", "mem", "-x", "ont2d", bwa_index, query_fasta],
        stderr=subprocess.DEVNULL).decode()
    return sam_to_guide_cigar(sam, target_regions)


def exonerated_lastz(reference_fasta, query_fasta, target_regions=None):
    """Guide alignment via the vendored lastz: same (guide cigar, strand)
    contract as exonerated_bwa.  Fallback for hosts without a bwa binary —
    lastz already ships with the framework for anchoring (ops/blast.py),
    and its exonerate cigar output needs no SAM round-trip.  Returns
    (False, False) when nothing aligns or the region filter rejects it."""
    from ..ops.blast import LASTZ_ARGS, find_lastz

    lastz = find_lastz()
    if lastz is None:
        raise RuntimeError("vendored lastz binary not found")
    res = subprocess.run([lastz] + LASTZ_ARGS
                         + [reference_fasta, query_fasta],
                         capture_output=True, text=True, check=True)
    lines = [l for l in res.stdout.splitlines() if l.startswith("cigar:")]
    if not lines:
        return False, False
    # lastz emits target (reference) first; keep the best-scoring line
    # (they arrive score-sorted) and normalize to the bwa wrapper's
    # guide orientation contract
    f = lines[0].split()
    qname, q_start, q_end, _q_strand = f[1], int(f[2]), int(f[3]), f[4]
    rname, r_start, r_end, r_strand = f[5], int(f[6]), int(f[7]), f[8]
    ops = " ".join(f[10:])
    strand = r_strand
    if target_regions is not None:
        lo, hi = sorted((r_start, r_end))
        if not target_regions.check_aligned_region(lo, hi):
            return False, False
    guide = (f"cigar: {qname} {q_start} {q_end} + {rname} {r_start} "
             f"{r_end} {strand} 1 {ops}")
    return guide, strand


def get_bwa_index(reference, dest_dir):
    """`bwa index` into dest_dir, returning the index prefix
    (scripts/nanoporeLib.py:47-51, Bwa.build_index :282-289)."""
    if not bwa_available():
        raise RuntimeError("bwa binary not found on PATH")
    prefix = os.path.join(dest_dir, "temp_bwaIndex")
    subprocess.check_call(["bwa", "index", "-p", prefix, reference],
                          stderr=subprocess.DEVNULL)
    return prefix


def make_temp_sequence(fasta_path, forward, destination):
    """First fasta record -> bare one-line sequence file, reverse-complement
    when forward=False (scripts/nanoporeLib.py:155-163)."""
    for _name, seq in read_fasta_file(fasta_path):
        if not forward:
            seq = reverse_complement(seq)
        with open(destination, "w") as fh:
            print(seq, file=fh)
        return destination
    raise ValueError(f"no sequences in {fasta_path}")


def get_proceding_kmers(kmer, alphabet="ACGT"):
    """All kmers whose suffix overlaps this kmer's prefix by k-1
    (scripts/nanoporeLib.py:238-243)."""
    suffix = kmer[1:]
    return [n + suffix for n in alphabet]


class TargetRegions:
    """Keep only reads whose guide alignment contains one of the given
    [start, end] reference intervals (scripts/nanoporeLib.py:246-270)."""

    def __init__(self, tsv, already_sorted=False):
        if os.stat(tsv).st_size == 0:
            raise ValueError("Empty regions file")
        arr = np.loadtxt(tsv, usecols=(0, 1), dtype=np.int32)
        if arr.ndim == 1:
            arr = arr[None, :]
        if not already_sorted:
            arr = np.sort(arr, axis=1)
        self.region_array = arr

    def check_aligned_region(self, left, right):
        if right < left:
            left, right = right, left
        return bool(np.any((self.region_array[:, 0] >= left)
                           & (self.region_array[:, 1] <= right)))
