"""kmer-rank verification.

Equivalent of scripts/kmerIndex.py (reference): check that the
lexicographic kmer ranking used by the emission tables is a bijection —
`kmer_index(kmers[i]) == i` for every kmer of length k
(kmerIndex.py:26-58).
"""

import sys
from argparse import ArgumentParser
from itertools import product

from ..models.kmers import kmer_index


def verify_kmer_ranks(k=6, alphabet="ACGT"):
    """Asserts rank(kmer) enumerates kmers in lexicographic order.
    Returns the number of kmers checked."""
    for i, tup in enumerate(product(alphabet, repeat=k)):
        kmer = "".join(tup)
        idx = kmer_index(kmer)
        if idx != i:
            raise AssertionError(f"rank({kmer}) = {idx}, expected {i}")
    return len(alphabet) ** k


def main(argv=None):
    p = ArgumentParser(prog="cpecan-kmer-index", description=__doc__)
    p.add_argument("-k", type=int, default=6)
    args = p.parse_args(argv)
    n = verify_kmer_ranks(args.k)
    print(f"verified {n} kmer ranks (k={args.k})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
