"""Legacy code-generated kmer emission matrices, computed programmatically.

Equivalent of impl/emissionMatrix.c (emissions_kmer_setMatchProbsToDefaults
/ setGapProbsToDefaults — 'not really used anymore' per the reference) and
its generator scripts/emissionMatrixFunctionCodeGen.py: the (|A|^k)^2
match matrix decomposes as the sum of per-position single-base log costs,
so there is nothing to code-generate — build it directly.
"""

from itertools import product

import numpy as np

# single-base log costs (impl/emissionMatrix.c:16-19)
M = -2.1149196655034745   # log(0.12064298095701059)  same base
V = -4.5691014376830479   # log(0.010367271172731285) transversion
S = -3.9833860032220842   # log(0.01862247669752685)  transition
N = -2.772588722          # log(0.25**2)              anything with N

ALPHABET = "ACGTN"
_PURINES = {"A", "G"}
_PYRIMIDINES = {"C", "T"}


def base_cost(a, b):
    if a == "N" or b == "N":
        return N
    if a == b:
        return M
    if ({a, b} <= _PURINES) or ({a, b} <= _PYRIMIDINES):
        return S
    return V


def kmer_match_probs(k=2, alphabet=ALPHABET):
    """[|A|^k, |A|^k] symmetric log match matrix; entry (i, j) is the sum of
    per-position base costs of kmer_i vs kmer_j (kmers in lexicographic
    order over `alphabet`)."""
    n = len(alphabet)
    base = np.array([[base_cost(a, b) for b in alphabet] for a in alphabet])
    out = np.zeros((n ** k, n ** k))
    for pos in range(k):
        stride = n ** (k - 1 - pos)
        idx = (np.arange(n ** k) // stride) % n
        out += base[np.ix_(idx, idx)]
    return out


def kmer_gap_probs(k=2, alphabet=ALPHABET):
    """[|A|^k] uniform log gap vector: k * log(0.2)
    (impl/emissionMatrix.c:57-70)."""
    g = k * np.log(0.2)
    return np.full(len(alphabet) ** k, g)


def kmer_strings(k=2, alphabet=ALPHABET):
    return ["".join(t) for t in product(alphabet, repeat=k)]
