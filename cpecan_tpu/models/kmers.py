"""Base / kmer indexing (host-side, numpy).

Parity with emissions_discrete_getBaseIndex / getKmerIndex
(impl/stateMachine.c:104-153): A,C,G,T -> 0..3 lexicographic; any other
character (N/n) maps to the sentinel NUM_OF_KMERS+1 = 4097, which the signal
emission tables treat as "no model" (level mean/sd 0 -> LOG_ZERO pdf).
"""

import numpy as np

from ..constants import KMER_LENGTH, N_SENTINEL, NUM_OF_KMERS

_BASE_LUT = np.full(256, -1, dtype=np.int64)
for _i, _c in enumerate("ACGT"):
    _BASE_LUT[ord(_c)] = _i


def base_index(ch):
    """emissions_discrete_getBaseIndex (impl/stateMachine.c:104-118)."""
    i = _BASE_LUT[ord(ch)]
    return int(i) if i >= 0 else N_SENTINEL


def seq_to_base_indices(seq):
    """Vectorized base indices for a DNA string; N -> N_SENTINEL."""
    arr = _BASE_LUT[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]
    return np.where(arr >= 0, arr, N_SENTINEL)


def kmer_index(kmer):
    """emissions_discrete_getKmerIndex (impl/stateMachine.c:120-139).

    Lexicographic rank of a KMER_LENGTH-mer; any non-ACGT char makes the
    result exceed NUM_OF_KMERS (treated as invalid downstream).
    """
    if len(kmer) == 0:
        return N_SENTINEL
    axis_length = 4 ** len(kmer)
    l = axis_length // 4
    i = 0
    x = 0
    while l > 1:
        x += l * base_index(kmer[i])
        i += 1
        l //= 4
    x += base_index(kmer[-1])
    return x


def seq_to_kmer_indices(seq, length=None):
    """Kmer index of the 6-mer starting at each position p of ``seq``.

    Positions whose window contains a non-ACGT char (or runs off the end)
    get an index > NUM_OF_KMERS.  ``length`` defaults to len(seq) -
    (KMER_LENGTH-1) (sequence_correctSeqLength for kmer/event sequences,
    impl/pairwiseAligner.c:355-370) but callers may ask for more positions
    (clamped windows are marked invalid).
    """
    base = seq_to_base_indices(seq)
    n = len(seq)
    if length is None:
        length = max(n - (KMER_LENGTH - 1), 0)
    out = np.full(length, N_SENTINEL, dtype=np.int64)
    valid_len = min(length, max(n - (KMER_LENGTH - 1), 0))
    if valid_len > 0:
        windows = np.lib.stride_tricks.sliding_window_view(base[:valid_len + KMER_LENGTH - 1], KMER_LENGTH)
        ok = np.all(windows < 4, axis=1)
        # reference weighting: 4^5,4^4,4^3,4^2,4^1,4^0 (last char weight 1)
        weights = 4 ** np.arange(KMER_LENGTH - 1, -1, -1, dtype=np.int64)
        vals = windows @ weights
        out[:valid_len] = np.where(ok, vals, N_SENTINEL)
    return out


def valid_kmer(idx):
    return (0 <= idx) & (idx <= NUM_OF_KMERS)
