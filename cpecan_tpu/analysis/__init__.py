"""Post-processing / analysis tools over alignment outputs.

Equivalents of the reference's scripts/ post-processing set:
process_posteriors.py (EventAlign-type export), summarize_alignments.py
(pairwise alignment-set comparison), duration_analysis.py (event-duration
collection), kmerIndex.py (kmer-rank verification).
"""

from .eventalign import process_posteriors  # noqa: F401
from .compare import compare_alignment_sets  # noqa: F401
from .durations import collect_event_durations  # noqa: F401
from .kmer_rank import verify_kmer_ranks  # noqa: F401
