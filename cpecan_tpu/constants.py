"""Global constants of the cPecan-TPU framework.

Parity sources (reference: jeizenga/cPecan):
  - PAIR_ALIGNMENT_PROB_1: inc/pairwiseAligner.h:27
  - LOG_ZERO:              inc/pairwiseAligner.h:192
  - KMER_LENGTH/NUM_OF_KMERS: inc/emissionMatrix.h:4-6
  - SYMBOL_NUMBER/MODEL_PARAMS: inc/stateMachine.h:14-16
  - NB_EVENT_PARAMS:       inc/nanopore.h:4
"""

# Integer fixed-point scale: probability 1.0 == 10^7.
PAIR_ALIGNMENT_PROB_1 = 10_000_000

LOG_ZERO = float("-inf")

KMER_LENGTH = 6
NUM_OF_KMERS = 4096  # 4**6
# Sentinel index returned by the reference for 'N'/unknown symbols
# (impl/stateMachine.c:116 returns NUM_OF_KMERS + 1).
N_SENTINEL = NUM_OF_KMERS + 1

SYMBOL_NUMBER = 5
SYMBOL_NUMBER_NO_N = 4

# Pore model: level_mean, level_sd, noise_mean, noise_sd, noise_lambda per kmer.
MODEL_PARAMS = 5
# Event: mean, stdev, duration.
NB_EVENT_PARAMS = 3

# State indices shared by the 3/4/5-state machines (inc/stateMachine.h:30-32).
MATCH = 0
SHORT_GAP_X = 1
SHORT_GAP_Y = 2
LONG_GAP_X = 3
LONG_GAP_Y = 4

# Echelon states (impl/stateMachine.c:1165-1167).
MATCH0, MATCH1, MATCH2, MATCH3, MATCH4, MATCH5, GAP_X = 0, 1, 2, 3, 4, 5, 6

# Strands (inc/stateMachine.h:34-37).
TEMPLATE = 0
COMPLEMENT = 1
