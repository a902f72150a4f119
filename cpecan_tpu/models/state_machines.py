"""Pair-HMM state machines, TPU-native formulation.

The reference expresses each state machine as a per-cell C callback firing a
fan of `doTransition` calls (impl/stateMachine.c:830-1510).  Here each machine
is a *declarative* object:

  * a static, ordered list of (from, to) transitions per source direction
    ("lower" = consumes an X element, "middle" = consumes both, "upper" =
    consumes a Y element), in exactly the reference's call order so that the
    strict engine can reproduce its floating-point fold order;
  * a ``weights_fn(d, base) -> {dir: (w_0[W], w_1[W], ...)}`` closure giving
    each transition's per-cell log-weight (emission + transition) along band
    diagonal ``d`` whose lowest x-coordinate is ``base``.

All per-position features (kmer indices, model params, event params) are
precomputed as padded device arrays so that ``weights_fn`` is just a couple
of dynamic slices + elementwise math — the natural shape for `lax.scan` and
Pallas.

Reference constructors mirrored here:
  StateMachine5   impl/stateMachine.c:902-959   (fiveState DNA)
  StateMachine3   impl/stateMachine.c:1513-1561 (threeState; nucleotide or
                                                 nanopore strawman defaults)
  StateMachine4   impl/stateMachine.c:961-1040  (fourState signal)
  SM3Vanilla      impl/stateMachine.c:1610-1650 (nanopolish-style)
  SM3-HDP         impl/stateMachine.c:1563-1608
  Echelon         impl/stateMachine.c:1652-1692
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    LOG_ZERO, MATCH, SHORT_GAP_X, SHORT_GAP_Y, LONG_GAP_X, LONG_GAP_Y,
    NUM_OF_KMERS, N_SENTINEL, KMER_LENGTH,
)
from ..io.poremodel import (
    PoreModel, LEVEL_MEAN, LEVEL_SD, NOISE_MEAN, NOISE_SD, NOISE_LAMBDA,
)
from . import kmers
from .emissions import log_gauss_pdf, poisson_posterior_prob

LOG_TENTH = -2.3025850929940455  # log(0.1), impl/stateMachine.c:1557


# ---------------------------------------------------------------------------
# Slicing helpers: per-diagonal views of per-position feature arrays.
# ---------------------------------------------------------------------------

def pad_x_array(arr, W, sentinel):
    """arr[x] is the feature of the X element consumed entering column x
    (i.e. element x-1); arr[0] must already be the sentinel.  Pads the end so
    a dynamic slice of size W starting at any base in [0, lX] is in range."""
    pad = np.full(W, sentinel, dtype=arr.dtype)
    return np.concatenate([arr, pad])


def pad_y_array(arr, W, sentinel):
    """Same for Y features, padded on both sides (slices run backwards)."""
    pad = np.full(W, sentinel, dtype=arr.dtype)
    return np.concatenate([pad, arr, pad])


def slice_x(arr, base, W):
    return jax.lax.dynamic_slice_in_dim(arr, base, W)


def slice_y(arr_padded, d, base, W):
    start = jnp.maximum(d - base + 1, 0)
    return jnp.flip(jax.lax.dynamic_slice_in_dim(arr_padded, start, W))


# ---------------------------------------------------------------------------
# DpProblem: everything the engine needs for one alignment problem.
# ---------------------------------------------------------------------------

@dataclass
class ExpectationSpec:
    kind: str                 # 'discrete' | 'signal3'
    symbol_set_size: int = 0  # for 'discrete' (emission table K)
    n_emission_bins: int = 0  # for 'signal3' (kmer-gap table size)


@dataclass
class DpProblem:
    """One alignment problem, fully described for the scan engine.

    ``feats`` is a pytree of device arrays (per-position features, emission
    tables, transition params); ``weights_fn(feats, d, base)`` is a *pure*
    function of them, so the engine can be jitted once per shape bucket and
    vmapped across a batch of reads by batching ``feats``.
    """

    S: int
    match_state: int
    transitions: dict                       # {'lower'|'middle'|'upper': ((frm,to),...)}
    feats: dict
    weights_fn: Callable                    # (feats, d, base) -> {dir: tuple of [W] arrays}
    start: jnp.ndarray                      # [S]
    end: jnp.ndarray
    ragged_start: jnp.ndarray
    ragged_end: jnp.ndarray
    W: int
    # emission element indices for EM expectation accumulation
    x_elem_idx: jnp.ndarray = None          # padded x array (int32)
    y_elem_idx: jnp.ndarray = None          # padded y array (int32)
    expectation_spec: ExpectationSpec = None
    multi_match_states: int = 0             # echelon: posterior over states match1..5


def _vec(values, dtype):
    return jnp.asarray(np.array(values, dtype=np.float64), dtype=dtype)


# ---------------------------------------------------------------------------
# 5-state DNA machine (fiveState / fiveStateAsymmetric)
# ---------------------------------------------------------------------------

# Default log transition params, impl/stateMachine.c:921-938.
SM5_DEFAULTS = dict(
    match_continue=-0.030064059121770816,
    match_from_short_gap_x=-1.272871422049609,
    match_from_long_gap_x=-5.673280173170473,
    gap_short_open_x=-4.34381910900448,
    gap_short_extend_x=-0.3388262689231553,
    gap_short_switch_to_x=-4.910694825551255,
    gap_long_open_x=-6.30810595366929,
    gap_long_extend_x=-0.003442492794189331,
    gap_long_switch_to_x=-6.30810595366929,
)

# Default DNA emission tables, impl/stateMachine.c:60-82.
EMISSION_MATCH = -2.1149196655034745
EMISSION_TRANSVERSION = -4.5691014376830479
EMISSION_TRANSITION = -3.9833860032220842
EMISSION_GAP = -1.6094379124341003  # log(0.2)
LOG_QUARTER = -1.386294361          # impl/stateMachine.c:159 (N gap prob)
LOG_QUARTER_SQ = -2.772588722       # impl/stateMachine.c:170 (N match prob)


def default_dna_match_table():
    m = np.array([
        [EMISSION_MATCH, EMISSION_TRANSVERSION, EMISSION_TRANSITION, EMISSION_TRANSVERSION],
        [EMISSION_TRANSVERSION, EMISSION_MATCH, EMISSION_TRANSVERSION, EMISSION_TRANSITION],
        [EMISSION_TRANSITION, EMISSION_TRANSVERSION, EMISSION_MATCH, EMISSION_TRANSVERSION],
        [EMISSION_TRANSVERSION, EMISSION_TRANSITION, EMISSION_TRANSVERSION, EMISSION_MATCH],
    ])
    return m


def _extend_tables_with_n(match4, gapx4, gapy4):
    """Row/col 4 holds the reference's N fallback values
    (impl/stateMachine.c:155-173)."""
    match5 = np.full((5, 5), LOG_QUARTER_SQ)
    match5[:4, :4] = match4
    gapx5 = np.concatenate([gapx4, [LOG_QUARTER]])
    gapy5 = np.concatenate([gapy4, [LOG_QUARTER]])
    return match5, gapx5, gapy5


class StateMachine5:
    """Classic 5-state affine-gap DNA pair-HMM."""

    S = 5
    match_state = MATCH
    # Transition fan in the reference's call order (impl/stateMachine.c:830-866).
    transitions = {
        "lower": ((MATCH, SHORT_GAP_X), (SHORT_GAP_X, SHORT_GAP_X),
                  (MATCH, LONG_GAP_X), (LONG_GAP_X, LONG_GAP_X)),
        "middle": ((MATCH, MATCH), (SHORT_GAP_X, MATCH), (SHORT_GAP_Y, MATCH),
                   (LONG_GAP_X, MATCH), (LONG_GAP_Y, MATCH)),
        "upper": ((MATCH, SHORT_GAP_Y), (SHORT_GAP_Y, SHORT_GAP_Y),
                  (MATCH, LONG_GAP_Y), (LONG_GAP_Y, LONG_GAP_Y)),
    }

    def __init__(self, params=None, match_table=None, gap_x_table=None,
                 gap_y_table=None):
        p = dict(SM5_DEFAULTS) if params is None else dict(params)
        # Symmetric by construction unless overridden (impl/stateMachine.c:930-938).
        for k in list(p):
            if k.endswith("_x") and k[:-2] + "_y" not in p:
                p[k[:-2] + "_y"] = p[k]
        self.p = p
        self.match_table = default_dna_match_table() if match_table is None else match_table
        self.gap_x_table = np.full(4, EMISSION_GAP) if gap_x_table is None else gap_x_table
        self.gap_y_table = np.full(4, EMISSION_GAP) if gap_y_table is None else gap_y_table

    # start/end vectors: impl/stateMachine.c:744-790
    def start_vec(self):
        return [0.0, LOG_ZERO, LOG_ZERO, LOG_ZERO, LOG_ZERO]

    def ragged_start_vec(self):
        return [LOG_ZERO, LOG_ZERO, LOG_ZERO, 0.0, 0.0]

    def end_vec(self):
        p = self.p
        return [p["match_continue"], p["match_from_short_gap_x"],
                p["match_from_short_gap_y"], p["match_from_long_gap_x"],
                p["match_from_long_gap_y"]]

    def ragged_end_vec(self):
        p = self.p
        return [p["gap_long_open_x"], p["gap_long_open_x"], p["gap_long_open_y"],
                p["gap_long_extend_x"], p["gap_long_extend_y"]]

    def _tp(self, names):
        return [self.p[n] for n in names]

    def build(self, seq_x: str, seq_y: str, W: int, dtype=jnp.float64) -> DpProblem:
        l_x, l_y = len(seq_x), len(seq_y)
        match5, gapx5, gapy5 = _extend_tables_with_n(
            self.match_table, self.gap_x_table, self.gap_y_table)

        bx = np.minimum(kmers.seq_to_base_indices(seq_x), 4)
        by = np.minimum(kmers.seq_to_base_indices(seq_y), 4)
        fx = pad_x_array(np.concatenate([[4], bx]).astype(np.int32), W, 4)
        fy = pad_y_array(np.concatenate([[4], by]).astype(np.int32), W, 4)

        feats = dict(
            fx=jnp.asarray(fx), fy=jnp.asarray(fy),
            match_t=jnp.asarray(match5, dtype=dtype),
            gapx_t=jnp.asarray(gapx5, dtype=dtype),
            gapy_t=jnp.asarray(gapy5, dtype=dtype),
            tp_lower=_vec(self._tp(["gap_short_open_x", "gap_short_extend_x",
                                    "gap_long_open_x", "gap_long_extend_x"]), dtype),
            tp_middle=_vec(self._tp(["match_continue", "match_from_short_gap_x",
                                     "match_from_short_gap_y", "match_from_long_gap_x",
                                     "match_from_long_gap_y"]), dtype),
            tp_upper=_vec(self._tp(["gap_short_open_y", "gap_short_extend_y",
                                    "gap_long_open_y", "gap_long_extend_y"]), dtype),
        )

        def weights_fn(f, d, base):
            ix = slice_x(f["fx"], base, W)
            iy = slice_y(f["fy"], d, base, W)
            e_gap_x = f["gapx_t"][ix]
            e_match = f["match_t"][ix, iy]
            e_gap_y = f["gapy_t"][iy]
            return {
                "lower": tuple(e_gap_x + f["tp_lower"][i] for i in range(4)),
                "middle": tuple(e_match + f["tp_middle"][i] for i in range(5)),
                "upper": tuple(e_gap_y + f["tp_upper"][i] for i in range(4)),
            }

        xi = jnp.asarray(pad_x_array(np.concatenate([[1000], np.minimum(
            kmers.seq_to_base_indices(seq_x), 1000)]).astype(np.int32), W, 1000))
        yi = jnp.asarray(pad_y_array(np.concatenate([[1000], np.minimum(
            kmers.seq_to_base_indices(seq_y), 1000)]).astype(np.int32), W, 1000))

        return DpProblem(
            S=self.S, match_state=self.match_state, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W, x_elem_idx=xi, y_elem_idx=yi,
            expectation_spec=ExpectationSpec(kind="discrete", symbol_set_size=4),
        )


# ---------------------------------------------------------------------------
# 3-state machines
# ---------------------------------------------------------------------------

# impl/stateMachine.c:1266-1277
SM3_NUCLEOTIDE_DEFAULTS = dict(
    match_continue=-0.030064059121770816,
    match_from_gap_x=-1.272871422049609,
    match_from_gap_y=-1.272871422049609,
    gap_open_x=-4.21256642,
    gap_open_y=-4.21256642,
    gap_extend_x=-0.3388262689231553,
    gap_extend_y=-0.3388262689231553,
    gap_switch_to_x=-4.910694825551255,
    gap_switch_to_y=-4.910694825551255,
)

# impl/stateMachine.c:1279-1290
SM3_NANOPORE_DEFAULTS = dict(
    match_continue=-0.23552123624314988,
    match_from_gap_x=-0.21880828092192281,
    match_from_gap_y=-0.013406326748077823,
    gap_open_x=-1.6269694202638481,
    gap_open_y=-4.3187242127300092,
    gap_extend_x=-1.6269694202638481,
    gap_extend_y=-4.3187242127239411,
    gap_switch_to_x=LOG_ZERO,
    gap_switch_to_y=LOG_ZERO,
)


class _StateMachine3Base:
    S = 3
    match_state = MATCH
    # impl/stateMachine.c:1306-1335
    transitions = {
        "lower": ((MATCH, SHORT_GAP_X), (SHORT_GAP_X, SHORT_GAP_X),
                  (SHORT_GAP_Y, SHORT_GAP_X)),
        "middle": ((MATCH, MATCH), (SHORT_GAP_X, MATCH), (SHORT_GAP_Y, MATCH)),
        "upper": ((MATCH, SHORT_GAP_Y), (SHORT_GAP_Y, SHORT_GAP_Y)),
    }

    def __init__(self, params):
        self.p = dict(params)

    # impl/stateMachine.c:1169-1208
    def start_vec(self):
        return [0.0, LOG_ZERO, LOG_ZERO]

    def ragged_start_vec(self):
        return [LOG_ZERO, 0.0, 0.0]

    def end_vec(self):
        p = self.p
        return [p["match_continue"], p["match_from_gap_x"], p["match_from_gap_y"]]

    def ragged_end_vec(self):
        p = self.p
        return [(p["gap_open_x"] + p["gap_open_y"]) / 2.0,
                p["gap_extend_x"], p["gap_extend_y"]]

    def _tps(self, dtype):
        p = self.p
        return (
            _vec([p["gap_open_x"], p["gap_extend_x"], p["gap_switch_to_x"]], dtype),
            _vec([p["match_continue"], p["match_from_gap_x"], p["match_from_gap_y"]], dtype),
            _vec([p["gap_open_y"], p["gap_extend_y"]], dtype),
        )


class StateMachine3Nucleotide(_StateMachine3Base):
    """threeState DNA machine (symbol emissions)."""

    def __init__(self, params=None, match_table=None, gap_x_table=None,
                 gap_y_table=None):
        super().__init__(params or SM3_NUCLEOTIDE_DEFAULTS)
        self.match_table = default_dna_match_table() if match_table is None else match_table
        self.gap_x_table = np.full(4, EMISSION_GAP) if gap_x_table is None else gap_x_table
        self.gap_y_table = np.full(4, EMISSION_GAP) if gap_y_table is None else gap_y_table

    def build(self, seq_x, seq_y, W, dtype=jnp.float64):
        match5, gapx5, gapy5 = _extend_tables_with_n(
            self.match_table, self.gap_x_table, self.gap_y_table)
        bx = np.minimum(kmers.seq_to_base_indices(seq_x), 4)
        by = np.minimum(kmers.seq_to_base_indices(seq_y), 4)
        tp_l, tp_m, tp_u = self._tps(dtype)
        feats = dict(
            fx=jnp.asarray(pad_x_array(np.concatenate([[4], bx]).astype(np.int32), W, 4)),
            fy=jnp.asarray(pad_y_array(np.concatenate([[4], by]).astype(np.int32), W, 4)),
            match_t=jnp.asarray(match5, dtype=dtype),
            gapx_t=jnp.asarray(gapx5, dtype=dtype),
            gapy_t=jnp.asarray(gapy5, dtype=dtype),
            tp_l=tp_l, tp_m=tp_m, tp_u=tp_u,
        )

        def weights_fn(f, d, base):
            ix = slice_x(f["fx"], base, W)
            iy = slice_y(f["fy"], d, base, W)
            e_gap_x = f["gapx_t"][ix]
            e_match = f["match_t"][ix, iy]
            e_gap_y = f["gapy_t"][iy]
            return {
                "lower": tuple(e_gap_x + f["tp_l"][i] for i in range(3)),
                "middle": tuple(e_match + f["tp_m"][i] for i in range(3)),
                "upper": tuple(e_gap_y + f["tp_u"][i] for i in range(2)),
            }

        return DpProblem(
            S=3, match_state=MATCH, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W,
            expectation_spec=ExpectationSpec(kind="discrete", symbol_set_size=4),
        )


def _signal_model_x_features(model_rows, kx, W):
    """Gather per-x model params (level/noise mean+sd) for kmer index array kx
    (kx[0] is the sentinel for x=0).  Invalid kmers get 0 mean / 0 sd, which
    log_gauss_pdf maps to LOG_ZERO (the reference's guard)."""
    valid = kx <= NUM_OF_KMERS
    safe = np.clip(kx, 0, NUM_OF_KMERS - 1)
    feats = {}
    for name, col in (("lvl_mu", LEVEL_MEAN), ("lvl_sd", LEVEL_SD),
                      ("nz_mu", NOISE_MEAN), ("nz_sd", NOISE_SD)):
        v = np.where(valid, model_rows[safe, col], 0.0)
        feats[name] = jnp.asarray(pad_x_array(v, W, 0.0))
    return feats


class StateMachine3SignalStrawman(_StateMachine3Base):
    """threeState nanopore signal machine ("strawMan",
    getStrawManStateMachine3, impl/stateMachine.c:1775-1785).

    X = reference 6-mers, Y = events.  Match and gap-Y emissions are
    independent Gaussians over (event mean, event noise)
    (emissions_signal_strawManGetKmerEventMatchProb, impl/stateMachine.c:596-630);
    gap-X emission is a per-kmer table initialised to log(0.1)
    (impl/stateMachine.c:1556-1558).
    """

    def __init__(self, model: PoreModel, params=None, gap_x_log_probs=None):
        super().__init__(params or SM3_NANOPORE_DEFAULTS)
        self.model = model
        self.gap_x_log_probs = (np.full(NUM_OF_KMERS, LOG_TENTH)
                                if gap_x_log_probs is None else gap_x_log_probs)

    def build(self, ref_seq: str, events: np.ndarray, W, dtype=jnp.float64):
        l_x = kmers.seq_to_kmer_indices(ref_seq).shape[0]
        kx = np.concatenate([[N_SENTINEL], kmers.seq_to_kmer_indices(ref_seq)])
        mfeat = _signal_model_x_features(self.model.match_model, kx, W)
        gfeat = _signal_model_x_features(self.model.gap_y_model, kx, W)
        valid = kx <= NUM_OF_KMERS
        gapx = np.where(valid, self.gap_x_log_probs[np.clip(kx, 0, NUM_OF_KMERS - 1)],
                        LOG_ZERO)
        gapx = jnp.asarray(pad_x_array(gapx, W, LOG_ZERO), dtype=dtype)

        tp_l, tp_m, tp_u = self._tps(dtype)
        feats = dict(
            m=mfeat, g=gfeat, gapx=gapx,
            ev_mean=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 0]]), W, 0.0)),
            ev_noise=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 1]]), W, 0.0)),
            tp_l=tp_l, tp_m=tp_m, tp_u=tp_u,
        )

        def weights_fn(f, d, base):
            mean = slice_y(f["ev_mean"], d, base, W)
            noise = slice_y(f["ev_noise"], d, base, W)

            def gauss2(mf):
                return (log_gauss_pdf(mean, slice_x(mf["lvl_mu"], base, W),
                                      slice_x(mf["lvl_sd"], base, W))
                        + log_gauss_pdf(noise, slice_x(mf["nz_mu"], base, W),
                                        slice_x(mf["nz_sd"], base, W)))

            e_match = gauss2(f["m"]).astype(dtype)
            e_gap_y = gauss2(f["g"]).astype(dtype)
            e_gap_x = slice_x(f["gapx"], base, W)
            return {
                "lower": tuple(e_gap_x + f["tp_l"][i] for i in range(3)),
                "middle": tuple(e_match + f["tp_m"][i] for i in range(3)),
                "upper": tuple(e_gap_y + f["tp_u"][i] for i in range(2)),
            }

        xi = jnp.asarray(pad_x_array(
            np.minimum(kx, N_SENTINEL).astype(np.int32), W, N_SENTINEL))

        return DpProblem(
            S=3, match_state=MATCH, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W, x_elem_idx=xi,
            expectation_spec=ExpectationSpec(kind="signal3",
                                             n_emission_bins=NUM_OF_KMERS),
        )


# ---------------------------------------------------------------------------
# Input slicing for large-gap splitting
# (sequence_slice* fns, impl/pairwiseAligner.c:287-317)
# ---------------------------------------------------------------------------

def _slice_dna(seq_x, seq_y, x1, x2, y1, y2):
    return seq_x[x1:x2], seq_y[y1:y2]


def _slice_signal(ref_seq, events, x1, x2, y1, y2):
    # Kmer slices keep reading KMER_LENGTH-1 chars past the last element,
    # exactly like the reference's pointer-repointing slice.
    return ref_seq[x1:x2 + KMER_LENGTH - 1], events[y1:y2]


StateMachine5.slice_inputs = staticmethod(_slice_dna)
StateMachine3Nucleotide.slice_inputs = staticmethod(_slice_dna)
StateMachine3SignalStrawman.slice_inputs = staticmethod(_slice_signal)


# ---------------------------------------------------------------------------
# 4-state signal machine (fourState, impl/stateMachine.c:961-1040)
# ---------------------------------------------------------------------------

# Template-read transition defaults (impl/stateMachine.c:996-1012).
SM4_DEFAULTS = dict(
    match_continue=-0.23552123624314988,
    gap_short_open_x=-1.6269694202638481,
    gap_short_open_y=-4.7241893208381773,
    gap_long_open_x=-5.4173365013981227,
    gap_short_extend_x=-1.6269694202638481,
    match_from_short_gap_x=-0.21880828092192281,
    gap_long_extend_x=-0.003442492794189331,
    match_from_long_gap_x=-5.6732801731704612,
    match_from_short_gap_y=-0.013406326748077823,
    gap_short_extend_y=-4.724189320832104,
    gap_long_switch_to_x=-5.4173365013920494,
)


class StateMachine4:
    """4-state signal HMM: match, shortGapX (skip), shortGapY (extra event),
    longGapX.  Emissions identical to the strawman machine
    (getStateMachine4, impl/stateMachine.c:1800-1809)."""

    S = 4
    match_state = MATCH
    # impl/stateMachine.c:868-898
    transitions = {
        "lower": ((MATCH, SHORT_GAP_X), (SHORT_GAP_X, SHORT_GAP_X),
                  (MATCH, LONG_GAP_X), (LONG_GAP_X, LONG_GAP_X),
                  (SHORT_GAP_Y, LONG_GAP_X)),
        "middle": ((MATCH, MATCH), (SHORT_GAP_X, MATCH), (SHORT_GAP_Y, MATCH),
                   (LONG_GAP_X, MATCH)),
        "upper": ((MATCH, SHORT_GAP_Y), (SHORT_GAP_Y, SHORT_GAP_Y)),
    }
    slice_inputs = staticmethod(_slice_signal)

    def __init__(self, model: PoreModel, params=None, gap_x_log_probs=None):
        self.p = dict(params or SM4_DEFAULTS)
        self.model = model
        # stateMachine4_construct leaves EMISSION_GAP_X_PROBS at the zeros
        # from emissions_signal_initEmissionsToZero (impl/stateMachine.c:1037)
        # — unlike SM3, which fills log(0.1) (:1556-1558).
        self.gap_x_log_probs = (np.zeros(NUM_OF_KMERS)
                                if gap_x_log_probs is None else gap_x_log_probs)

    def start_vec(self):
        return [0.0, LOG_ZERO, LOG_ZERO, LOG_ZERO]

    def ragged_start_vec(self):
        # stateMachine4_raggedStartStateProb (impl/stateMachine.c:792-795)
        return [LOG_ZERO, LOG_ZERO, 0.0, 0.0]

    def end_vec(self):
        p = self.p
        return [p["match_continue"], p["match_from_short_gap_x"],
                p["match_from_short_gap_y"], p["match_from_long_gap_x"]]

    def ragged_end_vec(self):
        p = self.p
        return [p["gap_long_open_x"], p["gap_long_open_x"],
                p["gap_long_open_x"], p["gap_long_extend_x"]]

    def build(self, ref_seq, events, W, dtype=jnp.float64):
        p = self.p
        kx = np.concatenate([[N_SENTINEL], kmers.seq_to_kmer_indices(ref_seq)])
        mfeat = _signal_model_x_features(self.model.match_model, kx, W)
        gfeat = _signal_model_x_features(self.model.gap_y_model, kx, W)
        valid = kx <= NUM_OF_KMERS
        gapx = np.where(valid, self.gap_x_log_probs[np.clip(kx, 0, NUM_OF_KMERS - 1)],
                        LOG_ZERO)
        feats = dict(
            m=mfeat, g=gfeat,
            gapx=jnp.asarray(pad_x_array(gapx, W, LOG_ZERO), dtype=dtype),
            ev_mean=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 0]]), W, 0.0)),
            ev_noise=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 1]]), W, 0.0)),
            tp_l=_vec([p["gap_short_open_x"], p["gap_short_extend_x"],
                       p["gap_long_open_x"], p["gap_long_extend_x"],
                       p["gap_long_switch_to_x"]], dtype),
            tp_m=_vec([p["match_continue"], p["match_from_short_gap_x"],
                       p["match_from_short_gap_y"], p["match_from_long_gap_x"]], dtype),
            tp_u=_vec([p["gap_short_open_y"], p["gap_short_extend_y"]], dtype),
        )

        def weights_fn(f, d, base):
            mean = slice_y(f["ev_mean"], d, base, W)
            noise = slice_y(f["ev_noise"], d, base, W)

            def gauss2(mf):
                return (log_gauss_pdf(mean, slice_x(mf["lvl_mu"], base, W),
                                      slice_x(mf["lvl_sd"], base, W))
                        + log_gauss_pdf(noise, slice_x(mf["nz_mu"], base, W),
                                        slice_x(mf["nz_sd"], base, W)))

            e_match = gauss2(f["m"]).astype(dtype)
            e_gap_y = gauss2(f["g"]).astype(dtype)
            e_gap_x = slice_x(f["gapx"], base, W)
            return {
                "lower": tuple(e_gap_x + f["tp_l"][i] for i in range(5)),
                "middle": tuple(e_match + f["tp_m"][i] for i in range(4)),
                "upper": tuple(e_gap_y + f["tp_u"][i] for i in range(2)),
            }

        # EM expectations: the reference wires
        # cell_signal_updateTransAndKmerSkipExpectations into fourState
        # (impl/stateMachine.c:986,1800-1810) — [4,4] transition counts plus
        # per-kmer gap counters on the shortGapX target.
        xi = jnp.asarray(pad_x_array(
            np.minimum(kx, N_SENTINEL).astype(np.int32), W, N_SENTINEL))

        return DpProblem(
            S=4, match_state=MATCH, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W, x_elem_idx=xi,
            expectation_spec=ExpectationSpec(kind="signal3",
                                             n_emission_bins=NUM_OF_KMERS),
        )


# ---------------------------------------------------------------------------
# Vanilla (nanopolish-style) 3-state machine
# (stateMachine3Vanilla, impl/stateMachine.c:1368-1409, 1610-1650)
# ---------------------------------------------------------------------------

def _getkmer2_positions(l_x):
    """sequence_getKmer2 pointer positions per column x
    (impl/pairwiseAligner.c:336-341): index x-1 maps to element x-2 for
    x >= 2, else element 0."""
    x = np.arange(l_x + 1)
    return np.where(x - 1 > 0, x - 2, 0)


def _kmer_idx_at(ref_seq, positions):
    all_idx = kmers.seq_to_kmer_indices(ref_seq, length=len(ref_seq))
    return all_idx[np.clip(positions, 0, len(ref_seq) - 1)]


class StateMachine3Vanilla:
    """Reimplementation of the Nanopolish HMM: per-cell transitions from
    kmer-dependent skip probabilities alpha/beta in 30 |delta-level-mean|
    bins (impl/stateMachine.c:1368-1409)."""

    S = 3
    match_state = MATCH
    transitions = {
        "lower": ((MATCH, SHORT_GAP_X), (SHORT_GAP_X, SHORT_GAP_X)),
        "middle": ((MATCH, MATCH), (SHORT_GAP_X, MATCH), (SHORT_GAP_Y, MATCH)),
        "upper": ((MATCH, SHORT_GAP_Y), (SHORT_GAP_Y, SHORT_GAP_Y)),
    }
    slice_inputs = staticmethod(_slice_signal)

    def __init__(self, model: PoreModel, strand="template", skip_bin_probs=None):
        self.model = model
        # impl/stateMachine.c:1292-1304, 1625-1629
        if strand == "template":
            self.t_m_to_y_not_x = 0.17
            self.t_e_to_e = 0.55
        else:
            self.t_m_to_y_not_x = 0.14
            self.t_e_to_e = 0.49
        # 60-entry table: [0:30] beta, [30:60] alpha; loaded from the pore
        # model's line 2 by default (emissions_signal_loadPoreModel :283-295)
        if skip_bin_probs is None:
            skip_bin_probs = np.concatenate([model.skip_bins, model.skip_bins])
        self.skip_bin_probs = skip_bin_probs
        self.default_end_match_prob = -0.23552123624314988
        self.default_end_from_x_prob = -1.6269694202638481
        self.default_end_from_y_prob = -4.3187242127300092

    def start_vec(self):
        return [0.0, LOG_ZERO, LOG_ZERO]

    def ragged_start_vec(self):
        return [LOG_ZERO, 0.0, 0.0]

    def end_vec(self):
        return [self.default_end_match_prob, self.default_end_from_x_prob,
                self.default_end_from_y_prob]

    def ragged_end_vec(self):
        # impl/stateMachine.c:1210-1222
        return [(self.default_end_from_x_prob + self.default_end_from_y_prob) / 2.0,
                self.default_end_from_x_prob, self.default_end_from_y_prob]

    def x_skip_bins(self, ref_seq):
        """Per-column skip bin: |level_mean(kmer at p+1) - level_mean(kmer at
        p)| binned, where p is the getKmer2 position for column x."""
        from ..io.poremodel import kmer_skip_bin_table
        l_x = max(len(ref_seq) - (KMER_LENGTH - 1), 0)
        pos = _getkmer2_positions(l_x)
        k_prev = _kmer_idx_at(ref_seq, pos)
        k_next = _kmer_idx_at(ref_seq, pos + 1)
        return kmer_skip_bin_table(self.model.match_model, k_prev, k_next)

    def build(self, ref_seq, events, W, dtype=jnp.float64):
        l_x = max(len(ref_seq) - (KMER_LENGTH - 1), 0)
        bins = self.x_skip_bins(ref_seq)
        beta = self.skip_bin_probs[bins]            # a_mx per column
        alpha = self.skip_bin_probs[bins + 30]      # a_xx per column
        a_mx = beta
        a_my = (1.0 - a_mx) * self.t_m_to_y_not_x
        a_mm = 1.0 - a_my - a_mx
        a_yy = self.t_e_to_e
        a_ym = 1.0 - a_yy
        a_xx = alpha
        a_xm = 1.0 - a_xx

        def logs(a):
            with np.errstate(divide="ignore"):
                return np.log(a)

        # match kmer for emissions: getKmer2 pointer + 1 char offset
        # (emissions_signal_getEventMatchProbWithTwoDists, impl/stateMachine.c:500-506)
        pos = _getkmer2_positions(l_x)
        kx = _kmer_idx_at(ref_seq, pos + 1)
        mfeat = _twodists_x_features(self.model.match_model, kx, W)
        gfeat = _twodists_x_features(self.model.gap_y_model, kx, W)

        feats = dict(
            m=mfeat, g=gfeat,
            la_mx=jnp.asarray(pad_x_array(logs(a_mx), W, LOG_ZERO), dtype=dtype),
            la_xx=jnp.asarray(pad_x_array(logs(a_xx), W, LOG_ZERO), dtype=dtype),
            la_mm=jnp.asarray(pad_x_array(logs(a_mm), W, LOG_ZERO), dtype=dtype),
            la_xm=jnp.asarray(pad_x_array(logs(a_xm), W, LOG_ZERO), dtype=dtype),
            la_my=jnp.asarray(pad_x_array(logs(a_my), W, LOG_ZERO), dtype=dtype),
            ev_mean=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 0]]), W, 0.0)),
            ev_noise=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 1]]), W, 0.0)),
            la_ym=jnp.asarray(np.log(a_ym), dtype=dtype),
            la_yy=jnp.asarray(np.log(a_yy), dtype=dtype),
        )

        def weights_fn(f, d, base):
            mean = slice_y(f["ev_mean"], d, base, W)
            noise = slice_y(f["ev_noise"], d, base, W)
            e_match = _twodists_eval(f["m"], base, W, mean, noise).astype(dtype)
            e_gap_y = _twodists_eval(f["g"], base, W, mean, noise).astype(dtype)
            return {
                "lower": (slice_x(f["la_mx"], base, W),
                          slice_x(f["la_xx"], base, W)),
                "middle": (e_match + slice_x(f["la_mm"], base, W),
                           e_match + slice_x(f["la_xm"], base, W),
                           e_match + f["la_ym"]),
                "upper": (e_gap_y + slice_x(f["la_my"], base, W),
                          e_gap_y + f["la_yy"]),
            }

        xi = jnp.asarray(pad_x_array(bins.astype(np.int32), W, 0))

        return DpProblem(
            S=3, match_state=MATCH, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W, x_elem_idx=xi,
            expectation_spec=ExpectationSpec(kind="vanilla"),
        )


def _twodists_x_features(model_rows, kx, W):
    """Per-x params for getEventMatchProbWithTwoDists: Gaussian level +
    inverse-Gaussian noise (impl/stateMachine.c:500-529)."""
    valid = kx <= NUM_OF_KMERS
    safe = np.clip(kx, 0, NUM_OF_KMERS - 1)
    feats = {}
    for name, col in (("lvl_mu", LEVEL_MEAN), ("lvl_sd", LEVEL_SD),
                      ("nz_mu", NOISE_MEAN), ("nz_lambda", NOISE_LAMBDA)):
        v = np.where(valid, model_rows[safe, col], 0.0)
        feats[name] = jnp.asarray(pad_x_array(v, W, 0.0))
    return feats


def _twodists_eval(f, base, W, mean, noise):
    from .emissions import log_inv_gauss_pdf
    level = log_gauss_pdf(mean, slice_x(f["lvl_mu"], base, W),
                          slice_x(f["lvl_sd"], base, W))
    nz = log_inv_gauss_pdf(noise, slice_x(f["nz_mu"], base, W),
                           slice_x(f["nz_lambda"], base, W))
    return level + nz


# ---------------------------------------------------------------------------
# Echelon 7-state machine (multi-kmer-per-event)
# (stateMachineEchelon, impl/stateMachine.c:1411-1459, 1652-1692)
# ---------------------------------------------------------------------------

from ..constants import MATCH0, MATCH1, MATCH2, MATCH3, MATCH4, MATCH5, GAP_X
from ..logmath import log_add as _strict_log_add


def _echelon_transitions():
    lower = tuple((n, GAP_X) for n in range(1, 6)) + ((GAP_X, GAP_X),)
    middle = tuple((frm, n) for n in range(1, 6) for frm in range(6)) \
        + tuple((GAP_X, n) for n in range(1, 6))
    upper = tuple((n, MATCH0) for n in range(1, 6))
    return {"lower": lower, "middle": middle, "upper": upper}


class StateMachineEchelon:
    """7-state multi-kmer-per-event HMM: states match0..match5 + gapX.  An
    event can emit 1..5 kmers (Poisson duration model); match0 is the
    extra-event state (getStateMachineEchelon, impl/stateMachine.c:1823-1833).
    """

    S = 7
    match_state = MATCH1
    transitions = _echelon_transitions()

    def __init__(self, model: PoreModel, skip_bin_probs=None):
        self.model = model
        # pore-model line 2 loaded into bins [0:30]+[30:60]
        # (emissions_signal_loadPoreModel :283-295); getKmerSkipProb reads
        # only [bin] (impl/stateMachine.c:430-472)
        if skip_bin_probs is None:
            skip_bin_probs = np.concatenate([model.skip_bins, model.skip_bins])
        self.skip_bin_probs = skip_bin_probs
        # NOTE: the reference stores these end probs in *probability* space,
        # flagged "todo these aren't log and won't work"
        # (impl/stateMachine.c:1667-1669); we replicate them verbatim.
        self.default_end_match_prob = 0.79015888282447311
        self.default_end_from_x_prob = 0.19652425498269727

    def start_vec(self):
        v = [LOG_ZERO] * 7
        v[MATCH1] = 0.0
        return v

    def ragged_start_vec(self):
        v = [LOG_ZERO] * 7
        v[GAP_X] = 0.0
        return v

    def end_vec(self):
        return [self.default_end_match_prob] * 6 + [self.default_end_from_x_prob]

    ragged_end_vec = end_vec

    @staticmethod
    def slice_inputs(ref_seq, events, x1, x2, y1, y2):
        # echelon kmer reads can run far past the slice into the original
        # buffer (multi-kmer fan + n-padding); keep the full tail.
        return ref_seq[x1:], events[y1:y2]

    def _skip_logs(self, a_mx):
        """Per-column skip transition logs.  Echelon couples alpha to beta
        (a_xx = a_mx, la_xh = la_mh; impl/stateMachine.c:1420-1426)."""
        with np.errstate(divide="ignore"):
            la_mx = np.log(a_mx)
            la_mh = np.log(1.0 - a_mx)
        return la_mx, la_mh, la_mx, la_mh

    def build(self, ref_seq, events, W, dtype=jnp.float64):
        l_x = max(len(ref_seq) - (KMER_LENGTH - 1), 0)
        refp = ref_seq + "n" * 30  # sequence_padSequence (impl/pairwiseAligner.c:282-285)
        from ..io.poremodel import kmer_skip_bin_table
        pos = _getkmer2_positions(l_x)
        k_prev = _kmer_idx_at(refp, pos)
        k_next = _kmer_idx_at(refp, pos + 1)
        bins = kmer_skip_bin_table(self.model.match_model, k_prev, k_next)
        a_mx = self.skip_bin_probs[bins]
        la_mx, la_mh, la_xx, la_xh = self._skip_logs(a_mx)

        # multi-kmer term params: kmer at position p(x)+1+i for i = 0..4
        m_feats = []
        for i in range(5):
            ki = _kmer_idx_at(refp, pos + 1 + i)
            m_feats.append(_twodists_x_features(self.model.match_model, ki, W))
        g_feat = _twodists_x_features(self.model.gap_y_model,
                                      _kmer_idx_at(refp, pos + 1), W)

        # multi-kmer validity: lastBase = chars[p + 6n] must be uppercase
        # (emissions_signal_multipleKmerMatchProb, impl/stateMachine.c:531-550)
        valid_n = {}
        chars = np.frombuffer(refp.encode(), dtype=np.uint8)
        for n in range(1, 6):
            idx = np.clip(pos + 6 * n, 0, len(chars) - 1)
            ok = (pos + 6 * n < len(chars)) & (chars[idx] >= 65) & (chars[idx] <= 90)
            valid_n[n] = ok

        # durations: poisson posterior per event, n = 0..5
        # (emissions_signal_getDurationProb, impl/stateMachine.c:552-555)
        dur = np.concatenate([[0.0], events[:, 2]])
        durs = {}
        for n in range(6):
            c = 0.00332005312085
            l_beta = 0.1397619423751586
            l_f = (0.0, 0.0, 0.69314718056, 1.79175946923, 3.17805383035, 4.78749174278)
            lam = dur / c
            with np.errstate(divide="ignore"):
                b = np.where(lam > 0.0, n * np.log(np.where(lam > 0, lam, 1.0)),
                             0.0 if n == 0 else LOG_ZERO)
            durs[n] = (n + 1) * l_beta + b - l_f[n] - 2.0 * lam

        feats = dict(
            la_mx=jnp.asarray(pad_x_array(la_mx, W, LOG_ZERO), dtype=dtype),
            la_mh=jnp.asarray(pad_x_array(la_mh, W, LOG_ZERO), dtype=dtype),
            la_xx=jnp.asarray(pad_x_array(la_xx, W, LOG_ZERO), dtype=dtype),
            la_xh=jnp.asarray(pad_x_array(la_xh, W, LOG_ZERO), dtype=dtype),
            m=m_feats, g=g_feat,
            valid={n: jnp.asarray(pad_x_array(valid_n[n].astype(np.float64), W, 0.0))
                   for n in range(1, 6)},
            dur={n: jnp.asarray(pad_y_array(durs[n], W, LOG_ZERO), dtype=dtype)
                 for n in range(6)},
            ev_mean=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 0]]), W, 0.0)),
            ev_noise=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 1]]), W, 0.0)),
        )

        def weights_fn(f, d, base):
            mean = slice_y(f["ev_mean"], d, base, W)
            noise = slice_y(f["ev_noise"], d, base, W)
            terms = [_twodists_eval(f["m"][i], base, W, mean, noise)
                     for i in range(5)]
            la_mx_s = slice_x(f["la_mx"], base, W)
            la_mh_s = slice_x(f["la_mh"], base, W)
            la_xx_s = slice_x(f["la_xx"], base, W)
            la_xh_s = slice_x(f["la_xh"], base, W)
            dur_s = {n: slice_y(f["dur"][n], d, base, W) for n in range(6)}

            # multipleKmerMatchProb folds from 0.0 (NOT LOG_ZERO) — a
            # reference quirk preserved bit-for-bit
            # (impl/stateMachine.c:533 `double p = 0.0`).
            e_n = {}
            acc = jnp.zeros((W,), dtype)
            for n in range(1, 6):
                acc = _strict_log_add(acc, terms[n - 1])
                val = slice_x(f["valid"][n], base, W)
                e_n[n] = jnp.where(val > 0.5, acc - np.log(n),
                                   jnp.array(LOG_ZERO, dtype))
            e_scaled = _twodists_eval(f["g"], base, W, mean, noise).astype(dtype)

            # lower: matches -> gapX use la_mx; gapX -> gapX uses la_xx;
            # middle from gapX uses la_xh (echelonB separates these,
            # impl/stateMachine.c:1470-1475; echelon A couples them)
            lower = tuple(la_mx_s for _ in range(5)) + (la_xx_s,)
            middle = tuple(e_n[n] + la_mh_s + dur_s[n]
                           for n in range(1, 6) for _ in range(6)) \
                + tuple(e_n[n] + la_xh_s + dur_s[n] for n in range(1, 6))
            upper = tuple(e_scaled + la_mh_s + dur_s[0] for _ in range(5))
            return {"lower": lower, "middle": middle, "upper": upper}

        return DpProblem(
            S=7, match_state=MATCH1, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W, multi_match_states=5,
        )


class StateMachineEchelonB(StateMachineEchelon):
    """EchelonB variant (stateMachineEchelonB_cellCalculate,
    impl/stateMachine.c:1461-1510; struct inc/stateMachine.h:247-260):
    identical topology/emissions to echelon, but the skip transitions are
    four global scalars (MATCH_TO_SKIP / MATCH_TO_HUB and SKIP_CONTINUE /
    SKIP_TO_HUB) instead of per-kmer skip-bin lookups, decoupling alpha
    (keep skipping) from beta (start skipping).  The reference defines the
    cell calculate and struct but never a constructor; the defaults here
    use the pore model's mean skip-bin probability for both, which
    reproduces echelon A's alpha==beta coupling in expectation.
    """

    def __init__(self, model: PoreModel, match_to_skip=None,
                 skip_continue=None):
        super().__init__(model)
        if match_to_skip is None:
            match_to_skip = float(np.mean(model.skip_bins))
        if skip_continue is None:
            skip_continue = match_to_skip
        self.match_to_skip = float(match_to_skip)
        self.skip_continue = float(skip_continue)

    def _skip_logs(self, a_mx):
        with np.errstate(divide="ignore"):
            la_mx = np.full_like(a_mx, np.log(self.match_to_skip))
            la_mh = np.full_like(a_mx, np.log1p(-self.match_to_skip))
            la_xx = np.full_like(a_mx, np.log(self.skip_continue))
            la_xh = np.full_like(a_mx, np.log1p(-self.skip_continue))
        return la_mx, la_mh, la_xx, la_xh


# ---------------------------------------------------------------------------
# HDP-emission 3-state machine
# (stateMachine3Hdp_construct, impl/stateMachine.c:1563-1608)
# ---------------------------------------------------------------------------

class StateMachine3Hdp(_StateMachine3Base):
    """threeState machine whose match/gap-Y emissions are HDP kmer densities
    evaluated by cubic-spline interpolation of the sampled grid
    (get_nanopore_kmer_density -> grid_spline_interp, impl/hdp.c:2577-2601).

    NOTE: the reference adds the *raw density* where its DP expects a log
    probability (stateMachine3HDP_cellCalculate, impl/stateMachine.c:1353).
    ``log_density=True`` (default) applies log() for a mathematically sound
    alignment; pass False for bug-compatible behaviour.
    """

    slice_inputs = staticmethod(_slice_signal)

    def __init__(self, nhdp, params=None, gap_x_log_probs=None,
                 log_density=True):
        super().__init__(params or SM3_NANOPORE_DEFAULTS)
        self.nhdp = nhdp
        self.log_density = log_density
        self.gap_x_log_probs = (np.full(NUM_OF_KMERS, LOG_TENTH)
                                if gap_x_log_probs is None else gap_x_log_probs)

    def build(self, ref_seq, events, W, dtype=jnp.float64):
        grid, tables, slopes = self.nhdp.density_tables()
        # kmer via sequence_getKmer3 (index < 0 -> first element,
        # impl/pairwiseAligner.c:343-347); effectively position x-1 clamped
        kx = np.concatenate([[N_SENTINEL], kmers.seq_to_kmer_indices(ref_seq)])
        valid = kx <= NUM_OF_KMERS
        safe = np.clip(kx, 0, NUM_OF_KMERS - 1).astype(np.int32)
        gapx = np.where(valid, self.gap_x_log_probs[safe], LOG_ZERO)
        tp_l, tp_m, tp_u = self._tps(dtype)
        feats = dict(
            kx=jnp.asarray(pad_x_array(safe, W, 0)),
            kvalid=jnp.asarray(pad_x_array(valid.astype(np.float64), W, 0.0)),
            gapx=jnp.asarray(pad_x_array(gapx, W, LOG_ZERO), dtype=dtype),
            tables=jnp.asarray(tables, dtype=dtype),
            slopes=jnp.asarray(slopes, dtype=dtype),
            grid0=jnp.asarray(grid[0], dtype=dtype),
            grid_dx=jnp.asarray(grid[1] - grid[0], dtype=dtype),
            grid_last=jnp.asarray(grid[-1], dtype=dtype),
            ev_mean=jnp.asarray(pad_y_array(
                np.concatenate([[0.0], events[:, 0]]), W, 0.0), dtype=dtype),
            tp_l=tp_l, tp_m=tp_m, tp_u=tp_u,
        )
        G = tables.shape[1]
        log_density = self.log_density

        def density(f, kx_s, kv_s, mean):
            # grid_spline_interp on the even grid, vectorized per cell
            i = jnp.clip(((mean - f["grid0"]) / f["grid_dx"]).astype(jnp.int32),
                         0, G - 2)
            y0 = f["tables"][kx_s, i]
            y1 = f["tables"][kx_s, i + 1]
            s0 = f["slopes"][kx_s, i]
            s1 = f["slopes"][kx_s, i + 1]
            dy = y1 - y0
            a = s0 * f["grid_dx"] - dy
            b = dy - s1 * f["grid_dx"]
            t = (mean - (f["grid0"] + i * f["grid_dx"])) / f["grid_dx"]
            u = 1.0 - t
            mid = u * y0 + t * y1 + t * u * (a * u + b * t)
            lo = f["tables"][kx_s, 0] - f["slopes"][kx_s, 0] * (f["grid0"] - mean)
            hi = (f["tables"][kx_s, G - 1]
                  + f["slopes"][kx_s, G - 1] * (mean - f["grid_last"]))
            d = jnp.where(mean <= f["grid0"], lo,
                          jnp.where(mean >= f["grid_last"], hi, mid))
            d = jnp.maximum(d, 0.0)
            if log_density:
                d = jnp.where(d > 0.0, jnp.log(jnp.maximum(d, 1e-300)),
                              LOG_ZERO)
            return jnp.where(kv_s > 0.5, d, LOG_ZERO)

        def weights_fn(f, d, base):
            kx_s = slice_x(f["kx"], base, W)
            kv_s = slice_x(f["kvalid"], base, W)
            mean = slice_y(f["ev_mean"], d, base, W)
            e_match = density(f, kx_s, kv_s, mean)
            e_gap_y = e_match  # getHdpStateMachine3 uses the same density fn
            e_gap_x = slice_x(f["gapx"], base, W)
            return {
                "lower": tuple(e_gap_x + f["tp_l"][i] for i in range(3)),
                "middle": tuple(e_match + f["tp_m"][i] for i in range(3)),
                "upper": tuple(e_gap_y + f["tp_u"][i] for i in range(2)),
            }

        xi = jnp.asarray(pad_x_array(
            np.minimum(kx, N_SENTINEL).astype(np.int32), W, N_SENTINEL))

        return DpProblem(
            S=3, match_state=MATCH, transitions=self.transitions,
            feats=feats, weights_fn=weights_fn,
            start=_vec(self.start_vec(), dtype), end=_vec(self.end_vec(), dtype),
            ragged_start=_vec(self.ragged_start_vec(), dtype),
            ragged_end=_vec(self.ragged_end_vec(), dtype),
            W=W, x_elem_idx=xi,
            expectation_spec=ExpectationSpec(kind="signal3",
                                             n_emission_bins=NUM_OF_KMERS),
        )
