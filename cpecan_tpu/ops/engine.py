"""Banded forward-backward DP engine (lax.scan formulation).

This is the TPU-native replacement for the reference's banded driver
``getPosteriorProbsWithBanding`` (impl/pairwiseAligner.c:919-1055) and the
unbanded variant ``getAlignedPairsWithoutBanding`` (:1561-1618).

Design
------
Each anti-diagonal ``d`` of the banded DP matrix is stored as a fixed-width
buffer of ``W`` cells indexed by ``x - base[d]`` where ``base[d]`` is the
lowest in-band x-coordinate.  In this layout the wavefront dependencies have
*static* slot offsets up to a per-diagonal scalar shift:

    current[x] <- lower  = prev1[x-1]   (diagonal d-1, consumes X element)
                  middle = prev2[x-1]   (diagonal d-2, consumes X and Y)
                  upper  = prev1[x]     (diagonal d-1, consumes Y element)

so the whole forward pass is one ``lax.scan`` whose carry is two diagonal
buffers.  The reference's *windowed traceback* — backward sweeps restarted
from end-state initialisations at band pinch-points, with the running total
probability refreshed every 10 posterior calculations
(impl/pairwiseAligner.c:966-1015) — depends only on band geometry, never on
DP values, so it is precomputed on the host into per-diagonal control flags
(ops/band.py: TracebackSchedule) and the backward pass becomes a second
single ``lax.scan`` with carry resets.  Both scans are jittable and
vmappable across a batch of reads.

Strict mode reproduces the reference's piecewise-polynomial logAdd and its
floating-point fold order exactly, so posterior *decisions* (which pairs
clear the threshold) match the C implementation bit-for-bit in float64.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LOG_ZERO, PAIR_ALIGNMENT_PROB_1, SHORT_GAP_X
from ..logmath import log_add, log_add_exact
from .band import BackwardPlan, BandGeometry

DIRECTIONS = ("lower", "middle", "upper")


@dataclass
class Control:
    """Device control arrays: per-diagonal band geometry for the forward
    pass and a step plan for the (segmented) backward pass."""

    base: jnp.ndarray       # [n_pad+1] lowest in-band x-coordinate per diag
    width: jnp.ndarray      # [n_pad+1] in-band cell count per diag
    # backward step plan, [n_steps_pad] each (steps are descending runs of
    # diagonals, one contiguous segment per traceback window)
    step_d: jnp.ndarray
    step_seed: jnp.ndarray
    step_emit: jnp.ndarray
    step_refresh: jnp.ndarray
    step_ragged: jnp.ndarray
    n_diag: int             # real diagonal count — static


def make_control(band: BandGeometry, plan: BackwardPlan, n_pad=None,
                 n_steps_pad=None):
    n = band.n_diag
    n_pad = n if n_pad is None else n_pad
    assert n_pad >= n
    n_steps = plan.n_steps
    n_steps_pad = n_steps if n_steps_pad is None else n_steps_pad
    assert n_steps_pad >= n_steps

    def pad_diag(a, fill):
        out = np.full(n_pad + 1, fill, dtype=a.dtype)
        out[: n + 1] = a
        return jnp.asarray(out)

    def pad_step(a, fill):
        out = np.full(n_steps_pad, fill, dtype=a.dtype)
        out[:n_steps] = a
        return jnp.asarray(out)

    return Control(
        base=pad_diag(band.x_lo.astype(np.int32), 0),
        width=pad_diag(band.width.astype(np.int32), 0),
        # padding steps re-seed at diagonal 0 with nothing emitted
        step_d=pad_step(plan.d.astype(np.int32), 0),
        step_seed=pad_step(plan.seed, True),
        step_emit=pad_step(plan.emit, False),
        step_refresh=pad_step(plan.refresh, False),
        step_ragged=pad_step(plan.ragged, False),
        n_diag=n,
    )


def _shift_slots(buf, s, W):
    """out[o] = buf[o + s] with LOG_ZERO fill outside [0, W)."""
    s = jnp.clip(s, -W, W)
    if buf.ndim == 1:
        pad = jnp.full((W,), LOG_ZERO, buf.dtype)
        padded = jnp.concatenate([pad, buf, pad])
        return jax.lax.dynamic_slice_in_dim(padded, W + s, W)
    pad = jnp.full((W, buf.shape[1]), LOG_ZERO, buf.dtype)
    padded = jnp.concatenate([pad, buf, pad], axis=0)
    return jax.lax.dynamic_slice(padded, (W + s, jnp.zeros((), jnp.int32)), (W, buf.shape[1]))


def _init_diag(vec, width, W, dtype):
    """In-band cells get per-state ``vec``; others LOG_ZERO
    (dpDiagonal_initialiseValues, impl/pairwiseAligner.c:603-612)."""
    o = jnp.arange(W)
    return jnp.where((o < width)[:, None], vec[None, :].astype(dtype),
                     jnp.array(LOG_ZERO, dtype))


def _cell_dot_strict(a, b, logadd):
    """dpDiagonal_dotProduct (impl/pairwiseAligner.c:614-624): per-cell state
    dot folded in state order, then folded across cells in ascending x.
    -inf padding cells are exact no-ops for the reference logAdd."""
    S = a.shape[1]
    cd = a[:, 0] + b[:, 0]
    for s in range(1, S):
        cd = logadd(cd, a[:, s] + b[:, s])

    def body(i, acc):
        return logadd(acc, cd[i])

    return jax.lax.fori_loop(0, a.shape[0], body, jnp.array(LOG_ZERO, a.dtype))


def _cell_dot_fast(a, b, _logadd):
    v = a + b
    m = jnp.max(v)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(v - m_safe))) + m_safe
    return jnp.where(jnp.isfinite(m), out, LOG_ZERO)


def forward_pass(problem, ctrl: Control, feats, *, ragged_left=False, strict=True):
    """Forward recursion over all diagonals; returns [n_pad+1, W, S]."""
    W, S = problem.W, problem.S
    dtype = problem.start.dtype
    logadd = log_add if strict else log_add_exact
    trans = problem.transitions

    start_vec = problem.ragged_start if ragged_left else problem.start
    init0 = _init_diag(start_vec, ctrl.width[0], W, dtype)

    def step(carry, xs):
        prev1, prev2, base1, base2 = carry
        d, base, width = xs
        w = problem.weights_fn(feats, d, base)
        src = {
            "lower": _shift_slots(prev1, base - 1 - base1, W),
            "middle": _shift_slots(prev2, base - 1 - base2, W),
            "upper": _shift_slots(prev1, base - base1, W),
        }
        acc = jnp.full((W, S), LOG_ZERO, dtype)
        for dirn in DIRECTIONS:
            for (frm, to), wt in zip(trans[dirn], w[dirn]):
                acc = acc.at[:, to].set(
                    logadd(acc[:, to], src[dirn][:, frm] + wt))
        o = jnp.arange(W)
        acc = jnp.where((o < width)[:, None], acc, jnp.array(LOG_ZERO, dtype))
        return (acc, prev1, base, base1), acc

    zero_buf = jnp.full((W, S), LOG_ZERO, dtype)
    n_pad = ctrl.base.shape[0] - 1
    xs = (jnp.arange(1, n_pad + 1, dtype=jnp.int32), ctrl.base[1:], ctrl.width[1:])
    carry0 = (init0, zero_buf, ctrl.base[0], jnp.zeros((), jnp.int32))
    _, out = jax.lax.scan(step, carry0, xs)
    return jnp.concatenate([init0[None], out], axis=0)


def _total_probability(problem, feats, logadd, cell_dot, d, base, base_n1,
                       fwd_d, fwd_dm1, base_dm1, bwd_d, next1):
    """diagonalCalculationTotalProbability (impl/pairwiseAligner.c:763-781):
    dot(fwd[d], bwd[d]) plus the "matches through d" term built by a
    forward-middle step from fwd[d-1] into diagonal d+1's geometry, dotted
    with bwd[d+1] (= next1 carry, LOG_ZERO outside its band)."""
    W, S = problem.W, problem.S
    dtype = fwd_d.dtype
    t0 = cell_dot(fwd_d, bwd_d, logadd)

    w1 = problem.weights_fn(feats, d + 1, base_n1)
    fwd_dm1_in_d1 = _shift_slots(fwd_dm1, base_n1 - 1 - base_dm1, W)
    md = jnp.full((W, S), LOG_ZERO, dtype)
    for (frm, to), wt in zip(problem.transitions["middle"], w1["middle"]):
        md = md.at[:, to].set(logadd(md[:, to], fwd_dm1_in_d1[:, frm] + wt))
    t1 = cell_dot(md, next1, logadd)
    return logadd(t0, t1)


def _expectation_init(problem, dtype):
    spec = problem.expectation_spec
    if spec is None:
        return None
    S = problem.S
    if spec.kind == "vanilla":
        # cell_signal_updateBetaAndAlphaProb (impl/pairwiseAligner.c:493-513):
        # only the 60 skip-bin counters are accumulated.
        return {"skip_bins": jnp.zeros((60,), dtype),
                "likelihood": jnp.zeros((), dtype)}
    acc = {"trans": jnp.zeros((S, S), dtype), "likelihood": jnp.zeros((), dtype)}
    if spec.kind == "discrete":
        K = spec.symbol_set_size
        acc["emis"] = jnp.zeros((S, K, K), dtype)
    elif spec.kind == "signal3":
        # +2 sentinel bins absorb invalid-kmer (zero-probability) updates
        acc["kmer_gap"] = jnp.zeros((spec.n_emission_bins + 2,), dtype)
    return acc


def _accumulate_expectations(problem, feats, acc, d, base, width,
                             fwd_dm1, fwd_dm2, base_dm1, base_dm2,
                             bwd_d, total, emit):
    """cell_updateExpectations / cell_signal_updateTransAndKmerSkipExpectations
    (impl/pairwiseAligner.c:423-459) accumulated over one diagonal
    (diagonalCalculationExpectations, :868-912)."""
    spec = problem.expectation_spec
    W, S = problem.W, problem.S
    dtype = bwd_d.dtype
    w = problem.weights_fn(feats, d, base)
    src = {
        "lower": _shift_slots(fwd_dm1, base - 1 - base_dm1, W),
        "middle": _shift_slots(fwd_dm2, base - 1 - base_dm2, W),
        "upper": _shift_slots(fwd_dm1, base - base_dm1, W),
    }
    o = jnp.arange(W)
    gate = jnp.where(emit, jnp.array(1.0, dtype), jnp.array(0.0, dtype))
    cell_ok = (o < width).astype(dtype) * gate

    x_idx = None
    if problem.x_elem_idx is not None:
        from ..models.state_machines import slice_x
        x_idx = slice_x(problem.x_elem_idx, base, W)
    y_idx = None
    if problem.y_elem_idx is not None:
        from ..models.state_machines import slice_y
        y_idx = slice_y(problem.y_elem_idx, d, base, W)

    if spec.kind == "vanilla":
        # beta: match->shortGapX; alpha: shortGapX->shortGapX, both indexed
        # by the cell's skip bin (x_elem_idx holds the per-column bin).
        for dirn in DIRECTIONS:
            for (frm, to), wt in zip(problem.transitions[dirn], w[dirn]):
                if to != SHORT_GAP_X or frm not in (0, SHORT_GAP_X):
                    continue
                logp = src[dirn][:, frm] + wt + bwd_d[:, to] - total
                p = jnp.exp(logp) * cell_ok
                p = jnp.where(jnp.isfinite(logp), p, 0.0)
                off = 0 if frm == 0 else 30
                acc["skip_bins"] = acc["skip_bins"].at[x_idx + off].add(p)
        acc["likelihood"] = acc["likelihood"] + jnp.where(emit, total, 0.0)
        return acc

    trans_acc = acc["trans"]
    p_by_to = jnp.zeros((W, S), dtype)
    for dirn in DIRECTIONS:
        for (frm, to), wt in zip(problem.transitions[dirn], w[dirn]):
            logp = src[dirn][:, frm] + wt + bwd_d[:, to] - total
            p = jnp.exp(logp) * cell_ok
            p = jnp.where(jnp.isfinite(logp), p, 0.0)
            trans_acc = trans_acc.at[frm, to].add(jnp.sum(p))
            p_by_to = p_by_to.at[:, to].add(p)
            if spec.kind == "signal3" and to == SHORT_GAP_X:
                nb = spec.n_emission_bins
                idx = jnp.clip(x_idx, 0, nb + 1)
                acc["kmer_gap"] = acc["kmer_gap"].at[idx].add(p)

    if spec.kind == "discrete":
        K = spec.symbol_set_size
        ohx = (x_idx[:, None] == jnp.arange(K)[None, :]).astype(dtype)
        ohy = (y_idx[:, None] == jnp.arange(K)[None, :]).astype(dtype)
        acc["emis"] = acc["emis"] + jnp.einsum("os,oa,ob->sab", p_by_to, ohx, ohy)

    acc["trans"] = trans_acc
    acc["likelihood"] = acc["likelihood"] + jnp.where(emit, total, 0.0)
    return acc


def backward_pass(problem, ctrl: Control, feats, all_fwd, *, strict=True,
                  compute_expectations=False):
    """Segmented backward recursion following the step plan.

    Each traceback window is a contiguous descending segment; a seed step
    replaces the recursion with the end-state initialisation (the window
    top), and the carry across segment boundaries is cut off there.

    Returns dict with:
      posteriors [n_steps, W] — match-state posterior per cell (0 outside
                                emitted steps / invalid cells)
      totals     [n_steps]    — in-scope total probability per step
      step_d, step_base       — diagonal / band base per step (for pair
                                extraction)
      expectations            — accumulator pytree (if requested)
    """
    W, S = problem.W, problem.S
    dtype = all_fwd.dtype
    logadd = log_add if strict else log_add_exact
    cell_dot = _cell_dot_strict if strict else _cell_dot_fast
    trans = problem.transitions

    zero_buf = jnp.full((W, S), LOG_ZERO, dtype)

    sd = ctrl.step_d
    step_base = jnp.take(ctrl.base, sd)
    step_width = jnp.take(ctrl.width, sd)
    fwd_d = jnp.take(all_fwd, sd, axis=0)
    fwd_dm1 = jnp.take(all_fwd, jnp.maximum(sd - 1, 0), axis=0)
    fwd_dm1 = jnp.where((sd >= 1)[:, None, None], fwd_dm1, LOG_ZERO)
    fwd_dm2 = jnp.take(all_fwd, jnp.maximum(sd - 2, 0), axis=0)
    fwd_dm2 = jnp.where((sd >= 2)[:, None, None], fwd_dm2, LOG_ZERO)
    base_dm1 = jnp.take(ctrl.base, jnp.maximum(sd - 1, 0))
    base_dm2 = jnp.take(ctrl.base, jnp.maximum(sd - 2, 0))

    xs = dict(
        d=sd, base=step_base, width=step_width,
        seed=ctrl.step_seed, emit=ctrl.step_emit, refresh=ctrl.step_refresh,
        ragged=ctrl.step_ragged,
        fwd_d=fwd_d, fwd_dm1=fwd_dm1, fwd_dm2=fwd_dm2,
        base_dm1=base_dm1, base_dm2=base_dm2,
    )

    exp_acc0 = _expectation_init(problem, dtype) if compute_expectations else None

    def step(carry, x):
        next1, next2, base_n1, base_n2, total, exp_acc = carry
        d, base, width = x["d"], x["base"], x["width"]
        seed = x["seed"]

        # Cut the carry at segment starts: a window's recursion never sees
        # diagonals above its own top.
        next1 = jnp.where(seed, zero_buf, next1)
        next2 = jnp.where(seed, zero_buf, next2)

        # --- recursion: bwd[d] from bwd[d+1] (lower/upper) and bwd[d+2]
        # (middle), folded in the reference's arrival order: middle, upper,
        # lower (diagonalCalculationBackward walk, impl/pairwiseAligner.c:988-997)
        w1 = problem.weights_fn(feats, d + 1, base_n1)
        w2 = problem.weights_fn(feats, d + 2, base_n2)
        acc = jnp.full((W, S), LOG_ZERO, dtype)
        for (frm, to), wt in zip(trans["middle"], w2["middle"]):
            contrib = _shift_slots(wt + next2[:, to], base + 1 - base_n2, W)
            acc = acc.at[:, frm].set(logadd(acc[:, frm], contrib))
        for (frm, to), wt in zip(trans["upper"], w1["upper"]):
            contrib = _shift_slots(wt + next1[:, to], base - base_n1, W)
            acc = acc.at[:, frm].set(logadd(acc[:, frm], contrib))
        for (frm, to), wt in zip(trans["lower"], w1["lower"]):
            contrib = _shift_slots(wt + next1[:, to], base + 1 - base_n1, W)
            acc = acc.at[:, frm].set(logadd(acc[:, frm], contrib))
        o = jnp.arange(W)
        acc = jnp.where((o < width)[:, None], acc, jnp.array(LOG_ZERO, dtype))

        end_vec = jnp.where(x["ragged"], problem.ragged_end, problem.end)
        init_d = _init_diag(end_vec, width, W, dtype)
        bwd_d = jnp.where(seed, init_d, acc)

        # --- total probability refresh (bwd[d+1] = next1; LOG_ZERO at seeds,
        # matching the reference's NULL check at window tops)
        new_total = _total_probability(
            problem, feats, logadd, cell_dot, d, base, base_n1,
            x["fwd_d"], x["fwd_dm1"], x["base_dm1"], bwd_d, next1)
        total = jnp.where(x["refresh"], new_total, total)

        # --- posterior extraction (diagonalCalculationPosteriorMatchProbs,
        # impl/pairwiseAligner.c:783-822; multi-state variant :824-866)
        xcoord = base + o
        ycoord = d - xcoord
        valid = (o < width) & (xcoord > 0) & (ycoord > 0) & x["emit"]
        ms = problem.match_state
        n_post = problem.multi_match_states or 1
        logpost = (x["fwd_d"][:, ms:ms + n_post]
                   + bwd_d[:, ms:ms + n_post] - total)
        post = jnp.where(valid[:, None] & jnp.isfinite(logpost),
                         jnp.exp(logpost), 0.0)

        if exp_acc is not None:
            exp_acc = _accumulate_expectations(
                problem, feats, exp_acc, d, base, width,
                x["fwd_dm1"], x["fwd_dm2"], x["base_dm1"], x["base_dm2"],
                bwd_d, total, x["emit"])

        carry = (bwd_d, next1, base, base_n1, total, exp_acc)
        return carry, (post, total)

    carry0 = (zero_buf, zero_buf, jnp.zeros((), ctrl.base.dtype),
              jnp.zeros((), ctrl.base.dtype), jnp.array(LOG_ZERO, dtype),
              exp_acc0)
    carry, (posts, totals) = jax.lax.scan(step, carry0, xs)

    out = {
        "posteriors": posts,
        "totals": totals,
        "step_d": sd,
        "step_base": step_base,
    }
    if compute_expectations:
        out["expectations"] = carry[5]
    return out


def extract_aligned_pairs(out, threshold, multi=False):
    """Host-side conversion of the per-step posterior tensor into
    (score, x-1, y-1) pairs, matching impl/pairwiseAligner.c:806-813
    (clamp to 1.0, floor of p * PAIR_ALIGNMENT_PROB_1, 0-based coords).

    With ``multi`` (echelon), state match-k contributes k pairs
    (x+n-1, y-1) for n < k (diagonalCalculationMultiPosteriorMatchProbs,
    impl/pairwiseAligner.c:845-856)."""
    posteriors = np.asarray(out["posteriors"])
    step_d = np.asarray(out["step_d"])
    step_base = np.asarray(out["step_base"])
    pairs = []
    s_idx, o_idx, k_idx = np.nonzero(posteriors >= threshold)
    for s, o, k in zip(s_idx, o_idx, k_idx):
        p = min(posteriors[s, o, k], 1.0)
        x = int(step_base[s]) + int(o)
        y = int(step_d[s]) - x
        score = int(np.floor(p * PAIR_ALIGNMENT_PROB_1))
        if multi:
            for n in range(k + 1):
                pairs.append((score, x + n - 1, y - 1))
        else:
            pairs.append((score, x - 1, y - 1))
    return pairs
