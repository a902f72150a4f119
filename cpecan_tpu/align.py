"""High-level alignment API.

TPU-native equivalents of the reference entry points:
  getAlignedPairs / getAlignedPairsUsingAnchors  impl/pairwiseAligner.c:1505-1559
  getAlignedPairsWithoutBanding                  impl/pairwiseAligner.c:1561-1618
  getExpectationsUsingAnchors                    impl/pairwiseAligner.c:1620-1640
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .ops.anchors import get_split_points
from .ops.band import (full_band, make_band, traceback_schedule,
                       unbanded_schedule)
from .ops.engine import (backward_pass, extract_aligned_pairs, forward_pass,
                         make_control)


@dataclass
class AlignmentParams:
    """pairwiseAlignmentBandingParameters_construct defaults
    (impl/pairwiseAligner.c:1477-1490)."""

    threshold: float = 0.01
    min_diags_between_traceback: int = 1000
    traceback_diagonals: int = 40
    diagonal_expansion: int = 20
    constraint_diagonal_trim: int = 14
    anchor_matrix_bigger_than_this: int = 500 * 500
    repeat_mask_matrix_bigger_than_this: int = 500 * 500
    split_matrix_bigger_than_this: int = 3000 * 3000
    align_ambiguity_characters: bool = False
    gap_gamma: float = 0.5


def _round_width(w, multiple=8):
    return max(((w + multiple - 1) // multiple) * multiple, multiple)


def _round_bucket(n, granularity=256):
    """Round scan lengths up to a bucket so jit compilations are reused
    across reads/iterations of similar size."""
    return max(((n + granularity - 1) // granularity) * granularity, granularity)


_RUN_CACHE = {}


def _get_runner(problem, key, ragged_left, strict, compute_expectations):
    """Build (or fetch) a jitted engine invocation for this shape bucket.

    The cached callable closes over the *static* structure of the first
    problem seen for the key (transition lists, W, S, weights_fn code) and
    takes every array — feats, state vectors, control arrays — as traced
    arguments, so models/reads with the same shape signature share one
    compilation."""
    import dataclasses

    if key in _RUN_CACHE:
        return _RUN_CACHE[key]

    template = problem

    @jax.jit
    def run(feats, start, end, ragged_start, ragged_end, x_elem_idx,
            y_elem_idx, ctrl_arrays):
        prob = dataclasses.replace(
            template, feats=feats, start=start, end=end,
            ragged_start=ragged_start, ragged_end=ragged_end,
            x_elem_idx=x_elem_idx, y_elem_idx=y_elem_idx)
        from .ops.engine import Control
        ctrl = Control(**ctrl_arrays, n_diag=0)
        all_fwd = forward_pass(prob, ctrl, feats,
                               ragged_left=ragged_left, strict=strict)
        return backward_pass(prob, ctrl, feats, all_fwd, strict=strict,
                             compute_expectations=compute_expectations)

    _RUN_CACHE[key] = run
    return run


def _run_one(sm, x_input, y_input, l_x, l_y, anchors, params, *, banded,
             ragged_left, ragged_right, strict, dtype, compute_expectations):
    if banded:
        band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
        sched = traceback_schedule(
            band,
            min_diags_between_traceback=params.min_diags_between_traceback,
            traceback_diagonals=params.traceback_diagonals,
            diagonal_expansion=params.diagonal_expansion,
            ragged_right_end=ragged_right)
    else:
        band = full_band(l_x, l_y)
        sched = unbanded_schedule(band, ragged_right_end=ragged_right)
    W = _round_width(band.max_width)
    problem = sm.build(x_input, y_input, W, dtype=dtype)
    n_pad = _round_bucket(band.n_diag)
    n_steps_pad = _round_bucket(sched.n_steps)
    ctrl = make_control(band, sched, n_pad=n_pad, n_steps_pad=n_steps_pad)

    key = (type(sm).__name__, W, n_pad, n_steps_pad, str(dtype),
           strict, ragged_left, compute_expectations)
    run = _get_runner(problem, key, ragged_left, strict, compute_expectations)
    ctrl_arrays = dict(base=ctrl.base, width=ctrl.width, step_d=ctrl.step_d,
                       step_seed=ctrl.step_seed, step_emit=ctrl.step_emit,
                       step_refresh=ctrl.step_refresh,
                       step_ragged=ctrl.step_ragged)
    out = dict(run(problem.feats, problem.start, problem.end,
                   problem.ragged_start, problem.ragged_end,
                   problem.x_elem_idx, problem.y_elem_idx, ctrl_arrays))
    out["band"] = band
    out["problem"] = problem
    return out


def get_aligned_pairs_without_banding(sm, x_input, y_input, l_x, l_y,
                                      params=None, *, ragged_left=False,
                                      ragged_right=False, strict=True,
                                      dtype=jnp.float64):
    params = params or AlignmentParams()
    if l_x == 0 or l_y == 0:
        return []  # degenerate matrix: no match cells exist
    out = _run_one(sm, x_input, y_input, l_x, l_y, [], params, banded=False,
                   ragged_left=ragged_left, ragged_right=ragged_right,
                   strict=strict, dtype=dtype, compute_expectations=False)
    return extract_aligned_pairs(out, params.threshold,
                                 multi=bool(out["problem"].multi_match_states))


def get_aligned_pairs_using_anchors(sm, x_input, y_input, l_x, l_y,
                                    anchor_pairs, params=None, *,
                                    ragged_left=False, ragged_right=False,
                                    strict=True, dtype=jnp.float64,
                                    banded=True):
    """Banded alignment with large-gap splitting
    (getPosteriorProbsWithBandingSplittingAlignmentsByLargeGaps,
    impl/pairwiseAligner.c:1405-1471)."""
    params = params or AlignmentParams()
    if l_x == 0 or l_y == 0:
        return []
    split_points = get_split_points(anchor_pairs, l_x, l_y,
                                    params.split_matrix_bigger_than_this,
                                    ragged_left, ragged_right)
    pairs = []
    j = 0
    n_regions = len(split_points)
    for i, (x1, y1, x2, y2) in enumerate(split_points):
        sub_x, sub_y = sm.slice_inputs(x_input, y_input, x1, x2, y1, y2)
        sub_anchors = []
        while j < len(anchor_pairs):
            ax, ay = anchor_pairs[j]
            if ax + ay >= x2 + y2:
                break
            sub_anchors.append((ax - x1, ay - y1))
            j += 1
        out = _run_one(sm, sub_x, sub_y, x2 - x1, y2 - y1, sub_anchors, params,
                       banded=banded,
                       ragged_left=(ragged_left or i > 0),
                       ragged_right=(ragged_right or i < n_regions - 1),
                       strict=strict, dtype=dtype, compute_expectations=False)
        sub_pairs = extract_aligned_pairs(
            out, params.threshold, multi=bool(out["problem"].multi_match_states))
        pairs.extend((s, x + x1, y + y1) for s, x, y in sub_pairs)
    assert j == len(anchor_pairs)
    return pairs


def get_expectations_using_anchors(sm, x_input, y_input, l_x, l_y,
                                   anchor_pairs, params=None, *,
                                   ragged_left=False, ragged_right=False,
                                   strict=True, dtype=jnp.float64,
                                   banded=True):
    """EM E-step over one alignment; returns summed expectation pytree
    (getExpectationsUsingAnchors, impl/pairwiseAligner.c:1620-1640)."""
    params = params or AlignmentParams()
    split_points = get_split_points(anchor_pairs, l_x, l_y,
                                    params.split_matrix_bigger_than_this,
                                    ragged_left, ragged_right)
    total_acc = None
    j = 0
    n_regions = len(split_points)
    for i, (x1, y1, x2, y2) in enumerate(split_points):
        sub_x, sub_y = sm.slice_inputs(x_input, y_input, x1, x2, y1, y2)
        sub_anchors = []
        while j < len(anchor_pairs):
            ax, ay = anchor_pairs[j]
            if ax + ay >= x2 + y2:
                break
            sub_anchors.append((ax - x1, ay - y1))
            j += 1
        out = _run_one(sm, sub_x, sub_y, x2 - x1, y2 - y1, sub_anchors, params,
                       banded=banded,
                       ragged_left=(ragged_left or i > 0),
                       ragged_right=(ragged_right or i < n_regions - 1),
                       strict=strict, dtype=dtype, compute_expectations=True)
        acc = {k: np.asarray(v) for k, v in out["expectations"].items()}
        if total_acc is None:
            total_acc = acc
        else:
            total_acc = {k: total_acc[k] + acc[k] for k in acc}
    return total_acc
