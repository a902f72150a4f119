"""Band geometry (host-side, numpy).

Anti-diagonal coordinate system of the reference DP core
(impl/pairwiseAligner.c:35-227):

    xay = x + y   (anti-diagonal index, 0 .. lX+lY)
    xmy = x - y   (position along an anti-diagonal)

Cells exist only where (xay + xmy) is even; the x/y coordinates are
x = (xay+xmy)/2, y = (xay-xmy)/2.  A *Band* assigns every anti-diagonal an
[xmyL, xmyR] interval derived from a monotone chain of anchor pairs expanded
by ``expansion`` diagonals (band_construct, impl/pairwiseAligner.c:131-184).

The TPU engine indexes the cells of a diagonal by their absolute
x-coordinate: diagonal ``d`` holds cells x in [x_lo[d], x_hi[d]], stored at
slot ``x - x_lo[d]`` of a fixed-width buffer.  In this layout the wavefront
recursion has *static* slot offsets between consecutive diagonals (modulo a
per-diagonal scalar shift), which is what makes it map cleanly onto
``lax.scan``/Pallas.
"""

from dataclasses import dataclass

import numpy as np


def diagonal_width(xmy_l, xmy_r):
    """Number of cells on a diagonal (impl/pairwiseAligner.c:62-64)."""
    return (xmy_r - xmy_l) // 2 + 1


def _avoid_off_by_one(xay, xmy):
    # impl/pairwiseAligner.c:97-99
    return xmy if (xay + xmy) % 2 == 0 else xmy + 1


def _set_current_diagonal(xay, x_l, y_l, x_u, y_u):
    # impl/pairwiseAligner.c:107-125
    xmy_l = x_l - y_l
    xmy_r = x_u - y_u
    xmy_l = _avoid_off_by_one(xay, xmy_l)
    xmy_r = _avoid_off_by_one(xay, xmy_r)

    # Bound the xmy coordinates by the band boundaries
    # (band_setCurrentDiagonalP, impl/pairwiseAligner.c:101-105).
    def bound(xmy, i, j, k):
        if i < j:
            xmy += 2 * (j - i) * k
        return xmy

    xmy_l = bound(xmy_l, (xay + xmy_l) // 2, x_l, 1)
    xmy_l = bound(xmy_l, y_l, (xay - xmy_l) // 2, 1)
    xmy_r = bound(xmy_r, x_u, (xay + xmy_r) // 2, -1)
    xmy_r = bound(xmy_r, (xay - xmy_r) // 2, y_u, -1)
    if (xay + xmy_l) % 2 != 0 or (xay + xmy_r) % 2 != 0 or xmy_l > xmy_r:
        raise ValueError(
            f"invalid diagonal: xay {xay} xmyL {xmy_l} xmyR {xmy_r}")
    return xmy_l, xmy_r


def _bound_coordinate(z, l_z):
    return 0 if z < 0 else (l_z if z > l_z else z)


def band_construct(anchor_pairs, l_x, l_y, expansion):
    """Port of band_construct (impl/pairwiseAligner.c:131-184).

    anchor_pairs: sequence of (x, y) *sequence* coordinates (0-based, strictly
    increasing in both).  Returns (xmy_l, xmy_r) int64 arrays of length
    lX+lY+1.
    """
    assert l_x >= 0 and l_y >= 0
    assert expansion % 2 == 0
    n = l_x + l_y
    xmy_ls = np.empty(n + 1, dtype=np.int64)
    xmy_rs = np.empty(n + 1, dtype=np.int64)

    anchor_idx = 0
    xay = 0
    pxay = pxmy = 0
    nxay = nxmy = 0
    x_l = y_l = x_u = y_u = 0

    while xay <= n:
        xmy_ls[xay], xmy_rs[xay] = _set_current_diagonal(xay, x_l, y_l, x_u, y_u)
        cur = xay
        xay += 1
        if nxay == cur:
            pxay, pxmy = nxay, nxmy
            x, y = l_x, l_y
            if anchor_idx < len(anchor_pairs):
                ax, ay = anchor_pairs[anchor_idx]
                anchor_idx += 1
                # Matrix coordinates are +1 the sequence ones
                # (impl/pairwiseAligner.c:160-161).
                x, y = ax + 1, ay + 1
                assert x > (pxay + pxmy) // 2 and y > (pxay - pxmy) // 2
                assert 0 < x <= l_x and 0 < y <= l_y
            nxay = x + y
            nxmy = x - y
            x_l = _bound_coordinate((pxay + (pxmy - expansion)) // 2, l_x)
            y_l = _bound_coordinate((nxay - (nxmy - expansion)) // 2, l_y)
            x_u = _bound_coordinate((nxay + (nxmy + expansion)) // 2, l_x)
            y_u = _bound_coordinate((pxay - (pxmy + expansion)) // 2, l_y)
    return xmy_ls, xmy_rs


@dataclass
class BandGeometry:
    """x-indexed band layout for the scan engine."""

    l_x: int
    l_y: int
    xmy_l: np.ndarray  # [nDiag+1]
    xmy_r: np.ndarray  # [nDiag+1]
    x_lo: np.ndarray   # [nDiag+1] lowest x-coordinate in band at each diagonal
    width: np.ndarray  # [nDiag+1] number of cells on each diagonal

    @property
    def n_diag(self):
        return self.l_x + self.l_y

    @property
    def max_width(self):
        return int(self.width.max())


def make_band(anchor_pairs, l_x, l_y, expansion):
    xmy_l, xmy_r = band_construct(anchor_pairs, l_x, l_y, expansion)
    d = np.arange(l_x + l_y + 1, dtype=np.int64)
    x_lo = (d + xmy_l) // 2
    width = (xmy_r - xmy_l) // 2 + 1
    return BandGeometry(l_x, l_y, xmy_l, xmy_r, x_lo, width)


def full_band(l_x, l_y):
    """Band covering the full matrix (getAlignedPairsWithoutBanding uses an
    anchor-less band with expansion 2, impl/pairwiseAligner.c:1581)."""
    return make_band([], l_x, l_y, 2)


@dataclass
class TracebackSchedule:
    """Per-diagonal control arrays encoding the reference's windowed
    traceback (getPosteriorProbsWithBanding, impl/pairwiseAligner.c:955-1045).

    All arrays have length nDiag+1 and are indexed by xay.

    is_top[d]        — d is the top diagonal of a traceback window: after the
                       backward scan emits diagonal d it resets its carry to
                       the end-state initialisation (the reference initialises
                       the backward matrix there, :972).
    init_before[d]   — the backward value *emitted* for d is the end-state
                       initialisation itself (true only at the final
                       diagonal, where the reference extracts posteriors from
                       the initialised diagonal).
    refresh_total[d] — recompute the running total probability at d
                       (every 10th posterior calculation per window, :1005).
    emit[d]          — extract posteriors / accumulate expectations at d.
    ragged_top[d]    — the end-state initialisation at this top uses
                       raggedEndStateProb instead of endStateProb.
    """

    is_top: np.ndarray
    init_before: np.ndarray
    refresh_total: np.ndarray
    emit: np.ndarray
    ragged_top: np.ndarray


def traceback_schedule(band: BandGeometry, *, min_diags_between_traceback,
                       traceback_diagonals, diagonal_expansion,
                       ragged_right_end=False):
    """Reproduce the traceback-window decisions of the banded driver.

    The decisions depend only on band geometry and parameters, never on the
    DP values, so they can be computed on the host up front.
    """
    n = band.n_diag
    is_top = np.zeros(n + 1, dtype=bool)
    init_before = np.zeros(n + 1, dtype=bool)
    refresh = np.zeros(n + 1, dtype=bool)
    emit = np.zeros(n + 1, dtype=bool)
    ragged_top = np.zeros(n + 1, dtype=bool)

    if n == 0:
        return TracebackSchedule(is_top, init_before, refresh, emit, ragged_top)

    traced_back_to = 0
    for d in range(1, n + 1):
        at_end = d == n
        tb_point = (d >= traced_back_to + min_diags_between_traceback
                    and band.width[d] <= diagonal_expansion * 2 + 1)
        if at_end or tb_point:
            is_top[d] = True
            if at_end:
                init_before[d] = True
                ragged_top[d] = ragged_right_end
            traced_back_from = d - (0 if at_end else traceback_diagonals + 1)
            # Walk goes from d down to traced_back_to+1; posterior calcs
            # happen for diagonals <= traced_back_from, counting from 0 and
            # refreshing the total every 10 calcs (:1005).
            count = 0
            for d2 in range(d, traced_back_to, -1):
                if d2 <= traced_back_from:
                    emit[d2] = True
                    if count % 10 == 0:
                        refresh[d2] = True
                    count += 1
            traced_back_to = traced_back_from
    return TracebackSchedule(is_top, init_before, refresh, emit, ragged_top)


def unbanded_schedule(band: BandGeometry, ragged_right_end=False):
    """Schedule matching getAlignedPairsWithoutBanding
    (impl/pairwiseAligner.c:1561-1618): single global backward pass, one
    total probability computed at the final diagonal, posteriors for every
    diagonal."""
    n = band.n_diag
    is_top = np.zeros(n + 1, dtype=bool)
    init_before = np.zeros(n + 1, dtype=bool)
    refresh = np.zeros(n + 1, dtype=bool)
    emit = np.ones(n + 1, dtype=bool)
    emit[0] = False  # posterior loop runs i=1..nDiag; x>0,y>0 masks d=0 anyway
    ragged_top = np.zeros(n + 1, dtype=bool)
    is_top[n] = True
    init_before[n] = True
    refresh[n] = True
    ragged_top[n] = ragged_right_end
    return TracebackSchedule(is_top, init_before, refresh, emit, ragged_top)
