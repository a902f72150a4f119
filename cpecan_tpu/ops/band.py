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


def _band_construct_loop(anchor_pairs, l_x, l_y, expansion):
    """Direct per-diagonal port of band_construct
    (impl/pairwiseAligner.c:131-184) — the executable reference semantics
    the vectorized band_construct below is tested against.

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


def band_construct(anchor_pairs, l_x, l_y, expansion):
    """Vectorized band_construct (impl/pairwiseAligner.c:131-184).

    Between consecutive anchors the four band-corner coordinates are
    constant, so the per-diagonal loop factors into one numpy pass: compute
    corners per anchor segment, np.repeat them over each segment's diagonal
    range, then apply the parity fix and the four sequential coordinate
    bounds (band_setCurrentDiagonal(P), :97-125) as array arithmetic.
    Identical output to _band_construct_loop (asserted in tests).
    """
    assert l_x >= 0 and l_y >= 0
    assert expansion % 2 == 0
    n = l_x + l_y
    # matrix-coordinate waypoints: origin, anchors+1, terminal corner
    ap = np.asarray(anchor_pairs, dtype=np.int64).reshape(-1, 2)
    ax = ap[:, 0] + 1
    ay = ap[:, 1] + 1
    if len(ax):
        if not (np.all(np.diff(ax) > 0) and np.all(np.diff(ay) > 0)
                and ax[0] > 0 and ay[0] > 0 and ax[-1] <= l_x
                and ay[-1] <= l_y):
            raise ValueError("anchors must be strictly increasing and "
                             "in range")
    wx = np.concatenate([[0], ax, [l_x]])
    wy = np.concatenate([[0], ay, [l_y]])
    pxay = wx[:-1] + wy[:-1]      # segment k: previous waypoint
    pxmy = wx[:-1] - wy[:-1]
    nxay = wx[1:] + wy[1:]        # segment k: next waypoint
    nxmy = wx[1:] - wy[1:]

    def clip(v, hi):
        return np.clip(v, 0, hi)

    seg_x_l = clip((pxay + (pxmy - expansion)) // 2, l_x)
    seg_y_l = clip((nxay - (nxmy - expansion)) // 2, l_y)
    seg_x_u = clip((nxay + (nxmy + expansion)) // 2, l_x)
    seg_y_u = clip((pxay - (pxmy + expansion)) // 2, l_y)

    # diagonal d>=1 belongs to the first segment with nxay >= d (the loop
    # advances corners whenever nxay == cur); diagonal 0 uses zero corners
    lengths = np.diff(np.concatenate([[0], nxay]))
    x_l = np.concatenate([[0], np.repeat(seg_x_l, lengths)])
    y_l = np.concatenate([[0], np.repeat(seg_y_l, lengths)])
    x_u = np.concatenate([[0], np.repeat(seg_x_u, lengths)])
    y_u = np.concatenate([[0], np.repeat(seg_y_u, lengths)])
    # degenerate waypoints (repeated nxay) are skipped by np.repeat(0) — but
    # the final waypoint may coincide with the last anchor; pad to n+1
    if len(x_l) < n + 1:
        pad = n + 1 - len(x_l)
        x_l = np.concatenate([x_l, np.repeat(x_l[-1], pad)])
        y_l = np.concatenate([y_l, np.repeat(y_l[-1], pad)])
        x_u = np.concatenate([x_u, np.repeat(x_u[-1], pad)])
        y_u = np.concatenate([y_u, np.repeat(y_u[-1], pad)])

    xay = np.arange(n + 1, dtype=np.int64)
    xmy_l = x_l - y_l
    xmy_r = x_u - y_u
    xmy_l = np.where((xay + xmy_l) % 2 != 0, xmy_l + 1, xmy_l)
    xmy_r = np.where((xay + xmy_r) % 2 != 0, xmy_r + 1, xmy_r)
    # sequential coordinate bounds (band_setCurrentDiagonalP): clamp x
    # below by x_l / y above by y_l on the left edge, and x above by x_u /
    # y below by y_u on the right edge
    xmy_l = xmy_l + 2 * np.maximum(x_l - (xay + xmy_l) // 2, 0)
    xmy_l = xmy_l + 2 * np.maximum((xay - xmy_l) // 2 - y_l, 0)
    xmy_r = xmy_r - 2 * np.maximum((xay + xmy_r) // 2 - x_u, 0)
    xmy_r = xmy_r - 2 * np.maximum(y_u - (xay - xmy_r) // 2, 0)
    bad = ((xay + xmy_l) % 2 != 0) | ((xay + xmy_r) % 2 != 0) | (xmy_l > xmy_r)
    if np.any(bad):
        d0 = int(np.nonzero(bad)[0][0])
        raise ValueError(f"invalid diagonal: xay {d0} xmyL {xmy_l[d0]} "
                         f"xmyR {xmy_r[d0]}")
    return xmy_l, xmy_r


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


def make_bands(anchor_lists, l_xs, l_ys, expansion):
    """Batched make_band: one flat numpy pass over every read's anchor
    chain (the per-read band_construct is ~25 small-array numpy calls,
    which dominated batch host prep at B=128).  Returns a list of
    BandGeometry whose arrays are views into shared [B, NDmax+1] planes —
    per read identical to make_band (asserted in tests)."""
    assert expansion % 2 == 0
    B = len(l_xs)
    l_xs = np.asarray(l_xs, np.int64)
    l_ys = np.asarray(l_ys, np.int64)
    n = l_xs + l_ys
    nd1 = int(n.max()) + 1

    aps = [np.asarray(a, np.int64).reshape(-1, 2) for a in anchor_lists]
    n_a = np.asarray([len(a) for a in aps], np.int64)
    # flat waypoints per read: [0, anchors+1 ..., terminal corner]
    woff = np.concatenate([[0], np.cumsum(n_a + 2)])
    wx = np.empty(int(woff[-1]), np.int64)
    wy = np.empty(int(woff[-1]), np.int64)
    for r, ap in enumerate(aps):
        o = woff[r]
        wx[o] = 0
        wy[o] = 0
        if len(ap):
            ax = ap[:, 0] + 1
            ay = ap[:, 1] + 1
            if not (np.all(np.diff(ax) > 0) and np.all(np.diff(ay) > 0)
                    and ax[0] > 0 and ay[0] > 0 and ax[-1] <= l_xs[r]
                    and ay[-1] <= l_ys[r]):
                raise ValueError("anchors must be strictly increasing and "
                                 "in range")
            wx[o + 1:o + 1 + len(ax)] = ax
            wy[o + 1:o + 1 + len(ay)] = ay
        wx[woff[r + 1] - 1] = l_xs[r]
        wy[woff[r + 1] - 1] = l_ys[r]

    # segment s of read r spans waypoints (s, s+1); S_r = n_a + 1 segments
    n_s = n_a + 1
    soff = np.concatenate([[0], np.cumsum(n_s)])
    seg_read = np.repeat(np.arange(B), n_s)
    seg_i = np.arange(int(soff[-1])) - soff[seg_read]
    wp = woff[seg_read] + seg_i
    pxay = wx[wp] + wy[wp]
    pxmy = wx[wp] - wy[wp]
    nxay = wx[wp + 1] + wy[wp + 1]
    nxmy = wx[wp + 1] - wy[wp + 1]
    lxs = l_xs[seg_read]
    lys = l_ys[seg_read]
    seg_x_l = np.clip((pxay + (pxmy - expansion)) // 2, 0, lxs)
    seg_y_l = np.clip((nxay - (nxmy - expansion)) // 2, 0, lys)
    seg_x_u = np.clip((nxay + (nxmy + expansion)) // 2, 0, lxs)
    seg_y_u = np.clip((pxay - (pxmy + expansion)) // 2, 0, lys)

    # diagonals 1..n_r of read r take the first segment with nxay >= d;
    # np.repeat over per-segment diagonal counts (sums to n_r per read)
    prev = np.concatenate([[0], nxay[:-1]])
    lengths = nxay - np.where(seg_i == 0, 0, prev)
    drow = np.repeat(np.arange(B), n)
    doff = np.concatenate([[0], np.cumsum(n)])
    dcol = np.arange(int(doff[-1])) - doff[drow] + 1
    # int32 planes + in-place ops: the [B, ND] elementwise block is
    # memory-bound and coordinates fit int32 with lots of headroom (the
    # kernel metadata is int16 anyway)
    x_l = np.zeros((B, nd1), np.int32)
    y_l = np.zeros((B, nd1), np.int32)
    x_u = np.zeros((B, nd1), np.int32)
    y_u = np.zeros((B, nd1), np.int32)
    x_l[drow, dcol] = np.repeat(seg_x_l, lengths)
    y_l[drow, dcol] = np.repeat(seg_y_l, lengths)
    x_u[drow, dcol] = np.repeat(seg_x_u, lengths)
    y_u[drow, dcol] = np.repeat(seg_y_u, lengths)

    xay = np.broadcast_to(np.arange(nd1, dtype=np.int32)[None, :], (B, nd1))
    xmy_l = x_l - y_l
    xmy_r = x_u - y_u
    t = xay + xmy_l
    t &= 1
    xmy_l += t          # parity fix: +1 when (xay+xmy) is odd
    t = xay + xmy_r
    t &= 1
    xmy_r += t
    # sequential coordinate bounds (band_setCurrentDiagonalP)
    t = xay + xmy_l
    t //= 2
    np.subtract(x_l, t, out=t)
    np.maximum(t, 0, out=t)
    t += t
    xmy_l += t
    t = xay - xmy_l
    t //= 2
    t -= y_l
    np.maximum(t, 0, out=t)
    t += t
    xmy_l += t
    t = xay + xmy_r
    t //= 2
    t -= x_u
    np.maximum(t, 0, out=t)
    t += t
    xmy_r -= t
    t = xay - xmy_r
    t //= 2
    np.subtract(y_u, t, out=t)
    np.maximum(t, 0, out=t)
    t += t
    xmy_r -= t
    live = xay <= n[:, None]
    bad = live & ((((xay + xmy_l) & 1) != 0) | (((xay + xmy_r) & 1) != 0)
                  | (xmy_l > xmy_r))
    if np.any(bad):
        r0, d0 = (int(v[0]) for v in np.nonzero(bad))
        raise ValueError(f"invalid diagonal: xay {d0} xmyL {xmy_l[r0, d0]} "
                         f"xmyR {xmy_r[r0, d0]}")
    x_lo = (xay + xmy_l) >> 1
    width = ((xmy_r - xmy_l) >> 1) + 1
    return [BandGeometry(int(l_xs[r]), int(l_ys[r]),
                         xmy_l[r, :n[r] + 1], xmy_r[r, :n[r] + 1],
                         x_lo[r, :n[r] + 1], width[r, :n[r] + 1])
            for r in range(B)]


def full_band(l_x, l_y):
    """Band covering the full matrix (getAlignedPairsWithoutBanding uses an
    anchor-less band with expansion 2, impl/pairwiseAligner.c:1581)."""
    return make_band([], l_x, l_y, 2)


@dataclass
class BackwardPlan:
    """Step-level plan for the backward pass.

    The reference's traceback windows *overlap*: window w runs its backward
    recursion from its top diagonal (seeded with the end-state
    initialisation, impl/pairwiseAligner.c:972) down to the previous
    window's tracedBackFrom+1, but only emits posteriors for diagonals
    <= its own tracedBackFrom; the diagonals above that (traceBackDiagonals+1
    of them) are recomputed by the *next* window, whose recursion passes
    through this window's top without any reset.  Each window is therefore an
    independent seeded backward run, laid out here as contiguous descending
    segments of one scan.

    All arrays have length n_steps:
      d[s]       — diagonal processed at step s
      seed[s]    — step starts a window: backward value := end-state init
                   (no recursion from the carry)
      emit[s]    — extract posteriors / accumulate expectations
      refresh[s] — recompute the running total probability (every 10th
                   posterior calculation per window, :1005)
      ragged[s]  — seed uses raggedEndStateProb
    """

    d: np.ndarray
    seed: np.ndarray
    emit: np.ndarray
    refresh: np.ndarray
    ragged: np.ndarray

    @property
    def n_steps(self):
        return len(self.d)


def _windows(band: BandGeometry, min_diags_between_traceback,
             traceback_diagonals, diagonal_expansion):
    """(traced_back_to, top, traced_back_from) per traceback window, in the
    reference's chronological order (getPosteriorProbsWithBanding,
    impl/pairwiseAligner.c:955-1045)."""
    n = band.n_diag
    wins = []
    traced_back_to = 0
    for d in range(1, n + 1):
        at_end = d == n
        tb_point = (d >= traced_back_to + min_diags_between_traceback
                    and band.width[d] <= diagonal_expansion * 2 + 1)
        if at_end or tb_point:
            traced_back_from = d - (0 if at_end else traceback_diagonals + 1)
            wins.append((traced_back_to, d, traced_back_from))
            traced_back_to = traced_back_from
    return wins


def _plan_from_windows(wins, ragged_right_end, n_diag):
    ds, seeds, emits, refreshes, raggeds = [], [], [], [], []
    for traced_back_to, top, traced_back_from in wins:
        at_end = top == n_diag
        count = 0
        for step, d in enumerate(range(top, traced_back_to, -1)):
            ds.append(d)
            seeds.append(step == 0)
            raggeds.append(step == 0 and at_end and ragged_right_end)
            if d <= traced_back_from:
                emits.append(True)
                refreshes.append(count % 10 == 0)
                count += 1
            else:
                emits.append(False)
                refreshes.append(False)
    return BackwardPlan(
        d=np.array(ds, dtype=np.int64), seed=np.array(seeds),
        emit=np.array(emits), refresh=np.array(refreshes),
        ragged=np.array(raggeds))


def traceback_schedule(band: BandGeometry, *, min_diags_between_traceback,
                       traceback_diagonals, diagonal_expansion,
                       ragged_right_end=False):
    """Build the step plan for the banded windowed driver.  The decisions
    depend only on band geometry and parameters, never on DP values, so they
    are computed on the host up front."""
    if band.n_diag == 0:
        return BackwardPlan(*(np.zeros(0, dtype=t) for t in
                              (np.int64, bool, bool, bool, bool)))
    wins = _windows(band, min_diags_between_traceback, traceback_diagonals,
                    diagonal_expansion)
    return _plan_from_windows(wins, ragged_right_end, band.n_diag)


def unbanded_schedule(band: BandGeometry, ragged_right_end=False):
    """Plan matching getAlignedPairsWithoutBanding
    (impl/pairwiseAligner.c:1561-1618): one global backward run seeded at the
    final diagonal, a single total probability, posteriors everywhere."""
    n = band.n_diag
    plan = _plan_from_windows([(0, n, n)], ragged_right_end, n)
    # One total, computed at the final diagonal only.
    plan.refresh[:] = False
    plan.refresh[0] = True
    return plan
