"""Pallas TPU wavefront kernels for the banded forward-backward engine.

Layout strategy
---------------
The engine's x-indexed formulation (ops/engine.py) makes every wavefront
dependency a *static* lane shift once diagonals are stored densely over the
full x range:

    fwd[d][x] <- fwd[d-1][x-1] (lower), fwd[d-2][x-1] (middle),
                 fwd[d-1][x]   (upper)

so the kernel keeps each diagonal as an [R, X] tile — R reads on sublanes
(R=8..32; more reads per group amortize the per-diagonal fixed costs that
dominate this latency-bound wavefront), x on lanes — and the recursion is a
lane-roll plus elementwise log-adds.  Band narrowness is handled by
masking, not by shifting windows, which keeps all slicing uniform across
the batched reads (their bands differ).  Cells outside the band are
computed-and-masked; the overcompute is repaid by perfect (8,128) tiling
and by fusing the entire scan into one kernel (the XLA-scan engine pays
~1ms/diagonal in dispatch; this kernel pays ~1µs).

Y-side features are pre-flipped and aligned so that the per-diagonal slice
start (C - d) is identical for all reads in a group.  The forward kernel
streams each diagonal to HBM through a double-buffered DMA ring; the
backward kernel streams them back (prefetching the next diagonal while the
current one computes) and emits match posteriors *band-locally*: each
diagonal's posteriors are rolled into a narrow [R, W] window at a
host-precomputed per-group window start covering the union of the group's
bands, cutting the posterior tensor (and the top-k compaction that
sparsifies it for the slow host link) by X/W.

This file implements the 3-state strawman signal machine (the flagship
workload, getStrawManStateMachine3); other families reuse the scaffold.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # finite stand-in for LOG_ZERO inside the kernel (avoids NaNs)


def _log_add(x, y):
    """Reference piecewise-cubic logAdd (impl/pairwiseAligner.c:235-255),
    branch-free; all-finite with NEG in place of -inf."""
    lo = jnp.minimum(x, y)
    hi = jnp.maximum(x, y)
    d = jnp.minimum(hi - lo, 7.5)
    p1 = ((-0.009350833524763 * d + 0.130659527668286) * d + 0.498799810682272) * d + 0.693203116424741
    p2 = ((-0.014532321752540 * d + 0.139942324101744) * d + 0.495635523139337) * d + 0.692140569840976
    p3 = ((-0.004605031767994 * d + 0.063427417320019) * d + 0.695956496475118) * d + 0.514272634594009
    p4 = ((-0.000458661602210 * d + 0.009695946122598) * d + 0.930734667215156) * d + 0.168037164329057
    lk = jnp.where(d <= 1.0, p1, jnp.where(d <= 2.5, p2, jnp.where(d <= 4.5, p3, p4)))
    return jnp.where((hi - lo) >= 7.5, hi, lk + lo)


def _log_add3(a, b, c):
    return _log_add(_log_add(a, b), c)


def _gauss(x, mu, sd):
    log_inv_sqrt_2pi = -0.91893853320467267
    sd_ok = sd > 0.0
    sds = jnp.where(sd_ok, sd, 1.0)
    a = (x - mu) / sds
    return jnp.where(sd_ok, log_inv_sqrt_2pi - jnp.log(sds) - 0.5 * a * a, NEG)


def _dyn_lane_slice(ref, row, start, X):
    """ref[:, row, start:start+X] for arbitrary (unaligned) traced start.

    Mosaic only allows lane-dim dynamic loads at 128-aligned offsets, so load
    the covering aligned window (with a multiple_of hint) and rotate the
    remainder away."""
    L = X + 128
    aligned = pl.multiple_of((start // 128) * 128, 128)
    rem = start - aligned
    win = ref[:, row, pl.ds(aligned, L)]
    rot = pltpu.roll(win, L - rem, axis=1)
    return rot[:, :X]


def _dyn_lane_slice2(ref, row, start, W):
    """ref[:, row, start:start+W] for traced start, with the covering
    aligned window clamped into bounds (needed when start can reach the
    last page; requires start + W <= lanes)."""
    Ldim = ref.shape[-1]
    if Ldim == W:
        # single-window refs: rotate the whole row (lanes past the end
        # wrap, but they are always outside every band)
        return pltpu.roll(ref[:, row, :], jnp.mod(-start, W), axis=1)
    L = min(W + 128, Ldim)
    aligned = pl.multiple_of(
        jnp.minimum((start // 128) * 128, Ldim - L), 128)
    rem = start - aligned
    win = ref[:, row, pl.ds(aligned, L)]
    rot = pltpu.roll(win, L - rem, axis=1)
    return rot[:, :W]


class _RowSlices:
    """Lazy per-row window slices of a [R, NROWS, L] VMEM ref, indexable
    like the full tensor (obj[:, i, :] -> [R, W] at the window start)."""

    def __init__(self, ref, start, W):
        self.ref = ref
        self.start = start
        self.W = W
        self._cache = {}

    def __getitem__(self, key):
        i = key[1]
        if i not in self._cache:
            self._cache[i] = _dyn_lane_slice2(self.ref, i, self.start,
                                              self.W)
        return self._cache[i]


def _col_select_ref(ref, idx):
    """Column idx of a [R, L] VMEM ref as a lane-replicated [R, 1].

    Onehot + lane reduction (reductions produce lane-replicated layouts, so
    the result broadcasts cleanly against [R, X] tiles; a direct
    dynamic-slice column has a dynamic lane layout Mosaic cannot relayout).
    Loads only the 128-lane page containing the column (aligned dynamic
    load), so it's one vreg of work per call instead of L/128."""
    aligned = pl.multiple_of((idx // 128) * 128, 128)
    page = ref[:, pl.ds(aligned, 128)]
    lane = jax.lax.broadcasted_iota(jnp.int32, page.shape, 1)
    return jnp.sum(jnp.where(lane == idx - aligned, page, 0.0), axis=1,
                   keepdims=True)

def _inv_gauss(x, mu, lam):
    """log inverse-Gaussian pdf (emissions_signal_logInvGaussPdf,
    impl/stateMachine.c:323-332), all-finite with NEG guards."""
    l_two_pi = 1.8378770664093453
    bad = (x <= 0.0) | (lam <= 0.0) | (mu == 0.0)
    sx = jnp.where(x > 0.0, x, 1.0)
    smu = jnp.where(mu != 0.0, mu, 1.0)
    slam = jnp.where(lam > 0.0, lam, 1.0)
    a = (x - smu) / smu
    out = (jnp.log(slam) - l_two_pi - 3.0 * jnp.log(sx)
           - slam * a * a / sx) / 2.0
    return jnp.where(bad, NEG, out)


# ---------------------------------------------------------------------------
# Machine specs: what differs between state-machine families inside the
# shared wavefront kernels — emission formulas and the per-state transition
# combines.  All are staticmethods traced into the kernel at lowering time.
# Scalar layout: [NS machine scalars..., start(3), end(3), ragged_end(3)].
# ---------------------------------------------------------------------------

# strawman machine scalar order
T_MM, T_XM, T_YM, T_OX, T_EX, T_SX, T_OY, T_EY = range(8)


class _StrawmanSpec:
    """3-state strawman signal machine (stateMachine3_cellCalculate,
    impl/stateMachine.c:1306-1335): global scalar transitions, gap-X
    emission from a per-kmer table, Gaussian×Gaussian match emission."""

    S = 3     # states: M, shortGapX, shortGapY
    NS = 8    # machine scalars
    NXF = 9   # x-feature rows

    @staticmethod
    def emissions(xf, mean, noise):
        e_match = (_gauss(mean, xf[:, 0, :], xf[:, 1, :])
                   + _gauss(noise, xf[:, 2, :], xf[:, 3, :]))
        e_gapy = (_gauss(mean, xf[:, 4, :], xf[:, 5, :])
                  + _gauss(noise, xf[:, 6, :], xf[:, 7, :]))
        return e_match, e_gapy

    # window-frame variants: inputs arrive pre-aligned to the current
    # window (p1m/p2m at source x-1, p1 at x; n1 at x, n1p/n2p/em2p at
    # x+1), so no in-spec shifts — the band-local kernels compute on
    # [R, W] tiles instead of [R, X] frames
    @staticmethod
    def fwd_update_w(t, xf, e_match, e_gapy, p1m, p1, p2m):
        e_gapx = xf[:, 8, :]
        new_x = _log_add3(p1m[0] + t[T_OX], p1m[1] + t[T_EX],
                          p1m[2] + t[T_SX]) + e_gapx
        new_m = _log_add3(p2m[0] + t[T_MM], p2m[1] + t[T_XM],
                          p2m[2] + t[T_YM]) + e_match
        new_y = _log_add(p1[0] + t[T_OY], p1[2] + t[T_EY]) + e_gapy
        return [new_m, new_x, new_y]

    @staticmethod
    def bwd_update_w(t, xf, xfp, em1, eg1, em2p, n1, n1p, n2p):
        e_gapx_p = xfp[:, 8, :]
        mid = em2p + n2p[0]
        bw_m = mid + t[T_MM]
        bw_x = mid + t[T_XM]
        bw_y = mid + t[T_YM]
        up = eg1 + n1[2]
        bw_m = _log_add(bw_m, up + t[T_OY])
        bw_y = _log_add(bw_y, up + t[T_EY])
        low = e_gapx_p + n1p[1]
        bw_m = _log_add(bw_m, low + t[T_OX])
        bw_x = _log_add(bw_x, low + t[T_EX])
        bw_y = _log_add(bw_y, low + t[T_SX])
        return [bw_m, bw_x, bw_y]

    # transition lane layout for the expectation accumulator: frm*3 + to
    # (ContinuousPairHmm's [3,3] transition table order)
    EXP_LANES = {"mm": 0, "ox": 1, "oy": 2, "xm": 3, "ex": 4,
                 "ym": 6, "sx": 7, "ey": 8}

    @staticmethod
    def exp_probs_w(t, xfw, em_t, eg_t, y_t, f0m, f1m, f1a, bw2, total):
        """Posterior transition probabilities into one target diagonal
        (cell_signal_updateTransAndKmerSkipExpectations,
        impl/pairwiseAligner.c:442-459): p = exp(fwd_src + transition +
        emission + bwd_target - total), band-locally on [R, W] tiles.
        Inputs arrive pre-aligned to the TARGET diagonal's window frame:
        f0m = fwd[d] at source x-1 (middle), f1m = fwd[d+1] at x-1 (lower),
        f1a = fwd[d+1] at x (upper), bw2 = bwd[d+2] at x, em_t/eg_t =
        emissions(d+2) at x.  Returns {name: [R, W]} keyed like EXP_LANES,
        plus the per-column contributions for the EXP_NACC accumulators.
        ``y_t`` is the target diagonal's y-element row (only specs with
        EXP_Y_AUX receive a real value)."""
        def p(logp):
            return jnp.exp(jnp.minimum(logp - total, 10.0))

        e_gapx = xfw[:, 8, :]
        # middle: src (d, x-1) -> M at (d+2, x)
        mid = em_t + bw2[0]
        probs = {
            "mm": p(f0m[0] + t[T_MM] + mid),
            "xm": p(f0m[1] + t[T_XM] + mid),
            "ym": p(f0m[2] + t[T_YM] + mid),
        }
        # lower: src (d+1, x-1) -> X at (d+2, x)
        low = e_gapx + bw2[1]
        probs["ox"] = p(f1m[0] + t[T_OX] + low)
        probs["ex"] = p(f1m[1] + t[T_EX] + low)
        probs["sx"] = p(f1m[2] + t[T_SX] + low)
        # upper: src (d+1, x) -> Y at (d+2, x)
        up = eg_t + bw2[2]
        probs["oy"] = p(f1a[0] + t[T_OY] + up)
        probs["ey"] = p(f1a[2] + t[T_EY] + up)
        gapx_sum = probs["ox"] + probs["ex"] + probs["sx"]
        return probs, gapx_sum


# 4-state signal machine scalar order: lower(5), middle(4), upper(2)
(T4_SOX, T4_SEX, T4_LOX, T4_LEX, T4_LSX,
 T4_MM, T4_MSX, T4_MSY, T4_MLX,
 T4_SOY, T4_SEY) = range(11)


class _Sm4Spec(_StrawmanSpec):
    """4-state signal machine (stateMachine4_cellCalculate,
    impl/stateMachine.c:868-898): match, shortGapX, shortGapY, longGapX;
    emissions identical to the strawman machine (inherited)."""

    S = 4
    NS = 11
    NXF = 9
    # transition lanes frm*4 + to over states (M, shortGapX, shortGapY,
    # longGapX); the reference wires cell_signal_updateTransAndKmerSkipExpectations
    # into fourState (impl/stateMachine.c:986,1800-1810) — per-kmer gap
    # counters accumulate on the shortGapX target only (:456-459)
    EXP_LANES = {"mm": 0, "sxm": 4, "sym": 8, "lxm": 12,
                 "msx": 1, "sxsx": 5,
                 "mlx": 3, "lxlx": 15, "sylx": 11,
                 "msy": 2, "sysy": 10}
    EXP_NACC = 1

    @staticmethod
    def exp_probs_w(t, xfw, em_t, eg_t, y_t, f0m, f1m, f1a, bw2, total):
        def p(logp):
            return jnp.exp(jnp.minimum(logp - total, 10.0))

        e_gapx = xfw[:, 8, :]
        # middle: src (d, x-1) -> M at (d+2, x)
        mid = em_t + bw2[0]
        probs = {
            "mm": p(f0m[0] + t[T4_MM] + mid),
            "sxm": p(f0m[1] + t[T4_MSX] + mid),
            "sym": p(f0m[2] + t[T4_MSY] + mid),
            "lxm": p(f0m[3] + t[T4_MLX] + mid),
        }
        # lower: src (d+1, x-1) -> shortGapX / longGapX at (d+2, x)
        low_s = e_gapx + bw2[1]
        low_l = e_gapx + bw2[3]
        probs["msx"] = p(f1m[0] + t[T4_SOX] + low_s)
        probs["sxsx"] = p(f1m[1] + t[T4_SEX] + low_s)
        probs["mlx"] = p(f1m[0] + t[T4_LOX] + low_l)
        probs["lxlx"] = p(f1m[3] + t[T4_LEX] + low_l)
        probs["sylx"] = p(f1m[2] + t[T4_LSX] + low_l)
        # upper: src (d+1, x) -> shortGapY at (d+2, x)
        up = eg_t + bw2[2]
        probs["msy"] = p(f1a[0] + t[T4_SOY] + up)
        probs["sysy"] = p(f1a[2] + t[T4_SEY] + up)
        # kmer-gap counters: to == shortGapX only (not longGapX)
        gapx_sum = probs["msx"] + probs["sxsx"]
        return probs, gapx_sum

    @staticmethod
    def fwd_update_w(t, xf, e_match, e_gapy, p1m, p1, p2m):
        e_gapx = xf[:, 8, :]
        new_sx = _log_add(p1m[0] + t[T4_SOX],
                          p1m[1] + t[T4_SEX]) + e_gapx
        new_lx = _log_add3(p1m[0] + t[T4_LOX], p1m[3] + t[T4_LEX],
                           p1m[2] + t[T4_LSX]) + e_gapx
        new_m = _log_add(
            _log_add(p2m[0] + t[T4_MM], p2m[1] + t[T4_MSX]),
            _log_add(p2m[2] + t[T4_MSY], p2m[3] + t[T4_MLX])) + e_match
        new_sy = _log_add(p1[0] + t[T4_SOY], p1[2] + t[T4_SEY]) + e_gapy
        return [new_m, new_sx, new_sy, new_lx]

    @staticmethod
    def bwd_update_w(t, xf, xfp, em1, eg1, em2p, n1, n1p, n2p):
        e_gapx_p = xfp[:, 8, :]
        mid = em2p + n2p[0]
        low_s = e_gapx_p + n1p[1]
        low_l = e_gapx_p + n1p[3]
        up = eg1 + n1[2]
        bw_m = _log_add(_log_add(mid + t[T4_MM], low_s + t[T4_SOX]),
                        _log_add(low_l + t[T4_LOX], up + t[T4_SOY]))
        bw_sx = _log_add(mid + t[T4_MSX], low_s + t[T4_SEX])
        bw_sy = _log_add3(mid + t[T4_MSY], low_l + t[T4_LSX],
                          up + t[T4_SEY])
        bw_lx = _log_add(mid + t[T4_MLX], low_l + t[T4_LEX])
        return [bw_m, bw_sx, bw_sy, bw_lx]


# 5-state DNA machine scalar order: lower(4), middle(5), upper(4)
(T5_SOX, T5_SEX, T5_LOX, T5_LEX,
 T5_MM, T5_MSX, T5_MSY, T5_MLX, T5_MLY,
 T5_SOY, T5_SEY, T5_LOY, T5_LEY) = range(13)


class _Dna5Spec:
    """Classic 5-state affine-gap DNA pair-HMM (stateMachine5_cellCalculate,
    impl/stateMachine.c:830-866): states M, shortGapX, shortGapY, longGapX,
    longGapY; match emission from the 5x5 (incl. N) base table via a
    5-way select on the y base index, gap emissions as value rows."""

    S = 5
    NS = 13
    NXF = 6   # match rows for y-base 0..4, then the gap-X emission row

    @staticmethod
    def emissions(xf, mean, noise):
        # mean carries the y base index (0..4) as float; noise carries the
        # gap-Y emission value directly
        e_match = jnp.where(mean == 0.0, xf[:, 0, :], 0.0)
        for b in range(1, 5):
            e_match = e_match + jnp.where(mean == float(b), xf[:, b, :],
                                          0.0)
        return e_match, noise

    @staticmethod
    def fwd_update_w(t, xf, e_match, e_gapy, p1m, p1, p2m):
        e_gapx = xf[:, 5, :]
        new_sx = _log_add(p1m[0] + t[T5_SOX],
                          p1m[1] + t[T5_SEX]) + e_gapx
        new_lx = _log_add(p1m[0] + t[T5_LOX],
                          p1m[3] + t[T5_LEX]) + e_gapx
        new_m = _log_add(
            _log_add3(p2m[0] + t[T5_MM], p2m[1] + t[T5_MSX],
                      p2m[2] + t[T5_MSY]),
            _log_add(p2m[3] + t[T5_MLX],
                     p2m[4] + t[T5_MLY])) + e_match
        new_sy = _log_add(p1[0] + t[T5_SOY], p1[2] + t[T5_SEY]) + e_gapy
        new_ly = _log_add(p1[0] + t[T5_LOY], p1[4] + t[T5_LEY]) + e_gapy
        return [new_m, new_sx, new_sy, new_lx, new_ly]

    @staticmethod
    def bwd_update_w(t, xf, xfp, em1, eg1, em2p, n1, n1p, n2p):
        e_gapx_p = xfp[:, 5, :]
        mid = em2p + n2p[0]
        low_s = e_gapx_p + n1p[1]
        low_l = e_gapx_p + n1p[3]
        up_s = eg1 + n1[2]
        up_l = eg1 + n1[4]
        bw_m = _log_add(
            _log_add3(mid + t[T5_MM], low_s + t[T5_SOX],
                      low_l + t[T5_LOX]),
            _log_add(up_s + t[T5_SOY], up_l + t[T5_LOY]))
        bw_sx = _log_add(mid + t[T5_MSX], low_s + t[T5_SEX])
        bw_sy = _log_add(mid + t[T5_MSY], up_s + t[T5_SEY])
        bw_lx = _log_add(mid + t[T5_MLX], low_l + t[T5_LEX])
        bw_ly = _log_add(mid + t[T5_MLY], up_l + t[T5_LEY])
        return [bw_m, bw_sx, bw_sy, bw_lx, bw_ly]

    # EM expectations (cell_updateExpectations,
    # impl/pairwiseAligner.c:423-441): the 13 active transitions land in
    # lanes frm*5+to of the [5,5] transition table; emission expectations
    # accumulate per-column posterior mass per (to-state, y-base) — the
    # x-base scatter happens post-kernel (emis[to, bx, by] += p).
    # lane = frm*5 + to over states (M, SX, SY, LX, LY)
    EXP_LANES = {"mm": 0, "sxm": 5, "sym": 10, "lxm": 15, "lym": 20,
                 "msx": 1, "sxsx": 6, "mlx": 3, "lxlx": 18,
                 "msy": 2, "sysy": 12, "mly": 4, "lyly": 24}
    EXP_NACC = 20  # 5 to-states x 4 y bases (N excluded, like the engine)
    EXP_Y_AUX = True

    @staticmethod
    def exp_probs_w(t, xfw, em_t, eg_t, y_t, f0m, f1m, f1a, bw2, total):
        def p(logp):
            return jnp.exp(jnp.minimum(logp - total, 10.0))

        e_gapx = xfw[:, 5, :]
        # middle: src (d, x-1) -> M at (d+2, x)
        mid = em_t + bw2[0]
        probs = {
            "mm": p(f0m[0] + t[T5_MM] + mid),
            "sxm": p(f0m[1] + t[T5_MSX] + mid),
            "sym": p(f0m[2] + t[T5_MSY] + mid),
            "lxm": p(f0m[3] + t[T5_MLX] + mid),
            "lym": p(f0m[4] + t[T5_MLY] + mid),
        }
        # lower: src (d+1, x-1) -> shortGapX / longGapX at (d+2, x)
        low_s = e_gapx + bw2[1]
        low_l = e_gapx + bw2[3]
        probs["msx"] = p(f1m[0] + t[T5_SOX] + low_s)
        probs["sxsx"] = p(f1m[1] + t[T5_SEX] + low_s)
        probs["mlx"] = p(f1m[0] + t[T5_LOX] + low_l)
        probs["lxlx"] = p(f1m[3] + t[T5_LEX] + low_l)
        # upper: src (d+1, x) -> shortGapY / longGapY at (d+2, x)
        up_s = eg_t + bw2[2]
        up_l = eg_t + bw2[4]
        probs["msy"] = p(f1a[0] + t[T5_SOY] + up_s)
        probs["sysy"] = p(f1a[2] + t[T5_SEY] + up_s)
        probs["mly"] = p(f1a[0] + t[T5_LOY] + up_l)
        probs["lyly"] = p(f1a[4] + t[T5_LEY] + up_l)

        # posterior mass into each target state (for emission expectations)
        p_to = [
            (probs["mm"] + probs["sxm"] + probs["sym"]
             + probs["lxm"] + probs["lym"]),
            probs["msx"] + probs["sxsx"],
            probs["msy"] + probs["sysy"],
            probs["mlx"] + probs["lxlx"],
            probs["mly"] + probs["lyly"],
        ]
        contribs = []
        for to in range(5):
            for by in range(4):
                contribs.append(jnp.where(y_t == float(by), p_to[to], 0.0))
        return probs, tuple(contribs)


# vanilla machine scalar order
VA_YM, VA_YY = range(2)


class _VanillaSpec:
    """Nanopolish-style vanilla machine (stateMachine3Vanilla_cellCalculate,
    impl/stateMachine.c:1368-1409): per-column transitions from kmer-skip
    bins (x-feature rows 8-12: la_mx, la_xx, la_mm, la_xm, la_my), silent
    kmer-skip gap-X (no emission), Gaussian×inverse-Gaussian emissions."""

    S = 3
    NS = 2
    NXF = 13

    @staticmethod
    def emissions(xf, mean, noise):
        e_match = (_gauss(mean, xf[:, 0, :], xf[:, 1, :])
                   + _inv_gauss(noise, xf[:, 2, :], xf[:, 3, :]))
        e_gapy = (_gauss(mean, xf[:, 4, :], xf[:, 5, :])
                  + _inv_gauss(noise, xf[:, 6, :], xf[:, 7, :]))
        return e_match, e_gapy

    @staticmethod
    def fwd_update_w(t, xf, e_match, e_gapy, p1m, p1, p2m):
        la_mx, la_xx, la_mm, la_xm, la_my = (xf[:, i, :]
                                             for i in range(8, 13))
        new_x = _log_add(p1m[0] + la_mx, p1m[1] + la_xx)
        new_m = _log_add3(p2m[0] + la_mm, p2m[1] + la_xm,
                          p2m[2] + t[VA_YM]) + e_match
        new_y = _log_add(p1[0] + la_my, p1[2] + t[VA_YY]) + e_gapy
        return [new_m, new_x, new_y]

    @staticmethod
    def bwd_update_w(t, xf, xfp, em1, eg1, em2p, n1, n1p, n2p):
        la_my = xf[:, 12, :]
        # target-x transitions at x+1 come from the x+1 feature slice
        la_mx_p = xfp[:, 8, :]
        la_xx_p = xfp[:, 9, :]
        la_mm_p = xfp[:, 10, :]
        la_xm_p = xfp[:, 11, :]
        mid = em2p + n2p[0]
        up = eg1 + n1[2]
        low = n1p[1]  # silent gap-X: no emission on lower
        bw_m = _log_add3(mid + la_mm_p, low + la_mx_p, up + la_my)
        bw_x = _log_add(mid + la_xm_p, low + la_xx_p)
        bw_y = _log_add(mid + t[VA_YM], up + t[VA_YY])
        return [bw_m, bw_x, bw_y]

    # EM expectations (cell_signal_updateBetaAndAlphaProb,
    # impl/pairwiseAligner.c:493-513): only the per-skip-bin beta (M->X)
    # and alpha (X->X) posterior masses are accumulated, per column
    EXP_LANES = {}
    EXP_NACC = 2

    @staticmethod
    def exp_probs_w(t, xfw, em_t, eg_t, y_t, f0m, f1m, f1a, bw2, total):
        la_mx = xfw[:, 8, :]
        la_xx = xfw[:, 9, :]

        def p(logp):
            return jnp.exp(jnp.minimum(logp - total, 10.0))

        low = bw2[1]  # target shortGapX at (d+2, x); silent (no emission)
        p_beta = p(f1m[0] + la_mx + low)
        p_alpha = p(f1m[1] + la_xx + low)
        return {}, (p_beta, p_alpha)


def _exact_log_add(a, b):
    """Exact log(exp(a)+exp(b)) (not the piecewise cubic) — the echelon
    multi-kmer fold uses true logAdd in the reference too."""
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    return hi + jnp.log1p(jnp.exp(jnp.maximum(lo - hi, -80.0)))


class _EchelonSpec:
    """7-state echelon machine (stateMachineEchelon_cellCalculate,
    impl/stateMachine.c:1411-1459) on the band-local wavefront kernels:
    states (match0, match1..match5, gapX); an event emits 1..5 kmers with
    a Poisson duration posterior; posteriors are multi-state (match1..5),
    expanded to (x+n, y) pairs host-side
    (diagonalCalculationMultiPosteriorMatchProbs,
    impl/pairwiseAligner.c:824-866).

    xf rows: 4i..4i+3 = (lvl_mu, lvl_sd, nz_mu, nz_lambda) of the kmer at
    offset i (i = 0..4); 20..23 = the scaled/gap model of the first kmer;
    24..27 = skip transition logs la_mx/la_mh/la_xx/la_xh; 28..32 =
    multi-kmer validity for n = 1..5.
    yf rows: 0..5 = Poisson duration posteriors dur_0..dur_5; 6 = event
    mean; 7 = event noise.

    The reference defines no echelon EM (its cellCalculateUpdateExpectations
    is NULL, impl/stateMachine.c:1823-1833) — EXP_LANES stays None.
    """

    S = 7
    NS = 0
    NXF = 33
    Y_ROWS = 8
    POST_STATES = (1, 2, 3, 4, 5)
    EXP_LANES = None
    EM_LEAVES = 5  # fwd emission carry is the 5-tuple of per-n terms

    @staticmethod
    def emissions(xf, *ys):
        dur = ys[:6]
        mean, noise = ys[6], ys[7]
        # multipleKmerMatchProb folds from 0.0, NOT log-zero — a reference
        # quirk preserved bit-for-bit (impl/stateMachine.c:533)
        acc = jnp.zeros_like(mean)
        w_n = []
        for n in range(1, 6):
            i = n - 1
            term = (_gauss(mean, xf[:, 4 * i, :], xf[:, 4 * i + 1, :])
                    + _inv_gauss(noise, xf[:, 4 * i + 2, :],
                                 xf[:, 4 * i + 3, :]))
            acc = _exact_log_add(acc, term)
            e_n = jnp.where(xf[:, 27 + n, :] > 0.5,
                            acc - float(np.log(n)), NEG)
            w_n.append(jnp.maximum(e_n + dur[n], NEG))
        e_scaled = (_gauss(mean, xf[:, 20, :], xf[:, 21, :])
                    + _inv_gauss(noise, xf[:, 22, :], xf[:, 23, :]))
        return tuple(w_n), jnp.maximum(e_scaled + dur[0], NEG)

    @staticmethod
    def fwd_update_w(t, xf, e_match, e_gapy, p1m, p1, p2m):
        w_n = e_match            # 5-tuple of per-n emission+duration terms
        scaled = e_gapy
        la_mx = xf[:, 24, :]
        la_mh = xf[:, 25, :]
        la_xx = xf[:, 26, :]
        la_xh = xf[:, 27, :]
        # middle: every state at (d-2, x-1) -> match_n; the per-source
        # transition is the same for all n, so fold sources once
        src_m = p2m[0]
        for i in range(1, 6):
            src_m = _log_add(src_m, p2m[i])
        mid = _log_add(src_m + la_mh, p2m[6] + la_xh)
        new_mn = [mid + w for w in w_n]
        # upper: match_1..5 at (d-1, x) -> match0 (extra event)
        src_u = p1[1]
        for i in range(2, 6):
            src_u = _log_add(src_u, p1[i])
        new_m0 = src_u + la_mh + scaled
        # lower: match_1..5 / gapX at (d-1, x-1) -> gapX (silent)
        src_l = p1m[1]
        for i in range(2, 6):
            src_l = _log_add(src_l, p1m[i])
        new_x = _log_add(src_l + la_mx, p1m[6] + la_xx)
        return [new_m0] + new_mn + [new_x]

    @staticmethod
    def bwd_update_w(t, xf, xfp, em1, eg1, em2p, n1, n1p, n2p):
        w_n2 = em2p              # per-n terms at (d+2, x+1)
        scaled1 = eg1            # scaled+dur0 at (d+1, x)
        la_mx_p = xfp[:, 24, :]
        la_mh_p = xfp[:, 25, :]
        la_xx_p = xfp[:, 26, :]
        la_xh_p = xfp[:, 27, :]
        la_mh_x = xf[:, 25, :]
        mid = w_n2[0] + n2p[1]
        for n in range(2, 6):
            mid = _log_add(mid, w_n2[n - 1] + n2p[n])
        low = n1p[6]
        up = scaled1 + n1[0]
        bw_m0 = mid + la_mh_p
        # match_1..5 share an identical outgoing fan (their differences
        # are forward emissions only)
        bw_m = _log_add3(mid + la_mh_p, low + la_mx_p, up + la_mh_x)
        bw_x = _log_add(mid + la_xh_p, low + la_xx_p)
        return [bw_m0] + [bw_m] * 5 + [bw_x]


# --- bounded block-wavefront spike knobs (tools/exp_block_wavefront.py) ---
# Timing-only ablations of the untiled forward: quantify how much of the
# per-step cost is the DMA ring vs the emission build before attempting
# any block decomposition.  Results are WRONG when enabled; production
# code never sets these.  Numbers recorded in BASELINE.md.
_EXP_SKIP_DMA = False
_EXP_CONST_EMISSIONS = False


def _sm3_forward_kernel(scal, winf, xf, yf, basef, widthf, *rest, X, ND, C,
                        R, W, spec, tile=None):
    """One group of R reads: full forward pass over ND diagonals, computed
    BAND-LOCALLY: every diagonal lives directly in its [R, W] group window
    (band ⊆ window by construction), carries re-align between consecutive
    windows with one dynamic lane-roll per state, and per-step vector work
    is W lanes instead of the full X frame — the dominant win when
    W << X.  Each diagonal streams to HBM as an [S, R, W] window at
    winf[0, 0, d].  Emission formulas / transition combines come from the
    machine `spec` (window variants fwd_update_w); specs with
    STREAMED=True read per-diagonal emission windows from an HBM stream
    (HDP density tables) — those windows are already band-local.

    With ``tile`` (the long-alignment path, matching the reference's
    O(band*window)-at-any-length banded engine,
    impl/pairwiseAligner.c:919-1055), one call processes ONE tile of TD
    diagonals: the x/y feature blocks and band metadata arrive pre-sliced
    to the tile (VMEM stays O(tile), independent of X), per-group tile
    scalars ride in ``tscal`` ([d0 metadata-slice origin, dA first
    diagonal, xoff x-slice origin, cy = C - yoff, is_first]), DP carries
    chain through carry_in/carry_out ([2S, R, W], raw in their own
    windows' frames), and the HBM plane is written at ABSOLUTE diagonal
    indices (input_output-aliased across tile calls).  The untiled path
    is the special case d0 = xoff = 0, dA = 1, cy = C."""
    streamed = getattr(spec, "STREAMED", False)
    if tile is not None:
        assert not streamed
        tscal, carry_in, _plane_prev, out_ref, carry_out, sem, scratch = rest
        est_ref = escr = None
        TDL = tile["TDL"]
        d0 = tscal[0, 0]
        dA = tscal[0, 1]
        xoff = tscal[0, 2]
        cy = tscal[0, 3]
        first = tscal[0, 4] > 0
        n_steps = tile["TD"]
    elif streamed:
        est_ref, out_ref, sem, scratch, escr = rest
        carry_in = carry_out = None
        d0, dA, xoff, cy, first, n_steps = 0, 1, 0, C, True, ND
    else:
        est_ref = escr = None
        out_ref, sem, scratch = rest
        carry_in = carry_out = None
        d0, dA, xoff, cy, first, n_steps = 0, 1, 0, C, True, ND
    g = pl.program_id(0)
    S = spec.S
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    lanef = lane.astype(jnp.float32)
    t = [scal[0, i] for i in range(spec.NS + 3 * S)]
    S_M = spec.NS

    def ld(d):
        # local index into the tile's metadata slice (identity untiled);
        # clamped so selected-away init reads on later tiles stay in
        # bounds
        if tile is None:
            return d
        return jnp.clip(d - d0, 0, TDL - 1)

    def band_mask(d, w):
        base = _col_select_ref(basef, ld(d))
        width = _col_select_ref(widthf, ld(d))
        xl = lanef + w.astype(jnp.float32)
        return (xl >= base) & (xl < base + width)

    def align(v, s):
        # out[:, l] = v[:, l + s]; NEG where l + s falls outside [0, W)
        r = pltpu.roll(v, jnp.mod(-s, W), axis=1)
        ls = lane + s
        return jnp.where((ls >= 0) & (ls < W), r, NEG)

    w0 = winf[0, 0, ld(0)]
    m0 = band_mask(0, w0)
    zeros = jnp.zeros((R, W), jnp.float32) + 0.0 * lanef
    prev1 = [jnp.where(m0, zeros + t[S_M + i], NEG) for i in range(S)]
    neg = jnp.full((R, W), NEG, jnp.float32) + 0.0 * lanef

    if tile is None:
        if not _EXP_SKIP_DMA:
            for i in range(S):
                scratch[0, i] = prev1[i]
            pltpu.make_async_copy(scratch.at[0], out_ref.at[g, 0],
                                  sem.at[0]).start()
    else:
        # init (d = 0 start values) only on the first tile; later tiles
        # resume from the carried DP[dA-1], DP[dA-2] tiles
        firstf = first.astype(jnp.float32)
        prev1 = [prev1[i] * firstf + carry_in[0, i] * (1.0 - firstf)
                 for i in range(S)]
        prev2 = [neg * firstf + carry_in[0, S + i] * (1.0 - firstf)
                 for i in range(S)]

        @pl.when(first)
        def _():
            for i in range(S):
                scratch[0, i] = prev1[i]
            pltpu.make_async_copy(scratch.at[0], out_ref.at[g, 0],
                                  sem.at[0]).start()

    # streamed emission windows are double-buffered: diagonal d+1's DMA is
    # in flight while d computes
    def est_start(d):
        pltpu.make_async_copy(est_ref.at[g, d], escr.at[d % 2],
                              sem.at[2 + d % 2]).start()

    def fetch_est(d):
        pltpu.make_async_copy(est_ref.at[g, d], escr.at[d % 2],
                              sem.at[2 + d % 2]).wait()
        e = escr[d % 2]

        @pl.when(d < ND)
        def _():
            est_start(d + 1)

        return e

    if streamed:
        est_start(1)

    def step(s, carry):
        d = dA + s if tile is not None else s
        p1 = list(carry[:S])
        p2 = list(carry[S:])
        w = winf[0, 0, ld(d)]
        w1 = winf[0, 0, ld(d - 1)]
        w2 = winf[0, 0, ld(jnp.maximum(d - 2, 0))]
        s1 = w - w1
        s2 = w - w2
        # absolute-x sources: lower/middle at x-1, upper at x
        p1m = [align(v, s1 - 1) for v in p1]
        p1a = [align(v, s1) for v in p1]
        p2m = [align(v, s2 - 1) for v in p2]
        xfw = _RowSlices(xf, w - xoff, W)
        if _EXP_CONST_EMISSIONS:
            # ablation: drop the per-step y-slice + emission build (keeps
            # the recurrence data-dependent through p1m/p1a/p2m)
            e_match = zeros - 1.0
            e_gapy = zeros - 2.0
        elif streamed:
            e_match = fetch_est(d)
            e_gapy = e_match
        else:
            ystart = cy - d + w
            if tile is not None:
                ystart = jnp.maximum(ystart, 0)
            ys = [_dyn_lane_slice2(yf, r, ystart, W)
                  for r in range(getattr(spec, "Y_ROWS", 2))]
            e_match, e_gapy = spec.emissions(xfw, *ys)

        new = spec.fwd_update_w(t, xfw, e_match, e_gapy, p1m, p1a, p2m)

        mask = band_mask(d, w)
        new = [jnp.where(mask, v, NEG) for v in new]

        slot = d % 2

        if tile is None:
            wait_pred = d >= 2
        else:
            # the d-2 ring slot was started by THIS call (two steps ago,
            # or the first-tile d=0 pre-write)
            wait_pred = jnp.where(first, d >= 2, s >= 2)

        if not _EXP_SKIP_DMA:
            @pl.when(wait_pred)
            def _():
                pltpu.make_async_copy(scratch.at[slot],
                                      out_ref.at[g, d - 2],
                                      sem.at[slot]).wait()

            for i in range(S):
                scratch[slot, i] = new[i]
            pltpu.make_async_copy(scratch.at[slot], out_ref.at[g, d],
                                  sem.at[slot]).start()
        return tuple(new) + tuple(p1)

    if tile is None:
        carry = tuple(prev1) + (neg,) * S
    else:
        carry = tuple(prev1) + tuple(prev2)
    # manual 2x unroll (Mosaic's for-loop lowering has no partial unroll):
    # halves loop-control overhead; an odd ND gets a tail step
    if tile is None:
        def step2(i, c):
            return step(2 * i + 2, step(2 * i + 1, c))
    else:
        def step2(i, c):
            return step(2 * i + 1, step(2 * i, c))

    carry = jax.lax.fori_loop(0, n_steps // 2, step2, carry)
    if n_steps % 2:
        carry = step(n_steps, carry)
    dB = dA + n_steps - 1 if tile is not None else ND
    if _EXP_SKIP_DMA:
        # ablation: the per-step ring never started; keep the loop live
        # with ONE final write of the last carry
        for i in range(S):
            scratch[0, i] = carry[i]
        cp = pltpu.make_async_copy(scratch.at[0], out_ref.at[g, dB],
                                   sem.at[0])
        cp.start()
        cp.wait()
        return
    pltpu.make_async_copy(scratch.at[dB % 2], out_ref.at[g, dB],
                          sem.at[dB % 2]).wait()
    pltpu.make_async_copy(scratch.at[(dB - 1) % 2], out_ref.at[g, dB - 1],
                          sem.at[(dB - 1) % 2]).wait()
    if tile is not None:
        # chain carry to the next tile: DP[dB] (raw @ w_dB) then DP[dB-1]
        for i in range(2 * S):
            carry_out[0, i] = carry[i]


def _masked_lse(v, mask):
    """Per-read (sublane) log-sum-exp over lanes."""
    vv = jnp.where(mask, v, NEG)
    m = jnp.max(vv, axis=1, keepdims=True)
    s = jnp.sum(jnp.where(mask, jnp.exp(vv - m), 0.0), axis=1, keepdims=True)
    return m + jnp.log(jnp.maximum(s, 1e-37))


def _sm3_backward_kernel(scal, winf, xf, yf, basef, widthf, seedf, raggedf,
                         fwd_ref, *rest, X, ND, C, R, W, NP, spec,
                         with_exp=False, tile=None):
    streamed = getattr(spec, "STREAMED", False)
    est_ref = escr = None
    tscal = carry_in = carry_out = None
    if tile is not None:
        assert not streamed and not with_exp
        (tscal, shf_ref, carry_in, _post_prev, post_ref, tot_ref,
         carry_out, sems, fscratch, pscratch) = rest
        return _sm3_backward_body_w(scal, winf, xf, yf, basef, widthf,
                                    seedf, raggedf, fwd_ref, None,
                                    post_ref, tot_ref, None, None,
                                    sems, fscratch, pscratch, None, None,
                                    X=X, ND=ND, C=C, R=R, W=W, NP=NP,
                                    spec=spec, with_exp=False, tile=tile,
                                    tscal=tscal, carry_in=carry_in,
                                    carry_out=carry_out, shf_ref=shf_ref)
    if streamed:
        est_ref, rest = rest[0], rest[1:]
    post_ref, tot_ref = rest[:2]
    rest = rest[2:]
    if with_exp:
        trans_ref, acc_ref = rest[:2]
        rest = rest[2:]
    else:
        trans_ref = acc_ref = None
    sems, fscratch, pscratch = rest[:3]
    rest = rest[3:]
    if with_exp:
        ascr, rest = rest[0], rest[1:]
    else:
        ascr = None
    if streamed:
        escr = rest[0]
    return _sm3_backward_body_w(scal, winf, xf, yf, basef, widthf,
                                seedf, raggedf, fwd_ref, est_ref,
                                post_ref, tot_ref, trans_ref, acc_ref,
                                sems, fscratch, pscratch, ascr, escr,
                                X=X, ND=ND, C=C, R=R, W=W, NP=NP,
                                spec=spec, with_exp=with_exp)


def _sm3_backward_body_w(scal, winf, xf, yf, basef, widthf, seedf, raggedf,
                         fwd_ref, est_ref, post_ref, tot_ref, trans_ref,
                         acc_ref, sems, fscratch, pscratch, ascr, escr, *,
                         X, ND, C, R, W, NP, spec, with_exp=False,
                         tile=None, tscal=None, carry_in=None,
                         carry_out=None, shf_ref=None):
    """Band-local full backward sweep d = ND..1: every tile lives in its
    diagonal's [R, W] group window; carried tiles re-align between windows
    with one dynamic lane-roll per state.  Forward windows arrive from HBM
    already band-local (no unpack); posteriors are emitted band-locally.

    EM expectations (with_exp) accumulate band-locally too
    (diagonalCalculation(_signal)_Expectations,
    impl/pairwiseAligner.c:868-912): the per-transition posterior sums land
    in trans_ref lanes, and the per-column accumulators (kmer/bin scatter
    sources) live in a two-page [2, NACC, R, W] VMEM ladder anchored at
    x-page p*W.  Group windows are monotone non-increasing along the
    backward sweep (asserted at prep), so a finished page is DMA'd to its
    HBM slot acc_ref[g, page] exactly once as the ladder walks down —
    VMEM stays O(W), independent of X, which is what lets EM run at the
    full posterior-path group size on multi-kb reads."""
    g = pl.program_id(0)
    S = spec.S
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    lanef = lane.astype(jnp.float32)
    t = [scal[0, i] for i in range(spec.NS + 3 * S)]
    E_M = spec.NS + S
    RE_M = spec.NS + 2 * S
    streamed = est_ref is not None
    FS = 6 if streamed else 4    # flush-DMA semaphore slot (with_exp)
    NACC = getattr(spec, "EXP_NACC", 1)
    needs_y = with_exp and getattr(spec, "EXP_Y_AUX", False)
    if tile is not None:
        TDL = tile["TDL"]
        d0 = tscal[0, 0]
        dH = tscal[0, 1]
        xoff = tscal[0, 2]
        cy = tscal[0, 3]
        first = tscal[0, 4] > 0
        last = tscal[0, 5] > 0
        n_steps = tile["TD"]
        # per-tile log-space shift correction [R, 1]: the fwd plane rows
        # of this tile carry cumulative re-centering shift A_t and the
        # bwd carry B_t (applied between tile calls, _tile_steps) — the
        # carried `total` stays ABSOLUTE, so posteriors repay A_t + B_t
        # here, exactly (shifts are plain subtractions that propagate
        # linearly through the log-space recursions)
        shf1 = shf_ref[0][:, 0:1]
    else:
        d0, dH, xoff, cy = 0, ND, 0, C
        first = last = True
        n_steps = ND
        shf1 = None

    def ld(d):
        # local index into the tile's metadata slice (identity untiled)
        if tile is None:
            return d
        return jnp.clip(d - d0, 0, TDL - 1)

    def band(d, w):
        base = _col_select_ref(basef, ld(d))
        width = _col_select_ref(widthf, ld(d))
        xl = lanef + w.astype(jnp.float32)
        return (xl >= base) & (xl < base + width)

    def align(v, s):
        r = pltpu.roll(v, jnp.mod(-s, W), axis=1)
        ls = lane + s
        return jnp.where((ls >= 0) & (ls < W), r, NEG)

    # streamed emission windows: double-buffered along the descending
    # sweep; the returned tile is at the REQUESTED diagonal's own window
    def est_start(d):
        pltpu.make_async_copy(est_ref.at[g, d], escr.at[d % 2],
                              sems.at[4 + d % 2]).start()

    def emissions_at(d_em, x_start):
        """Emission tiles for diagonal d_em with lanes l -> x_start + l."""
        if est_ref is not None:
            pltpu.make_async_copy(est_ref.at[g, d_em], escr.at[d_em % 2],
                                  sems.at[4 + d_em % 2]).wait()
            e = escr[d_em % 2]

            # the exp epilogue consumes emissions(1); the posterior-only
            # sweep stops at emissions(2) (a started DMA must be waited)
            @pl.when(d_em >= (2 if with_exp else 3))
            def _():
                est_start(d_em - 1)

            # stream windows live at w_{d_em}; realign to x_start
            s = x_start - winf[0, 0, d_em]
            e = align(e, s)
            return e, e
        xfw = _RowSlices(xf, x_start - xoff, W)
        ystart = cy - d_em + x_start
        if tile is not None:
            ystart = jnp.maximum(ystart, 0)
        ys = [_dyn_lane_slice2(yf, r, ystart, W)
              for r in range(getattr(spec, "Y_ROWS", 2))]
        return spec.emissions(xfw, *ys)

    if est_ref is not None:
        est_start(ND + 2)

    neg = jnp.full((R, W), NEG, jnp.float32) + 0.0 * lanef

    def start_fetch(d, slot):
        pltpu.make_async_copy(fwd_ref.at[g, d], fscratch.at[slot],
                              sems.at[2 + slot]).start()

    def wait_fetch(d, slot):
        pltpu.make_async_copy(fwd_ref.at[g, d], fscratch.at[slot],
                              sems.at[2 + slot]).wait()

    start_fetch(dH, 0)

    # The sweep writes diagonals ND..1 only; zero diagonal 0 so the row is
    # deterministic (the saturated-extraction fallback reads the full
    # plane, and uninitialized HBM showed up as run-to-run garbage there).
    # Tiled runs zero it on the LAST tile (the one that reaches d = 1).
    zrow = jnp.zeros((R, W), jnp.float32) + 0.0 * lanef

    def _zero_diag0():
        if len(getattr(spec, "POST_STATES", (0,))) == 1:
            pscratch[0] = zrow
        else:
            for j in range(len(spec.POST_STATES)):
                pscratch[0, j] = zrow
        cp = pltpu.make_async_copy(pscratch.at[0], post_ref.at[g, 0],
                                   sems.at[0])
        cp.start()
        cp.wait()

    if tile is None:
        _zero_diag0()
    else:
        pl.when(last)(_zero_diag0)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    if with_exp:
        # zero the page ladder and every HBM accumulator page (pages the
        # ladder never reaches must still be deterministic zeros)
        for j in range(NACC):
            ascr[0, j] = zrow
            ascr[1, j] = zrow

        def zero_page(pg, _):
            cp = pltpu.make_async_copy(ascr.at[0], acc_ref.at[g, pg],
                                       sems.at[FS])
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, NP, zero_page, 0)

    def flush_to(p_needed, p):
        """Walk the page ladder down to p_needed: each step DMAs the
        finished upper page to its HBM slot and shifts the ladder."""
        def body(pv):
            cp = pltpu.make_async_copy(ascr.at[1], acc_ref.at[g, pv + 1],
                                       sems.at[FS])
            cp.start()
            cp.wait()
            for j in range(NACC):
                ascr[1, j] = ascr[0, j]
                ascr[0, j] = zrow
            return pv - 1

        return jax.lax.while_loop(lambda pv: pv > p_needed, body, p)

    def accumulate_exp(d_t, w2t, em_t, eg_t, f0m, f1m, f1a, bw2, total,
                       trans_c, p):
        """Expectation contributions for one target diagonal, all inputs
        pre-aligned to the target window frame w2t."""
        p = flush_to(w2t // W, p)
        y_t = (_dyn_lane_slice2(yf, 0, C - d_t + w2t, W) if needs_y
               else None)
        xfw2 = _RowSlices(xf, w2t, W)
        probs, contribs = spec.exp_probs_w(t, xfw2, em_t, eg_t, y_t, f0m,
                                           f1m, f1a, bw2, total)
        m = band(d_t, w2t).astype(jnp.float32)
        for name, idx in spec.EXP_LANES.items():
            tot = jnp.sum(probs[name] * m, axis=1, keepdims=True)
            trans_c = trans_c + jnp.where(lane128 == idx, tot, 0.0)
        if not isinstance(contribs, (tuple, list)):
            contribs = (contribs,)
        off = w2t - p * W
        zpad = jnp.zeros((R, W), jnp.float32)
        for j, c in enumerate(contribs):
            rolled = pltpu.roll(jnp.concatenate([c * m, zpad], axis=1),
                                off, axis=1)
            ascr[0, j] = ascr[0, j] + rolled[:, :W]
            ascr[1, j] = ascr[1, j] + rolled[:, W:]
        return trans_c, p

    def step(s, carry):
        # carries are RAW (each in its own diagonal's window): n1 = bwd[d+1]
        # @ w_{d+1}, n2 = bwd[d+2] @ w_{d+2}; em/eg carry = emissions(d+2)
        # at x = w_{d+1} + l (computed last step)
        n1 = list(carry[:S])
        n2 = list(carry[S:2 * S])
        total, em_c, eg_c = carry[2 * S:2 * S + 3]
        if with_exp:
            f1_c = list(carry[2 * S + 3:3 * S + 3])
            trans_c = carry[3 * S + 3]
            p = carry[3 * S + 4]
        d = dH - s
        w = winf[0, 0, ld(d)]
        w1 = winf[0, 0, ld(d + 1)]
        w2 = winf[0, 0, ld(jnp.minimum(d + 2, dH + 2))]
        sa = _col_select_ref(seedf, ld(d))       # 0.0 or 1.0
        ra = _col_select_ref(raggedf, ld(d))
        keep = 1.0 - sa

        def cut(v):
            return v * keep + NEG * sa

        n1 = [cut(v) for v in n1]
        n2 = [cut(v) for v in n2]

        # alignment offsets into the current window
        o1 = w - w1
        o2 = w - w2
        n1a = [align(v, o1) for v in n1]       # bwd[d+1] at x
        n1p = [align(v, o1 + 1) for v in n1]   # bwd[d+1] at x+1
        n2p = [align(v, o2 + 1) for v in n2]   # bwd[d+2] at x+1
        # emissions(d+2) at x+1: realign the carried tiles (at w1 frame);
        # the cut rides on n2p, so the emission needs none.  tree_map:
        # specs may carry emission tuples (echelon's per-n terms)
        em2p = jax.tree_util.tree_map(lambda v: align(v, o1 + 1), em_c)
        # emissions(d+1) at x, fresh (becomes next step's carry)
        em1, eg1 = emissions_at(d + 1, w)

        xfw = _RowSlices(xf, w - xoff, W)
        xfp = _RowSlices(xf, w + 1 - xoff, W)
        bw = spec.bwd_update_w(t, xfw, xfp, em1, eg1, em2p, n1a, n1p, n2p)

        mask = band(d, w)
        nmask = jnp.logical_not(mask)
        seed_in = sa * mask.astype(jnp.float32)
        out_bw = []
        for i in range(S):
            v = jnp.where(nmask, NEG, bw[i])
            init_i = t[E_M + i] * (1.0 - ra) + t[RE_M + i] * ra
            out_bw.append(v * (1.0 - seed_in) + init_i * seed_in)
        bw = out_bw

        slot = s % 2
        wait_fetch(d, slot)

        # prefetch the next diagonal's forward windows — but never past
        # this tile's bottom (the next tile call re-issues its own first
        # fetch; a DMA left in flight at kernel return faults)
        d_lo = dH - n_steps + 1

        @pl.when((d >= 2) & (d > d_lo))
        def _():
            start_fetch(d - 1, (s + 1) % 2)

        f = [fscratch[slot, i] for i in range(S)]

        prod = f[0] + bw[0]
        for i in range(1, S):
            prod = _log_add(prod, f[i] + bw[i])
        t0 = _masked_lse(prod, mask)
        if shf1 is not None:
            # seed in the ABSOLUTE frame: stored DP rows are
            # (absolute - shift), so absolute = stored + shift
            t0 = t0 + shf1
        total = total * keep + t0 * sa

        if with_exp:
            # expectations into target diagonal d+2: middle source fwd[d]
            # (fetched this step @ w), lower/upper source fwd[d+1]
            # (carried raw @ w1), target backward n2 (raw @ w2)
            f0m = [align(v, w2 - w - 1) for v in f]
            f1m = [align(v, w2 - w1 - 1) for v in f1_c]
            f1a = [align(v, w2 - w1) for v in f1_c]
            em_t = jax.tree_util.tree_map(lambda v: align(v, w2 - w1), em_c)
            eg_t = jax.tree_util.tree_map(lambda v: align(v, w2 - w1), eg_c)
            trans_c, p = accumulate_exp(d + 2, w2, em_t, eg_t, f0m, f1m,
                                        f1a, n2, total, trans_c, p)

        df = jnp.float32(d)
        xl = lanef + w.astype(jnp.float32)
        ok = mask & (xl > 0) & (xl < df)
        post_states = getattr(spec, "POST_STATES", (0,))

        def post_of(si):
            z = f[si] + bw[si] - total
            if shf1 is not None:
                z = z + shf1  # f @ A_t + bw @ B_t vs absolute total
            return jnp.where(ok, jnp.exp(jnp.minimum(z, 0.69)), 0.0)

        pslot = s % 2

        @pl.when(s >= 2)
        def _():
            pltpu.make_async_copy(pscratch.at[pslot],
                                  post_ref.at[g, dH - (s - 2)],
                                  sems.at[pslot]).wait()

        if len(post_states) == 1:
            pscratch[pslot] = post_of(post_states[0])
        else:
            for j, si in enumerate(post_states):
                pscratch[pslot, j] = post_of(si)
        pltpu.make_async_copy(pscratch.at[pslot], post_ref.at[g, d],
                              sems.at[pslot]).start()

        # next step's n2 = this step's (cut) n1, raw @ w_{d+1}; next
        # step's em carry = emissions(d+1) at w (the next w1)
        out = tuple(bw) + tuple(n1) + (total, em1, eg1)
        if with_exp:
            out = out + tuple(f) + (trans_c, p)
        return out

    em_init, eg_init = emissions_at(dH + 2, winf[0, 0, ld(dH + 1)])
    lift = functools.partial(jax.tree_util.tree_map,
                             lambda v: v + 0.0 * lanef)
    em0, eg0 = lift(em_init), lift(eg_init)
    if tile is None:
        carry = ((neg,) * (2 * S)
                 + (jnp.full((R, 1), NEG, jnp.float32), em0, eg0))
        if with_exp:
            zero128 = jnp.zeros((R, 128), jnp.float32) \
                + 0.0 * lane128.astype(jnp.float32)
            carry = carry + (neg,) * S + (zero128,
                                          winf[0, 0, jnp.int32(ND + 2)]
                                          // W)
    else:
        # resume from the carried sweep state unless this is the first
        # (topmost) tile; carry rows: n1[S], n2[S], total, em leaves,
        # eg leaves — all raw in their own diagonals' window frames
        em_leaves, em_def = jax.tree_util.tree_flatten(em0)
        eg_leaves, eg_def = jax.tree_util.tree_flatten(eg0)
        n_em = len(em_leaves)
        firstf = first.astype(jnp.float32)

        def sel(init_v, row):
            return init_v * firstf + carry_in[0, row] * (1.0 - firstf)

        states = [sel(neg, i) for i in range(2 * S)]
        tot0 = (jnp.full((R, 1), NEG, jnp.float32) * firstf
                + carry_in[0, 2 * S][:, 0:1] * (1.0 - firstf))
        em_c0 = jax.tree_util.tree_unflatten(
            em_def, [sel(em_leaves[j], 2 * S + 1 + j)
                     for j in range(n_em)])
        eg_c0 = jax.tree_util.tree_unflatten(
            eg_def, [sel(eg_leaves[j], 2 * S + 1 + n_em + j)
                     for j in range(len(eg_leaves))])
        carry = tuple(states) + (tot0, em_c0, eg_c0)
    # manual 2x unroll, same rationale as the forward loop
    def step2(i, c):
        return step(2 * i + 1, step(2 * i, c))

    carry = jax.lax.fori_loop(0, n_steps // 2, step2, carry)
    if n_steps % 2:
        carry = step(n_steps - 1, carry)
    total = carry[2 * S]
    tot_ref[0] = total + jnp.zeros((R, tot_ref.shape[-1]), jnp.float32)
    if tile is not None:
        for i in range(2 * S):
            carry_out[0, i] = carry[i]
        carry_out[0, 2 * S] = carry[2 * S] + 0.0 * lanef
        out_leaves = (jax.tree_util.tree_leaves(carry[2 * S + 1])
                      + jax.tree_util.tree_leaves(carry[2 * S + 2]))
        for j, leaf in enumerate(out_leaves):
            carry_out[0, 2 * S + 1 + j] = leaf

    if with_exp:
        # epilogue: targets 2 and 1 (the loop covers targets 3..ND+2).
        # After the loop: n1 = bwd[1] @ w1, n2 = bwd[2] @ w2, f1 = fwd[1]
        # @ w1, em/eg carry = emissions(2) @ w1; fwd[0] needs one
        # synchronous fetch (every in-loop fetch has been waited).
        n1 = list(carry[:S])
        n2 = list(carry[S:2 * S])
        em_c, eg_c = carry[2 * S + 1], carry[2 * S + 2]
        f1_c = list(carry[2 * S + 3:3 * S + 3])
        trans_c = carry[3 * S + 3]
        p = carry[3 * S + 4]
        w0 = winf[0, 0, 0]
        w1 = winf[0, 0, 1]
        start_fetch(0, 0)
        wait_fetch(0, 0)
        f0 = [fscratch[0, i] for i in range(S)]
        # target 2: middle from fwd[0], lower/upper from fwd[1], bwd[2]
        w2t = winf[0, 0, 2]
        em_t = jax.tree_util.tree_map(lambda v: align(v, w2t - w1), em_c)
        eg_t = jax.tree_util.tree_map(lambda v: align(v, w2t - w1), eg_c)
        trans_c, p = accumulate_exp(
            2, w2t, em_t, eg_t,
            [align(v, w2t - w0 - 1) for v in f0],
            [align(v, w2t - w1 - 1) for v in f1_c],
            [align(v, w2t - w1) for v in f1_c],
            n2, total, trans_c, p)
        # target 1: no middle (source diagonal -1), lower/upper from fwd[0]
        w1t = winf[0, 0, 1]
        em1t, eg1t = emissions_at(1, w1t)
        trans_c, p = accumulate_exp(
            1, w1t, em1t, eg1t,
            [neg] * S,
            [align(v, w1t - w0 - 1) for v in f0],
            [align(v, w1t - w0) for v in f0],
            n1, total, trans_c, p)
        trans_ref[0] = trans_c
        # final ladder flush: pages p+1 and p
        cp = pltpu.make_async_copy(ascr.at[1], acc_ref.at[g, p + 1],
                                   sems.at[FS])
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(ascr.at[0], acc_ref.at[g, p],
                                   sems.at[FS])
        cp.start()
        cp.wait()

    d_lo = dH - n_steps + 1   # 1 untiled; the tile's bottom diagonal
    pltpu.make_async_copy(pscratch.at[(n_steps - 1) % 2],
                          post_ref.at[g, d_lo],
                          sems.at[(n_steps - 1) % 2]).wait()
    pltpu.make_async_copy(pscratch.at[(n_steps - 2) % 2],
                          post_ref.at[g, d_lo + 1],
                          sems.at[(n_steps - 2) % 2]).wait()


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _quantize_events(ev):
    """Per-channel affine u16 quantization of the event upload
    ([B, E, C] f32 -> u16 codes + [2C] f32 scales) — halves the biggest
    H2D transfer on the slow host link.  Code 0 is reserved for exact 0.0
    (padding / y=0 rows) so dequantization preserves the no-event value
    bit-exactly; real values map to 1..65535 with max error
    range/2/65534 (~1e-3 pA at nanopore scales, ~40x below the f32
    score drift the kernels already carry vs the f64 engine)."""
    C = ev.shape[-1]
    flat = ev.reshape(-1, C)
    # range over the real (nonzero) values — zeros are padding and carry
    # through the reserved code, so they must not stretch the range
    masked = np.where(flat == 0.0, np.nan, flat)
    lo = np.nan_to_num(np.nanmin(masked, axis=0), nan=0.0)
    hi = np.nan_to_num(np.nanmax(masked, axis=0), nan=0.0)
    sc = np.maximum((hi - lo) / 65534.0, 1e-12).astype(np.float32)
    q = np.rint((ev - lo) / sc).astype(np.int64) + 1
    q = np.where(ev == 0.0, 0, np.clip(q, 1, 65535)).astype(np.uint16)
    return q, np.concatenate([sc, lo.astype(np.float32)])


def _dequantize_events(evq, evs):
    """Device-side inverse of _quantize_events ([..., C] u16 -> f32)."""
    C = evq.shape[-1]
    sc, lo = evs[:C], evs[C:]
    v = (evq.astype(jnp.float32) - 1.0) * sc + lo
    return jnp.where(evq == 0, 0.0, v)


def _base_codes(reads, X):
    """Per-read base codes [B, X + KMER_LENGTH - 1] u8 for the device-side
    kmer-index build: position x holds ref[x - 1] as 0..3 (A,C,G,T), 4
    for N / padding / the x=0 boundary — a 4x smaller upload than int16
    kmer indices."""
    from ..constants import KMER_LENGTH
    from ..models import kmers as K

    B = len(reads)
    codes = np.full((B, X + KMER_LENGTH - 1), 4, dtype=np.uint8)
    for r, (ref, *_rest) in enumerate(reads):
        b = K.seq_to_base_indices(ref)
        codes[r, 1:1 + len(b)] = np.minimum(b, 4)
    return codes


def _kx_from_codes(codes):
    """Device-side seq_to_kmer_indices: [B, X + K - 1] u8 base codes ->
    [B, X] int32 kmer indices, any window containing a non-ACGT code ->
    N_SENTINEL (exactly the host function's contract)."""
    from ..constants import KMER_LENGTH, N_SENTINEL

    c = codes.astype(jnp.int32)
    X = c.shape[1] - (KMER_LENGTH - 1)
    kx = jnp.zeros(c.shape[:1] + (X,), jnp.int32)
    ok = jnp.ones(c.shape[:1] + (X,), bool)
    for i in range(KMER_LENGTH):
        ci = jax.lax.slice_in_dim(c, i, i + X, axis=1)
        kx = kx + ci * (4 ** (KMER_LENGTH - 1 - i))
        ok = ok & (ci < 4)
    return jnp.where(ok, kx, N_SENTINEL)


def _vanilla_kmer_pair(kx, xp):
    """getKmer2 skip-bin kmer pair from the per-column kmer indices
    kx[x] = kmer at ref position x-1 (_kx_from_codes): position
    pos(x) = x-2 for x >= 2 else 0 and its successor
    (StateMachine3Vanilla.x_skip_bins / sequence_getKmer2,
    impl/pairwiseAligner.c:336-341), so kxp[x] = kx[x-1] (x >= 2, else
    kx[1]) and kxn[x] = kx[x] (x >= 2, else kx[2]).  ``xp`` is jnp or np
    (device build and its host twin in the EM finalize share this).

    One knowingly benign difference from an all_idx gather with a
    clipped position: kxp at the out-of-band column x = l_x + 1 is a
    valid kmer here instead of the sentinel — that column is outside
    every band (band x <= l_x), so no posterior or expectation reads
    it."""
    rep = (jnp.repeat if xp is jnp else np.repeat)
    cat = (jnp.concatenate if xp is jnp else np.concatenate)
    kxp = cat([rep(kx[:, 1:2], 2, 1), kx[:, 1:-1]], 1)
    kxn = cat([rep(kx[:, 2:3], 2, 1), kx[:, 2:]], 1)
    return kxp, kxn


def _kx_from_codes_np(codes):
    """Host twin of _kx_from_codes (same contract, numpy) — used by the
    expectation finalize, where the codes are already host-resident."""
    from ..constants import KMER_LENGTH, N_SENTINEL

    c = codes.astype(np.int64)
    X = c.shape[1] - (KMER_LENGTH - 1)
    kx = np.zeros(c.shape[:1] + (X,), np.int64)
    ok = np.ones(c.shape[:1] + (X,), bool)
    for i in range(KMER_LENGTH):
        ci = c[:, i:i + X]
        kx += ci * (4 ** (KMER_LENGTH - 1 - i))
        ok &= ci < 4
    kx[~ok] = N_SENTINEL
    return kx


class _PallasAlignerBase:
    """Group-of-R batched banded forward/backward over the wavefront
    kernels, parameterized by a machine spec (emissions + transition
    combines) and per-machine device feature assembly.

    Fast path: exact full backward (no traceback windowing), f32, posteriors
    emitted as band-local [R, W] windows per diagonal.  R (reads per kernel
    instance) amortizes the per-diagonal fixed costs: with band-local
    compute the per-step vector work is a handful of [R, 128] vregs, so
    per-step fixed cost dominates and packing more reads per launch is
    near-free (v5e strawman measured 4.84e8 cells/s at R=8 vs 8.04e8 at
    R=32, extracted pairs bit-identical).  Default: 32 compiled, 8 under
    interpret (batches pad to a multiple of R; CPU interpret tests stay
    cheap at 8).
    """

    spec = None  # subclass: machine spec class
    # STREAMED specs: build the emission stream with one matmul per read
    # (False forces the per-diagonal scan build)
    stream_matmul = True

    def __init__(self, params=None, interpret=False, group=None):
        from ..align import AlignmentParams
        self.params = params or AlignmentParams()
        self.interpret = interpret
        self.group = group if group is not None else (8 if interpret else 32)
        self._cache = {}
        # upload hook: mesh runs swap in a sharded device_put so every
        # per-read host array lands pre-sharded over the ('data',) axis
        # (feature assembly and band construction then SPMD-partition
        # under jit with no resharding); model tables stay replicated
        self._dput = jax.device_put
        # model-table hook: identity normally (tables are cached device
        # arrays); mesh runs swap in a replicated device_put
        self._tab_put = lambda x: x

    # subclass hooks -----------------------------------------------------
    def _scalars(self, sm):
        raise NotImplementedError

    def _feature_inputs(self, reads, X):
        """dict of compact host arrays merged into prep."""
        raise NotImplementedError

    def _device_features(self, sm, prep):
        """(xf [Bp, NXF, X], yf [Bp, 2, C+X+256]) on device."""
        raise NotImplementedError


class StrawmanPallasAligner(_PallasAlignerBase):
    """3-state strawman signal machine (getStrawManStateMachine3) on the
    wavefront kernels."""

    spec = _StrawmanSpec

    def _scalars(self, sm, ragged_left=False):
        p = sm.p
        vals = [p["match_continue"], p["match_from_gap_x"], p["match_from_gap_y"],
                p["gap_open_x"], p["gap_extend_x"], p["gap_switch_to_x"],
                p["gap_open_y"], p["gap_extend_y"]]
        start = sm.ragged_start_vec() if ragged_left else sm.start_vec()
        end = sm.end_vec()
        ragged_end = sm.ragged_end_vec()
        arr = np.array([vals + list(start) + list(end) + list(ragged_end)],
                       dtype=np.float64)
        arr = np.nan_to_num(arr, neginf=NEG)
        return np.maximum(arr, NEG).astype(np.float32)

    def _device_features(self, sm, prep):
        mm, gm, gapx = self._model_tables(sm)
        sp = prep.get("sp")
        return self._assemble_fn(prep["C"], prep["C"] + prep["X"] + 256,
                                 scaled=sp is not None)(
            *([self._dput(prep["codes"]), self._dput(prep["evq"]),
               jax.device_put(prep["evs"])]
              + ([self._dput(sp)] if sp is not None else [])
              + [mm, gm, gapx]))

    def _feature_inputs(self, reads, X):
        """Compact per-read inputs for on-device feature assembly: base
        codes [B, X+5] u8 (kmer indices rebuild on device — 4x smaller
        than int16 kmer indices) and events quantized to u16 (+4 f32
        scales).  Keeping the upload small matters — the host->device
        link is the slow resource, so the [B, 9, X] gathers happen on the
        TPU (_assemble_fn).  Host-side f32 events stay in prep for the
        HDP stream builder."""
        B = len(reads)
        max_ev = max(r[1].shape[0] for r in reads)
        ev = np.zeros((B, max_ev + 1, 2), np.float32)
        for r, (_ref, events, _l_x, _l_y, _a) in enumerate(reads):
            ev[r, 1:1 + len(events), :] = events[:, :2]
        evq, evs = _quantize_events(ev)
        return dict(ev=ev, codes=_base_codes(reads, X), evq=evq, evs=evs)

    def _assemble_fn(self, C, Y, scaled=False):
        """Jitted on-device feature assembly (cached per (C, Y) shape).

        With ``scaled``, per-read scale params sp [B, 5] = (scale, shift,
        var, scale_sd, var_sd) are applied to the match-model gathers —
        emissions_signal_scaleModel (impl/stateMachine.c:632-674) done on
        device, so one unscaled table serves a whole batch of reads."""
        key = ("asm", C, Y, scaled)
        if key in self._cache:
            return self._cache[key]
        from ..constants import NUM_OF_KMERS

        def assemble(codes, evq, evs, sp, mm, gm, gapx):
            kx = _kx_from_codes(codes)
            ev = _dequantize_events(evq, evs)
            valid = kx <= NUM_OF_KMERS
            safe = jnp.clip(kx, 0, NUM_OF_KMERS - 1)
            if sp is None:
                rows = [jnp.where(valid, mm[safe, c], 0.0) for c in range(4)]
            else:
                scale = sp[:, 0:1]
                shift = sp[:, 1:2]
                var = sp[:, 2:3]
                scale_sd = sp[:, 3:4]
                var_sd = sp[:, 4:5]
                lvl_mu = mm[safe, 0] * scale + shift
                lvl_sd = mm[safe, 1] * var
                nz_mu = mm[safe, 2] * scale_sd
                nz_sd = jnp.sqrt(nz_mu ** 3
                                 / jnp.maximum(mm[safe, 4] * var_sd, 1e-30))
                rows = [jnp.where(valid, r, 0.0)
                        for r in (lvl_mu, lvl_sd, nz_mu, nz_sd)]
            rows += [jnp.where(valid, gm[safe, c], 0.0) for c in range(4)]
            rows += [jnp.maximum(jnp.where(valid, gapx[safe], NEG), NEG)]
            xf = jnp.stack(rows, axis=1).astype(jnp.float32)
            B, E, _ = ev.shape
            n = min(E, C + 1)  # y in [0, C] maps to j = C - y >= 0
            yf = jnp.zeros((B, 2, Y), jnp.float32)
            yf = yf.at[:, 0, C - n + 1:C + 1].set(ev[:, :n, 0][:, ::-1])
            yf = yf.at[:, 1, C - n + 1:C + 1].set(ev[:, :n, 1][:, ::-1])
            return xf, yf

        if scaled:
            fn = jax.jit(assemble)
        else:
            fn = jax.jit(lambda codes, evq, evs, mm, gm, gapx:
                         assemble(codes, evq, evs, None, mm, gm, gapx))
        self._cache[key] = fn
        return fn

    def _model_cache(self, sm, build):
        """Device-resident model tables, uploaded once per state machine.

        The cache holds a strong reference to each sm (so an id() is never
        reused while its entry is alive) and keeps only the most recent few
        models (bounds device memory across EM iterations)."""
        lru = self._cache.setdefault("models", {})
        key = id(sm)
        if key not in lru or lru[key][0] is not sm:
            lru[key] = (sm, build(sm))
            while len(lru) > 4:
                lru.pop(next(iter(lru)))
        return lru[key][1]

    def _model_tables(self, sm):
        return self._model_cache(sm, lambda sm: (
            jax.device_put(np.asarray(sm.model.match_model[:, :5],
                                      np.float32)),
            jax.device_put(np.asarray(sm.model.gap_y_model[:, :4],
                                      np.float32)),
            jax.device_put(np.nan_to_num(
                np.asarray(sm.gap_x_log_probs, np.float32), neginf=NEG)),
        ))

    def prepare(self, sm, reads, ragged_right=False, scale_params=None,
                shape_hint=None, bands=None, pad_groups_to=None):
        from ..ops.band import make_bands

        p = self.params
        R = self.group
        if bands is None:
            bands = make_bands([r[4] for r in reads], [r[2] for r in reads],
                               [r[3] for r in reads], p.diagonal_expansion)
        B = len(reads)
        G = _round_up(B, R) // R
        if pad_groups_to:
            # mesh runs shard whole groups: G must divide the device count
            G = _round_up(G, pad_groups_to)
        Bp = G * R
        X = _round_up(max(r[2] for r in reads) + 2, 128)
        ND = max(b.n_diag for b in bands)
        if shape_hint is not None:
            # (max l_x, max n_diag) over a LARGER batch this chunk belongs
            # to: pins the kernel shape key so chunked pipelines compile
            # once instead of per chunk
            hx, hnd = shape_hint
            X = max(X, _round_up(hx + 2, 128))
            ND = max(ND, hnd)
        C = ND + 3
        NDp = _round_up(ND + 3, 128) + 128

        finputs = self._feature_inputs(reads + [reads[-1]] * (Bp - B), X)
        # band metadata ships as compact anchor chains + (l_x, l_y, n_diag,
        # ragged) per read and is rebuilt on device (_device_bands) — the
        # host->device link is the scarce resource and the full [Bp, NDp]
        # base/width/seed arrays dwarf the anchors that define them.
        # int16 suffices below 32k columns; longer references (the tiled
        # long-alignment path) widen to int32
        A_max = max(1, max(len(r[4]) for r in reads))
        # anchors are (x, y) pairs: the wire dtype must cover BOTH axes —
        # a short reference with >32k events (real for long nanopore
        # reads) would silently wrap y in int16
        Y_max = max(r[3] for r in reads)
        anch = np.full((Bp, A_max, 2), -1,
                       np.int16 if X < 2 ** 15 and Y_max < 2 ** 15
                       else np.int32)
        meta = np.zeros((Bp, 4), np.int32)
        for r, (_x, _y, l_x, l_y, a) in enumerate(reads):
            if len(a):
                anch[r, : len(a)] = np.asarray(a, np.int64)
            meta[r] = (l_x, l_y, bands[r].n_diag, 1 if ragged_right else 0)
        # padding rows reuse the last read's band (no ragged end)
        for r in range(B, Bp):
            anch[r] = anch[B - 1]
            meta[r] = meta[B - 1]
            meta[r, 3] = 0

        # per-group posterior windows: [lo, lo+W) covers the union of the
        # group's bands on every diagonal (from the host bands; padding
        # rows reuse the last read's band)
        lo_all = np.full((Bp, NDp), np.inf)
        hi_all = np.full((Bp, NDp), -np.inf)
        for r in range(Bp):
            band = bands[min(r, B - 1)]
            n = band.n_diag
            act = band.width > 0
            lo_all[r, : n + 1] = np.where(act, band.x_lo, np.inf)
            hi_all[r, : n + 1] = np.where(act, band.x_lo + band.width,
                                          -np.inf)
        W = 128
        win = np.zeros((G, NDp), np.int32)
        for g in range(G):
            lo = lo_all[g * R:(g + 1) * R].min(axis=0)
            hi = hi_all[g * R:(g + 1) * R].max(axis=0)
            any_act = np.isfinite(lo)
            spread = np.where(any_act, hi - lo, 0.0)
            W = max(W, int(_round_up(int(spread.max()), 128)))
        W = min(W, X)
        for g in range(G):
            lo = lo_all[g * R:(g + 1) * R].min(axis=0)
            # forward-fill diagonals with no active band with the last
            # active window start: keeps per-diagonal group windows
            # monotone non-decreasing in d (band corners are monotone
            # along an anchor chain), which the EM page ladder relies on
            fin = np.isfinite(lo)
            idx = np.where(fin, np.arange(lo.size), 0)
            np.maximum.accumulate(idx, out=idx)
            lo = np.where(fin[idx], lo[idx], 0.0)
            win[g] = np.clip(lo.astype(np.int64), 0, X - W)
        if (np.diff(win, axis=1) < 0).any():
            raise ValueError("non-monotone group window starts (anchor "
                             "chain must be monotone)")
        out_extra = {}
        if scale_params is not None:
            sp = np.ones((Bp, 5), np.float32)
            sp[:, 1] = 0.0  # identity: scale 1, shift 0, var/sds 1
            sp[:B] = np.asarray(scale_params, np.float32)
            out_extra["sp"] = sp
        # one coalesced int32 upload for (anchors, meta, windows): each
        # device_put pays a fixed tunnel round-trip, so fewer/larger
        # transfers win
        bandmeta = np.concatenate([
            anch.astype(np.int32).ravel(), meta.ravel(),
            win.astype(np.int32).ravel()])
        return dict(**finputs, **out_extra, anch=anch, meta=meta,
                    bandmeta=bandmeta,
                    win=win, bands=bands, X=X, ND=ND, C=C,
                    B=B, Bp=Bp, R=R, W=W, NDp=NDp)

    def _stream_args(self, sm, prep):
        """Extra kernel inputs for STREAMED specs (HBM emission stream);
        () for machines that compute emissions in-kernel."""
        return ()

    def _device_bands(self, NDp, A_max):
        """Jitted on-device band construction from anchor chains — the
        vectorized band_construct (ops/band.py, impl/pairwiseAligner.c:131-184)
        as segment-lookup array math: diagonal d's corners come from the
        first waypoint segment with nxay >= d (searchsorted), then the
        parity fix and the four coordinate bounds apply as arithmetic.
        Returns f32 (basef, widthf, seedf, raggedf), identical to the host
        arrays (asserted in tests)."""
        exp_ = int(self.params.diagonal_expansion)
        key = ("devbands", NDp, A_max, exp_)
        if key in self._cache:
            return self._cache[key]

        def one(a, m):
            l_x, l_y, n, ragged = m[0], m[1], m[2], m[3]
            valid = a[:, 0] >= 0
            # matrix coords are sequence coords + 1; padded slots collapse
            # onto the terminal corner (degenerate zero-length segments)
            ax = jnp.where(valid, a[:, 0].astype(jnp.int32) + 1, l_x)
            ay = jnp.where(valid, a[:, 1].astype(jnp.int32) + 1, l_y)
            zero = jnp.zeros((1,), jnp.int32)
            wx = jnp.concatenate([zero, ax, zero + l_x])
            wy = jnp.concatenate([zero, ay, zero + l_y])
            pxay = wx[:-1] + wy[:-1]
            pxmy = wx[:-1] - wy[:-1]
            nxay = wx[1:] + wy[1:]
            nxmy = wx[1:] - wy[1:]
            seg_x_l = jnp.clip((pxay + (pxmy - exp_)) // 2, 0, l_x)
            seg_y_l = jnp.clip((nxay - (nxmy - exp_)) // 2, 0, l_y)
            seg_x_u = jnp.clip((nxay + (nxmy + exp_)) // 2, 0, l_x)
            seg_y_u = jnp.clip((pxay - (pxmy + exp_)) // 2, 0, l_y)
            d = jnp.arange(NDp, dtype=jnp.int32)
            # first segment with nxay >= d: a comparison-sum for small
            # [NDp, n_seg] (jnp.searchsorted lowers much slower there),
            # binary search when the matrix would be big (long-alignment
            # tiled path: 100kb+ refs with tens of thousands of lastz
            # anchors would materialize a multi-GB comparison matrix)
            if NDp * nxay.shape[0] <= 2 ** 22:
                k = jnp.clip(jnp.sum(nxay[None, :] < d[:, None], axis=1),
                             0, nxay.shape[0] - 1)
            else:
                k = jnp.clip(jnp.searchsorted(nxay, d, side="left"),
                             0, nxay.shape[0] - 1)
            nz = d > 0
            x_l = jnp.where(nz, seg_x_l[k], 0)
            y_l = jnp.where(nz, seg_y_l[k], 0)
            x_u = jnp.where(nz, seg_x_u[k], 0)
            y_u = jnp.where(nz, seg_y_u[k], 0)
            xmy_l = x_l - y_l
            xmy_r = x_u - y_u
            xmy_l = jnp.where((d + xmy_l) % 2 != 0, xmy_l + 1, xmy_l)
            xmy_r = jnp.where((d + xmy_r) % 2 != 0, xmy_r + 1, xmy_r)
            xmy_l = xmy_l + 2 * jnp.maximum(x_l - (d + xmy_l) // 2, 0)
            xmy_l = xmy_l + 2 * jnp.maximum((d - xmy_l) // 2 - y_l, 0)
            xmy_r = xmy_r - 2 * jnp.maximum((d + xmy_r) // 2 - x_u, 0)
            xmy_r = xmy_r - 2 * jnp.maximum(y_u - (d - xmy_r) // 2, 0)
            x_lo = (d + xmy_l) // 2
            width = (xmy_r - xmy_l) // 2 + 1
            in_range = d <= n
            basef = jnp.where(in_range, x_lo, 0).astype(jnp.float32)
            widthf = jnp.where(in_range, width, 0).astype(jnp.float32)
            seedf = (d == n).astype(jnp.float32)
            raggedf = seedf * (ragged > 0)
            return basef, widthf, seedf, raggedf

        fn = jax.jit(jax.vmap(one))
        self._cache[key] = fn
        return fn

    def run(self, sm, reads, ragged_right=False, ragged_left=False,
            compact_k=4096, expectations=False, scale_params=None,
            shape_hint=None, defer_expectations=False, bands=None,
            mesh=None, tile_diag=None):
        est_x = _round_up(max(r[2] for r in reads) + 2, 128)
        # f32 posterior precision is bounded by the TOTAL log magnitude,
        # which grows with the DIAGONAL count (x + y), not x alone: at
        # ~20k+ diagonals the fwd/bwd rounding walks measurably distort
        # mid-sequence posteriors (BASELINE.md "Untiled precision wall"),
        # and the tiled path's per-tile re-centering is the fix.  Route
        # on the estimated diagonal count.
        est_nd = est_x + max(r[3] for r in reads) + 3
        if shape_hint is not None:
            est_x = max(est_x, _round_up(shape_hint[0] + 2, 128))
            est_nd = max(est_nd, shape_hint[1])
        streamed = getattr(self.spec, "STREAMED", False)
        nps1 = len(getattr(self.spec, "POST_STATES", (0,))) == 1
        nd_long = est_nd >= 2 ** 14
        if tile_diag is not None or est_x >= 2 ** 15 or (
                nd_long and mesh is None and not expectations
                and not streamed and nps1):
            # long-alignment tiled path: O(tile) VMEM at any length
            if mesh is not None:
                raise NotImplementedError(
                    "the tiled long-alignment path is single-device; "
                    "shard long batches across processes instead")
            if expectations:
                raise NotImplementedError(
                    "in-kernel EM expectations run untiled (< 32k "
                    "columns); split the alignment "
                    "(ops/anchors.get_split_points) or use the scan "
                    "engine (get_expectations_using_anchors)")
            return self._run_tiled(
                sm, reads, ragged_right=ragged_right,
                ragged_left=ragged_left, compact_k=compact_k,
                scale_params=scale_params, bands=bands,
                tile_diag=tile_diag)
        if nd_long:
            # expectation / mesh / streamed runs have no tiled variant:
            # run untiled (as always) but say what that costs
            import warnings
            warnings.warn(
                f"~{est_nd} diagonals on the untiled fast path: f32 "
                "posterior precision degrades past ~16k diagonals "
                "(BASELINE.md 'Untiled precision wall'); split the "
                "alignment at anchor gaps (ops/anchors.get_split_points) "
                "or use the f64 scan engine for full accuracy",
                stacklevel=2)
        if mesh is not None:
            return self._run_mesh(
                sm, reads, mesh=mesh, ragged_right=ragged_right,
                ragged_left=ragged_left, compact_k=compact_k,
                expectations=expectations, scale_params=scale_params,
                shape_hint=shape_hint, bands=bands)
        prep = self.prepare(sm, reads, ragged_right=ragged_right,
                            scale_params=scale_params,
                            shape_hint=shape_hint, bands=bands)
        X, ND, C, W = prep["X"], prep["ND"], prep["C"], prep["W"]
        # a short reference with a very long event axis routes untiled
        # (routing keys on X), but ND grows with BOTH axes and the fwd
        # plane [G, NDp, S, R, W] is the dominant HBM consumer — fail
        # with the remedies instead of an opaque allocator OOM
        S = self.spec.S
        NPS = len(getattr(self.spec, "POST_STATES", (0,)))
        Gh = prep["Bp"] // prep["R"]
        plane_bytes = 4 * Gh * prep["NDp"] * prep["R"] * W * (S + NPS)
        if plane_bytes > 14e9:
            raise ValueError(
                f"banded planes need ~{plane_bytes / 1e9:.1f} GB HBM "
                f"(ND={ND} diagonals, {Gh} groups of {prep['R']}): "
                "dispatch the batch in smaller chunks, lower the group "
                "size, or split the alignments at anchor gaps "
                "(ops/anchors.get_split_points)")
        scal = self._scalars(sm, ragged_left=ragged_left)
        fwd_fn, bwd_fn, bwd_exp_fn = self._fns(X, ND, C, W)
        # features assemble on device from compact uploads (kmer indices +
        # events + once-per-model tables) — the upload link is slow
        xf, yf = self._device_features(sm, prep)
        Bp, A = prep["anch"].shape[:2]
        G = Bp // prep["R"]
        NDp = prep["NDp"]
        key = ("bandsplit", Bp, A, G, NDp)
        if key not in self._cache:
            na, nm = Bp * A * 2, Bp * 4

            def split(bm):
                anch = bm[:na].reshape(Bp, A, 2)
                meta = bm[na:na + nm].reshape(Bp, 4)
                win3 = bm[na + nm:].reshape(G, 1, NDp)
                return anch, meta, win3

            self._cache[key] = jax.jit(split)
        anch_d, meta_d, win3 = self._cache[key](
            jax.device_put(prep["bandmeta"]))
        basef, widthf, seedf, raggedf = self._device_bands(NDp, A)(
            anch_d, meta_d)
        extra = self._stream_args(sm, prep)  # () unless spec.STREAMED
        fwd = fwd_fn(scal, win3, xf, yf, basef, widthf, *extra)
        out = {}
        if expectations:
            try:
                posts, totals, trans, gapx = bwd_exp_fn(
                    scal, win3, xf, yf, basef, widthf, seedf, raggedf,
                    fwd, *extra)
            except Exception as e:  # jax.errors.JaxRuntimeError
                if "vmem" not in str(e).lower():
                    raise
                # the expectation backward's per-column accumulator
                # ladder is O(NACC * R * W) VMEM; a ragged batch widens
                # the per-group window union W, and at group=64 the
                # Mosaic scoped-vmem limit (16 MB) can overflow at
                # compile time.  The EM operating point is group=32
                # (see CLAUDE.md / BASELINE.md group-size sweep).
                raise ValueError(
                    f"expectation kernels exceeded the TPU's scoped "
                    f"VMEM at group={prep['R']}, W={prep['W']}: run EM "
                    "with group<=32 (the library default), or batch "
                    "shape-homogeneous reads to narrow the per-group "
                    "window union") from e
            flat = self._exp_dispatch(prep, trans, gapx, totals)
            if defer_expectations:
                # no D2H here: the caller finalizes after dispatching the
                # next chunk's kernels (finalize_expectations); drop the
                # posterior plane reference so HBM frees between chunks
                out["expectations_flat"] = flat
                out["prep"] = prep
                out["totals"] = totals
                return out
            out["expectations"] = self._exp_finalize(sm, prep,
                                                     np.asarray(flat))
        else:
            posts, totals = bwd_fn(scal, win3, xf, yf, basef, widthf,
                                   seedf, raggedf, fwd, *extra)
        if not expectations:
            # E-step consumers only read out["expectations"]; the top-k
            # posterior compaction (and any later D2H of it) is pure
            # overhead there, so it runs only on posterior-decoding runs.
            global _compact_jit
            if _compact_jit is None:
                import jax as _jax
                _compact_jit = _jax.jit(compact_posteriors,
                                        static_argnums=1)
            out["compact"] = _compact_jit(posts, min(compact_k, ND * W))
        out.update(posteriors=posts, totals=totals, prep=prep)
        return out

    def _run_mesh(self, sm, reads, *, mesh, ragged_right=False,
                  ragged_left=False, compact_k=4096, expectations=False,
                  scale_params=None, shape_hint=None, bands=None):
        """Data-parallel run over a 1-axis device `mesh`: the fast-path
        equivalent of the reference's per-read process fan-out
        (scripts/signalAlign.py:101-141, scripts/trainModels.py:176-209).

        Read groups shard over the mesh axis: every per-read host upload
        lands pre-sharded (NamedSharding on the leading read/group dim),
        feature assembly and band construction SPMD-partition under jit,
        and the Pallas fwd/bwd kernels run per-device under shard_map on
        that device's groups.  Posterior runs also compact per device
        (top-k never crosses chips).  Expectation runs reduce the
        in-kernel EM accumulators ON DEVICE — per-family
        `_exp_device_reduce` folds reads locally and `lax.psum`s across
        the mesh — so the E-step result leaving the device is one tiny
        replicated pytree (`out["expectations_reduced"]`) regardless of
        batch size, ready for the M-step / multihost controller.
        """
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        n_dev = int(np.prod(mesh.devices.shape))
        shard_reads = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        old_dput, old_tput = self._dput, self._tab_put
        self._dput = lambda x: jax.device_put(x, shard_reads)
        self._tab_put = lambda x: jax.device_put(x, repl)
        try:
            prep = self.prepare(sm, reads, ragged_right=ragged_right,
                                scale_params=scale_params,
                                shape_hint=shape_hint, bands=bands,
                                pad_groups_to=n_dev)
            X, ND, C, W = prep["X"], prep["ND"], prep["C"], prep["W"]
            R = prep["R"]
            scal = jax.device_put(self._scalars(sm,
                                                ragged_left=ragged_left),
                                  repl)
            fwd_fn, bwd_fn, bwd_exp_fn = self._fns(X, ND, C, W)
            xf, yf = self._device_features(sm, prep)
            basef, widthf, seedf, raggedf = self._device_bands(
                prep["NDp"], prep["anch"].shape[1])(
                self._dput(prep["anch"]), self._dput(prep["meta"]))
            win3 = self._dput(prep["win"][:, None, :])
            # streamed (HDP) emission stream, built SHARDED: the density
            # matmul + skew-gather are per-read, so the build itself
            # SPMD-partitions over the mesh; pin the result's sharding
            # in case the partitioner chose otherwise
            extra = tuple(jax.device_put(e, shard_reads)
                          for e in self._stream_args(sm, prep))
        finally:
            self._dput, self._tab_put = old_dput, old_tput
        ne = len(extra)

        out = {"prep": prep}
        if expectations:
            if getattr(self.spec, "EXP_LANES", None) is None:
                raise NotImplementedError(
                    f"{self.spec.__name__} does not support in-kernel "
                    "expectations; use the scan engine "
                    "(get_expectations_using_anchors)")
            B, Bp = prep["B"], prep["Bp"]
            valid = np.zeros(Bp, np.float32)
            valid[:B] = 1.0
            n_diag = np.zeros(Bp, np.float32)
            n_diag[:B] = [b.n_diag for b in prep["bands"]]
            aux = self._exp_reduce_aux(sm, prep)
            aux_keys = tuple(sorted(aux))
            aux_vals = [jax.device_put(aux[k], shard_reads)
                        for k in aux_keys]
            valid_d = jax.device_put(valid, shard_reads)
            n_diag_d = jax.device_put(n_diag, shard_reads)

            key = ("meshexp", X, ND, C, W, R, axis, n_dev, aux_keys, ne,
                   self.spec.__name__)
            if key not in self._cache:
                na = len(aux_keys)

                def go(scal, win3, xf, yf, basef, widthf, seedf, raggedf,
                       valid, n_diag, *rest):
                    aux_vals, est = rest[:na], rest[na:]
                    fwd = fwd_fn(scal, win3, xf, yf, basef, widthf, *est)
                    _posts, totals, trans, gapx = bwd_exp_fn(
                        scal, win3, xf, yf, basef, widthf, seedf,
                        raggedf, fwd, *est)
                    return self._exp_device_reduce(
                        trans, gapx, totals, dict(zip(aux_keys, aux_vals)),
                        valid, n_diag, axis)

                in_specs = ((P(),) + (P(axis),) * (9 + na + ne))
                self._cache[key] = jax.jit(shard_map(
                    go, mesh=mesh, in_specs=in_specs, out_specs=P(),
                    check_vma=False))
            out["expectations_reduced"] = self._cache[key](
                scal, win3, xf, yf, basef, widthf, seedf, raggedf,
                valid_d, n_diag_d, *aux_vals, *extra)
            return out

        k_eff = min(compact_k, ND * W)
        key = ("meshpost", X, ND, C, W, R, axis, n_dev, k_eff, ne,
               self.spec.__name__)
        if key not in self._cache:
            def go(scal, win3, xf, yf, basef, widthf, seedf, raggedf,
                   *est):
                fwd = fwd_fn(scal, win3, xf, yf, basef, widthf, *est)
                posts, totals = bwd_fn(scal, win3, xf, yf, basef, widthf,
                                       seedf, raggedf, fwd, *est)
                return (posts, totals) + compact_posteriors(posts, k_eff)

            self._cache[key] = jax.jit(shard_map(
                go, mesh=mesh, in_specs=(P(),) + (P(axis),) * (7 + ne),
                out_specs=(P(axis),) * 5, check_vma=False))
        posts, totals, *comp = self._cache[key](
            scal, win3, xf, yf, basef, widthf, seedf, raggedf, *extra)
        out.update(posteriors=posts, totals=totals, compact=tuple(comp))
        return out

    def _exp_reduce_aux(self, sm, prep):
        """Host-side per-read metadata the mesh EM reduce needs on device
        (sharded like the reads).  Strawman/SM4: per-column kmer ids for
        the kmer-gap segment sum (the host finalize's np.add.at)."""
        from ..constants import NUM_OF_KMERS
        kx = _kx_from_codes_np(prep["codes"])
        return {"kx": np.clip(kx, 0, NUM_OF_KMERS + 1).astype(np.int32)}

    def _exp_device_reduce(self, trans, gapx, totals, aux, valid, n_diag,
                           axis):
        """Device-side E-step reduction for a mesh shard: fold this
        shard's reads into the family's expectation pytree, then psum
        across the mesh — the collective replacement for the reference's
        expectation-file merge (trainModels add_and_norm_expectations).
        Mirrors _exp_finalize exactly (same accumulators, same kmer
        scatter), minus the per-read breakdown."""
        from ..constants import NUM_OF_KMERS
        S = self.spec.S
        G, R = trans.shape[0], trans.shape[1]
        GR = G * R
        X = gapx.shape[-1]
        tr = trans[:, :, :S * S].reshape(GR, S * S)
        gc = gapx[:, 0].reshape(GR, X)
        tot = totals.reshape(GR, -1)[:, 0]
        v = valid.astype(jnp.float32)
        red = {
            "trans": (tr * v[:, None]).sum(0).reshape(S, S),
            "kmer_gap": jnp.zeros((NUM_OF_KMERS + 2,), jnp.float32).at[
                aux["kx"].reshape(GR * X)].add(
                (gc * v[:, None]).reshape(GR * X)),
            "likelihood": jnp.sum(tot * n_diag * v),
        }
        return {k: jax.lax.psum(val, axis) for k, val in red.items()}

    def _reduce_expectations(self, sm, prep, trans, gapx, totals):
        """Fused device reduce + ONE D2H round trip (the tunnel charges
        ~25ms fixed latency per transfer; r2's three sequential
        np.asarray calls dominated the E-step), then host finalize."""
        return self._exp_finalize(
            sm, prep,
            np.asarray(self._exp_dispatch(prep, trans, gapx, totals)))

    def finalize_expectations(self, sm, out):
        """Host half of a deferred E-step (run(..., expectations=True,
        defer_expectations=True)): one D2H transfer of the fused
        accumulator.  Deferring lets a pipeline dispatch chunk k+1's
        kernels before blocking on chunk k's download."""
        return self._exp_finalize(sm, out["prep"],
                                  np.asarray(out["expectations_flat"]))

    def _exp_dispatch(self, prep, trans, gapx, totals):
        """Device side: flatten the kernel accumulators into ONE [GR, F]
        f32 array so the whole E-step result crosses the tunnel in a
        single transfer.  Strawman/SM4 layout: S*S transition lanes, X
        per-column gap-X masses (the per-kmer scatter happens on host,
        where the base codes already live — 4x fewer bytes than shipping
        the [B, 4098] per-kmer table), 1 window total."""
        S = self.spec.S
        key = ("expdisp", self.spec.__name__, S)
        if key not in self._cache:
            def fn(trans, gapx, totals):
                G, R = trans.shape[0], trans.shape[1]
                tr = trans[:, :, :S * S].reshape(G * R, S * S)
                gc = gapx[:, 0].reshape(G * R, gapx.shape[-1])
                tot = totals.reshape(G * R, -1)[:, :1]
                return jnp.concatenate([tr, gc, tot], axis=1)
            self._cache[key] = jax.jit(fn)
        return self._cache[key](trans, gapx, totals)

    def _exp_finalize(self, sm, prep, flat):
        from ..constants import NUM_OF_KMERS
        B, X = prep["B"], prep["X"]
        S = self.spec.S
        tr = flat[:B, :S * S].reshape(B, S, S).astype(np.float64)
        gc = flat[:B, S * S:S * S + X].astype(np.float64)
        tot = flat[:B, S * S + X].astype(np.float64)
        kx = _kx_from_codes_np(prep["codes"][:B])
        idx = np.clip(kx, 0, NUM_OF_KMERS + 1)
        seg = np.zeros((B, NUM_OF_KMERS + 2))
        rows = np.repeat(np.arange(B)[:, None], idx.shape[1], axis=1)
        np.add.at(seg, (rows, idx), gc)
        n_diag = np.asarray([b.n_diag for b in prep["bands"]])
        return {
            "trans": tr,
            "kmer_gap": seg,
            "likelihood": tot * n_diag,
        }

    def _fns(self, X, ND, C, W):
        key = (X, ND, C, W, self.group, self.spec.__name__)
        if key in self._cache:
            return self._cache[key]

        R = self.group
        fwd_kernel = functools.partial(_sm3_forward_kernel, X=X, ND=ND, C=C,
                                       R=R, W=W, spec=self.spec)
        NDp = _round_up(ND + 3, 128) + 128
        NP = -(-X // W) + 1  # accumulator page count (EM ladder)

        vspec = lambda shape: pl.BlockSpec(
            shape, (lambda g: (g,) + (0,) * (len(shape) - 1)),
            memory_space=pltpu.VMEM)

        common_in = [
            pl.BlockSpec((1, self.spec.NS + 3 * self.spec.S),
                         lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            vspec((R, self.spec.NXF, X)),
            vspec((R, getattr(self.spec, "Y_ROWS", 2), C + X + 256)),
            vspec((R, NDp)),
            vspec((R, NDp)),
        ]

        win_spec = pl.BlockSpec((1, 1, NDp), lambda g: (g, 0, 0),
                                memory_space=pltpu.SMEM)

        streamed = getattr(self.spec, "STREAMED", False)
        est_in = ([pl.BlockSpec(memory_space=pl.ANY)] if streamed else [])
        est_scr = ([pltpu.VMEM((2, R, W), jnp.float32)] if streamed else [])

        def fwd(scal, win, xf, yf, basef, widthf, *est):
            G = xf.shape[0] // R
            return pl.pallas_call(
                fwd_kernel,
                grid=(G,),
                in_specs=[common_in[0], win_spec] + list(common_in[1:])
                         + est_in,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((G, ND + 1, self.spec.S, R, W),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.SemaphoreType.DMA((4 if streamed else 2,)),
                    pltpu.VMEM((2, self.spec.S, R, W), jnp.float32),
                ] + est_scr,
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
                interpret=self.interpret,
            )(scal, win, xf, yf, basef, widthf, *est)

        def make_bwd(with_exp):
            if with_exp and getattr(self.spec, "EXP_LANES", None) is None:
                def unsupported(*_a, **_k):
                    raise NotImplementedError(
                        f"{self.spec.__name__} does not support in-kernel "
                        "expectations; use the scan engine "
                        "(get_expectations_using_anchors)")
                return unsupported
            kern = functools.partial(_sm3_backward_kernel, X=X, ND=ND, C=C,
                                     R=R, W=W, NP=NP, spec=self.spec,
                                     with_exp=with_exp)
            NPS = len(getattr(self.spec, "POST_STATES", (0,)))
            post_shape = ((ND + 1, R, W) if NPS == 1
                          else (ND + 1, NPS, R, W))
            out_specs = [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            nacc = getattr(self.spec, "EXP_NACC", 1)
            def shapes(G):
                out = [jax.ShapeDtypeStruct((G,) + post_shape, jnp.float32),
                       jax.ShapeDtypeStruct((G, R, 128), jnp.float32)]
                if with_exp:
                    # per-column accumulators as page-major HBM windows
                    # (the kernel's flush ladder writes one page at a time)
                    out += [jax.ShapeDtypeStruct((G, R, 128), jnp.float32),
                            jax.ShapeDtypeStruct((G, NP, nacc, R, W),
                                                 jnp.float32)]
                return out
            extra_specs = ([pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pl.ANY)]
                           if with_exp else [])
            exp_scr = ([pltpu.VMEM((2, nacc, R, W), jnp.float32)]
                       if with_exp else [])
            n_sem = (4 if not streamed else 6) + (1 if with_exp else 0)

            def bwd(scal, win, xf, yf, basef, widthf, seedf, raggedf,
                    fwd_hbm, *est):
                G = xf.shape[0] // R
                res = pl.pallas_call(
                    kern,
                    grid=(G,),
                    in_specs=[common_in[0], win_spec]
                             + list(common_in[1:]) + [
                        vspec((R, NDp)),
                        vspec((R, NDp)),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ] + est_in,
                    out_specs=out_specs + extra_specs,
                    out_shape=shapes(G),
                    scratch_shapes=[
                        pltpu.SemaphoreType.DMA((n_sem,)),
                        pltpu.VMEM((2, self.spec.S, R, W), jnp.float32),
                        pltpu.VMEM((2, R, W) if NPS == 1
                                   else (2, NPS, R, W), jnp.float32),
                    ] + exp_scr + est_scr,
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True),
                    interpret=self.interpret,
                )(scal, win, xf, yf, basef, widthf, seedf, raggedf,
                  fwd_hbm, *est)
                if not with_exp:
                    return res
                posts, totals, trans, acc = res
                # [G, NP, nacc, R, W] pages -> [G, nacc, R, X] x-frame
                gapx = acc.transpose(0, 2, 3, 1, 4).reshape(
                    G, nacc, R, NP * W)[..., :X]
                return posts, totals, trans, gapx

            return jax.jit(bwd)

        fns = (jax.jit(fwd), make_bwd(False), make_bwd(True))
        self._cache[key] = fns
        return fns

    def _fns_tiled(self, XT, YT, TDL, TD, NDT, W):
        """Per-tile pallas callables for the long-alignment path: one call
        sweeps TD diagonals with O(tile) VMEM (features and band metadata
        pre-sliced), chaining DP carries and writing the HBM planes at
        absolute diagonal indices (input_output-aliased across calls) —
        the reference's O(band*window)-memory-at-any-length banded engine
        (impl/pairwiseAligner.c:919-1055) as a tiled TPU sweep."""
        key = ("tiledfns", XT, YT, TDL, TD, NDT, W, self.group,
               self.spec.__name__)
        if key in self._cache:
            return self._cache[key]
        R = self.group
        S = self.spec.S
        spec = self.spec
        YR = getattr(spec, "Y_ROWS", 2)
        NPS = len(getattr(spec, "POST_STATES", (0,)))
        n_em = getattr(spec, "EM_LEAVES", 1)
        NC = 2 * S + 1 + n_em + 1
        tile = dict(TD=TD, TDL=TDL)

        fwd_kernel = functools.partial(_sm3_forward_kernel, X=XT, ND=NDT,
                                       C=0, R=R, W=W, spec=spec, tile=tile)
        bwd_kernel = functools.partial(_sm3_backward_kernel, X=XT, ND=NDT,
                                       C=0, R=R, W=W, NP=0, spec=spec,
                                       with_exp=False, tile=tile)

        def vspec(shape):
            return pl.BlockSpec(
                shape, (lambda g: (g,) + (0,) * (len(shape) - 1)),
                memory_space=pltpu.VMEM)

        common_in = [
            pl.BlockSpec((1, spec.NS + 3 * S), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TDL), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            vspec((R, spec.NXF, XT)),
            vspec((R, YR, YT)),
            vspec((R, TDL)),
            vspec((R, TDL)),
        ]
        tscal_spec = pl.BlockSpec((1, 8), lambda g: (g, 0),
                                  memory_space=pltpu.SMEM)

        def fwd(scal, win_t, xf_t, yf_t, basef_t, widthf_t, tscal, carry,
                plane):
            G = xf_t.shape[0] // R
            return pl.pallas_call(
                fwd_kernel,
                grid=(G,),
                in_specs=common_in + [tscal_spec,
                                      vspec((1, 2 * S, R, W)),
                                      pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                           vspec((1, 2 * S, R, W))],
                out_shape=[
                    jax.ShapeDtypeStruct((G, NDT + 1, S, R, W),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((G, 2 * S, R, W), jnp.float32)],
                scratch_shapes=[
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((2, S, R, W), jnp.float32),
                ],
                input_output_aliases={8: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
                interpret=self.interpret,
            )(scal, win_t, xf_t, yf_t, basef_t, widthf_t, tscal, carry,
              plane)

        post_shape = ((NDT + 1, R, W) if NPS == 1
                      else (NDT + 1, NPS, R, W))

        def bwd(scal, win_t, xf_t, yf_t, basef_t, widthf_t, seedf_t,
                raggedf_t, fwd_plane, tscal, shf, carry, post):
            G = xf_t.shape[0] // R
            return pl.pallas_call(
                bwd_kernel,
                grid=(G,),
                in_specs=common_in + [
                    vspec((R, TDL)),
                    vspec((R, TDL)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    tscal_spec,
                    vspec((1, R, 128)),
                    vspec((1, NC, R, W)),
                    pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                           pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0),
                                        memory_space=pltpu.VMEM),
                           vspec((1, NC, R, W))],
                out_shape=[
                    jax.ShapeDtypeStruct((G,) + post_shape, jnp.float32),
                    jax.ShapeDtypeStruct((G, R, 128), jnp.float32),
                    jax.ShapeDtypeStruct((G, NC, R, W), jnp.float32)],
                scratch_shapes=[
                    pltpu.SemaphoreType.DMA((4,)),
                    pltpu.VMEM((2, S, R, W), jnp.float32),
                    pltpu.VMEM((2, R, W) if NPS == 1
                               else (2, NPS, R, W), jnp.float32),
                ],
                input_output_aliases={12: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
                interpret=self.interpret,
            )(scal, win_t, xf_t, yf_t, basef_t, widthf_t, seedf_t,
              raggedf_t, fwd_plane, tscal, shf, carry, post)

        self._cache[key] = (fwd, bwd, NC)
        return self._cache[key]

    def _tile_steps(self, XT, YT, TDL, TD, NDT, W, XFL, YFL):
        """Jitted per-tile drivers: XLA slices the tile's feature blocks
        and band metadata out of the full device arrays (per-group x/y
        origins), then runs the tiled kernels.  One compile serves every
        tile — tile origins are traced scalars."""
        key = ("tilestep", XT, YT, TDL, TD, NDT, W, XFL, YFL, self.group,
               self.spec.__name__)
        if key in self._cache:
            return self._cache[key]
        R = self.group
        NXF = self.spec.NXF
        YR = getattr(self.spec, "Y_ROWS", 2)
        S = self.spec.S
        fwd_p, bwd_p, NC = self._fns_tiled(XT, YT, TDL, TD, NDT, W)

        def recenter(carry, acc, n_rows):
            """Per-tile log-space re-centering: shift each read's DP
            carry rows so their max is ~0 — f32 runs out of absolute
            log precision past ~30k diagonals (values reach -1e5+,
            where one ulp is ~0.01 and the fwd/bwd rounding walks
            destroy mid-sequence posteriors).  Shifts propagate
            linearly through the log recursion and are repaid exactly
            in the backward's posterior normalization (shf input).
            Rows beyond n_rows (total / emission carries) are absolute
            quantities and stay unshifted."""
            m = jnp.max(carry[:, :n_rows], axis=(1, 3))      # [G, R]
            c = jnp.where(m > -1e20, m, 0.0)                 # skip unseeded
            carry = carry.at[:, :n_rows].add(-c[:, None, :, None])
            return carry, acc + c

        def slices(d0, xoffs, yoffs, xfp, yfp, win3, basef, widthf):
            G = xoffs.shape[0]
            Bp = basef.shape[0]
            z = jnp.zeros((), d0.dtype)
            win_t = jax.lax.dynamic_slice(win3, (z, z, d0), (G, 1, TDL))
            basef_t = jax.lax.dynamic_slice(basef, (z, d0), (Bp, TDL))
            widthf_t = jax.lax.dynamic_slice(widthf, (z, d0), (Bp, TDL))
            xfg = xfp.reshape(G, R, NXF, XFL)
            xf_t = jax.vmap(
                lambda a, o: jax.lax.dynamic_slice(
                    a, (jnp.zeros((), o.dtype),) * 2 + (o,),
                    (R, NXF, XT)))(xfg, xoffs)
            yfg = yfp.reshape(G, R, YR, YFL)
            yf_t = jax.vmap(
                lambda a, o: jax.lax.dynamic_slice(
                    a, (jnp.zeros((), o.dtype),) * 2 + (o,),
                    (R, YR, YT)))(yfg, yoffs)
            return (win_t, xf_t.reshape(G * R, NXF, XT),
                    yf_t.reshape(G * R, YR, YT), basef_t, widthf_t)

        def fwd_step(d0, tsc, xoffs, yoffs, scal, xfp, yfp, win3, basef,
                     widthf, carry, plane, A):
            carry, A = recenter(carry, A, 2 * S)
            win_t, xf_t, yf_t, basef_t, widthf_t = slices(
                d0, xoffs, yoffs, xfp, yfp, win3, basef, widthf)
            plane, carry = fwd_p(scal, win_t, xf_t, yf_t, basef_t,
                                 widthf_t, tsc, carry, plane)
            return plane, carry, A

        def bwd_step(d0, tsc, xoffs, yoffs, scal, xfp, yfp, win3, basef,
                     widthf, seedf, raggedf, fwd_plane, carry, post, B,
                     A_t):
            carry, B = recenter(carry, B, 2 * S)
            G = carry.shape[0]
            shf = jnp.broadcast_to((A_t + B)[:, :, None], (G, R, 128))
            win_t, xf_t, yf_t, basef_t, widthf_t = slices(
                d0, xoffs, yoffs, xfp, yfp, win3, basef, widthf)
            Bp = basef.shape[0]
            z = jnp.zeros((), d0.dtype)
            seedf_t = jax.lax.dynamic_slice(seedf, (z, d0), (Bp, TDL))
            raggedf_t = jax.lax.dynamic_slice(raggedf, (z, d0), (Bp, TDL))
            post, totals, carry = bwd_p(
                scal, win_t, xf_t, yf_t, basef_t, widthf_t, seedf_t,
                raggedf_t, fwd_plane, tsc, shf, carry, post)
            return post, totals, carry, B

        fns = (jax.jit(fwd_step, donate_argnums=(10, 11)),
               jax.jit(bwd_step, donate_argnums=(13, 14)), NC)
        self._cache[key] = fns
        return fns

    def _run_tiled(self, sm, reads, *, ragged_right=False,
                   ragged_left=False, compact_k=4096, scale_params=None,
                   bands=None, tile_diag=None):
        """Long-alignment fast path: the band-local wavefront sweeps run
        as a chain of TD-diagonal tiles, so VMEM is O(tile) and HBM is
        O(band plane) at ANY reference length — the capability class of
        the reference's banded engine (impl/pairwiseAligner.c:919-1055),
        which is O(band x window) memory at any length.  Results are
        bit-identical to the untiled kernels (same per-diagonal compute,
        carries chained raw in their windows' frames); posteriors are
        compacted per diagonal chunk (`compact_chunks`) and extracted
        with extract_pairs_long."""
        if getattr(self.spec, "STREAMED", False):
            raise NotImplementedError(
                "streamed (HDP) specs have no tiled long-alignment path; "
                "split the alignment (ops/anchors.get_split_points)")
        prep = self.prepare(sm, reads, ragged_right=ragged_right,
                            scale_params=scale_params, bands=bands)
        X, ND, C, W = prep["X"], prep["ND"], prep["C"], prep["W"]
        R = prep["R"]
        Bp = prep["Bp"]
        G = Bp // R
        S = self.spec.S
        TD = int(tile_diag or 2048)
        TD = max(128, (TD // 128) * 128)
        NT = -(-ND // TD)
        NDT = NT * TD
        NDp2 = _round_up(NDT + 3, 128) + 128

        win = prep["win"]
        if NDp2 > win.shape[1]:
            win_e = np.concatenate(
                [win, np.repeat(win[:, -1:], NDp2 - win.shape[1], 1)], 1)
        else:
            win_e = win[:, :NDp2]

        A = prep["anch"].shape[1]
        anch_d = jax.device_put(prep["anch"])
        meta_d = jax.device_put(prep["meta"])
        basef, widthf, seedf, raggedf = self._device_bands(NDp2, A)(
            anch_d, meta_d)
        xf, yf = self._device_features(sm, prep)
        PADX = 512
        xfp = jnp.pad(xf, ((0, 0), (0, 0), (0, PADX)))
        yfp = jnp.pad(yf, ((0, 0), (0, 0), (0, PADX)))
        XFL = int(xfp.shape[-1])
        YFL = int(yfp.shape[-1])
        win3_e = jax.device_put(
            np.ascontiguousarray(win_e[:, None, :]).astype(np.int32))

        # host tile plan: per-(group, tile) x/y slice origins
        TDL = TD + 128
        t_arange = np.arange(NT)
        wmin = np.empty((G, NT), np.int64)
        wmax = np.empty((G, NT), np.int64)
        for t in range(NT):
            lo = max(t * TD - 2, 0)
            hi = min(t * TD + TD + 3, NDp2)
            seg = win_e[:, lo:hi]
            wmin[:, t] = seg.min(axis=1)
            wmax[:, t] = seg.max(axis=1)
        xoff = (wmin // 128) * 128
        XT = int(_round_up(int((wmax - xoff).max()) + W + 256, 128))
        XT = min(XT, XFL)
        xoff = np.clip(xoff, 0, XFL - XT)
        if int((wmax + W + 129 - xoff).max()) > XT:
            raise ValueError(
                "anchor-chain x-span of one diagonal tile exceeds the "
                "tile window; split the alignment at the big gap "
                "(ops/anchors.get_split_points) or raise tile_diag")
        dhi = t_arange * TD + TD + 2
        dlo = np.maximum(t_arange * TD - 1, 0)
        ymin = C - dhi[None, :] + wmin
        ymax = C - dlo[None, :] + wmax + W + 129
        yoff = np.clip((ymin // 128) * 128 - 128, 0, None)
        YT = int(_round_up(int((ymax - yoff).max()) + 128, 128))
        YT = min(YT, YFL)
        yoff = np.clip(yoff, 0, YFL - YT)
        if int((ymax - yoff).max()) > YT:
            raise ValueError("tile y-span exceeds the tile window; "
                             "raise tile_diag or split the alignment")
        cys = (C - yoff).astype(np.int64)
        d0s = np.maximum(t_arange * TD - 2, 0)

        tsf = np.zeros((NT, G, 8), np.int32)
        tsb = np.zeros((NT, G, 8), np.int32)
        for t in range(NT):
            tsf[t, :, 0] = d0s[t]
            tsf[t, :, 1] = t * TD + 1          # dA
            tsf[t, :, 2] = xoff[:, t]
            tsf[t, :, 3] = cys[:, t]
            tsf[t, :, 4] = 1 if t == 0 else 0
            tsb[t, :, 0] = d0s[t]
            tsb[t, :, 1] = t * TD + TD         # dH
            tsb[t, :, 2] = xoff[:, t]
            tsb[t, :, 3] = cys[:, t]
            tsb[t, :, 4] = 1 if t == NT - 1 else 0
            tsb[t, :, 5] = 1 if t == 0 else 0
        tsf_d = jax.device_put(tsf)
        tsb_d = jax.device_put(tsb)
        d0s_d = jax.device_put(d0s.astype(np.int32))
        xoff_d = jax.device_put(xoff.astype(np.int32))
        yoff_d = jax.device_put(yoff.astype(np.int32))

        fwd_step, bwd_step, NC = self._tile_steps(XT, YT, TDL, TD, NDT, W,
                                                  XFL, YFL)
        scal = self._scalars(sm, ragged_left=ragged_left)
        NPS = len(getattr(self.spec, "POST_STATES", (0,)))
        # the two band planes are the only O(length) HBM consumers:
        # fwd [G, NDT+1, S, R, W] + posteriors [G, NDT+1, (NPS,) R, W],
        # both f32.  On a 16 GB v5e that caps a single group=8 alignment
        # at ~250kb (dna5, S=5) / ~400kb (strawman, S=3); fail with the
        # remedies instead of an opaque allocator OOM.
        plane_bytes = 4 * G * (NDT + 1) * R * W * (S + NPS)
        if plane_bytes > 14e9:
            raise ValueError(
                f"banded planes need ~{plane_bytes / 1e9:.1f} GB HBM "
                f"(ND={ND} diagonals, group={R}): split the alignment at "
                "anchor gaps (ops/anchors.get_split_points), lower the "
                "group size, or x-shard it over a mesh "
                "(parallel/seqpar)")
        plane = jnp.zeros((G, NDT + 1, S, R, W), jnp.float32)
        carry = jnp.zeros((G, 2 * S, R, W), jnp.float32)
        # A_ts[t] = cumulative re-centering shift of the fwd plane rows
        # written during tile t (see _tile_steps.recenter)
        A = jnp.zeros((G, R), jnp.float32)
        A_ts = []
        for t in range(NT):
            plane, carry, A = fwd_step(d0s_d[t], tsf_d[t], xoff_d[:, t],
                                       yoff_d[:, t], scal, xfp, yfp,
                                       win3_e, basef, widthf, carry,
                                       plane, A)
            A_ts.append(A)
        post_shape = ((G, NDT + 1, R, W) if NPS == 1
                      else (G, NDT + 1, NPS, R, W))
        post = jnp.zeros(post_shape, jnp.float32)
        bcarry = jnp.zeros((G, NC, R, W), jnp.float32)
        Bsh = jnp.zeros((G, R), jnp.float32)
        totals = None
        for t in reversed(range(NT)):
            post, totals, bcarry, Bsh = bwd_step(
                d0s_d[t], tsb_d[t], xoff_d[:, t], yoff_d[:, t], scal,
                xfp, yfp, win3_e, basef, widthf, seedf, raggedf, plane,
                bcarry, post, Bsh, A_ts[t])

        out = {"posteriors": post, "totals": totals, "prep": prep}
        # per-diagonal-chunk exact top-k compaction (one full-plane top-k
        # over hundreds of thousands of diagonals is where lax.top_k
        # falls over; per-TD chunks keep each call small and the union
        # exact per chunk)
        global _compact_jit
        if _compact_jit is None:
            _compact_jit = jax.jit(compact_posteriors, static_argnums=1)
        DC = TD
        kc = min(compact_k, DC * W)
        ck_key = ("tilecompact", NDT, DC, kc, NPS, R, W, G)
        if ck_key not in self._cache:
            def cc(post, off):
                off = jnp.asarray(off, jnp.int32)
                z = jnp.zeros((), jnp.int32)
                sl = (z, off) + (z,) * (len(post_shape) - 2)
                sz = (G, DC + 1) + post_shape[2:]
                ch = jax.lax.dynamic_slice(post, sl, sz)
                return compact_posteriors(ch, kc)
            self._cache[ck_key] = jax.jit(cc)
        cc = self._cache[ck_key]
        offs = np.arange(0, NDT, DC)
        out["compact_chunks"] = [(int(o), cc(post, int(o))) for o in offs]
        out["tiled"] = dict(TD=TD, NT=NT, NDT=NDT, DC=DC)
        return out


class VanillaPallasAligner(StrawmanPallasAligner):
    """Nanopolish-style vanilla machine (getSignalStateMachine3Vanilla) on
    the same wavefront kernels: transitions become x-feature rows derived
    from kmer-skip bins, assembled on device from compact bin/kmer uploads
    (StateMachine3Vanilla.build, models/state_machines.py)."""

    spec = _VanillaSpec

    def _scalars(self, sm, ragged_left=False):
        a_yy = sm.t_e_to_e
        a_ym = 1.0 - a_yy
        vals = [np.log(a_ym), np.log(a_yy)]
        start = sm.ragged_start_vec() if ragged_left else sm.start_vec()
        end = sm.end_vec()
        ragged_end = sm.ragged_end_vec()
        arr = np.array([vals + start + end + ragged_end], dtype=np.float64)
        arr = np.nan_to_num(arr, neginf=NEG)
        return np.maximum(arr, NEG).astype(np.float32)

    def _feature_inputs(self, reads, X):
        """u8 base codes + u16 quantized events (the headline path's wire
        format — the host->device tunnel is the slow resource).  The
        getKmer2 skip-bin kmer pair (kxp, kxn) derives from the codes ON
        DEVICE (_vanilla_kmer_pair), a 4x smaller x-side upload than the
        two int16 kmer-index arrays it replaces."""
        B = len(reads)
        max_ev = max(r[1].shape[0] for r in reads)
        ev = np.zeros((B, max_ev + 1, 2), np.float32)
        for r, (_ref, events, _l_x, _l_y, _a) in enumerate(reads):
            ev[r, 1:1 + len(events), :] = events[:, :2]
        evq, evs = _quantize_events(ev)
        return dict(ev=ev, codes=_base_codes(reads, X), evq=evq, evs=evs)

    def _model_tables(self, sm):
        from ..io.poremodel import (LEVEL_MEAN, LEVEL_SD, NOISE_MEAN,
                                    NOISE_LAMBDA)
        cols = [LEVEL_MEAN, LEVEL_SD, NOISE_MEAN, NOISE_LAMBDA]
        return self._model_cache(sm, lambda sm: (
            jax.device_put(np.asarray(sm.model.match_model[:, cols],
                                      np.float32)),
            jax.device_put(np.asarray(sm.model.gap_y_model[:, cols],
                                      np.float32)),
            jax.device_put(np.asarray(sm.skip_bin_probs, np.float32)),
        ))

    def _assemble_fn(self, C, Y, scaled=False):
        key = ("asm", C, Y, scaled)
        if key in self._cache:
            return self._cache[key]
        from ..constants import NUM_OF_KMERS

        def assemble(codes, evq, evs, sp, mm4, gm4, skip60, t_m2y):
            ev = _dequantize_events(evq, evs)
            kxp, kxn = _vanilla_kmer_pair(_kx_from_codes(codes), jnp)
            kx = kxn.astype(jnp.int32)
            valid = kx <= NUM_OF_KMERS
            safe = jnp.clip(kx, 0, NUM_OF_KMERS - 1)
            if sp is None:
                rows = [jnp.where(valid, mm4[safe, c], 0.0)
                        for c in range(4)]
                scale = 1.0
            else:
                # emissions_signal_scaleModel on device: match model rows
                # (lvl_mu, lvl_sd, nz_mu, nz_lambda) per-read scaled
                scale = sp[:, 0:1]
                rows = [jnp.where(valid, mm4[safe, 0] * scale + sp[:, 1:2],
                                  0.0),
                        jnp.where(valid, mm4[safe, 1] * sp[:, 2:3], 0.0),
                        jnp.where(valid, mm4[safe, 2] * sp[:, 3:4], 0.0),
                        jnp.where(valid, mm4[safe, 3] * sp[:, 4:5], 0.0)]
            rows += [jnp.where(valid, gm4[safe, c], 0.0) for c in range(4)]

            # skip bins from |Δ scaled level mean| in 0.5 pA steps, clamped
            # to 29 (emissions_signal_getKmerSkipBin,
            # impl/stateMachine.c:389-420); invalid kmers contribute mean
            # 0.0 (UNscaled), so the shift does not cancel there
            shift = sp[:, 1:2] if sp is not None else 0.0

            def level_mean(idx):
                idx = idx.astype(jnp.int32)
                m = mm4[jnp.clip(idx, 0, NUM_OF_KMERS - 1), 0]
                return jnp.where(idx > NUM_OF_KMERS, 0.0,
                                 m * scale + shift)

            d = jnp.abs(level_mean(kxn) - level_mean(kxp))
            b = jnp.minimum((d / 0.5).astype(jnp.int32), 29)
            a_mx = skip60[b]
            a_xx = skip60[b + 30]
            a_my = (1.0 - a_mx) * t_m2y
            a_mm = 1.0 - a_my - a_mx
            a_xm = 1.0 - a_xx

            def la(a):
                return jnp.where(valid & (a > 0.0),
                                 jnp.log(jnp.maximum(a, 1e-37)), NEG)

            rows += [la(a_mx), la(a_xx), la(a_mm), la(a_xm), la(a_my)]
            xf = jnp.stack(rows, axis=1).astype(jnp.float32)
            B, E, _ = ev.shape
            n = min(E, C + 1)
            yf = jnp.zeros((B, 2, Y), jnp.float32)
            yf = yf.at[:, 0, C - n + 1:C + 1].set(ev[:, :n, 0][:, ::-1])
            yf = yf.at[:, 1, C - n + 1:C + 1].set(ev[:, :n, 1][:, ::-1])
            return xf, yf

        if scaled:
            fn = jax.jit(assemble)
        else:
            fn = jax.jit(lambda codes, evq, evs, mm4, gm4, skip60,
                         t_m2y:
                         assemble(codes, evq, evs, None, mm4, gm4,
                                  skip60, t_m2y))
        self._cache[key] = fn
        return fn

    def _device_features(self, sm, prep):
        mm4, gm4, skip60 = self._model_tables(sm)
        sp = prep.get("sp")
        args = [self._dput(prep["codes"]),
                self._dput(prep["evq"]), jax.device_put(prep["evs"])]
        if sp is not None:
            args.append(self._dput(sp))
        return self._assemble_fn(prep["C"], prep["C"] + prep["X"] + 256,
                                 scaled=sp is not None)(
            *args, mm4, gm4, skip60, np.float32(sm.t_m_to_y_not_x))

    def _exp_dispatch(self, prep, trans, gapx, totals):
        """Vanilla fused wire format: the two per-column posterior-mass
        rows (beta, alpha) plus the window total in one [GR, 2X+1]
        array; the skip-bin scatter happens on host."""
        key = ("expdisp", self.spec.__name__)
        if key not in self._cache:
            def fn(gapx, totals):
                G, _n, R, X = gapx.shape
                g2 = gapx.transpose(0, 2, 1, 3).reshape(G * R, 2 * X)
                tot = totals.reshape(G * R, -1)[:, :1]
                return jnp.concatenate([g2, tot], axis=1)
            self._cache[key] = jax.jit(fn)
        return self._cache[key](gapx, totals)

    def _exp_reduce_aux(self, sm, prep):
        """Mesh EM reduce metadata: the per-column skip-bin ids, computed
        with the host twin of the device assembly's arithmetic (see
        _host_bins)."""
        return {"bins": self._host_bins(sm, prep).astype(np.int32)}

    def _exp_device_reduce(self, trans, gapx, totals, aux, valid, n_diag,
                           axis):
        """Vanilla mesh EM reduce: beta/alpha per-column masses scattered
        to the 60 skip bins on device, then psum'd (vanillaHmm kmer-skip
        expectations, impl/continuousHmm.c:410-426)."""
        G, R = gapx.shape[0], gapx.shape[2]
        GR = G * R
        X = gapx.shape[-1]
        beta = gapx[:, 0].reshape(GR, X)
        alpha = gapx[:, 1].reshape(GR, X)
        tot = totals.reshape(GR, -1)[:, 0]
        v = valid.astype(jnp.float32)
        b = aux["bins"].reshape(GR * X)
        skip = jnp.zeros((60,), jnp.float32)
        skip = skip.at[b].add((beta * v[:, None]).reshape(GR * X))
        skip = skip.at[b + 30].add((alpha * v[:, None]).reshape(GR * X))
        red = {"skip_bins": skip,
               "likelihood": jnp.sum(tot * n_diag * v)}
        return {k: jax.lax.psum(val, axis) for k, val in red.items()}

    def _host_bins(self, sm, prep):
        """Per-column skip-bin ids with EXACTLY the device assembly's
        arithmetic (f32, scaled means with shift, invalid kmers -> 0.0
        unscaled) so boundary deltas land in the same bin the kernel's
        transitions used."""
        from ..constants import NUM_OF_KMERS
        kxp, kxn = _vanilla_kmer_pair(_kx_from_codes_np(prep["codes"]), np)
        mm0 = np.asarray(sm.model.match_model[:, 0], np.float32)
        if "sp" in prep:
            scale = prep["sp"][:, 0:1].astype(np.float32)
            shift = prep["sp"][:, 1:2].astype(np.float32)
        else:
            scale = np.float32(1.0)
            shift = np.float32(0.0)

        def mean(idx):
            safe = np.clip(idx, 0, NUM_OF_KMERS - 1)
            return np.where(idx > NUM_OF_KMERS, np.float32(0.0),
                            mm0[safe] * scale + shift)

        d = np.abs(mean(kxn) - mean(kxp))
        return np.minimum((d / np.float32(0.5)).astype(np.int64), 29)

    def _exp_finalize(self, sm, prep, flat):
        """Vanilla EM: per-column beta/alpha posterior masses scattered to
        the 60 skip bins (vanillaHmm kmer-skip expectations,
        impl/continuousHmm.c:410-426).  Bins from _host_bins (device
        arithmetic parity)."""
        B, R, X = prep["B"], prep["R"], prep["X"]
        Bp = prep["Bp"]
        bins = self._host_bins(sm, prep)
        gapx_h = flat[:Bp, :2 * X].reshape(Bp, 2, X).astype(np.float64)
        skip = np.zeros((Bp, 60))
        rows = np.repeat(np.arange(Bp)[:, None], X, axis=1)
        np.add.at(skip, (rows, bins), gapx_h[:, 0, :])       # beta
        np.add.at(skip, (rows, bins + 30), gapx_h[:, 1, :])  # alpha
        n_diag = np.asarray([b.n_diag for b in prep["bands"]])
        tot = flat[:Bp, 2 * X].astype(np.float64)
        return {
            "skip_bins": skip[:B],
            "likelihood": tot[:B] * n_diag,
        }


class _HdpSpec(_StrawmanSpec):
    """threeState machine with HDP kmer-density emissions
    (stateMachine3HDP_cellCalculate, impl/stateMachine.c:1337-1366): same
    topology/transitions as the strawman spec; match == gap-Y emission is a
    spline density query, precomputed per diagonal in XLA and streamed from
    HBM into the kernels (per-lane table gathers don't vectorize on the
    VPU, but the density stream is exactly band-shaped)."""

    STREAMED = True


class HdpPallasAligner(StrawmanPallasAligner):
    """SM3-HDP machine (getHdpStateMachine3) on the wavefront kernels with
    a precomputed HBM emission stream."""

    spec = _HdpSpec

    def _device_features(self, sm, prep):
        from ..constants import NUM_OF_KMERS
        gapx_t = self._model_cache(sm, lambda sm: jax.device_put(
            np.nan_to_num(np.asarray(sm.gap_x_log_probs, np.float32),
                          neginf=NEG)))
        key = ("asm", prep["C"], prep["X"])
        if key not in self._cache:
            C, X = prep["C"], prep["X"]

            def assemble(codes, gapx):
                kx = _kx_from_codes(codes)
                valid = kx <= NUM_OF_KMERS
                safe = jnp.clip(kx, 0, NUM_OF_KMERS - 1)
                B = kx.shape[0]
                xf = jnp.zeros((B, 9, X), jnp.float32)
                xf = xf.at[:, 8, :].set(jnp.maximum(
                    jnp.where(valid, gapx[safe], NEG), NEG))
                yf = jnp.zeros((B, 2, C + X + 256), jnp.float32)
                return xf, yf

            self._cache[key] = jax.jit(assemble)
        return self._cache[key](self._dput(prep["codes"]), gapx_t)

    def _hdp_tables(self, sm):
        def build(sm):
            grid, tables, slopes = sm.nhdp.density_tables()
            return (np.asarray(grid),
                    jax.device_put(np.asarray(tables, np.float32)),
                    jax.device_put(np.asarray(slopes, np.float32)))

        key = ("hdp_tables", id(sm))
        lru = self._cache.setdefault("models", {})
        if key not in lru or lru[key][0] is not sm:
            lru[key] = (sm, build(sm))
            while len(lru) > 8:
                lru.pop(next(iter(lru)))
        return lru[key][1]

    def _stream_args(self, sm, prep):
        """Per-diagonal HDP emission windows, built GATHER-FREE: the spline
        query dens(k(x), mean(y)) factors into a per-read kmer coefficient
        table A[x, :] = (tab[k(x)], slo[k(x)]) and a per-read grid-weight
        table Wv[y, :] (the cubic-interp coefficients of mean(y) scattered
        onto the grid axis), so each diagonal's window is a rowwise dot of
        two CONTIGUOUS slices (x = win+l ascending, y = d-x descending) —
        no per-cell gathers (the previous 4-gather-per-cell build dominated
        the whole HDP path).  Matches grid_spline_interp
        (impl/hdp_math_utils.c) / dir_proc_density (impl/hdp.c:2577-2601).
        """
        from ..constants import NUM_OF_KMERS
        grid, tables_dev, slopes_dev = self._hdp_tables(sm)
        G_len = int(tables_dev.shape[1])
        X, ND, W, R = prep["X"], prep["ND"], prep["W"], prep["R"]
        Gg = prep["Bp"] // R
        log_density = sm.log_density
        Emax = prep["ev"].shape[1]
        # one-matmul build materializes M [Bp, X, U+1] f32; fall back to the
        # per-diagonal scan when that intermediate would not fit comfortably
        U = Emax + 2 * W
        use_mm = (self.stream_matmul
                  and prep["Bp"] * X * (U + 1) * 4 <= 4e9)
        key = ("est", ND, W, X, R, Gg, G_len, log_density, Emax, use_mm)
        if key not in self._cache:
            D = ND + 3

            def build(win, codes, evm, tab, slo, grid0, dx, glast):
                # u8 base codes -> kmer indices on device (4x smaller
                # upload); event means stay f32 here — HDP pair scores sit
                # at the 1e-3 fixed-point sensitivity the HIGHEST-precision
                # matmul note below describes, so the u16 event
                # quantization the non-streamed machines use is not worth
                # the parity risk on this path
                kx = _kx_from_codes(codes)
                valid = kx <= NUM_OF_KMERS
                safe = jnp.clip(kx, 0, NUM_OF_KMERS - 1)

                # per-read kmer coefficient rows [Bp, X, 2*Gl]
                ktab = jnp.where(valid[:, :, None], tab[safe], 0.0)
                kslo = jnp.where(valid[:, :, None], slo[safe], 0.0)
                A = jnp.concatenate([ktab, kslo], axis=-1)

                # per-event grid weights [Bp, Emax, Gl] x 2 channels:
                # midv = c0*y0 + c1*y1 + cs0*s0 + cs1*s1 (the expansion of
                # u*y0 + t*y1 + t*u*(a*u + b*t))
                mean = evm
                i = jnp.clip(((mean - grid0) / dx).astype(jnp.int32),
                             0, G_len - 2)
                tt = (mean - (grid0 + i.astype(mean.dtype) * dx)) / dx
                u = 1.0 - tt
                c0 = u + tt * u * u - tt * tt * u
                c1 = tt + tt * tt * u - tt * u * u
                cs0 = tt * u * u * dx
                cs1 = -tt * tt * u * dx
                gi = jnp.arange(G_len)
                oh_i = (gi[None, None, :] == i[:, :, None])
                oh_i1 = (gi[None, None, :] == (i + 1)[:, :, None])
                wt_mid = (oh_i * c0[..., None] + oh_i1 * c1[..., None])
                ws_mid = (oh_i * cs0[..., None] + oh_i1 * cs1[..., None])
                e0 = (gi == 0).astype(mean.dtype)
                eL = (gi == G_len - 1).astype(mean.dtype)
                low = (mean <= grid0)[..., None]
                high = (mean >= glast)[..., None]
                wt = jnp.where(low, e0, jnp.where(high, eL, wt_mid))
                ws = jnp.where(
                    low, e0 * (mean - grid0)[..., None],
                    jnp.where(high, eL * (mean - glast)[..., None], ws_mid))
                Wv = jnp.concatenate([wt, ws], axis=-1).astype(jnp.float32)
                # pad the y axis by W both sides (lane windows run past the
                # event range at the matrix corners)
                Wp = jnp.pad(Wv, ((0, 0), (W, W), (0, 0)))

                lanes = jnp.arange(W)
                kvf = valid.astype(jnp.float32)
                Bp = kx.shape[0]

                if use_mm:
                    # One MXU matmul per read gives EVERY (x, y) density at
                    # once: M[b, x, u] = sum_c A[b, x, c] * Wp[b, u, c]
                    # (u = y + W).  Each diagonal's window is then an
                    # anti-diagonal segment of M, extracted with the flat
                    # skew trick: pad one column so that
                    # flat[x*U + (d + W)] == M[x, d + W - x], and gather
                    # [D, W] windows per read (indices shared group-wide).
                    # Replaces the D-step scan of tiny slices+dots, which
                    # was per-step-overhead-bound (~280ms -> matmul ~ms).
                    # Precision.HIGHEST: the default TPU matmul precision
                    # splits f32 into bf16 passes (~1e-3 relative error),
                    # which is visible in the fixed-point pair scores; the
                    # scan build's small dots ran on the VPU in full f32
                    M = jax.lax.dot_general(
                        A, Wp, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    f = jnp.pad(M, ((0, 0), (0, 0), (0, 1))).reshape(
                        Bp, X * (U + 1))
                    wg = win[:, :D].astype(jnp.int32)          # [Gg, D]
                    xg = wg[:, :, None] + lanes[None, None, :].astype(
                        jnp.int32)                              # [Gg, D, W]
                    ddc = jnp.arange(D, dtype=jnp.int32)[None, :, None]
                    xs = jnp.clip(xg, 0, X - 1)
                    idx = jnp.clip(xs * U + ddc + W, 0, X * (U + 1) - 1)
                    fg = f.reshape(Gg, R, X * (U + 1))
                    dens = jax.vmap(lambda f2, ix: jax.vmap(
                        lambda fr: jnp.take(fr, ix))(f2))(fg, idx)
                    dens = dens.transpose(0, 2, 1, 3)  # [Gg, R, D, W] -> g,d,r,w
                    y_l = (ddc - xg)[:, :, None, :]    # true y, unclipped x
                    ok = (y_l >= 0) & (y_l < Emax)
                    dens = jnp.where(ok, jnp.maximum(dens, 0.0), 0.0)
                    if log_density:
                        # invalid-kmer columns are zeroed in A, so their
                        # density is 0 -> NEG here, same as the kv mask
                        dens = jnp.where(
                            dens > 0.0,
                            jnp.log(jnp.maximum(dens, 1e-30)), NEG)
                    else:
                        # raw-density (bug-compatible) mode: invalid kmers
                        # must be NEG while true zero densities stay 0.0
                        kg = kvf.reshape(Gg, R, X)
                        kv = jax.vmap(lambda k2, ix: jax.vmap(
                            lambda kr: jnp.take(kr, ix))(k2))(kg, xs)
                        dens = jnp.where(
                            kv.transpose(0, 2, 1, 3) > 0.5, dens, NEG)
                    return dens.astype(jnp.float32)

                # per-read window start per diagonal (group windows
                # broadcast over the group's reads) [D, Bp]
                w_rows = jnp.repeat(win[:, :D], R, axis=0).T.astype(
                    jnp.int32)

                def slice_rows(M, starts, L):
                    zero = jnp.zeros_like(starts[0])
                    return jax.vmap(
                        lambda m, s: jax.lax.dynamic_slice(
                            m, (s, zero), (L, 2 * G_len)))(M, starts)

                # scan over diagonals: each step slices [Bp, W, 2Gl] and
                # reduces — a vmap over d would materialise the full
                # [D, W, 2Gl] gather per read (tens of GB)
                def step(_, dw):
                    d, w_all = dw
                    a = slice_rows(A, w_all, W)
                    s = jnp.clip(d - w_all - W + 1 + W, 0,
                                 Emax + W).astype(jnp.int32)
                    wv = slice_rows(Wp, s, W)[:, ::-1, :]
                    dens = jax.lax.dot_general(
                        a, wv, (((2,), (2,)), ((0, 1), (0, 1))),
                        preferred_element_type=jnp.float32)
                    y_l = d - w_all[:, None] - lanes[None, :]
                    ok = (y_l >= 0) & (y_l < Emax)
                    kvw = jax.vmap(
                        lambda m, ss: jax.lax.dynamic_slice(m, (ss,),
                                                            (W,)))(
                        kvf, w_all)
                    dens = jnp.where(ok, jnp.maximum(dens, 0.0), 0.0)
                    if log_density:
                        dens = jnp.where(
                            dens > 0.0,
                            jnp.log(jnp.maximum(dens, 1e-30)), NEG)
                    return 0, jnp.where(kvw > 0.5, dens, NEG)

                dd = jnp.arange(D, dtype=jnp.int32)
                _, est = jax.lax.scan(step, 0, (dd, w_rows))
                # [D, Bp, W] -> [Gg, D, R, W]
                return est.reshape(D, Gg, R, W).transpose(1, 0, 2, 3) \
                    .astype(jnp.float32)

            self._cache[key] = jax.jit(build)
        fn = self._cache[key]
        est = fn(self._dput(prep["win"].astype(np.int32)),
                 self._dput(prep["codes"]),
                 self._dput(np.ascontiguousarray(prep["ev"][:, :, 0])),
                 self._tab_put(tables_dev), self._tab_put(slopes_dev),
                 np.float32(grid[0]), np.float32(grid[1] - grid[0]),
                 np.float32(grid[-1]))
        return (est,)


class Sm4PallasAligner(StrawmanPallasAligner):
    """4-state signal machine (getStateMachine4) on the wavefront kernels;
    features and emissions identical to the strawman aligner."""

    spec = _Sm4Spec

    def _scalars(self, sm, ragged_left=False):
        p = sm.p
        vals = [p["gap_short_open_x"], p["gap_short_extend_x"],
                p["gap_long_open_x"], p["gap_long_extend_x"],
                p["gap_long_switch_to_x"],
                p["match_continue"], p["match_from_short_gap_x"],
                p["match_from_short_gap_y"], p["match_from_long_gap_x"],
                p["gap_short_open_y"], p["gap_short_extend_y"]]
        start = sm.ragged_start_vec() if ragged_left else sm.start_vec()
        arr = np.array([vals + list(start) + list(sm.end_vec())
                        + list(sm.ragged_end_vec())], dtype=np.float64)
        arr = np.nan_to_num(arr, neginf=NEG)
        return np.maximum(arr, NEG).astype(np.float32)


class Dna5PallasAligner(StrawmanPallasAligner):
    """Classic 5-state DNA pair-HMM (getStateMachine5 / cPecanRealign's
    machine) on the wavefront kernels.  Reads are
    (seq_x, seq_y, l_x, l_y, anchors) with both sides DNA strings."""

    spec = _Dna5Spec

    def _scalars(self, sm, ragged_left=False):
        p = sm.p
        vals = [p["gap_short_open_x"], p["gap_short_extend_x"],
                p["gap_long_open_x"], p["gap_long_extend_x"],
                p["match_continue"], p["match_from_short_gap_x"],
                p["match_from_short_gap_y"], p["match_from_long_gap_x"],
                p["match_from_long_gap_y"],
                p["gap_short_open_y"], p["gap_short_extend_y"],
                p["gap_long_open_y"], p["gap_long_extend_y"]]
        start = sm.ragged_start_vec() if ragged_left else sm.start_vec()
        arr = np.array([vals + list(start) + list(sm.end_vec())
                        + list(sm.ragged_end_vec())], dtype=np.float64)
        arr = np.nan_to_num(arr, neginf=NEG)
        return np.maximum(arr, NEG).astype(np.float32)

    def _feature_inputs(self, reads, X):
        """x base indices [B, X] int16 (N/sentinel = 4) and the y side as
        (base index, gap-Y emission) value pairs [B, maxY+1, 2]."""
        from ..models import kmers as K

        B = len(reads)
        bx = np.full((B, X), 4, dtype=np.int16)
        max_y = max(r[3] for r in reads)
        ev = np.zeros((B, max_y + 1, 2), np.float32)
        for r, (seq_x, _seq_y, l_x, _l_y, _a) in enumerate(reads):
            b = np.minimum(K.seq_to_base_indices(seq_x), 4)
            bx[r, 1:1 + l_x] = b[:l_x]
        return dict(bx=bx, ydata=ev, reads=list(reads))

    def _model_tables(self, sm):
        from ..models.state_machines import _extend_tables_with_n

        def build(sm):
            match5, gapx5, gapy5 = _extend_tables_with_n(
                sm.match_table, sm.gap_x_table, sm.gap_y_table)
            gapy5_h = np.maximum(np.nan_to_num(gapy5, neginf=NEG), NEG)
            return (jax.device_put(np.asarray(match5, np.float32)),
                    jax.device_put(np.asarray(gapx5, np.float32)),
                    gapy5_h)  # host copy: consumed by the y-feature builder

        return self._model_cache(sm, build)

    def _assemble_fn(self, C, Y):
        key = ("asm", C, Y)
        if key in self._cache:
            return self._cache[key]

        def assemble(bx, ev, match5, gapx5):
            b = jnp.clip(bx.astype(jnp.int32), 0, 4)
            rows = [match5[b, col] for col in range(5)]
            rows.append(jnp.maximum(gapx5[b], NEG))
            xf = jnp.stack(rows, axis=1).astype(jnp.float32)
            B, E, _ = ev.shape
            n = min(E, C + 1)
            yf = jnp.zeros((B, 2, Y), jnp.float32)
            yf = yf.at[:, 0, C - n + 1:C + 1].set(ev[:, :n, 0][:, ::-1])
            yf = yf.at[:, 1, C - n + 1:C + 1].set(ev[:, :n, 1][:, ::-1])
            return xf, yf

        fn = jax.jit(assemble)
        self._cache[key] = fn
        return fn

    def _device_features(self, sm, prep):
        from ..models import kmers as K

        match5, gapx5, gapy5_h = self._model_tables(sm)
        ev = prep["ydata"]
        ev[:, 0, 0] = 4.0
        ev[:, 0, 1] = gapy5_h[4]
        for r, (_sx, seq_y, _lx, l_y, _a) in enumerate(prep["reads"]):
            by = np.minimum(K.seq_to_base_indices(seq_y), 4)[:l_y]
            ev[r, 1:1 + l_y, 0] = by
            ev[r, 1:1 + l_y, 1] = gapy5_h[by]
        return self._assemble_fn(prep["C"], prep["C"] + prep["X"] + 256)(
            self._dput(prep["bx"]), self._dput(ev), match5, gapx5)

    def _exp_dispatch(self, prep, trans, gapx, totals):
        """DNA EM reduce (cell_updateExpectations,
        impl/pairwiseAligner.c:423-441): [G, R, 128] transition lanes ->
        [GR, 25]; the 20 per-column (to-state, y-base) posterior masses
        contract to emis[to, x-base, y-base] by each column's x base (N
        columns excluded via the 4-wide one-hot, like the engine).  All
        of it ships as ONE [GR, 25+80+1] array."""
        key = ("expdisp", self.spec.__name__)
        if key not in self._cache:
            def fn(trans, gapx, bx, totals):
                G, R = trans.shape[0], trans.shape[1]
                GR = G * R
                tr = trans[:, :, :25].reshape(GR, 25)
                acc = gapx.transpose(0, 2, 1, 3).reshape(
                    GR, 5, 4, gapx.shape[-1])
                ohx = (bx[:, :, None] == jnp.arange(4)[None, None, :]
                       ).astype(acc.dtype)
                emis = jnp.einsum("bsyx,bxk->bsky", acc, ohx).reshape(
                    GR, 80)
                tot = totals.reshape(GR, -1)[:, :1]
                return jnp.concatenate([tr, emis, tot], axis=1)
            self._cache[key] = jax.jit(fn)
        return self._cache[key](
            trans, gapx, jnp.asarray(prep["bx"]).astype(jnp.int32), totals)

    def _exp_finalize(self, sm, prep, flat):
        B = prep["B"]
        tr = flat[:B, :25].reshape(B, 5, 5).astype(np.float64)
        emis = flat[:B, 25:105].reshape(B, 5, 4, 4).astype(np.float64)
        tot = flat[:B, 105].astype(np.float64)
        n_diag = np.asarray([b.n_diag for b in prep["bands"]])
        return {
            "trans": tr,
            "emis": emis,
            "likelihood": tot * n_diag,
        }

    def _exp_reduce_aux(self, sm, prep):
        """Mesh EM reduce metadata: per-column x base indices for the
        emission contraction (N columns excluded via the 4-wide
        one-hot)."""
        return {"bx": np.asarray(prep["bx"], np.int32)}

    def _exp_device_reduce(self, trans, gapx, totals, aux, valid, n_diag,
                           axis):
        """DNA 5-state mesh EM reduce (cell_updateExpectations,
        impl/pairwiseAligner.c:423-441): same contraction as
        _exp_dispatch, folded over this shard's reads and psum'd — the
        collective replacement for cPecanEm's expectation-file merge."""
        G, R = trans.shape[0], trans.shape[1]
        GR = G * R
        X = gapx.shape[-1]
        v = valid.astype(jnp.float32)
        tr = (trans[:, :, :25].reshape(GR, 25) * v[:, None]).sum(0)
        acc = gapx.transpose(0, 2, 1, 3).reshape(GR, 5, 4, X)
        bx = aux["bx"].reshape(GR, X)
        ohx = (bx[:, :, None] == jnp.arange(4)[None, None, :]).astype(
            jnp.float32)
        emis = jnp.einsum("bsyx,bxk,b->sky", acc, ohx, v)
        tot = totals.reshape(GR, -1)[:, 0]
        red = {"trans": tr.reshape(5, 5), "emis": emis,
               "likelihood": jnp.sum(tot * n_diag * v)}
        return {k: jax.lax.psum(val, axis) for k, val in red.items()}


class EchelonPallasAligner(StrawmanPallasAligner):
    """Echelon machine (getStateMachineEchelon) on the band-local wavefront
    kernels, with multi-state posterior windows.  Works for both
    StateMachineEchelon (per-kmer skip bins) and StateMachineEchelonB
    (global scalar skips) — the la_* rows are built host-side via the
    machine's own _skip_logs."""

    spec = _EchelonSpec

    def _scalars(self, sm, ragged_left=False):
        start = sm.ragged_start_vec() if ragged_left else sm.start_vec()
        arr = np.array([list(start) + list(sm.end_vec())
                        + list(sm.ragged_end_vec())], dtype=np.float64)
        arr = np.nan_to_num(arr, neginf=NEG)
        return np.maximum(arr, NEG).astype(np.float32)

    def _feature_inputs(self, reads, X):
        """Per-offset kmer indices (getKmer2 position + 1 + i, i = 0..4),
        the previous-kmer index (skip bins), the multi-kmer validity
        bitmask, and (mean, noise, duration) events."""
        from ..models.state_machines import (_getkmer2_positions,
                                             _kmer_idx_at)

        B = len(reads)
        kxp = np.full((B, X), np.int16(32767), dtype=np.int16)
        kx5 = np.full((B, 5, X), np.int16(32767), dtype=np.int16)
        validm = np.zeros((B, X), np.uint8)
        max_ev = max(r[1].shape[0] for r in reads)
        ev = np.zeros((B, max_ev + 1, 3), np.float32)
        from ..models import kmers as K
        for r, (ref, events, l_x, _l_y, _a) in enumerate(reads):
            refp = ref + "n" * 30  # sequence_padSequence
            pos = _getkmer2_positions(l_x)
            n_pos = len(pos)
            # one kmer-index pass per read, sliced six ways (the kmer scan
            # dominated echelon host prep when done per offset)
            all_idx = K.seq_to_kmer_indices(refp, length=len(refp))
            hi = len(refp) - 1
            kxp[r, :n_pos] = all_idx[np.clip(pos, 0, hi)]
            for i in range(5):
                kx5[r, i, :n_pos] = all_idx[np.clip(pos + 1 + i, 0, hi)]
            chars = np.frombuffer(refp.encode(), dtype=np.uint8)
            bits = np.zeros(n_pos, np.uint8)
            for n in range(1, 6):
                idx = np.clip(pos + 6 * n, 0, len(chars) - 1)
                ok = ((pos + 6 * n < len(chars)) & (chars[idx] >= 65)
                      & (chars[idx] <= 90))
                bits |= ok.astype(np.uint8) << (n - 1)
            validm[r, :n_pos] = bits
            ev[r, 1:1 + len(events), :] = events[:, :3]
        return dict(kxp=kxp, kx5=kx5, validm=validm, ev=ev)

    def _model_tables(self, sm):
        from ..io.poremodel import (LEVEL_MEAN, LEVEL_SD, NOISE_MEAN,
                                    NOISE_LAMBDA)
        cols = [LEVEL_MEAN, LEVEL_SD, NOISE_MEAN, NOISE_LAMBDA]
        return self._model_cache(sm, lambda sm: (
            jax.device_put(np.asarray(sm.model.match_model[:, cols],
                                      np.float32)),
            jax.device_put(np.asarray(sm.model.gap_y_model[:, cols],
                                      np.float32)),
        ))

    def _assemble_fn(self, C, Y, scaled=False):
        """Jitted on-device feature assembly.  With ``scaled``, per-read
        scale params sp [B, 5] apply emissions_signal_scaleModel
        (impl/stateMachine.c:632-674) to the five per-offset match-model
        gathers — (lvl_mu, lvl_sd, nz_mu, lambda) become (mu*scale+shift,
        sd*var, nz*scale_sd, lambda*var_sd); the gap/extra-event model and
        durations are read-independent (the reference scales only the
        match model)."""
        key = ("asm", C, Y, scaled)
        if key in self._cache:
            return self._cache[key]
        from ..constants import NUM_OF_KMERS

        def assemble(kx5, la4, validm, ev, sp, mm4, gm4):
            rows = []
            for i in range(5):
                ki = kx5[:, i].astype(jnp.int32)
                valid = ki <= NUM_OF_KMERS
                safe = jnp.clip(ki, 0, NUM_OF_KMERS - 1)
                if sp is None:
                    rows += [jnp.where(valid, mm4[safe, c], 0.0)
                             for c in range(4)]
                else:
                    lvl_mu = mm4[safe, 0] * sp[:, 0:1] + sp[:, 1:2]
                    lvl_sd = mm4[safe, 1] * sp[:, 2:3]
                    nz_mu = mm4[safe, 2] * sp[:, 3:4]
                    lam = mm4[safe, 3] * sp[:, 4:5]
                    rows += [jnp.where(valid, r, 0.0)
                             for r in (lvl_mu, lvl_sd, nz_mu, lam)]
            k0 = kx5[:, 0].astype(jnp.int32)
            v0 = k0 <= NUM_OF_KMERS
            s0 = jnp.clip(k0, 0, NUM_OF_KMERS - 1)
            rows += [jnp.where(v0, gm4[s0, c], 0.0) for c in range(4)]
            rows += [la4[:, i] for i in range(4)]
            vm = validm.astype(jnp.int32)
            rows += [((vm >> (n - 1)) & 1).astype(jnp.float32)
                     for n in range(1, 6)]
            xf = jnp.stack(rows, axis=1).astype(jnp.float32)

            B, E, _ = ev.shape
            n = min(E, C + 1)
            # Poisson duration posteriors dur_0..dur_5
            # (emissions_signal_getDurationProb, impl/stateMachine.c:552)
            c = 0.00332005312085
            l_beta = 0.1397619423751586
            l_f = (0.0, 0.0, 0.69314718056, 1.79175946923, 3.17805383035,
                   4.78749174278)
            dur = ev[:, :, 2]
            lam = dur / c
            safe_lam = jnp.where(lam > 0.0, lam, 1.0)
            yf = jnp.zeros((B, 8, Y), jnp.float32)
            for k in range(6):
                b = jnp.where(lam > 0.0, k * jnp.log(safe_lam),
                              0.0 if k == 0 else NEG)
                d_k = (k + 1) * l_beta + b - l_f[k] - 2.0 * lam
                yf = yf.at[:, k, C - n + 1:C + 1].set(
                    d_k[:, :n][:, ::-1].astype(jnp.float32))
            yf = yf.at[:, 6, C - n + 1:C + 1].set(ev[:, :n, 0][:, ::-1])
            yf = yf.at[:, 7, C - n + 1:C + 1].set(ev[:, :n, 1][:, ::-1])
            return xf, yf

        if scaled:
            fn = jax.jit(assemble)
        else:
            fn = jax.jit(lambda kx5, la4, validm, ev, mm4, gm4:
                         assemble(kx5, la4, validm, ev, None, mm4, gm4))
        self._cache[key] = fn
        return fn

    def _device_features(self, sm, prep):
        from ..io.poremodel import kmer_skip_bin_table

        mm4, gm4 = self._model_tables(sm)
        sp = prep.get("sp")
        # skip transition logs via the machine's own coupling (echelon A:
        # alpha == beta from the per-kmer bins; echelonB: global scalars).
        # With per-read scale params the bins come from the per-read
        # SCALED level means (getKmerSkipBin on the scaled model) without
        # materializing a scaled table per read.
        bins = kmer_skip_bin_table(
            sm.model.match_model,
            prep["kxp"].astype(np.int64),
            prep["kx5"][:, 0].astype(np.int64),
            scale=None if sp is None else sp[:, 0:1].astype(np.float64),
            shift=None if sp is None else sp[:, 1:2].astype(np.float64))
        a_mx = sm.skip_bin_probs[bins]
        la_mx, la_mh, la_xx, la_xh = sm._skip_logs(a_mx)
        la4 = np.stack([la_mx, la_mh, la_xx, la_xh], axis=1)
        la4 = np.maximum(np.nan_to_num(la4, neginf=NEG), NEG).astype(
            np.float32)
        return self._assemble_fn(prep["C"], prep["C"] + prep["X"] + 256,
                                 scaled=sp is not None)(
            *([self._dput(prep["kx5"]), self._dput(la4),
               self._dput(prep["validm"]), self._dput(prep["ev"])]
              + ([self._dput(sp)] if sp is not None else [])
              + [mm4, gm4]))


def extract_pairs_from_pallas(out, read_idx, threshold):
    """Host-side pair extraction from the kernel's windowed posterior tensor
    (posteriors[g, d, r, l] = match posterior of cell (x=win[g,d]+l, d-x) of
    read r)."""
    from ..constants import PAIR_ALIGNMENT_PROB_1
    posts = np.asarray(out["posteriors"])
    prep = out["prep"]
    R = prep["R"]
    win = prep["win"]
    g, r = divmod(read_idx, R)
    band = prep["bands"][read_idx]
    pairs = []
    sub = posts[g, : band.n_diag + 1, r]
    d_idx, l_idx = np.nonzero(sub >= threshold)
    for d, l in zip(d_idx, l_idx):
        p = min(float(sub[d, l]), 1.0)
        x = int(win[g, d]) + int(l)
        pairs.append((int(np.floor(p * PAIR_ALIGNMENT_PROB_1)),
                      x - 1, int(d) - x - 1))
    return pairs


def compact_posteriors(posts, k=4096):
    """Device-side sparsification: per read, top-k posterior cells over all
    diagonals of the windowed tensor.  Keeps the device->host transfer tiny
    (essential on slow links) and the top-k cheap (W lanes, not X).

    Hierarchical and EXACT: max-pool POOL consecutive diagonals, top-k the
    pooled positions, gather each candidate's POOL cells, then top-k those.
    Any cell in the true top-k lives in a pooled position whose max is >=
    its value, and fewer than k pooled positions can beat it — so the
    candidate set provably contains the true top-k, at ~POOL x less
    full-tensor top-k work (lax.top_k over the full plane dominates
    otherwise).

    posts: [G, ND+1, R, W] -> (values [G, R, k] u16, drow [G, R, k],
    lane [G, R, k]) where the flat plane index (d-1) * W' + l (diagonal 0
    is never emitted; W' = NP*W for multi-state windows) ships SPLIT as
    drow = flat // W and lane = flat % W, in the narrowest dtypes the
    static shapes allow (drow u16 when the diagonal-row count fits, lane
    u8 when W <= 256) — the int32 index half of the compacted pairs was
    the headline path's dominant D2H transfer, and (u16, u8) is 3 bytes
    against its 4.  Extractors rebuild flat = drow * W + lane in int64.
    Values ship as u16 fixed point (p * 65535, clipped to [0, 1] — the
    extractors' min(p, 1) applied early): 1.5e-5 absolute score error,
    ~40x below the kernel-vs-engine f32 drift, for another third off the
    device->host transfer.  The extractors dequantize transparently.
    """
    import jax
    import jax.numpy as jnp

    if posts.ndim == 5:
        # multi-state windows [G, ND+1, NP, R, W]: flatten (state, lane)
        # into one W' = NP*W axis; flat_idx then encodes
        # (d-1) * NP*W + state*W + lane
        G, ND1, NP, R, W0 = posts.shape
        p = posts[:, 1:].transpose(0, 3, 1, 2, 4).reshape(
            G, R, ND1 - 1, NP * W0)
        W = NP * W0
    else:
        G, ND1, R, W = posts.shape
        p = posts[:, 1:].transpose(0, 2, 1, 3)      # [G, R, N, W]
    N = ND1 - 1
    POOL = 8
    if N % POOL:
        pad = POOL - N % POOL
        p = jnp.concatenate(
            [p, jnp.zeros((G, R, pad, W), p.dtype)], axis=2)
    NP = p.shape[2] // POOL
    pooled = p.reshape(G, R, NP, POOL, W).max(axis=3).reshape(G, R, NP * W)
    kp = min(k, NP * W)
    _, pidx = jax.lax.top_k(pooled, kp)             # pooled positions
    # expand each pooled position to its POOL cell indices in the flat plane
    chunk = pidx // W
    lane = pidx % W
    full = ((chunk[..., None] * POOL + jnp.arange(POOL)) * W
            + lane[..., None]).reshape(G, R, kp * POOL)
    flat = p.reshape(G, R, -1)
    cand = jnp.take_along_axis(flat, full, axis=-1)
    vals, sub = jax.lax.top_k(cand, min(k, kp * POOL))
    idx = jnp.take_along_axis(full, sub, axis=-1)
    qv = jnp.round(jnp.clip(vals, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    n_rows = p.shape[2]  # diagonal rows in the flat plane (incl. pad)
    d_dt = jnp.uint16 if n_rows < 65536 else jnp.int32
    l_dt = jnp.uint8 if W <= 256 else jnp.uint16
    return qv, (idx // W).astype(d_dt), (idx % W).astype(l_dt)


def _compact_row(vals, g, r):
    """One read's compacted values as f32 probabilities (dequantizing the
    u16 fixed-point wire format; plain float arrays pass through so older
    callers keep working)."""
    v = np.asarray(vals[g, r])
    if v.dtype == np.uint16:
        v = v.astype(np.float32) / np.float32(65535.0)
    return v


_compact_jit = None


def _flat_ix(compact_tail, W, sel=None):
    """Rebuild int64 flat plane indices from the split (drow, lane) wire
    format (compact_posteriors); a legacy single int32 array passes
    through."""
    if len(compact_tail) == 1:
        ix = np.asarray(compact_tail[0])
        return (ix if sel is None else ix[sel]).astype(np.int64)
    drow, lane = (np.asarray(a) for a in compact_tail)
    if sel is not None:
        drow, lane = drow[sel], lane[sel]
    return drow.astype(np.int64) * W + lane.astype(np.int64)


def extract_pairs_compact(vals, idx, read_idx, n_diag, prep, threshold,
                          as_array=False):
    """Host-side pair extraction from compacted (top-k) windowed
    posteriors (vectorized — per-pair Python loops dominate the batch
    pipeline's host time otherwise).  ``idx`` is the (drow, lane) tuple
    of the split wire format (or a legacy flat int32 array).
    ``as_array`` returns an [N, 3] int64 (score, x, y) array instead of
    a tuple list (saves the array->tuple->array churn in batch
    pipelines)."""
    from ..constants import PAIR_ALIGNMENT_PROB_1
    R, W = prep["R"], prep["W"]
    win = prep["win"]
    g, r = divmod(read_idx, R)
    v = _compact_row(vals, g, r)
    tail = idx if isinstance(idx, tuple) else (idx,)
    ix = _flat_ix(tuple(a[g, r] for a in tail), W)
    d = ix // W + 1
    keep = (v >= threshold) & (d <= n_diag)
    v = v[keep]
    d = d[keep]
    l = ix[keep] % W
    x = win[g, d] + l
    scores = np.floor(np.minimum(v.astype(np.float64), 1.0)
                      * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
    if as_array:
        return np.stack([scores, x - 1, d - x - 1], axis=1)
    return list(zip(scores.tolist(), (x - 1).tolist(),
                    (d - x - 1).tolist()))


def extract_echelon_pairs(out, read_idx, n_diag, threshold):
    """Multi-state pair extraction with the echelon expansion
    (diagonalCalculationMultiPosteriorMatchProbs,
    impl/pairwiseAligner.c:845-856): a cell in state match_s above
    threshold emits s pairs (x+n-1, y-1) for n < s.  Reads the compacted
    top-k (flat idx = (d-1)*NP*W + state*W + lane, shipped split as
    drow/lane over the NP*W-wide plane), falling back to the full plane
    when the top-k saturates."""
    from ..constants import PAIR_ALIGNMENT_PROB_1
    vals, *idx = out["compact"]
    prep = out["prep"]
    R, W = prep["R"], prep["W"]
    NP = out["posteriors"].shape[2]
    win = prep["win"]
    g, r = divmod(read_idx, R)
    v = _compact_row(vals, g, r)
    pairs = []

    def emit(p, d, j, l):
        if d > n_diag:
            return
        x = int(win[g, d]) + l
        y = d - x
        if x < 1 or y < 1:
            return
        score = int(np.floor(min(float(p), 1.0) * PAIR_ALIGNMENT_PROB_1))
        for n in range(j + 1):
            pairs.append((score, x + n - 1, y - 1))

    if v.size and v[-1] >= threshold:
        # saturated: scan this read's full plane
        sub = np.asarray(out["posteriors"][g, : n_diag + 1, :, r])
        d_idx, j_idx, l_idx = np.nonzero(sub >= threshold)
        for d, j, l in zip(d_idx, j_idx, l_idx):
            emit(sub[d, j, l], int(d), int(j), int(l))
        return pairs

    ix = _flat_ix(tuple(a[g, r] for a in idx), NP * W)
    keep = v >= threshold
    for p, fi in zip(v[keep], ix[keep]):
        fi = int(fi)
        d = fi // (NP * W) + 1
        rem = fi % (NP * W)
        emit(p, d, rem // W, rem % W)
    return pairs


def extract_pairs_auto(out, read_idx, n_diag, threshold, as_array=False):
    """Pair extraction that detects top-k saturation: when every one of a
    read's k compacted cells clears the threshold, pairs may have been
    dropped — fall back to that read's full windowed posterior plane (one
    [ND+1, W] device->host slice)."""
    from ..constants import PAIR_ALIGNMENT_PROB_1
    if "tiled" in out:
        # run() routes long-diagonal batches to the tiled path (per-chunk
        # compaction, no single "compact" output) transparently — keep
        # extraction transparent too
        return extract_pairs_long(out, read_idx, n_diag, threshold,
                                  as_array=as_array)
    if out["posteriors"].ndim == 5:
        raise ValueError("multi-state posterior output: use "
                         "extract_echelon_pairs")
    vals, *idx = out["compact"]
    idx = tuple(idx)
    prep = out["prep"]
    R = prep["R"]
    g, r = divmod(read_idx, R)
    v = _compact_row(vals, g, r)
    if v.size == 0 or v[-1] < threshold:
        return extract_pairs_compact(vals, idx, read_idx, n_diag, prep,
                                     threshold, as_array=as_array)
    # saturated: extract from the full posterior plane for this read
    # (diagonal 0 is never swept; valid pairs need x >= 1 and y >= 1)
    win = prep["win"]
    sub = np.asarray(out["posteriors"][g, 1: n_diag + 1, r])
    d_idx, l_idx = np.nonzero(sub >= threshold)
    d = d_idx.astype(np.int64) + 1
    x = win[g, d] + l_idx
    p = np.minimum(sub[d_idx, l_idx].astype(np.float64), 1.0)
    keep = (x >= 1) & (d - x >= 1)
    scores = np.floor(p[keep] * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
    ap = np.stack([scores, x[keep] - 1, (d - x)[keep] - 1], axis=1)
    if as_array:
        return ap
    return list(map(tuple, ap.tolist()))


def extract_pairs_chunk(out, rels, n_diags, threshold):
    """Batched pair extraction: ONE vectorized numpy pass over a whole
    chunk's compacted posteriors instead of per-read
    ``extract_pairs_auto`` calls — the per-read small-array calls were
    the batch pipeline's dominant host cost (~2x the tsv formatting).

    Returns a list of [N, 3] int64 (score, x, y) arrays, one per entry
    of ``rels`` (read indices into the run's packed groups), each sorted
    by diagonal x+y with stable ties — exactly
    ``extract_pairs_auto(..., as_array=True)`` followed by the pipeline
    drain's stable argsort.  Reads whose top-k saturated (every
    compacted cell clears the threshold) fall back to the per-read
    full-plane path, like ``extract_pairs_auto``.
    """
    from ..constants import PAIR_ALIGNMENT_PROB_1
    if "tiled" in out:
        # diagonal-keyed routing sent this batch down the tiled path
        # (per-diagonal-chunk compaction): extract per read — already in
        # the same sorted (score, x, y) order this function returns
        return [extract_pairs_long(out, int(rel), int(nd_i), threshold,
                                   as_array=True)
                for rel, nd_i in zip(rels, n_diags)]
    vals, *idx = out["compact"]
    prep = out["prep"]
    R, W = prep["R"], prep["W"]
    win = np.asarray(prep["win"])
    rels = np.asarray(rels, np.int64)
    nd = np.asarray(n_diags, np.int64)
    v = np.asarray(vals)
    k = v.shape[-1]
    v = v.reshape(-1, k)[rels]
    if v.dtype == np.uint16:
        v = v.astype(np.float32) / np.float32(65535.0)
    ix = _flat_ix(tuple(np.asarray(a).reshape(-1, k) for a in idx), W,
                  sel=rels)
    sat = (v[:, -1] >= threshold) if k else np.zeros(len(rels), bool)
    d = ix // W + 1
    keep = (v >= threshold) & (d <= nd[:, None]) & ~sat[:, None]
    rsel, csel = np.nonzero(keep)
    dk = d[rsel, csel]
    lk = ix[rsel, csel] % W
    gk = rels[rsel] // R
    x = win[gk, dk].astype(np.int64) + lk
    vk = v[rsel, csel].astype(np.float64)
    scores = np.floor(np.minimum(vk, 1.0)
                      * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
    ap = np.stack([scores, x - 1, dk - x - 1], axis=1)
    # one global stable sort; x+y = d-2, so the drain's diagonal order
    # is just d within each read
    order = np.argsort((rsel << np.int64(32)) | dk, kind="stable")
    ap = ap[order]
    splits = np.searchsorted(rsel[order], np.arange(1, len(rels)))
    parts = np.split(ap, splits)
    for i in np.nonzero(sat)[0]:
        full = extract_pairs_auto(out, int(rels[i]), int(nd[i]), threshold,
                                  as_array=True).reshape(-1, 3)
        parts[i] = full[np.argsort(full[:, 1] + full[:, 2], kind="stable")]
    return parts


def extract_echelon_pairs_chunk(out, rels, n_diags, threshold):
    """Batched echelon pair extraction with the multi-state expansion
    (state j emits j+1 pairs, diagonalCalculationMultiPosteriorMatchProbs,
    impl/pairwiseAligner.c:845-856), vectorized over a whole chunk.

    Returns a list of [N, 3] int64 (score, x, y) arrays sorted by x+y
    (stable), matching ``extract_echelon_pairs`` + the drain's argsort.
    Saturated reads fall back to the per-read path.
    """
    from ..constants import PAIR_ALIGNMENT_PROB_1
    vals, *idx = out["compact"]
    prep = out["prep"]
    R, W = prep["R"], prep["W"]
    NP = out["posteriors"].shape[2]
    win = np.asarray(prep["win"])
    rels = np.asarray(rels, np.int64)
    nd = np.asarray(n_diags, np.int64)
    v = np.asarray(vals)
    k = v.shape[-1]
    v = v.reshape(-1, k)[rels]
    if v.dtype == np.uint16:
        v = v.astype(np.float32) / np.float32(65535.0)
    ix = _flat_ix(tuple(np.asarray(a).reshape(-1, k) for a in idx),
                  NP * W, sel=rels)
    sat = (v[:, -1] >= threshold) if k else np.zeros(len(rels), bool)
    d = ix // (NP * W) + 1
    j = ix % (NP * W) // W
    l = ix % W
    keep = (v >= threshold) & (d <= nd[:, None]) & ~sat[:, None]
    rsel, csel = np.nonzero(keep)
    dk = d[rsel, csel]
    jk = j[rsel, csel]
    gk = rels[rsel] // R
    x = win[gk, dk].astype(np.int64) + l[rsel, csel]
    y = dk - x
    vk = v[rsel, csel].astype(np.float64)
    valid = (x >= 1) & (y >= 1)
    rsel, jk, x, y, vk = (a[valid] for a in (rsel, jk, x, y, vk))
    scores = np.floor(np.minimum(vk, 1.0)
                      * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
    # state j expands to j+1 pairs (x+n-1, y-1), n ascending — same emit
    # order as the per-read path's inner loop
    reps = jk + 1
    base = np.repeat(np.arange(len(x)), reps)
    ends = np.cumsum(reps)
    n = (np.arange(int(ends[-1]) if len(ends) else 0)
         - np.repeat(ends - reps, reps))
    ap = np.stack([scores[base], x[base] + n - 1, y[base] - 1], axis=1)
    rr = rsel[base]
    order = np.argsort((rr << np.int64(32)) | (ap[:, 1] + ap[:, 2]),
                       kind="stable")
    ap = ap[order]
    splits = np.searchsorted(rr[order], np.arange(1, len(rels)))
    parts = np.split(ap, splits)
    for i in np.nonzero(sat)[0]:
        full = np.asarray(extract_echelon_pairs(out, int(rels[i]),
                                                int(nd[i]), threshold),
                          np.int64).reshape(-1, 3)
        parts[i] = full[np.argsort(full[:, 1] + full[:, 2], kind="stable")]
    return parts


def extract_pairs_long(out, read_idx, n_diag, threshold, as_array=False):
    """Pair extraction for tiled long-alignment runs (_run_tiled): the
    posteriors were compacted per diagonal chunk (``compact_chunks``,
    each an exact top-k over DC diagonals); each chunk extracts like
    extract_pairs_compact with its diagonal offset applied, and a chunk
    whose top-k saturated falls back to that read's chunk rows of the
    full windowed plane.  Returns (score, x, y) rows sorted by diagonal
    (matching extract_pairs_auto + the pipelines' stable drain order)."""
    from ..constants import PAIR_ALIGNMENT_PROB_1
    prep = out["prep"]
    R, W = prep["R"], prep["W"]
    win = prep["win"]
    DC = out["tiled"]["DC"]
    g, r = divmod(read_idx, R)
    parts = []
    for off, comp in out["compact_chunks"]:
        if off >= n_diag:
            break
        vals = comp[0]
        v = _compact_row(vals, g, r)
        sat = v.size > 0 and float(v[-1]) >= threshold
        if not sat:
            ix = _flat_ix(tuple(np.asarray(a)[g, r] for a in comp[1:]), W)
            d = ix // W + 1 + off
            keep = (v >= threshold) & (d <= n_diag)
            d = d[keep]
            l = ix[keep] % W
            p = v[keep].astype(np.float64)
        else:
            # saturated chunk: read this read's rows of the full plane
            hi = min(off + DC, n_diag)
            sub = np.asarray(out["posteriors"][g, off + 1: hi + 1, r])
            d_i, l = np.nonzero(sub >= threshold)
            d = d_i.astype(np.int64) + off + 1
            p = np.minimum(sub[d_i, l].astype(np.float64), 1.0)
        x = win[g, np.minimum(d, win.shape[1] - 1)].astype(np.int64) + l
        y = d - x
        ok = (x >= 1) & (y >= 1)
        scores = np.floor(np.minimum(p[ok], 1.0)
                          * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
        part = np.stack([scores, x[ok] - 1, y[ok] - 1], axis=1)
        parts.append(part[np.argsort(d[ok], kind="stable")])
    ap = (np.concatenate(parts, axis=0) if parts
          else np.zeros((0, 3), np.int64))
    if as_array:
        return ap
    return list(map(tuple, ap.tolist()))
