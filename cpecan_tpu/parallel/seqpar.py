"""Sequence parallelism: one alignment's wavefront split across chips.

The reference only ever splits an alignment at zero-coupling anchor gaps
(impl/pairwiseAligner.c:1405-1471).  This module implements the coupled
case (SURVEY §5 'long-context'): the x-dimension of the DP matrix is
sharded over a mesh axis, every anti-diagonal step exchanges the one
boundary cell each shard needs from its left (forward) or right (backward)
neighbor via `lax.ppermute` over ICI, and the recursion is the machine
spec's own window-frame update (the same `fwd_update_w`/`bwd_update_w`
the Pallas kernels run, here on [1, Xl] shard tiles instead of [R, W]
band windows).

Supported machines: the 3-state signal strawman and the classic DNA
5-state (the family where chromosome-scale references actually occur —
the reference's splitMatrixBiggerThanThis regime).  EM expectations
(`seqpar_expectations`) run as a vectorized post-pass over the stored
forward/backward planes with `psum`-merged transition accumulators, so
one chromosome-scale EM alignment can split across chips.

This is the scaling path for alignments too long for one chip (or one
chip's HBM): memory and compute per chip drop by the mesh size while the
per-diagonal collective is a single tiny ppermute.  Decision parity with
the single-chip engine is tested on a virtual CPU mesh.

Precision: posteriors default to float32 (decision parity holds in f32);
EM expectations default to float64 **when jax x64 is enabled** (the
engine-parity tests run under x64) and fall back to float32 otherwise —
requesting f64 without x64 would silently truncate with a UserWarning
per call site, so `_resolve_dtype` picks the widest honest dtype.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import (N_SENTINEL, NUM_OF_KMERS, PAIR_ALIGNMENT_PROB_1)
from ..models import kmers as K
# shared machine specs + numeric kernels: the reference cubic logAdd, the
# guarded Gaussian, and the per-machine window-frame updates — identical
# to the Pallas wavefront path
from ..ops.pallas_fb import NEG, _Dna5Spec, _StrawmanSpec, _gauss  # noqa: F401


def _resolve_dtype(dtype):
    """None -> f64 under x64 (test/parity runs), else f32 (device runs)."""
    if dtype is not None:
        return dtype
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _san(vals):
    arr = np.nan_to_num(np.asarray(vals, np.float64), neginf=NEG)
    return np.maximum(arr, NEG)


class _StrawmanAdapter:
    """Strawman signal machine: x features/scalars as in
    StrawmanPallasAligner (kept in f64 here for engine-parity tests)."""

    spec = _StrawmanSpec

    @staticmethod
    def scalars(sm):
        p = sm.p
        vals = [p["match_continue"], p["match_from_gap_x"],
                p["match_from_gap_y"], p["gap_open_x"], p["gap_extend_x"],
                p["gap_switch_to_x"], p["gap_open_y"], p["gap_extend_y"]]
        return _san(vals + list(sm.start_vec()) + list(sm.end_vec())
                    + list(sm.ragged_end_vec()))

    @staticmethod
    def x_features(sm, ref_seq, X):
        kx = np.full(X, N_SENTINEL, dtype=np.int64)
        ki = K.seq_to_kmer_indices(ref_seq)
        kx[1:1 + len(ki)] = ki
        valid = kx <= NUM_OF_KMERS
        safe = np.clip(kx, 0, NUM_OF_KMERS - 1)
        rows = []
        for tab in (sm.model.match_model, sm.model.gap_y_model):
            for c in range(4):
                rows.append(np.where(valid, tab[safe, c], 0.0))
        gapx = np.where(valid, sm.gap_x_log_probs[safe], NEG)
        rows.append(np.maximum(gapx, NEG))
        return np.stack(rows)  # [9, X]

    @staticmethod
    def y_rows(sm, events, C, L):
        """Flipped y-feature rows: row[j] = feature at y = C - j."""
        ev_m = np.zeros(L, dtype=np.float64)
        ev_n = np.zeros(L, dtype=np.float64)
        ys = np.arange(1, len(events) + 1)
        ev_m[C - ys] = events[:, 0]
        ev_n[C - ys] = events[:, 1]
        return np.stack([ev_m, ev_n])

    @staticmethod
    def reduce_expectations(sm, ref_seq, X, trans, acc, total, n_diag):
        """Per-column gap-X mass -> per-kmer counters (the engine's
        'signal3' kmer_gap; mirrors StrawmanPallasAligner
        ._reduce_expectations for a single read)."""
        kx = np.full(X, N_SENTINEL, dtype=np.int64)
        ki = K.seq_to_kmer_indices(ref_seq)
        kx[1:1 + len(ki)] = ki
        seg = np.zeros(NUM_OF_KMERS + 2)
        np.add.at(seg, np.clip(kx, 0, NUM_OF_KMERS + 1), acc[0])
        return {"trans": trans, "kmer_gap": seg,
                "likelihood": total * n_diag}


class _Dna5Adapter:
    """Classic 5-state DNA machine: x features/scalars as in
    Dna5PallasAligner (f64)."""

    spec = _Dna5Spec

    @staticmethod
    def scalars(sm):
        p = sm.p
        vals = [p["gap_short_open_x"], p["gap_short_extend_x"],
                p["gap_long_open_x"], p["gap_long_extend_x"],
                p["match_continue"], p["match_from_short_gap_x"],
                p["match_from_short_gap_y"], p["match_from_long_gap_x"],
                p["match_from_long_gap_y"],
                p["gap_short_open_y"], p["gap_short_extend_y"],
                p["gap_long_open_y"], p["gap_long_extend_y"]]
        return _san(vals + list(sm.start_vec()) + list(sm.end_vec())
                    + list(sm.ragged_end_vec()))

    @staticmethod
    def _tables(sm):
        from ..models.state_machines import _extend_tables_with_n
        match5, gapx5, gapy5 = _extend_tables_with_n(
            sm.match_table, sm.gap_x_table, sm.gap_y_table)
        return (_san(match5), _san(gapx5), _san(gapy5))

    @classmethod
    def x_features(cls, sm, seq_x, X):
        match5, gapx5, _ = cls._tables(sm)
        b = np.full(X, 4, dtype=np.int64)
        bi = np.minimum(K.seq_to_base_indices(seq_x), 4)
        b[1:1 + len(bi)] = bi
        rows = [match5[b, col] for col in range(5)]
        rows.append(np.maximum(gapx5[b], NEG))
        return np.stack(rows)  # [6, X]

    @classmethod
    def y_rows(cls, sm, seq_y, C, L):
        _, _, gapy5 = cls._tables(sm)
        by = np.minimum(K.seq_to_base_indices(seq_y), 4)
        ev_b = np.zeros(L, dtype=np.float64)
        ev_g = np.zeros(L, dtype=np.float64)
        ys = np.arange(1, len(by) + 1)
        ev_b[C - ys] = by
        ev_g[C - ys] = gapy5[by]
        return np.stack([ev_b, ev_g])

    @staticmethod
    def reduce_expectations(sm, seq_x, X, trans, acc, total, n_diag):
        """[20, X] (to-state, y-base) masses -> emis[to, x-base, y-base]
        (mirrors Dna5PallasAligner._reduce_expectations, N x-columns
        excluded via the 4-wide one-hot)."""
        bx = np.full(X, 4, dtype=np.int64)
        bi = np.minimum(K.seq_to_base_indices(seq_x), 4)
        bx[1:1 + len(bi)] = bi
        acc = acc.reshape(5, 4, X)
        ohx = (bx[:, None] == np.arange(4)[None, :]).astype(np.float64)
        emis = np.einsum("syx,xk->sky", acc, ohx)
        return {"trans": trans, "emis": emis, "likelihood": total * n_diag}


def _adapter_for(sm):
    from ..models.state_machines import (StateMachine3SignalStrawman,
                                         StateMachine5)
    if isinstance(sm, StateMachine3SignalStrawman):
        return _StrawmanAdapter
    if isinstance(sm, StateMachine5):
        return _Dna5Adapter
    raise ValueError(f"no sequence-parallel adapter for {type(sm).__name__}")


def _band_arrays(anchors, l_x, l_y, ND, expansion):
    if anchors is not None:
        from ..ops.band import make_band
        band = make_band(anchors, l_x, l_y,
                         20 if expansion is None else expansion)
        band_lo = np.zeros(ND + 3, np.int32)
        band_hi = np.full(ND + 3, -1, np.int32)
        n = band.n_diag
        band_lo[: n + 1] = band.x_lo
        band_hi[: n + 1] = band.x_lo + band.width - 1
        return band_lo, band_hi, band.n_diag
    d = np.arange(ND + 3)
    band_lo = np.maximum(d - l_y, 0).astype(np.int32)
    band_hi = np.minimum(d, l_x).astype(np.int32)
    return band_lo, band_hi, ND


def _seqpar_run(sm, seq_x, y_input, l_x, l_y, mesh, dtype, anchors,
                expansion, with_exp):
    """Shared fwd/bwd shard_map driver.  Returns (posts [ND+1, X], total,
    n_diag) and, with_exp, (trans [S,S], acc [NACC, X])."""
    ad = _adapter_for(sm)
    dtype = _resolve_dtype(dtype)
    spec = ad.spec
    S = spec.S
    NS = spec.NS
    NACC = getattr(spec, "EXP_NACC", 1)
    needs_y = getattr(spec, "EXP_Y_AUX", False)

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("x",))
    n_shards = int(np.prod(mesh.devices.shape))
    ND = l_x + l_y
    X = ((l_x + 2 + n_shards - 1) // n_shards) * n_shards
    C = ND + 3

    band_lo, band_hi, n_diag = _band_arrays(anchors, l_x, l_y, ND,
                                            expansion)

    xf_h = ad.x_features(sm, seq_x, X)               # [NXF, X]
    # x+1 frame: xfp[:, x] = xf[:, x+1] (static — sharded once, so the
    # spec's x+1 reads need no per-step collective)
    xfp_h = np.concatenate([xf_h[:, 1:], xf_h[:, -1:]], axis=1)
    ev_h = ad.y_rows(sm, y_input, C, C + X + 8)      # [2, C+X+8]
    tvec = ad.scalars(sm)                             # [NS + 3S]
    t = [float(v) for v in tvec]
    start = tvec[NS:NS + S]
    end = jnp.asarray(tvec[NS + S:NS + 2 * S], dtype)

    xf = jnp.asarray(xf_h, dtype)
    xfp = jnp.asarray(xfp_h, dtype)
    ev = jnp.asarray(ev_h, dtype)
    Xl = X // n_shards

    fwd_perm = [(i, i + 1) for i in range(n_shards - 1)]
    bwd_perm = [(i + 1, i) for i in range(n_shards - 1)]

    band_lo_j = jnp.asarray(band_lo)
    band_hi_j = jnp.asarray(band_hi)

    out_specs = (P(None, None, "x"), P(None))
    if with_exp:
        out_specs = out_specs + (P(None), P(None, "x"))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "x"), P(None, "x"), P(None), P(None),
                       P(None)),
             out_specs=out_specs,
             check_vma=False)
    def run(xf_l, xfp_l, ev_full, blo, bhi):
        shard = jax.lax.axis_index("x")
        x0 = shard * Xl
        lane = x0 + jax.lax.iota(jnp.int32, Xl)
        xf3 = xf_l[None]      # [1, NXF, Xl]: the spec's tile layout
        xfp3 = xfp_l[None]

        def emissions_at(d, plus=0):
            """Emission tiles on this shard's lanes for diagonal ``d``;
            ``plus=1`` evaluates at x+1 (using the pre-shifted xfp)."""
            j0 = C - d + x0 + plus
            mean = jax.lax.dynamic_slice_in_dim(ev_full[0], j0, Xl)[None]
            noise = jax.lax.dynamic_slice_in_dim(ev_full[1], j0, Xl)[None]
            return spec.emissions(xfp3 if plus else xf3, mean, noise)

        def mask(d):
            return (lane >= blo[d]) & (lane <= bhi[d])

        def shift_from_left(v):
            """out[..., i] = v[..., i-1] with the left neighbor's last
            column coming over ICI; global lane 0 gets NEG."""
            boundary = jax.lax.ppermute(v[..., -1:], "x", fwd_perm)
            rolled = jnp.concatenate([boundary, v[..., :-1]], axis=-1)
            return jnp.where(lane == 0, NEG, rolled)

        def shift_from_right(v):
            boundary = jax.lax.ppermute(v[..., :1], "x", bwd_perm)
            rolled = jnp.concatenate([v[..., 1:], boundary], axis=-1)
            return jnp.where(lane == X - 1, NEG, rolled)

        neg = jnp.full((1, Xl), NEG, dtype)
        start_col = [jnp.where(lane == 0, jnp.asarray(start[i], dtype),
                               NEG)[None] for i in range(S)]

        def fwd_step(carry, d):
            p1 = list(carry[:S])       # diag d-1
            p2 = list(carry[S:])       # diag d-2
            e_match, e_gapy = emissions_at(d)
            p1m = [shift_from_left(v) for v in p1]
            p2m = [shift_from_left(v) for v in p2]
            new = spec.fwd_update_w(t, xf3, e_match, e_gapy, p1m, p1, p2m)
            mk = mask(d)
            new = [jnp.where(mk, v, NEG) for v in new]
            return tuple(new) + tuple(p1), jnp.stack(
                [v[0] for v in new])

        init = tuple(start_col) + (neg,) * S
        _, fwd_all = jax.lax.scan(fwd_step, init, jnp.arange(1, ND + 1))
        first = jnp.stack([v[0] for v in start_col])[None]
        fwd_all = jnp.concatenate([first, fwd_all])  # [ND+1, S, Xl]

        def bwd_step(carry, d):
            n1 = list(carry[:S])       # bwd[d+1]
            n2 = list(carry[S:])       # bwd[d+2]
            em1, eg1 = emissions_at(d + 1)
            em2p, _ = emissions_at(d + 2, plus=1)
            n1p = [shift_from_right(v) for v in n1]
            n2p = [shift_from_right(v) for v in n2]
            bw = spec.bwd_update_w(t, xf3, xfp3, em1, eg1, em2p, n1, n1p,
                                   n2p)
            mk = mask(d)
            seed = mk & (d == ND)
            bw = [jnp.where(seed, end[i], jnp.where(mk, bw[i], NEG))
                  for i in range(S)]
            return tuple(bw) + tuple(n1), jnp.stack([v[0] for v in bw])

        init_b = (neg,) * (2 * S)
        _, bwd_rev = jax.lax.scan(bwd_step, init_b,
                                  jnp.arange(ND, 0, -1))
        bwd_all = jnp.concatenate([jnp.full((1, S, Xl), NEG, dtype),
                                   jnp.flip(bwd_rev, 0)])

        # total prob: logsumexp over diagonal ND of fwd*bwd
        prod = fwd_all[ND] + bwd_all[ND]
        mN = mask(ND)
        loc = jnp.max(jnp.where(mN, prod[0], NEG))
        for si in range(1, S):
            loc = jnp.maximum(loc, jnp.max(jnp.where(mN, prod[si], NEG)))
        gmax = jax.lax.pmax(loc, "x")
        ssum = sum(jnp.sum(jnp.where(mN, jnp.exp(prod[si] - gmax), 0.0))
                   for si in range(S))
        total = gmax + jnp.log(jax.lax.psum(ssum, "x"))

        posts = jnp.exp(jnp.minimum(
            fwd_all[:, 0, :] + bwd_all[:, 0, :] - total, 0.69))
        d_idx = jnp.arange(ND + 1)[:, None]
        in_band = (lane[None, :] >= blo[d_idx]) & \
            (lane[None, :] <= bhi[d_idx])
        ok = in_band & (lane[None, :] > 0) & (lane[None, :] < d_idx)
        posts = jnp.where(ok, posts, 0.0)
        if not with_exp:
            return posts[:, None, :], total[None]

        # ---- EM expectations: vectorized post-pass over all target
        # diagonals (diagonalCalculation(_signal)_Expectations,
        # impl/pairwiseAligner.c:868-912).  Target diagonal d receives
        # middle from fwd[d-2] at x-1, lower from fwd[d-1] at x-1, upper
        # from fwd[d-1] at x, weighted by bwd[d] at x.
        NDt = ND  # targets 1..ND
        negrow = jnp.full((1, S, Xl), NEG, dtype)
        f0 = jnp.concatenate([negrow, fwd_all[:ND - 1]])   # fwd[d-2]
        f1 = fwd_all[:ND]                                  # fwd[d-1]
        f0m_a = shift_from_left(f0)
        f1m_a = shift_from_left(f1)
        ds = jnp.arange(1, ND + 1)
        j_idx = (C - ds[:, None]) + x0 + jax.lax.iota(
            jnp.int32, Xl)[None, :]
        mean_t = ev_full[0][j_idx]
        noise_t = ev_full[1][j_idx]
        em_t, eg_t = spec.emissions(xf3, mean_t, noise_t)
        y_t = mean_t if needs_y else None
        f0m = [f0m_a[:, i, :] for i in range(S)]
        f1m = [f1m_a[:, i, :] for i in range(S)]
        f1a = [f1[:, i, :] for i in range(S)]
        bw2 = [bwd_all[1:, i, :] for i in range(S)]
        probs, contribs = spec.exp_probs_w(t, xf3, em_t, eg_t, y_t, f0m,
                                           f1m, f1a, bw2, total)
        m = ((lane[None, :] >= blo[ds][:, None])
             & (lane[None, :] <= bhi[ds][:, None])).astype(dtype)
        trans = jnp.zeros((S * S,), dtype)
        for name, idx in spec.EXP_LANES.items():
            tot = jax.lax.psum(jnp.sum(probs[name] * m), "x")
            trans = trans.at[idx].add(tot)
        if not isinstance(contribs, (tuple, list)):
            contribs = (contribs,)
        acc = jnp.stack([jnp.sum(c * m, axis=0) for c in contribs])
        return posts[:, None, :], total[None], trans, acc

    out = run(xf, xfp, ev, band_lo_j, band_hi_j)
    posts = np.asarray(out[0])[:, 0, :]
    total = float(np.asarray(out[1])[0])
    extra = None
    if with_exp:
        extra = (np.asarray(out[2]).reshape(S, S), np.asarray(out[3]))
    return posts, total, n_diag, X, extra


def seqpar_posteriors(sm, ref_seq, events, l_x, l_y, mesh=None,
                      threshold=0.01, dtype=jnp.float32, anchors=None,
                      expansion=None):
    """Forward-backward for one (long) alignment, x-sharded over ``mesh``
    ('x' axis).  Returns (pairs, total): (score, x, y) aligned pairs above
    the threshold — same contract as get_aligned_pairs_without_banding;
    with ``anchors`` (and optionally ``expansion``) the computation is
    banded like get_aligned_pairs_using_anchors, so the per-shard work
    shrinks to the band while memory/compute still split X-ways.

    ``sm`` selects the machine: StateMachine3SignalStrawman (``events``
    [l_y, 3]) or StateMachine5 (``events`` is the y DNA string).  The
    forward and backward scans run as one jitted shard_map; per diagonal
    each shard ppermutes its boundary column to the neighbor.
    """
    posts, total, _n_diag, _X, _ = _seqpar_run(
        sm, ref_seq, events, l_x, l_y, mesh, dtype, anchors, expansion,
        with_exp=False)
    pairs = []
    d_idx, x_idx = np.nonzero(posts >= threshold)
    for d, x in zip(d_idx, x_idx):
        pr = min(float(posts[d, x]), 1.0)
        pairs.append((int(np.floor(pr * PAIR_ALIGNMENT_PROB_1)),
                      int(x) - 1, int(d) - int(x) - 1))
    return pairs, total


def seqpar_expectations(sm, ref_seq, events, l_x, l_y, mesh=None,
                        dtype=None, anchors=None, expansion=None):
    """EM expectations for one (long) alignment, x-sharded over ``mesh``.

    Same accumulators as the Pallas in-kernel EM path, computed as a
    vectorized post-pass over the sharded forward/backward planes with
    psum-merged transition sums: strawman -> {trans [3,3], kmer_gap
    [K+2], likelihood}; DNA 5-state -> {trans [5,5], emis [5,4,4],
    likelihood}.  This is the path for EM on a single chromosome-scale
    alignment (the reference can only shard across alignments).
    """
    ad = _adapter_for(sm)
    _posts, total, n_diag, X, extra = _seqpar_run(
        sm, ref_seq, events, l_x, l_y, mesh, dtype, anchors, expansion,
        with_exp=True)
    trans, acc = extra
    return ad.reduce_expectations(sm, ref_seq, X, trans, acc, total,
                                  n_diag)
