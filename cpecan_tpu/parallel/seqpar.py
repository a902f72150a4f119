"""Sequence parallelism: one alignment's wavefront split across chips.

The reference only ever splits an alignment at zero-coupling anchor gaps
(impl/pairwiseAligner.c:1405-1471).  This module implements the coupled
case (SURVEY §5 'long-context'): the x-dimension of the DP matrix is
sharded over a mesh axis, every anti-diagonal step exchanges the one
boundary cell each shard needs from its left (forward) or right (backward)
neighbor via `lax.ppermute` over ICI, and the recursion itself is the same
3-state strawman update as the single-chip engine.

This is the scaling path for alignments too long for one chip (or one
chip's HBM): memory and compute per chip drop by the mesh size while the
per-diagonal collective is a single tiny ppermute.  Decision parity with
the single-chip unbanded engine is tested on a virtual CPU mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..constants import N_SENTINEL, NUM_OF_KMERS, PAIR_ALIGNMENT_PROB_1
from ..models import kmers as K
# shared numeric kernels: the reference cubic logAdd and the guarded
# Gaussian, identical to the Pallas wavefront path
from ..ops.pallas_fb import NEG, _gauss
from ..ops.pallas_fb import _log_add as _logadd
from ..ops.pallas_fb import _log_add3 as _logadd3


def _x_features(sm, ref_seq, X, dtype):
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
    return np.stack(rows).astype(dtype)  # [9, X]


def seqpar_posteriors(sm, ref_seq, events, l_x, l_y, mesh=None,
                      threshold=0.01, dtype=jnp.float32, anchors=None,
                      expansion=None):
    """Forward-backward for one (long) alignment, x-sharded over ``mesh``
    ('x' axis).  Returns (score, x, y) aligned pairs above the threshold —
    same contract as get_aligned_pairs_without_banding; with ``anchors``
    (and optionally ``expansion``) the computation is banded like
    get_aligned_pairs_using_anchors, so the per-shard work shrinks to the
    band while memory/compute still split X-ways across chips.

    Strawman 3-state machine (the flagship signal model).  The forward and
    backward scans run as one jitted shard_map; per diagonal each shard
    ppermutes its boundary column to the neighbor.
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("x",))
    n_shards = int(np.prod(mesh.devices.shape))
    ND = l_x + l_y
    X = ((l_x + 2 + n_shards - 1) // n_shards) * n_shards

    if anchors is not None:
        from ..ops.band import make_band
        band = make_band(anchors, l_x, l_y,
                         20 if expansion is None else expansion)
        band_lo = np.zeros(ND + 3, np.int32)
        band_hi = np.full(ND + 3, -1, np.int32)
        n = band.n_diag
        band_lo[: n + 1] = band.x_lo
        band_hi[: n + 1] = band.x_lo + band.width - 1
    else:
        # full matrix: x in [max(0, d-l_y), min(d, l_x)]
        d = np.arange(ND + 3)
        band_lo = np.maximum(d - l_y, 0).astype(np.int32)
        band_hi = np.minimum(d, l_x).astype(np.int32)

    xf = _x_features(sm, ref_seq, X, np.float64)
    p = sm.p

    def s(v):
        v = np.nan_to_num(np.float64(v), neginf=NEG)
        return float(max(v, NEG))

    t = [s(p["match_continue"]), s(p["match_from_gap_x"]),
         s(p["match_from_gap_y"]), s(p["gap_open_x"]), s(p["gap_extend_x"]),
         s(p["gap_switch_to_x"]), s(p["gap_open_y"]), s(p["gap_extend_y"])]
    end = jnp.asarray([s(p["match_continue"]), s(p["match_from_gap_x"]),
                       s(p["match_from_gap_y"])], dtype)

    # events flipped/padded so that slice start (C - d + x0) is uniform
    # per shard: ev_f[j] = event feature at y = C - j
    C = ND + 3
    ev_m = np.zeros(C + X + 8, dtype=np.float64)
    ev_n = np.zeros(C + X + 8, dtype=np.float64)
    ys = np.arange(1, len(events) + 1)
    ev_m[C - ys] = events[:, 0]
    ev_n[C - ys] = events[:, 1]

    xf = jnp.asarray(xf, dtype)
    ev = jnp.asarray(np.stack([ev_m, ev_n]), dtype)
    Xl = X // n_shards

    fwd_perm = [(i, i + 1) for i in range(n_shards - 1)]
    bwd_perm = [(i + 1, i) for i in range(n_shards - 1)]

    band_lo_j = jnp.asarray(band_lo)
    band_hi_j = jnp.asarray(band_hi)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "x"), P(None), P(None), P(None)),
             out_specs=(P(None, None, "x"), P(None)),
             check_vma=False)
    def run(xf_local, ev_full, blo, bhi):
        shard = jax.lax.axis_index("x")
        x0 = shard * Xl
        lane = x0 + jax.lax.iota(jnp.int32, Xl)
        e_gapx = xf_local[8]

        def emissions(d):
            j0 = C - d + x0
            mean = jax.lax.dynamic_slice_in_dim(ev_full[0], j0, Xl)
            noise = jax.lax.dynamic_slice_in_dim(ev_full[1], j0, Xl)
            e_match = (_gauss(mean, xf_local[0], xf_local[1])
                       + _gauss(noise, xf_local[2], xf_local[3]))
            e_gapy = (_gauss(mean, xf_local[4], xf_local[5])
                      + _gauss(noise, xf_local[6], xf_local[7]))
            return e_match, e_gapy

        def mask(d):
            # band interval on this diagonal (full matrix when unbanded)
            return (lane >= blo[d]) & (lane <= bhi[d])

        def shift_from_left(v):
            """out[i] = v[i-1] with the left neighbor's last column coming
            over ICI; global lane 0 gets NEG."""
            boundary = jax.lax.ppermute(v[-1:], "x", fwd_perm)
            rolled = jnp.concatenate([boundary, v[:-1]])
            return jnp.where(lane == 0, NEG, rolled)

        def shift_from_right(v):
            boundary = jax.lax.ppermute(v[:1], "x", bwd_perm)
            rolled = jnp.concatenate([v[1:], boundary])
            return jnp.where(lane == X - 1, NEG, rolled)

        neg = jnp.full((Xl,), NEG, dtype)
        start_m = jnp.where(lane == 0, 0.0, NEG).astype(dtype)

        def fwd_step(carry, d):
            p1m, p1x, p1y, p2m, p2x, p2y = carry
            e_match, e_gapy = emissions(d)
            sm_ = shift_from_left(p1m)
            sx = shift_from_left(p1x)
            sy = shift_from_left(p1y)
            new_x = _logadd3(sm_ + t[3], sx + t[4], sy + t[5]) + e_gapx
            new_m = _logadd3(shift_from_left(p2m) + t[0],
                             shift_from_left(p2x) + t[1],
                             shift_from_left(p2y) + t[2]) + e_match
            new_y = _logadd(p1m + t[6], p1y + t[7]) + e_gapy
            mk = mask(d)
            new_m = jnp.where(mk, new_m, NEG)
            new_x = jnp.where(mk, new_x, NEG)
            new_y = jnp.where(mk, new_y, NEG)
            return ((new_m, new_x, new_y, p1m, p1x, p1y),
                    jnp.stack([new_m, new_x, new_y]))

        init = (start_m, neg, neg, neg, neg, neg)
        _, fwd_all = jax.lax.scan(fwd_step, init,
                                  jnp.arange(1, ND + 1))
        first = jnp.stack([start_m, neg, neg])[None]
        fwd_all = jnp.concatenate([first, fwd_all])  # [ND+1, 3, Xl]

        # backward: seed at the corner cell (l_x+1? the engine seeds end
        # state probs at diagonal ND on every band cell; unbanded: the
        # single corner (l_x+1-1?) -- the terminal cell is (l_x+1, l_y+1)
        # exclusive; the last matrix cell is x = l_x+1 on diagonal ND+2?
        # Matching the engine: diagonal ND holds (x=l_x+?..) — we seed end
        # vec on every in-mask cell of diagonal ND, as the kernels do.
        def bwd_step(carry, d):
            n1m, n1x, n1y, n2m = carry
            em2, _ = emissions(d + 2)
            _, eg1 = emissions(d + 1)
            mid = shift_from_right(em2 + n2m)
            bw_m = mid + t[0]
            bw_x = mid + t[1]
            bw_y = mid + t[2]
            up = eg1 + n1y
            bw_m = _logadd(bw_m, up + t[6])
            bw_y = _logadd(bw_y, up + t[7])
            low = shift_from_right(e_gapx + n1x)
            bw_m = _logadd(bw_m, low + t[3])
            bw_x = _logadd(bw_x, low + t[4])
            bw_y = _logadd(bw_y, low + t[5])
            mk = mask(d)
            seed = mk & (d == ND)
            bw_m = jnp.where(seed, end[0], jnp.where(mk, bw_m, NEG))
            bw_x = jnp.where(seed, end[1], jnp.where(mk, bw_x, NEG))
            bw_y = jnp.where(seed, end[2], jnp.where(mk, bw_y, NEG))
            return ((bw_m, bw_x, bw_y, n1m),
                    jnp.stack([bw_m, bw_x, bw_y]))

        init_b = (neg, neg, neg, neg)
        _, bwd_rev = jax.lax.scan(bwd_step, init_b,
                                  jnp.arange(ND, 0, -1))
        bwd_all = jnp.concatenate([jnp.full((1, 3, Xl), NEG, dtype),
                                   jnp.flip(bwd_rev, 0)])

        # total prob: logsumexp over diagonal ND of fwd*bwd
        prod = fwd_all[ND] + bwd_all[ND]
        loc = jnp.max(jnp.where(mask(ND), prod[0], NEG))
        for si in (1, 2):
            loc = jnp.maximum(loc, jnp.max(jnp.where(mask(ND), prod[si],
                                                     NEG)))
        gmax = jax.lax.pmax(loc, "x")
        ssum = sum(jnp.sum(jnp.where(mask(ND), jnp.exp(prod[si] - gmax),
                                     0.0)) for si in range(3))
        total = gmax + jnp.log(jax.lax.psum(ssum, "x"))

        posts = jnp.exp(jnp.minimum(
            fwd_all[:, 0, :] + bwd_all[:, 0, :] - total, 0.69))
        d_idx = jnp.arange(ND + 1)[:, None]
        ok = (lane[None, :] > 0) & (lane[None, :] < d_idx)
        posts = jnp.where(ok, posts, 0.0)
        return posts[:, None, :], total[None]

    posts, total = run(xf, ev, band_lo_j, band_hi_j)
    posts = np.asarray(posts)[:, 0, :]
    pairs = []
    d_idx, x_idx = np.nonzero(posts >= threshold)
    for d, x in zip(d_idx, x_idx):
        pr = min(float(posts[d, x]), 1.0)
        pairs.append((int(np.floor(pr * PAIR_ALIGNMENT_PROB_1)),
                      int(x) - 1, int(d) - int(x) - 1))
    return pairs, float(np.asarray(total)[0])
