"""Tiled long-alignment fast path: exact parity with the untiled kernels.

The tiled path (`_run_tiled`, ops/pallas_fb.py) matches the reference
banded engine's O(band x window)-memory-at-any-length capability
(impl/pairwiseAligner.c:919-1055) by sweeping TD-diagonal tiles with
chained carries.  The per-diagonal compute is identical to the untiled
kernels; the per-tile log-space re-centering (which keeps f32 usable to
chromosome scale — shifts cancel exactly in the posterior via the
backward's shf correction) only perturbs rounding, so posteriors,
totals, and extracted pair decisions must agree to float tolerance —
pinned here on CPU interpret mode with tiles forced small
(tile_diag=128) so several tiles cover ordinary fixture-scale reads.
"""

import numpy as np
import pytest

from cpecan_tpu.align import AlignmentParams
from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner,
                                      StrawmanPallasAligner,
                                      extract_pairs_auto,
                                      extract_pairs_long)


def _synth_signal_reads(rng, n_reads, l_ref, n_events, anchor_step=64):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _synthetic_batch
    sm, reads = _synthetic_batch(n_reads=n_reads, n_ref=l_ref,
                                 n_events=n_events, seed=int(rng.integers(1e6)),
                                 shape_jitter=0.2)
    return sm, reads


def _dense_anchors(l_x, l_y, step):
    anchors = []
    px = py = -1
    n = max(l_x // step, 1)
    for j in range(1, n):
        x = int(j * (l_x - 2) / n) + 1
        y = int(j * (l_y - 2) / n) + 1
        if x > px and y > py:
            anchors.append((x, y))
            px, py = x, y
    return anchors


REL = 1e-2  # the re-centering perturbs f32 rounding against the large
# (-1e4..-1e5) log totals either way; drift stays at the same level as
# the documented engine-vs-pallas score drift (~1e-3 relative)


def _assert_same_pairs(out_t, out_u, n_diags, threshold):
    from cpecan_tpu.constants import PAIR_ALIGNMENT_PROB_1
    tol = int((REL + 155 / PAIR_ALIGNMENT_PROB_1) * PAIR_ALIGNMENT_PROB_1)
    for i, nd in enumerate(n_diags):
        pt = extract_pairs_long(out_t, i, nd, threshold, as_array=True)
        pu = extract_pairs_auto(out_u, i, nd, threshold, as_array=True)
        mt = {(x, y): s for s, x, y in pt.tolist()}
        mu = {(x, y): s for s, x, y in pu.tolist()}
        near = (threshold + REL) * PAIR_ALIGNMENT_PROB_1
        for k in set(mt) ^ set(mu):
            # a pair present on one side only must sit at the threshold
            s = mt.get(k, mu.get(k))
            assert s <= near, (i, k, s)
        for k in set(mt) & set(mu):
            assert abs(mt[k] - mu[k]) <= tol, (i, k, mt[k], mu[k])


def _assert_close_planes(out_t, out_u):
    pu = np.asarray(out_u["posteriors"])
    pt = np.asarray(out_t["posteriors"])[:, :pu.shape[1]]
    np.testing.assert_allclose(pt, pu, atol=REL)
    np.testing.assert_allclose(np.asarray(out_t["totals"]),
                               np.asarray(out_u["totals"]),
                               atol=5e-2, rtol=1e-6)


def test_tiled_matches_untiled_strawman():
    rng = np.random.default_rng(11)
    sm, reads = _synth_signal_reads(rng, 3, 500, 430)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out_u = pa.run(sm, reads, compact_k=512)
    out_t = pa.run(sm, reads, compact_k=512, tile_diag=128)
    nd = [b.n_diag for b in out_u["prep"]["bands"]]
    assert out_t["tiled"]["NT"] > 3
    _assert_close_planes(out_t, out_u)
    _assert_same_pairs(out_t, out_u, nd, params.threshold)


def test_tiled_matches_untiled_dna5():
    from cpecan_tpu.models.state_machines import StateMachine5
    rng = np.random.default_rng(5)
    bases = "ACGT"
    reads = []
    for _ in range(2):
        n = int(rng.integers(420, 520))
        sx = "".join(rng.choice(list(bases), n))
        out = []
        for ch in sx:
            r = rng.random()
            if r < 0.05:
                continue
            out.append(rng.choice(list(bases)) if r < 0.12 else ch)
            if rng.random() < 0.05:
                out.append(rng.choice(list(bases)))
        sy = "".join(out)
        reads.append((sx, sy, len(sx), len(sy),
                      _dense_anchors(len(sx), len(sy), 64)))
    sm = StateMachine5()
    params = AlignmentParams()
    pa = Dna5PallasAligner(params, interpret=True)
    out_u = pa.run(sm, reads, compact_k=512)
    out_t = pa.run(sm, reads, compact_k=512, tile_diag=128)
    _assert_close_planes(out_t, out_u)
    nd = [b.n_diag for b in out_u["prep"]["bands"]]
    _assert_same_pairs(out_t, out_u, nd, params.threshold)


def test_chunk_extraction_handles_tiled_outputs():
    """The diagonal-keyed routing (run() >= 2^14 est. diagonals) can
    hand the batch pipelines a tiled output: extract_pairs_chunk and
    extract_pairs_auto must return the same rows they produce on the
    untiled wire."""
    from cpecan_tpu.ops.pallas_fb import (extract_pairs_auto,
                                          extract_pairs_chunk)
    rng = np.random.default_rng(17)
    sm, reads = _synth_signal_reads(rng, 2, 400, 350)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out_u = pa.run(sm, reads, compact_k=512)
    out_t = pa.run(sm, reads, compact_k=512, tile_diag=128)
    nds = [b.n_diag for b in out_u["prep"]["bands"]]
    got = extract_pairs_chunk(out_t, [0, 1], nds, params.threshold)
    want = extract_pairs_chunk(out_u, [0, 1], nds, params.threshold)
    for g, w in zip(got, want):
        assert {tuple(r[1:]) for r in g} == {tuple(r[1:]) for r in w}
    for i in range(2):
        a = extract_pairs_auto(out_t, i, nds[i], params.threshold)
        b = extract_pairs_auto(out_u, i, nds[i], params.threshold)
        assert {(x, y) for _, x, y in a} == {(x, y) for _, x, y in b}


def test_tiled_guards():
    rng = np.random.default_rng(1)
    sm, reads = _synth_signal_reads(rng, 1, 300, 260)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True)
    with pytest.raises(NotImplementedError):
        pa.run(sm, reads, tile_diag=128, expectations=True)
