"""Tiled long-alignment fast path: exact parity with the untiled kernels.

The tiled path (`_run_tiled`, ops/pallas_fb.py) matches the reference
banded engine's O(band x window)-memory-at-any-length capability
(impl/pairwiseAligner.c:919-1055) by sweeping TD-diagonal tiles with
chained carries.  The per-diagonal compute is identical to the untiled
kernels, so posteriors, totals, and extracted pairs must be
BIT-identical — pinned here on CPU interpret mode with tiles forced
small (tile_diag=128) so several tiles cover ordinary fixture-scale
reads.
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


def _assert_same_pairs(out_t, out_u, n_diags, threshold):
    for i, nd in enumerate(n_diags):
        pt = extract_pairs_long(out_t, i, nd, threshold, as_array=True)
        pu = extract_pairs_auto(out_u, i, nd, threshold, as_array=True)
        pu = pu[np.argsort(pu[:, 1] + pu[:, 2], kind="stable")]
        assert pt.shape == pu.shape, (i, pt.shape, pu.shape)
        st = pt[np.lexsort((pt[:, 2], pt[:, 1]))]
        su = pu[np.lexsort((pu[:, 2], pu[:, 1]))]
        # pair DECISIONS exact; scores may differ by one u16 wire step
        # when only one side's top-k saturated into the f32 full-plane
        # fallback (1e7 / 65535 ~ 153)
        np.testing.assert_array_equal(st[:, 1:], su[:, 1:])
        assert np.abs(st[:, 0] - su[:, 0]).max(initial=0) <= 153


def test_tiled_matches_untiled_strawman():
    rng = np.random.default_rng(11)
    sm, reads = _synth_signal_reads(rng, 3, 500, 430)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out_u = pa.run(sm, reads, compact_k=512)
    out_t = pa.run(sm, reads, compact_k=512, tile_diag=128)
    nd = [b.n_diag for b in out_u["prep"]["bands"]]
    NDT = out_t["tiled"]["NDT"]
    assert out_t["tiled"]["NT"] > 3
    # posterior planes bit-identical over the untiled diagonal range
    pu = np.asarray(out_u["posteriors"])
    pt = np.asarray(out_t["posteriors"])[:, :pu.shape[1]]
    np.testing.assert_array_equal(pt, pu)
    np.testing.assert_array_equal(np.asarray(out_t["totals"]),
                                  np.asarray(out_u["totals"]))
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
    pu = np.asarray(out_u["posteriors"])
    pt = np.asarray(out_t["posteriors"])[:, :pu.shape[1]]
    np.testing.assert_array_equal(pt, pu)
    np.testing.assert_array_equal(np.asarray(out_t["totals"]),
                                  np.asarray(out_u["totals"]))
    nd = [b.n_diag for b in out_u["prep"]["bands"]]
    _assert_same_pairs(out_t, out_u, nd, params.threshold)


def test_tiled_guards():
    rng = np.random.default_rng(1)
    sm, reads = _synth_signal_reads(rng, 1, 300, 260)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True)
    with pytest.raises(NotImplementedError):
        pa.run(sm, reads, tile_diag=128, expectations=True)
