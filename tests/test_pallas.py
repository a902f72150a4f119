"""Pallas wavefront kernel vs the scan engine (interpret mode on CPU).

The fast path uses a single exact full backward pass (no traceback
windowing), so the comparison target is the scan engine run with a
single-window plan over the banded geometry.
"""

import dataclasses
from cpecan_tpu.fixtures import fixture_path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpecan_tpu.align import AlignmentParams
from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
from cpecan_tpu.ops.band import _plan_from_windows, make_band
from cpecan_tpu.ops.engine import (backward_pass, extract_aligned_pairs,
                                   forward_pass, make_control)
from cpecan_tpu.ops.pallas_fb import (StrawmanPallasAligner,
                                      extract_pairs_from_pallas)


def _engine_single_window(sm, ref, events, l_x, l_y, anchors, params):
    band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
    n = band.n_diag
    plan = _plan_from_windows([(0, n, n)], False, n)
    plan.refresh[:] = False
    plan.refresh[0] = True
    ctrl = make_control(band, plan)
    problem = sm.build(ref, events, ((band.max_width + 7) // 8) * 8,
                       dtype=jnp.float64)
    all_fwd = forward_pass(problem, ctrl, problem.feats)
    out = backward_pass(problem, ctrl, problem.feats, all_fwd)
    return extract_aligned_pairs(out, params.threshold)


@pytest.fixture(scope="module")
def fixture_reads(template_model):
    # 8 ragged shapes = one interpret-mode group; sizes kept small — the
    # slow-tier randomized campaigns (test_fuzz_differential) cover large
    # geometries, the fast tier covers the shape variety
    from tests.test_parallel import _synthetic_read
    rng = np.random.default_rng(5)
    return [_synthetic_read(rng, template_model, n_ref=72 + 8 * i,
                            n_events=64 + 10 * i) for i in range(8)]


def test_device_band_construction_matches_host(template_model):
    """The on-device band rebuild (_device_bands) must equal the host
    band_construct bit-for-bit for random anchor chains."""
    rng = np.random.default_rng(3)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True)
    reads = []
    for i in range(6):
        l_x = int(rng.integers(20, 200))
        l_y = int(rng.integers(20, 200))
        n_anchor = int(rng.integers(0, 8))
        xs = np.sort(rng.choice(np.arange(1, l_x - 1), size=min(n_anchor, l_x - 2),
                                replace=False)) if n_anchor else []
        anchors = []
        py = 0
        for x in xs:
            y = py + 1 + int(rng.integers(0, max((l_y - 1 - py) // 4, 1)))
            if y >= l_y:
                break
            anchors.append((int(x), y))
            py = y
        reads.append(("A" * (l_x + 5), np.zeros((l_y, 3)), l_x, l_y,
                      anchors))
    # build host bands + compact metadata exactly like prepare does
    from cpecan_tpu.ops.band import make_band
    NDp = 512
    A_max = max(1, max(len(r[4]) for r in reads))
    anch = np.full((len(reads), A_max, 2), -1, np.int16)
    meta = np.zeros((len(reads), 4), np.int32)
    bands = []
    for r, (_x, _y, l_x, l_y, a) in enumerate(reads):
        band = make_band(a, l_x, l_y, 20)
        bands.append(band)
        if a:
            anch[r, : len(a)] = np.asarray(a, np.int64)
        meta[r] = (l_x, l_y, band.n_diag, r % 2)
    pa.params = AlignmentParams(diagonal_expansion=20)
    basef, widthf, seedf, raggedf = pa._device_bands(NDp, A_max)(
        jnp.asarray(anch), jnp.asarray(meta))
    for r, band in enumerate(bands):
        n = band.n_diag
        want_base = np.zeros(NDp)
        want_width = np.zeros(NDp)
        want_base[: n + 1] = band.x_lo
        want_width[: n + 1] = band.width
        np.testing.assert_array_equal(np.asarray(basef[r]), want_base)
        np.testing.assert_array_equal(np.asarray(widthf[r]), want_width)
        assert np.asarray(seedf[r]).nonzero()[0].tolist() == [n]
        assert (np.asarray(raggedf[r]).sum() > 0) == bool(r % 2)


def test_anchor_wire_survives_long_event_axis(template_model):
    """Regression: the compact anchor wire picked int16 from the
    reference length alone, silently wrapping anchor *y* for a short
    reference with >32k events (real for long nanopore reads — the
    untiled path is routed on X only).  The dtype must key on both axes
    and the device-rebuilt band must match the host band."""
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
    from cpecan_tpu.ops.band import make_band

    sm = StateMachine3SignalStrawman(template_model)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True, group=8)
    l_x, l_y = 1000, 40000
    anchors = [(100, 35000), (200, 36000)]
    ev = np.zeros((l_y, 3))
    ev[:, 1] = 1.0
    read = ("A" * (l_x + 5), ev, l_x, l_y, anchors)
    prep = pa.prepare(sm, [read])
    assert prep["anch"].dtype == np.int32
    np.testing.assert_array_equal(prep["anch"][0, :2],
                                  np.asarray(anchors))
    band = make_band(anchors, l_x, l_y, pa.params.diagonal_expansion)
    basef, widthf, _, _ = pa._device_bands(
        prep["NDp"], prep["anch"].shape[1])(
        jnp.asarray(prep["anch"]), jnp.asarray(prep["meta"]))
    n = band.n_diag
    np.testing.assert_array_equal(np.asarray(basef[0])[: n + 1],
                                  band.x_lo)
    np.testing.assert_array_equal(np.asarray(widthf[0])[: n + 1],
                                  band.width)


def test_long_diagonal_routing(template_model):
    """run() must route on the DIAGONAL count, not x alone: f32
    posterior precision collapses on the untiled path past ~16k
    diagonals (BASELINE.md 'Untiled precision wall' — measured pairs
    56 vs 5716 at ND=41k untiled, fixed by the tiled path's per-tile
    re-centering).  Posterior runs >= 2^14 diagonals go tiled; paths
    with no tiled variant (expectations) warn instead."""
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman

    sm = StateMachine3SignalStrawman(template_model)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True, group=8)
    calls = []
    pa._run_tiled = lambda *a, **k: calls.append(("tiled", k)) or {
        "tiled": True}
    long_read = ("A" * 505, np.zeros((17000, 3)), 500, 17000,
                 [(100, 3400), (400, 13600)])
    out = pa.run(sm, [long_read])
    assert out == {"tiled": True} and len(calls) == 1
    # expectations have no tiled variant: untiled + warning.  Stub the
    # kernel dispatch — 17k interpret-mode diagonals are not a unit test
    pa2 = StrawmanPallasAligner(AlignmentParams(), interpret=True,
                                group=8)
    imps = []
    pa2._fns = lambda *a: imps.append(a) or (_ for _ in ()).throw(
        RuntimeError("stop-at-dispatch"))
    with pytest.warns(UserWarning, match="16k diagonals"):
        with pytest.raises(RuntimeError, match="stop-at-dispatch"):
            pa2.run(sm, [long_read], expectations=True)


def test_pallas_matches_engine_pairs(template_model, fixture_reads):
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads):
        want = _engine_single_window(sm, ref, events, l_x, l_y, anchors,
                                     params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert got_set == want_set, (i, got_set ^ want_set)
        # scores agree to the fast path's wire precision: f32 kernels
        # (~1e-3) + the u16 event-upload quantization (~1e-4-per-cell,
        # sums over paths) — pair decisions are the exact contract
        ws = {(x, y): s for s, x, y in want}
        for s, x, y in got:
            assert abs(s - ws[(x, y)]) <= 25000, (x, y, s, ws[(x, y)])


def test_pallas_zymo_pairs(zymo_reference_seq, zymo_npread, template_model):
    """Kernel vs engine on the real Zymo read (banded, lastz anchors)."""
    from cpecan_tpu.constants import KMER_LENGTH
    from cpecan_tpu.io.npread import remap_anchor_pairs
    from cpecan_tpu.io.poremodel import scale_model
    from cpecan_tpu.ops.anchors import filter_to_remove_overlap
    from cpecan_tpu.ops.blast import (
        find_lastz, get_blast_pairs_for_pairwise_alignment_parameters)

    if find_lastz() is None:
        pytest.skip("lastz unavailable")
    params = AlignmentParams()
    anchors = get_blast_pairs_for_pairwise_alignment_parameters(
        zymo_reference_seq, zymo_npread.twod_read, params)
    filtered = filter_to_remove_overlap(
        remap_anchor_pairs(anchors, zymo_npread.template_event_map))
    l_x = len(zymo_reference_seq) - (KMER_LENGTH - 1)
    l_y = zymo_npread.n_template_events
    tp = zymo_npread.template_params
    model = scale_model(template_model, tp.scale, tp.shift, tp.var,
                        tp.scale_sd, tp.var_sd)
    sm = StateMachine3SignalStrawman(model)

    read = (zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
            filtered)
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, [read])
    got = {(x, y) for _, x, y in
           extract_pairs_from_pallas(out, 0, params.threshold)}
    want = {(x, y) for _, x, y in _engine_single_window(
        sm, zymo_reference_seq, zymo_npread.template_events, l_x, l_y,
        filtered, params)}
    # f32 kernel vs f64 engine: allow a tiny decision fringe near threshold
    assert len(got ^ want) <= 2, len(got ^ want)
    assert len(got & want) >= 980


def test_compact_extraction_matches_full(template_model, fixture_reads):
    from cpecan_tpu.ops.pallas_fb import extract_pairs_compact
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads)
    vals, *idx = out["compact"]
    idx = tuple(idx)
    prep = out["prep"]
    for i in range(len(fixture_reads)):
        full = extract_pairs_from_pallas(out, i, params.threshold)
        comp = extract_pairs_compact(vals, idx, i, prep["bands"][i].n_diag,
                                     prep, params.threshold)
        # selection is exact; scores ride the u16 fixed-point wire format
        # (one quantization step = ceil(1e7/65535) = 153)
        assert sorted((x, y) for _, x, y in full) \
            == sorted((x, y) for _, x, y in comp)
        fs = {(x, y): s for s, x, y in full}
        for s, x, y in comp:
            assert abs(s - fs[(x, y)]) <= 153, (s, fs[(x, y)], x, y)


def test_vanilla_pallas_matches_engine_pairs(template_model, fixture_reads):
    from cpecan_tpu.models.state_machines import StateMachine3Vanilla
    from cpecan_tpu.ops.pallas_fb import VanillaPallasAligner

    sm = StateMachine3Vanilla(template_model)
    params = AlignmentParams()
    pa = VanillaPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads):
        want = _engine_single_window(sm, ref, events, l_x, l_y, anchors,
                                     params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        # f32 kernel vs f64 engine: allow a tiny decision fringe
        assert len(got_set ^ want_set) <= 1, (i, got_set ^ want_set)
        assert len(got_set & want_set) >= 0.98 * len(want_set)
        ws = {(x, y): s for s, x, y in want}
        for s, x, y in got:
            if (x, y) in ws:
                assert abs(s - ws[(x, y)]) <= 20000, (x, y, s, ws[(x, y)])


def test_pallas_expectations_match_engine(template_model, fixture_reads):
    """Kernel EM accumulators vs the engine single-window expectation pass
    (posterior-weighted transition counts + per-kmer gap counts)."""
    from cpecan_tpu.ops.engine import make_control
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads, expectations=True)
    exp = out["expectations"]
    assert exp["trans"].shape == (len(fixture_reads), 3, 3)

    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads):
        band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
        n = band.n_diag
        plan = _plan_from_windows([(0, n, n)], False, n)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        problem = sm.build(ref, events, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        eng = backward_pass(problem, ctrl, problem.feats, all_fwd,
                            compute_expectations=True)["expectations"]
        want_tr = np.asarray(eng["trans"])
        got_tr = exp["trans"][i]
        # f32 kernel vs f64 engine on accumulated posterior mass
        np.testing.assert_allclose(got_tr, want_tr, rtol=2e-3, atol=1e-3)
        want_gap = np.asarray(eng["kmer_gap"])
        got_gap = exp["kmer_gap"][i]
        assert want_gap.shape == got_gap.shape
        np.testing.assert_allclose(got_gap.sum(), want_gap.sum(), rtol=2e-3)
        nz = want_gap > 1e-3
        np.testing.assert_allclose(got_gap[nz], want_gap[nz], rtol=5e-3,
                                   atol=1e-3)


def test_pallas_per_read_scaling(template_model, fixture_reads):
    """On-device per-read model scaling vs per-read scale_model + engine."""
    from cpecan_tpu.io.poremodel import scale_model

    params = AlignmentParams()
    rng = np.random.default_rng(11)
    sp = np.stack([rng.uniform(0.9, 1.1, len(fixture_reads)),   # scale
                   rng.uniform(-2.0, 2.0, len(fixture_reads)),  # shift
                   rng.uniform(0.9, 1.1, len(fixture_reads)),   # var
                   rng.uniform(0.9, 1.1, len(fixture_reads)),   # scale_sd
                   rng.uniform(0.9, 1.1, len(fixture_reads))],  # var_sd
                  axis=1)
    base_sm = StateMachine3SignalStrawman(template_model)
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(base_sm, fixture_reads, scale_params=sp)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads):
        scaled = scale_model(template_model, *sp[i])
        sm_i = StateMachine3SignalStrawman(scaled)
        want = _engine_single_window(sm_i, ref, events, l_x, l_y, anchors,
                                     params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert len(got_set ^ want_set) <= 1, (i, got_set ^ want_set)
        assert len(got_set & want_set) >= 0.98 * max(len(want_set), 1)


def test_dna5_pallas_matches_engine(template_model):
    """5-state DNA machine (cPecanRealign's) on the wavefront kernels vs
    the engine, including the reference golden pair set."""
    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner

    sm = StateMachine5()
    rng = np.random.default_rng(17)
    reads = []
    for i in range(5):
        n = 60 + 15 * i
        seq_x = "".join(rng.choice(list("ACGT"), n))
        seq_y = "".join(c if rng.random() > 0.15 else
                        str(rng.choice(list("ACGT"))) for c in seq_x)
        anchors = [(j, j) for j in range(10, n - 10, 12)]
        reads.append((seq_x, seq_y, len(seq_x), len(seq_y), anchors))
    # the reference golden case at threshold 0.2 (pairwiseAlignerTest.c:358)
    reads.append(("AGCG", "AGTTCG", 4, 6, []))

    params = AlignmentParams(threshold=0.2)
    pa = Dna5PallasAligner(params, interpret=True)
    out = pa.run(sm, reads)
    for i, (sx, sy, l_x, l_y, anchors) in enumerate(reads):
        want = _engine_single_window(sm, sx, sy, l_x, l_y, anchors, params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert len(got_set ^ want_set) <= 1, (i, got_set ^ want_set)
        ws = {(x, y): s for s, x, y in want}
        for s, x, y in got:
            if (x, y) in ws:
                assert abs(s - ws[(x, y)]) <= 20000, (i, x, y, s)
    # golden pair set for AGCG x AGTTCG
    golden = {(x, y) for _, x, y in
              extract_pairs_from_pallas(out, len(reads) - 1, 0.2)}
    assert golden == {(0, 0), (1, 1), (2, 4), (3, 5)}


@pytest.mark.slow
def test_dna5_pallas_expectations_match_engine():
    """DNA 5-state EM accumulators (transitions + emission expectations)
    on the kernel vs the engine single-window expectation pass — the
    cPecanEm E-step fast path (cell_updateExpectations,
    impl/pairwiseAligner.c:423-441)."""
    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.engine import make_control
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner

    sm = StateMachine5()
    rng = np.random.default_rng(23)
    reads = []
    for i in range(4):
        n = 50 + 18 * i
        seq_x = "".join(rng.choice(list("ACGT"), n))
        seq_y = "".join(c if rng.random() > 0.18 else
                        str(rng.choice(list("ACGT"))) for c in seq_x)
        anchors = [(j, j) for j in range(8, n - 8, 11)]
        reads.append((seq_x, seq_y, len(seq_x), len(seq_y), anchors))
    # one read with an N (must be excluded from emission expectations)
    seq_x = "ACGTAGGTACNGATTACAGGATCC"
    seq_y = "ACGTCGGTACAGATAACAGGATCC"
    reads.append((seq_x, seq_y, len(seq_x), len(seq_y), []))

    params = AlignmentParams()
    pa = Dna5PallasAligner(params, interpret=True)
    out = pa.run(sm, reads, expectations=True)
    exp = out["expectations"]
    assert exp["trans"].shape == (len(reads), 5, 5)
    assert exp["emis"].shape == (len(reads), 5, 4, 4)

    for i, (sx, sy, l_x, l_y, anchors) in enumerate(reads):
        band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
        n = band.n_diag
        plan = _plan_from_windows([(0, n, n)], False, n)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        problem = sm.build(sx, sy, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        eng = backward_pass(problem, ctrl, problem.feats, all_fwd,
                            compute_expectations=True)["expectations"]
        np.testing.assert_allclose(exp["trans"][i], np.asarray(eng["trans"]),
                                   rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(exp["emis"][i], np.asarray(eng["emis"]),
                                   rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(exp["likelihood"][i],
                                   float(eng["likelihood"]), rtol=1e-4)


@pytest.mark.slow
def test_sm4_pallas_matches_engine(template_model, fixture_reads):
    from cpecan_tpu.models.state_machines import StateMachine4
    from cpecan_tpu.ops.pallas_fb import Sm4PallasAligner

    sm = StateMachine4(template_model)
    params = AlignmentParams()
    pa = Sm4PallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads):
        want = _engine_single_window(sm, ref, events, l_x, l_y, anchors,
                                     params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert len(got_set ^ want_set) <= 1, (i, got_set ^ want_set)
        assert len(got_set & want_set) >= 0.98 * max(len(want_set), 1)


@pytest.mark.slow
def test_echelon_pallas_matches_engine(template_model):
    """Echelon on the band-local wavefront kernels (multi-state posterior
    windows + host-side expansion) vs the engine's multi-posterior
    extraction."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.pallas_fb import (EchelonPallasAligner,
                                          extract_echelon_pairs)

    rng = np.random.default_rng(6)
    mm = template_model.match_model
    reads = []
    for r in range(3):
        n = 40 + 12 * r
        ref = "".join(rng.choice(list("ACGT"), n))
        l_x = n - 5
        kidx = seq_to_kmer_indices(ref)
        events = np.zeros((l_x, 3))
        for i in range(l_x):
            events[i, 0] = mm[kidx[i], 0] + rng.normal(0, 0.5)
            events[i, 1] = max(mm[kidx[i], 2], 0.1)
            events[i, 2] = 0.01
        anchors = [(j, j) for j in range(6, l_x - 6, 9)]
        reads.append((ref, events, l_x, l_x, anchors))

    sm = StateMachineEchelon(template_model)
    params = AlignmentParams(threshold=0.15)
    pa = EchelonPallasAligner(params, interpret=True)
    out = pa.run(sm, reads)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(reads):
        want = get_aligned_pairs_using_anchors(sm, ref, events, l_x, l_y,
                                               anchors, params)
        got = extract_echelon_pairs(out, i, out["prep"]["bands"][i].n_diag,
                                    params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        # f32 kernel vs f64 engine: allow a small decision fringe
        assert len(got_set ^ want_set) <= max(2, len(want_set) // 50), \
            (i, got_set ^ want_set)
        assert len(got_set & want_set) >= 0.97 * max(len(want_set), 1)


def test_echelon_pallas_scale_params(template_model):
    """Echelon with per-read on-device model scaling (scale_params) vs the
    engine on host-scaled models: the match-model gathers AND the kmer
    skip bins must follow each read's scale/shift (the bins derive from
    scaled level-mean differences, impl/stateMachine.c:389-420), so one
    unscaled table serves a whole batch — the run_batch_fast echelon
    path."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    from cpecan_tpu.io.poremodel import scale_model
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.pallas_fb import (EchelonPallasAligner,
                                          extract_echelon_pairs)

    rng = np.random.default_rng(16)
    mm = template_model.match_model
    reads, sps = [], []
    for r in range(3):
        n = 40 + 12 * r
        ref = "".join(rng.choice(list("ACGT"), n))
        l_x = n - 5
        kidx = seq_to_kmer_indices(ref)
        sp = [1.0 + 0.05 * r, 2.0 * r - 1.0, 1.0 + 0.03 * r,
              1.0 - 0.02 * r, 1.0 + 0.01 * r]
        sps.append(sp)
        events = np.zeros((l_x, 3))
        for i in range(l_x):
            events[i, 0] = mm[kidx[i], 0] * sp[0] + sp[1] + rng.normal(0, 0.5)
            events[i, 1] = max(mm[kidx[i], 2] * sp[3], 0.1)
            events[i, 2] = 0.01
        anchors = [(j, j) for j in range(6, l_x - 6, 9)]
        reads.append((ref, events, l_x, l_x, anchors))

    params = AlignmentParams(threshold=0.15)
    pa = EchelonPallasAligner(params, interpret=True)
    out = pa.run(sm=StateMachineEchelon(template_model), reads=reads,
                 scale_params=np.asarray(sps, np.float32))
    for i, (ref, events, l_x, l_y, anchors) in enumerate(reads):
        sm_scaled = StateMachineEchelon(scale_model(template_model,
                                                    *sps[i]))
        want = get_aligned_pairs_using_anchors(sm_scaled, ref, events,
                                               l_x, l_y, anchors, params)
        got = extract_echelon_pairs(out, i, out["prep"]["bands"][i].n_diag,
                                    params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert len(got_set ^ want_set) <= max(2, len(want_set) // 50), \
            (i, got_set ^ want_set)


@pytest.mark.slow
def test_hdp_pallas_matches_engine(template_model):
    """SM3-HDP machine with streamed density emissions vs the engine."""
    from cpecan_tpu.hdp.nanopore_hdp import flat_hdp_model_2
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3Hdp
    from cpecan_tpu.ops.pallas_fb import HdpPallasAligner

    model_path = fixture_path("template_median68pA.model")
    nhdp = flat_hdp_model_2("ACGT", 6, 1.0, 1.0, 1.0, 1.0,
                            30.0, 110.0, 120, model_path)
    rng = np.random.default_rng(2)
    mm = template_model.match_model
    ref = "".join(rng.choice(list("ACGT"), 60))
    l_x = 60 - 5
    kidx = seq_to_kmer_indices(ref)
    kmers_train, signals = [], []
    for p in range(l_x):
        for _ in range(6):
            kmers_train.append(ref[p:p + 6])
            signals.append(mm[kidx[p], 0] + rng.normal(0, 1.0))
    nhdp.update_from_assignments(kmers_train, signals)
    nhdp.execute_gibbs_sampling(num_samples=8, burn_in=200, thinning=40)
    nhdp.finalize_distributions()
    sm = StateMachine3Hdp(nhdp)

    reads = []
    for j in range(3):
        n_ev = l_x - 4 * j
        events = np.zeros((n_ev, 3))
        for i in range(n_ev):
            events[i, 0] = mm[kidx[min(i, l_x - 1)], 0] + rng.normal(0, 0.5)
            events[i, 1] = 1.0
            events[i, 2] = 0.01
        anchors = [(i, min(i, n_ev - 2)) for i in range(8, l_x - 8, 10)]
        filtered = []
        px = py = -1
        for x, y in anchors:
            if x > px and y > py:
                filtered.append((x, y))
                px, py = x, y
        reads.append((ref, events, l_x, n_ev, filtered))

    params = AlignmentParams(threshold=0.1)
    pa = HdpPallasAligner(params, interpret=True)
    out = pa.run(sm, reads)
    for i, (rx, events, l_x_i, l_y, anchors) in enumerate(reads):
        want = _engine_single_window(sm, rx, events, l_x_i, l_y, anchors,
                                     params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert len(got_set ^ want_set) <= 2, (i, got_set ^ want_set)
        assert len(got_set & want_set) >= 0.95 * max(len(want_set), 1)

    # HDP EM expectations (hdpHmm transition counts) on the kernel vs the
    # engine — the streamed spec shares the strawman accumulator lanes
    from cpecan_tpu.ops.engine import make_control
    out_e = pa.run(sm, reads, expectations=True)
    exp = out_e["expectations"]
    for i, (rx, events, l_x_i, l_y, anchors) in enumerate(reads):
        band = make_band(anchors, l_x_i, l_y, params.diagonal_expansion)
        n = band.n_diag
        plan = _plan_from_windows([(0, n, n)], False, n)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        problem = sm.build(rx, events, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        eng = backward_pass(problem, ctrl, problem.feats, all_fwd,
                            compute_expectations=True)["expectations"]
        np.testing.assert_allclose(exp["trans"][i],
                                   np.asarray(eng["trans"]),
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(exp["likelihood"][i],
                                   float(eng["likelihood"]), rtol=1e-4)


@pytest.mark.slow
def test_vanilla_pallas_expectations_match_engine(template_model,
                                                  fixture_reads):
    """Vanilla EM accumulators (beta/alpha skip-bin masses) on the kernel
    vs the engine's signal expectation pass."""
    from cpecan_tpu.align import get_expectations_using_anchors
    from cpecan_tpu.models.state_machines import StateMachine3Vanilla
    from cpecan_tpu.ops.pallas_fb import VanillaPallasAligner

    sm = StateMachine3Vanilla(template_model)
    params = AlignmentParams()
    pa = VanillaPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads, expectations=True, ragged_left=True,
                 ragged_right=True)
    exp = out["expectations"]
    assert exp["skip_bins"].shape == (len(fixture_reads), 60)
    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads):
        acc = get_expectations_using_anchors(
            sm, ref, events, l_x, l_y, anchors, params, ragged_left=True,
            ragged_right=True)
        want = np.asarray(acc["skip_bins"])
        got = exp["skip_bins"][i]
        np.testing.assert_allclose(got.sum(), want.sum(), rtol=5e-3)
        big = want > 1e-2
        np.testing.assert_allclose(got[big], want[big], rtol=2e-2,
                                   atol=5e-3)


@pytest.mark.slow
def test_wide_window_group(template_model):
    """Reads with divergent band positions in one group force the window
    wider than one 128-lane page (W=256+), covering the window-widening
    and W<X unpack paths that aligned-anchor fixtures never reach."""
    from tests.test_parallel import _synthetic_read

    rng = np.random.default_rng(21)
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    reads = []
    for i in range(4):
        ref, events, l_x, l_y, _ = _synthetic_read(
            rng, template_model, n_ref=400, n_events=150)
        # anchor chains at very different diagonals per read: read i's band
        # sits ~i*90 columns to the right
        off = 90 * i
        anchors = [(min(off + j, l_x - 2), min(j, l_y - 2))
                   for j in range(10, 120, 20)]
        filtered = []
        px = py = -1
        for x, y in anchors:
            if x > px and y > py:
                filtered.append((x, y))
                px, py = x, y
        reads.append((ref, events, l_x, l_y, filtered))

    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, reads)
    assert out["prep"]["W"] >= 256, out["prep"]["W"]  # widened window
    assert out["prep"]["W"] < out["prep"]["X"]
    for i, (ref, events, l_x, l_y, anchors) in enumerate(reads):
        want = _engine_single_window(sm, ref, events, l_x, l_y, anchors,
                                     params)
        got = extract_pairs_from_pallas(out, i, params.threshold)
        want_set = {(x, y) for _, x, y in want}
        got_set = {(x, y) for _, x, y in got}
        assert len(got_set & want_set) >= 0.98 * max(len(want_set), 1)
        _assert_fringe_only(want, got, params.threshold)


def _assert_fringe_only(want, got, threshold):
    """Symmetric differences must be threshold-marginal (f32 vs f64
    decision fringe), never confidently-called pairs."""
    from cpecan_tpu.constants import PAIR_ALIGNMENT_PROB_1
    ws = {(x, y): s for s, x, y in want}
    gs = {(x, y): s for s, x, y in got}
    cutoff = threshold * PAIR_ALIGNMENT_PROB_1
    for k in set(ws) ^ set(gs):
        s = ws.get(k, gs.get(k))
        assert abs(s - cutoff) <= 0.05 * cutoff, (k, s, cutoff)

def test_group_packing_parity_and_zero_diag0(template_model, fixture_reads):
    """Group size must not change results: the same reads through R=8 and
    R=16 kernels give identical pair sets, and the never-swept diagonal-0
    posterior row is written (zeros) rather than left as uninitialized
    memory (it leaked nondeterministic garbage through the saturated
    top-k fallback before being zeroed)."""
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    sets = {}
    for group in (8, 16):
        pa = StrawmanPallasAligner(params, interpret=True, group=group)
        out = pa.run(sm, fixture_reads[:4])
        post = np.asarray(out["posteriors"])
        assert (post[:, 0] == 0).all()
        sets[group] = [
            frozenset(extract_pairs_from_pallas(out, i, params.threshold))
            for i in range(4)]
    assert sets[8] == sets[16]


@pytest.mark.slow
def test_sm4_pallas_expectations_match_engine(template_model,
                                              fixture_reads):
    """fourState EM accumulators (cell_signal_updateTransAndKmerSkipExpectations
    wired into SM4, impl/stateMachine.c:986,1800-1810): [4,4] transition
    counts + per-kmer gap counts on the shortGapX target, kernel vs the
    engine single-window expectation pass."""
    from cpecan_tpu.models.state_machines import StateMachine4
    from cpecan_tpu.ops.engine import make_control
    from cpecan_tpu.ops.pallas_fb import Sm4PallasAligner

    sm = StateMachine4(template_model)
    params = AlignmentParams()
    pa = Sm4PallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads[:4], expectations=True)
    exp = out["expectations"]
    assert exp["trans"].shape == (4, 4, 4)

    for i, (ref, events, l_x, l_y, anchors) in enumerate(fixture_reads[:4]):
        band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
        n = band.n_diag
        plan = _plan_from_windows([(0, n, n)], False, n)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        problem = sm.build(ref, events, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        eng = backward_pass(problem, ctrl, problem.feats, all_fwd,
                            compute_expectations=True)["expectations"]
        np.testing.assert_allclose(exp["trans"][i], np.asarray(eng["trans"]),
                                   rtol=2e-3, atol=1e-3)
        want_gap = np.asarray(eng["kmer_gap"])
        got_gap = exp["kmer_gap"][i]
        np.testing.assert_allclose(got_gap.sum(), want_gap.sum(), rtol=2e-3)
        nz = want_gap > 1e-3
        np.testing.assert_allclose(got_gap[nz], want_gap[nz], rtol=5e-3,
                                   atol=1e-3)


def test_hdp_stream_builds_agree(template_model):
    """The one-matmul HDP emission-stream build (stream_matmul=True, the
    default) must agree with the per-diagonal scan build it replaced /
    falls back to for very large batches: same NEG mask, densities equal
    to f32 matmul reassociation (the pair decisions are identical; scores
    may differ by one fixed-point unit)."""
    from cpecan_tpu.hdp.nanopore_hdp import flat_hdp_model
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3Hdp
    from cpecan_tpu.ops.pallas_fb import HdpPallasAligner

    rng = np.random.default_rng(2)
    model_path = fixture_path("template_median68pA.model")
    ref = "".join(rng.choice(list("ACGT"), 60))
    kidx = seq_to_kmer_indices(ref)
    kmers = [ref[p:p + 6] for p in range(len(kidx)) for _ in (0, 1)]
    signals = [template_model.match_model[kidx[p], 0] + rng.normal(0, 1.0)
               for p in range(len(kidx)) for _ in (0, 1)]
    nhdp = flat_hdp_model("ACGT", 6, 1.0, 1.0, 40.0, 100.0, 60, model_path)
    nhdp.update_from_assignments(kmers, signals)
    nhdp.execute_gibbs_sampling(num_samples=3, burn_in=50, thinning=10)
    nhdp.finalize_distributions()
    sm = StateMachine3Hdp(nhdp)

    ev = np.zeros((50, 3))
    for i in range(50):
        k = kidx[min(int(i * len(kidx) / 50), len(kidx) - 1)]
        ev[i, 0] = template_model.match_model[k, 0] + rng.normal(0, 0.5)
        ev[i, 1] = 0.5
        ev[i, 2] = 0.01
    reads = [(ref, ev, len(kidx), 50, [])]

    pa = HdpPallasAligner(AlignmentParams(), interpret=True)
    prep = pa.prepare(sm, reads)
    pa.stream_matmul = True
    e_mm = np.asarray(pa._stream_args(sm, prep)[0])
    pa.stream_matmul = False
    e_scan = np.asarray(pa._stream_args(sm, prep)[0])
    neg = e_scan < -1e29
    assert (neg == (e_mm < -1e29)).all()
    diff = np.abs(np.where(neg, 0.0, e_scan - e_mm))
    assert diff.max() < 1e-4, diff.max()


def test_device_kmer_index_build_matches_host():
    """_kx_from_codes (device kmer rebuild from the u8 base-code upload)
    reproduces seq_to_kmer_indices exactly, incl. N windows, the x=0
    boundary, and past-the-end padding."""
    from cpecan_tpu.constants import N_SENTINEL
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.ops.pallas_fb import _base_codes, _kx_from_codes

    rng = np.random.default_rng(3)
    X = 64
    reads = []
    for n in (40, 57, 10):
        seq = "".join(rng.choice(list("ACGTN"), n, p=[.24, .24, .24, .24,
                                                      .04]))
        reads.append((seq, None, n, 0, []))
    codes = _base_codes(reads, X)
    kx_dev = np.asarray(_kx_from_codes(jnp.asarray(codes)))
    for r, (seq, *_r) in enumerate(reads):
        want = np.full(X, N_SENTINEL, np.int64)
        ki = seq_to_kmer_indices(seq)
        want[1:1 + len(ki)] = ki
        np.testing.assert_array_equal(kx_dev[r], want)


def test_event_quantization_roundtrip():
    """u16 event wire format: zeros survive bit-exactly, real values
    round-trip within half a quantization step."""
    from cpecan_tpu.ops.pallas_fb import (_dequantize_events,
                                          _quantize_events)

    rng = np.random.default_rng(5)
    ev = np.zeros((4, 30, 2), np.float32)
    ev[:, 1:25, 0] = rng.uniform(40.0, 120.0, (4, 24))
    ev[:, 1:25, 1] = rng.uniform(0.3, 3.0, (4, 24))
    q, evs = _quantize_events(ev)
    back = np.asarray(_dequantize_events(jnp.asarray(q),
                                         jnp.asarray(evs)))
    assert (back[ev == 0.0] == 0.0).all()
    step = evs[:2]
    err = np.abs(back - ev)
    assert (err[..., 0] <= step[0] * 0.51 + 1e-6).all(), err[..., 0].max()
    assert (err[..., 1] <= step[1] * 0.51 + 1e-6).all(), err[..., 1].max()
    # tightened range: lo comes from the nonzero values, not the padding
    assert abs(float(evs[2]) - ev[:, 1:25, 0].min()) < 1e-5


def test_shape_hint_parity(template_model):
    """A batch-wide shape_hint (chunked-pipeline compile pinning) pads the
    kernel's X/ND but must not change extracted pairs or scores."""
    from tests.test_parallel import _synthetic_read
    rng = np.random.default_rng(11)
    reads = [_synthetic_read(rng, template_model, n_ref=60, n_events=50)
             for _ in range(3)]
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    base = pa.run(sm, reads)
    hinted = pa.run(sm, reads, shape_hint=(200, 290))
    assert hinted["prep"]["X"] > base["prep"]["X"]
    assert hinted["prep"]["ND"] > base["prep"]["ND"]
    for i in range(len(reads)):
        n_diag = base["prep"]["bands"][i].n_diag
        a = extract_pairs_from_pallas(base, i, params.threshold)
        b = extract_pairs_from_pallas(hinted, i, params.threshold)
        assert sorted(a) == sorted(b)


def test_chunk_extraction_matches_per_read(template_model, fixture_reads):
    """extract_pairs_chunk (the batch pipeline's one-pass drain extractor)
    must equal per-read extract_pairs_auto + the drain's stable diagonal
    sort, element for element."""
    from cpecan_tpu.ops.pallas_fb import (extract_pairs_auto,
                                          extract_pairs_chunk)
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads)
    rels = list(range(len(fixture_reads)))
    nds = [out["prep"]["bands"][i].n_diag for i in rels]
    parts = extract_pairs_chunk(out, rels, nds, params.threshold)
    assert len(parts) == len(fixture_reads)
    for i in rels:
        want = extract_pairs_auto(out, i, nds[i], params.threshold,
                                  as_array=True).reshape(-1, 3)
        want = want[np.argsort(want[:, 1] + want[:, 2], kind="stable")]
        assert want.shape == parts[i].shape, i
        assert np.array_equal(parts[i], want), i


def test_chunk_extraction_saturated_fallback(template_model, fixture_reads):
    """A tiny compact_k saturates the top-k: the chunk extractor must fall
    back to the per-read full-plane path for those reads and still match."""
    from cpecan_tpu.ops.pallas_fb import (extract_pairs_auto,
                                          extract_pairs_chunk)
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True)
    out = pa.run(sm, fixture_reads, compact_k=8)
    rels = list(range(len(fixture_reads)))
    nds = [out["prep"]["bands"][i].n_diag for i in rels]
    parts = extract_pairs_chunk(out, rels, nds, params.threshold)
    for i in rels:
        want = extract_pairs_auto(out, i, nds[i], params.threshold,
                                  as_array=True).reshape(-1, 3)
        want = want[np.argsort(want[:, 1] + want[:, 2], kind="stable")]
        assert np.array_equal(parts[i], want), i


def test_echelon_chunk_extraction_matches_per_read(template_model):
    """extract_echelon_pairs_chunk must equal per-read
    extract_echelon_pairs (multi-state expansion) + the drain's sort."""
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.pallas_fb import (EchelonPallasAligner,
                                          extract_echelon_pairs,
                                          extract_echelon_pairs_chunk)

    rng = np.random.default_rng(23)
    mm = template_model.match_model
    reads = []
    for r in range(3):
        n = 40 + 12 * r
        ref = "".join(rng.choice(list("ACGT"), n))
        l_x = n - 5
        kidx = seq_to_kmer_indices(ref)
        events = np.zeros((l_x, 3))
        for i in range(l_x):
            events[i, 0] = mm[kidx[i], 0] + rng.normal(0, 0.5)
            events[i, 1] = max(mm[kidx[i], 2], 0.1)
            events[i, 2] = 0.01
        anchors = [(j, j) for j in range(6, l_x - 6, 9)]
        reads.append((ref, events, l_x, l_x, anchors))

    sm = StateMachineEchelon(template_model)
    params = AlignmentParams(threshold=0.15)
    pa = EchelonPallasAligner(params, interpret=True)
    out = pa.run(sm, reads)
    rels = list(range(len(reads)))
    nds = [out["prep"]["bands"][i].n_diag for i in rels]
    parts = extract_echelon_pairs_chunk(out, rels, nds, params.threshold)
    for i in rels:
        want = np.asarray(extract_echelon_pairs(out, i, nds[i],
                                                params.threshold),
                          np.int64).reshape(-1, 3)
        want = want[np.argsort(want[:, 1] + want[:, 2], kind="stable")]
        assert want.shape == parts[i].shape, i
        assert np.array_equal(parts[i], want), i
