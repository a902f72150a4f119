"""Sequence-parallel (x-sharded) wavefront vs the single-chip engine.

Runs on the 8-device virtual CPU mesh from conftest's XLA_FLAGS; parity
target is get_aligned_pairs_without_banding (the unbanded engine path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cpecan_tpu.align import AlignmentParams, get_aligned_pairs_without_banding
from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
from cpecan_tpu.parallel.seqpar import seqpar_posteriors


@pytest.fixture(scope="module")
def problem(template_model):
    from tests.test_parallel import _synthetic_read
    rng = np.random.default_rng(3)
    ref, events, l_x, l_y, _anchors = _synthetic_read(
        rng, template_model, n_ref=90, n_events=80)
    sm = StateMachine3SignalStrawman(template_model)
    return sm, ref, events, l_x, l_y


def _mesh(n):
    devices = jax.devices()
    assert len(devices) >= n, "conftest should provide 8 virtual devices"
    return Mesh(np.asarray(devices[:n]), ("x",))


@pytest.fixture(scope="module")
def strawman_want(problem):
    """Engine comparators, computed once for all shard-count params."""
    sm, ref, events, l_x, l_y = problem
    params = AlignmentParams()
    want = get_aligned_pairs_without_banding(sm, ref, events, l_x, l_y,
                                             params)
    from tests.test_pallas import _engine_single_window
    exact = _engine_single_window(sm, ref, events, l_x, l_y, [], params)
    return want, {(x, y): s for s, x, y in exact}


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_seqpar_matches_unbanded_engine(problem, strawman_want, n_shards):
    sm, ref, events, l_x, l_y = problem
    params = AlignmentParams()
    # decision-parity target: the reference-semantics unbanded path (its
    # scores carry the windowed-traceback total quirk,
    # impl/pairwiseAligner.c:1005-1015, so only the pair SET is compared)
    want, ws = strawman_want
    pairs, total = seqpar_posteriors(sm, ref, events, l_x, l_y,
                                     mesh=_mesh(n_shards),
                                     threshold=params.threshold,
                                     dtype=jnp.float64)
    want_set = {(x, y) for _, x, y in want}
    got_set = {(x, y) for _, x, y in pairs}
    assert got_set == want_set, got_set ^ want_set
    assert np.isfinite(total)
    # score parity vs the exact-total engine comparator
    for s, x, y in pairs:
        if (x, y) in ws:
            assert abs(s - ws[(x, y)]) <= 100, (x, y, s, ws[(x, y)])


def test_seqpar_shard_counts_agree(problem):
    sm, ref, events, l_x, l_y = problem
    p1, t1 = seqpar_posteriors(sm, ref, events, l_x, l_y, mesh=_mesh(2),
                               dtype=jnp.float64)
    p2, t2 = seqpar_posteriors(sm, ref, events, l_x, l_y, mesh=_mesh(8),
                               dtype=jnp.float64)
    assert sorted(p1) == sorted(p2)
    assert abs(t1 - t2) < 1e-9


def test_seqpar_banded_matches_engine(problem):
    """Banded sequence-parallel alignment vs the banded engine path."""
    from cpecan_tpu.align import get_aligned_pairs_using_anchors
    sm, ref, events, l_x, l_y = problem
    params = AlignmentParams()
    anchors = [(j, j) for j in range(10, min(l_x, l_y) - 10, 12)]
    want = get_aligned_pairs_using_anchors(sm, ref, events, l_x, l_y,
                                           anchors, params)
    pairs, total = seqpar_posteriors(
        sm, ref, events, l_x, l_y, mesh=_mesh(8), anchors=anchors,
        expansion=params.diagonal_expansion, threshold=params.threshold,
        dtype=jnp.float64)
    want_set = {(x, y) for _, x, y in want}
    got_set = {(x, y) for _, x, y in pairs}
    assert got_set == want_set, got_set ^ want_set
    assert np.isfinite(total)


@pytest.fixture(scope="module")
def dna_problem():
    rng = np.random.default_rng(7)
    n = 120
    seq_x = "".join(rng.choice(list("ACGT"), n))
    seq_y = "".join(c if rng.random() > 0.15 else
                    str(rng.choice(list("ACGT"))) for c in seq_x)
    from cpecan_tpu.models.state_machines import StateMachine5
    return StateMachine5(), seq_x, seq_y, len(seq_x), len(seq_y)


@pytest.fixture(scope="module")
def dna_want(dna_problem):
    sm, seq_x, seq_y, l_x, l_y = dna_problem
    return get_aligned_pairs_without_banding(sm, seq_x, seq_y, l_x, l_y,
                                             AlignmentParams(threshold=0.2))


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_seqpar_dna5_matches_unbanded_engine(dna_problem, dna_want,
                                             n_shards):
    """DNA 5-state (the chromosome-scale realignment family) x-sharded vs
    the unbanded engine."""
    sm, seq_x, seq_y, l_x, l_y = dna_problem
    params = AlignmentParams(threshold=0.2)
    want = dna_want
    pairs, total = seqpar_posteriors(sm, seq_x, seq_y, l_x, l_y,
                                     mesh=_mesh(n_shards),
                                     threshold=params.threshold,
                                     dtype=jnp.float64)
    want_set = {(x, y) for _, x, y in want}
    got_set = {(x, y) for _, x, y in pairs}
    assert got_set == want_set, got_set ^ want_set
    assert np.isfinite(total)


def test_seqpar_dna5_golden():
    """Reference golden pair set (pairwiseAlignerTest.c:358) through the
    sequence-parallel path."""
    from cpecan_tpu.models.state_machines import StateMachine5
    sm = StateMachine5()
    pairs, _total = seqpar_posteriors(sm, "AGCG", "AGTTCG", 4, 6,
                                      mesh=_mesh(4), threshold=0.2,
                                      dtype=jnp.float64)
    assert {(x, y) for _, x, y in pairs} == {(0, 0), (1, 1), (2, 4), (3, 5)}


def _engine_expectations(sm, x_in, y_in, l_x, l_y, anchors, params):
    from cpecan_tpu.ops.band import _plan_from_windows, make_band
    from cpecan_tpu.ops.engine import (backward_pass, forward_pass,
                                       make_control)
    band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
    n = band.n_diag
    plan = _plan_from_windows([(0, n, n)], False, n)
    plan.refresh[:] = False
    plan.refresh[0] = True
    ctrl = make_control(band, plan)
    problem = sm.build(x_in, y_in, ((band.max_width + 7) // 8) * 8,
                       dtype=jnp.float64)
    all_fwd = forward_pass(problem, ctrl, problem.feats)
    return backward_pass(problem, ctrl, problem.feats, all_fwd,
                         compute_expectations=True)["expectations"]


@pytest.fixture(scope="module")
def strawman_engine_exp(problem):
    sm, ref, events, l_x, l_y = problem
    params = AlignmentParams()
    anchors = [(j, j) for j in range(10, min(l_x, l_y) - 10, 12)]
    return anchors, _engine_expectations(sm, ref, events, l_x, l_y,
                                         anchors, params)


@pytest.mark.parametrize(
    "n_shards", [1, pytest.param(4, marks=pytest.mark.slow), 8])
def test_seqpar_strawman_expectations_match_engine(problem,
                                                   strawman_engine_exp,
                                                   n_shards):
    """x-sharded EM expectations (psum-merged accumulators) vs the engine
    single-window expectation pass — EM on one long alignment can now
    split across chips."""
    from cpecan_tpu.parallel.seqpar import seqpar_expectations
    sm, ref, events, l_x, l_y = problem
    params = AlignmentParams()
    anchors, eng = strawman_engine_exp
    got = seqpar_expectations(sm, ref, events, l_x, l_y,
                              mesh=_mesh(n_shards), anchors=anchors,
                              expansion=params.diagonal_expansion,
                              dtype=jnp.float64)
    # the engine comparator normalizes by its windowed-traceback total
    # (the reference per-window quirk, impl/pairwiseAligner.c:1005-1015);
    # seqpar uses the exact total, so accumulators agree to ~1e-6 rel
    np.testing.assert_allclose(got["trans"], np.asarray(eng["trans"]),
                               rtol=5e-5, atol=1e-7)
    want_gap = np.asarray(eng["kmer_gap"])
    np.testing.assert_allclose(got["kmer_gap"], want_gap, rtol=5e-5,
                               atol=1e-7)


@pytest.fixture(scope="module")
def dna_engine_exp(dna_problem):
    sm, seq_x, seq_y, l_x, l_y = dna_problem
    anchors = [(j, j) for j in range(10, min(l_x, l_y) - 10, 12)]
    return anchors, _engine_expectations(sm, seq_x, seq_y, l_x, l_y,
                                         anchors, AlignmentParams())


@pytest.mark.parametrize("n_shards", [1, 8])
def test_seqpar_dna5_expectations_match_engine(dna_problem, dna_engine_exp,
                                               n_shards):
    from cpecan_tpu.parallel.seqpar import seqpar_expectations
    sm, seq_x, seq_y, l_x, l_y = dna_problem
    params = AlignmentParams()
    anchors, eng = dna_engine_exp
    got = seqpar_expectations(sm, seq_x, seq_y, l_x, l_y,
                              mesh=_mesh(n_shards), anchors=anchors,
                              expansion=params.diagonal_expansion,
                              dtype=jnp.float64)
    # same windowed-total-vs-exact-total normalization drift as the
    # strawman test above; small (~1e-3) accumulator elements carry it as
    # ~1e-4 rel / <1e-6 abs, immaterial at EM normalization scale
    np.testing.assert_allclose(got["trans"], np.asarray(eng["trans"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(got["emis"], np.asarray(eng["emis"]),
                               rtol=2e-4, atol=2e-6)
