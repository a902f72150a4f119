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


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_seqpar_matches_unbanded_engine(problem, n_shards):
    sm, ref, events, l_x, l_y = problem
    params = AlignmentParams()
    # decision-parity target: the reference-semantics unbanded path (its
    # scores carry the windowed-traceback total quirk,
    # impl/pairwiseAligner.c:1005-1015, so only the pair SET is compared)
    want = get_aligned_pairs_without_banding(sm, ref, events, l_x, l_y,
                                             params)
    pairs, total = seqpar_posteriors(sm, ref, events, l_x, l_y,
                                     mesh=_mesh(n_shards),
                                     threshold=params.threshold,
                                     dtype=jnp.float64)
    want_set = {(x, y) for _, x, y in want}
    got_set = {(x, y) for _, x, y in pairs}
    assert got_set == want_set, got_set ^ want_set
    assert np.isfinite(total)
    # score parity vs the exact-total engine comparator
    from tests.test_pallas import _engine_single_window
    exact = _engine_single_window(sm, ref, events, l_x, l_y, [], params)
    ws = {(x, y): s for s, x, y in exact}
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
