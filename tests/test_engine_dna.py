"""DP engine golden tests on the 5-state DNA machine.

Mirrors test_diagonalDPCalculations (tests/pairwiseAlignerTest.c:276-372):
"AGCG" x "AGTTCG", threshold 0.2, expected exact pair set
{(0,0),(1,1),(2,4),(3,5)} and forward == backward total probability.
"""

import numpy as np
import pytest

from cpecan_tpu.align import (AlignmentParams, get_aligned_pairs_using_anchors,
                              get_aligned_pairs_without_banding)
from cpecan_tpu.constants import LOG_ZERO
from cpecan_tpu.logmath import log_add
from cpecan_tpu.models.state_machines import StateMachine5
from cpecan_tpu.ops.band import full_band, unbanded_schedule
from cpecan_tpu.ops.engine import backward_pass, forward_pass, make_control
from cpecan_tpu.fixtures import fixture_path


SX, SY = "AGCG", "AGTTCG"


def _strict_dot(a, b):
    S = a.shape[1]
    total = LOG_ZERO
    for o in range(a.shape[0]):
        cd = a[o, 0] + b[o, 0]
        for s in range(1, S):
            cd = float(log_add(cd, a[o, s] + b[o, s]))
        total = float(log_add(total, cd))
    return total


@pytest.fixture(scope="module")
def run():
    sm = StateMachine5()
    l_x, l_y = len(SX), len(SY)
    band = full_band(l_x, l_y)
    sched = unbanded_schedule(band)
    ctrl = make_control(band, sched)
    problem = sm.build(SX, SY, 8)
    all_fwd = forward_pass(problem, ctrl, problem.feats)
    out = backward_pass(problem, ctrl, problem.feats, all_fwd)
    return sm, problem, band, ctrl, np.asarray(all_fwd), out


def test_forward_equals_backward_total(run):
    sm, problem, band, ctrl, all_fwd, out = run
    n = band.n_diag
    # forward total: dot of final forward diagonal with endStateProb
    end = np.asarray(problem.end)
    fwd_final = all_fwd[n]
    # single cell (lX, lY)
    slot = band.l_x - band.x_lo[n]
    total_fwd = LOG_ZERO
    cd = fwd_final[slot, 0] + end[0]
    for s in range(1, 5):
        cd = float(log_add(cd, fwd_final[slot, s] + end[s]))
    total_fwd = cd

    # backward totals per step from the engine (single total for unbanded)
    totals = np.asarray(out["totals"])
    assert abs(totals[0] - total_fwd) < 1e-3
    assert abs(totals[-1] - total_fwd) < 1e-2


def test_exact_pair_set(run):
    sm, problem, band, ctrl, all_fwd, out = run
    params = AlignmentParams(threshold=0.2)
    from cpecan_tpu.ops.engine import extract_aligned_pairs
    pairs = extract_aligned_pairs(out, 0.2)
    got = {(x, y) for _, x, y in pairs}
    assert got == {(0, 0), (1, 1), (2, 4), (3, 5)}
    assert len(pairs) == 4


def test_without_banding_api():
    sm = StateMachine5()
    pairs = get_aligned_pairs_without_banding(
        sm, SX, SY, len(SX), len(SY), AlignmentParams(threshold=0.2))
    got = {(x, y) for _, x, y in pairs}
    assert got == {(0, 0), (1, 1), (2, 4), (3, 5)}


@pytest.mark.slow  # randomized sweep: slow differential tier
def test_banded_matches_unbanded_on_random_pairs():
    """Structural invariants like test_getAlignedPairs
    (tests/pairwiseAlignerTest.c:418-465): pairs unique, in range,
    scores in (0, 1e7]."""
    rng = np.random.default_rng(7)
    bases = "ACGT"
    for _ in range(5):
        n = int(rng.integers(10, 60))
        seq_x = "".join(rng.choice(list(bases), n))
        # evolve: point mutations + indels
        out = []
        for ch in seq_x:
            r = rng.random()
            if r < 0.1:
                continue
            if r < 0.2:
                out.append(rng.choice(list(bases)))
            else:
                out.append(ch)
            if rng.random() < 0.1:
                out.append(rng.choice(list(bases)))
        seq_y = "".join(out)
        if not seq_y:
            continue
        sm = StateMachine5()
        pairs = get_aligned_pairs_using_anchors(
            sm, seq_x, seq_y, len(seq_x), len(seq_y), [],
            AlignmentParams())
        seen = set()
        for score, x, y in pairs:
            assert 0 < score <= 10_000_000
            assert 0 <= x < len(seq_x)
            assert 0 <= y < len(seq_y)
            assert (x, y) not in seen
            seen.add((x, y))


def test_edge_cases():
    """Degenerate inputs: empty sequences return [], 1x1 aligns, bad
    anchors raise (verify-skill probe list)."""
    import numpy as np
    from cpecan_tpu.align import (AlignmentParams,
                                  get_aligned_pairs_using_anchors,
                                  get_aligned_pairs_without_banding)
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman

    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    sm = StateMachine3SignalStrawman(model)
    params = AlignmentParams()
    assert get_aligned_pairs_without_banding(
        sm, "", np.zeros((0, 3)), 0, 0, params) == []
    assert get_aligned_pairs_using_anchors(
        sm, "ACGTAC", np.zeros((0, 3)), 1, 0, [], params) == []
    ev = np.array([[65.0, 1.0, 0.05]])
    out = get_aligned_pairs_without_banding(sm, "ACGTAC", ev, 1, 1, params)
    assert len(out) == 1 and out[0][1:] == (0, 0)
    with pytest.raises(ValueError):
        get_aligned_pairs_using_anchors(
            sm, "ACGTACGTACGTACG", np.tile(ev, (10, 1)), 10, 10,
            [(5, 5), (3, 7)], params)
