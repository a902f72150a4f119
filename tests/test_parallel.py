"""Batched + multi-device (8 virtual CPU devices) engine tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpecan_tpu.align import AlignmentParams, get_aligned_pairs_using_anchors
from cpecan_tpu.constants import KMER_LENGTH
from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
from cpecan_tpu.ops.engine import extract_aligned_pairs
from cpecan_tpu.parallel.batch import BatchedAligner


def _synthetic_read(rng, model, n_ref=120, n_events=110):
    ref = "".join(rng.choice(list("ACGT"), n_ref))
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    l_x = n_ref - (KMER_LENGTH - 1)
    kidx = seq_to_kmer_indices(ref)
    events = np.zeros((n_events, 3))
    # events roughly follow the model means along the diagonal
    for i in range(n_events):
        k = kidx[min(int(i * l_x / n_events), l_x - 1)]
        events[i, 0] = model.match_model[k, 0] + rng.normal(0, 1.0)
        events[i, 1] = max(model.match_model[k, 2] + rng.normal(0, 0.3), 0.1)
        events[i, 2] = 0.05
    anchors = [(int(i * (l_x - 2) / 10) + 1, int(i * (n_events - 2) / 10) + 1)
               for i in range(1, 9)]
    anchors = sorted(set(anchors))
    # strictly increasing
    filtered = []
    px = py = -1
    for x, y in anchors:
        if x > px and y > py:
            filtered.append((x, y))
            px, py = x, y
    return ref, events, l_x, n_events, filtered


@pytest.fixture(scope="module")
def reads(template_model):
    rng = np.random.default_rng(3)
    return [_synthetic_read(rng, template_model) for _ in range(8)]


def test_batched_matches_single(template_model, reads):
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    ba = BatchedAligner(params, strict=True, dtype=jnp.float64)
    out = ba.run(sm, [(r, e, lx, ly, a) for r, e, lx, ly, a in reads[:3]])
    for i, (ref, events, l_x, l_y, anchors) in enumerate(reads[:3]):
        single = get_aligned_pairs_using_anchors(
            sm, ref, events, l_x, l_y, anchors, params)
        batch_out = {
            "posteriors": np.asarray(out["posteriors"][i]),
            "step_d": np.asarray(out["step_d"][i]),
            "step_base": np.asarray(out["step_base"][i]),
        }
        batched = extract_aligned_pairs(batch_out, params.threshold)
        assert sorted(batched) == sorted(single)


def test_mesh_sharded_alignment(template_model, reads):
    from cpecan_tpu.parallel.mesh import make_data_mesh, sharded_align_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    ba = BatchedAligner(params, strict=True, dtype=jnp.float64)
    template, feats, xei, yei, ctrl_arrays, bands = ba.prepare(
        sm, [(r, e, lx, ly, a) for r, e, lx, ly, a in reads])

    mesh = make_data_mesh(8)
    fn = sharded_align_fn(template, mesh, strict=True)
    out = fn(feats, xei, yei, ctrl_arrays)

    # compare against unsharded batch
    ref_out = ba.run(sm, [(r, e, lx, ly, a) for r, e, lx, ly, a in reads])
    np.testing.assert_allclose(np.asarray(out["posteriors"]),
                               np.asarray(ref_out["posteriors"]),
                               rtol=1e-10, atol=1e-12)


def test_mesh_em_psum(template_model, reads):
    from cpecan_tpu.parallel.mesh import make_data_mesh, sharded_align_fn
    from cpecan_tpu.align import get_expectations_using_anchors

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams()
    ba = BatchedAligner(params, strict=True, dtype=jnp.float64,
                        compute_expectations=True)
    template, feats, xei, yei, ctrl_arrays, bands = ba.prepare(
        sm, [(r, e, lx, ly, a) for r, e, lx, ly, a in reads])
    mesh = make_data_mesh(8)
    fn = sharded_align_fn(template, mesh, strict=True,
                          compute_expectations=True)
    out = fn(feats, xei, yei, ctrl_arrays)
    got = out["expectations"]

    # sum of single-read expectations must equal the psum-reduced result
    want_trans = np.zeros((3, 3))
    want_lik = 0.0
    for ref, events, l_x, l_y, anchors in reads:
        acc = get_expectations_using_anchors(sm, ref, events, l_x, l_y,
                                             anchors, params)
        want_trans += acc["trans"]
        want_lik += acc["likelihood"]
    np.testing.assert_allclose(np.asarray(got["trans"]), want_trans, rtol=1e-9)
    np.testing.assert_allclose(float(got["likelihood"]), want_lik, rtol=1e-9)
