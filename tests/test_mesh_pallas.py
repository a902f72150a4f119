"""The Pallas fast path on a device mesh (run(mesh=...)): data-parallel
read-group sharding with per-device kernels, per-device posterior
compaction, and psum-reduced in-kernel EM accumulators — the fast-path
replacement for the reference's per-read process fan-out
(scripts/signalAlign.py:101-141) and expectation-file merges
(scripts/trainModels.py:108-115, cPecanEm.py:185-188).

Parity bar: pair decisions identical to the single-device kernel run;
reduced EM accumulators match the summed per-read finalize to f32
accumulation error.  Runs on the 8 virtual CPU devices in interpret mode.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from cpecan_tpu.align import AlignmentParams
from cpecan_tpu.fixtures import fixture_path


@pytest.fixture(scope="module")
def data_mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    return Mesh(np.asarray(devs[:4]), ("data",))


def _signal_reads(n_reads=10, seed=3):
    from __graft_entry__ import _synthetic_batch
    return _synthetic_batch(n_reads=n_reads, n_ref=80, n_events=70,
                            seed=seed, shape_jitter=0.3)


def test_mesh_strawman_posteriors_and_em(data_mesh):
    from cpecan_tpu.ops.pallas_fb import (StrawmanPallasAligner,
                                          extract_pairs_auto)

    sm, reads = _signal_reads()
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, interpret=True, group=2)

    out1 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                  compact_k=512)
    out2 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                  compact_k=512, mesh=data_mesh)
    for i in range(len(reads)):
        p1 = extract_pairs_auto(out1, i, out1["prep"]["bands"][i].n_diag,
                                params.threshold)
        p2 = extract_pairs_auto(out2, i, out2["prep"]["bands"][i].n_diag,
                                params.threshold)
        assert set(p1) == set(p2), (i, set(p1) ^ set(p2))

    e1 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                expectations=True)
    e2 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                expectations=True, mesh=data_mesh)
    red = {k: np.asarray(v) for k, v in e2["expectations_reduced"].items()}
    exp = e1["expectations"]
    assert np.allclose(red["trans"], exp["trans"].sum(0), rtol=2e-3,
                       atol=1e-4)
    assert np.allclose(red["kmer_gap"], exp["kmer_gap"].sum(0), rtol=2e-3,
                       atol=1e-4)
    want = float(exp["likelihood"].sum())
    assert abs(float(red["likelihood"]) - want) <= 1e-4 * abs(want) + 1e-2


def test_mesh_dna5_em(data_mesh):
    import random

    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner

    rng = random.Random(9)
    reads = []
    for i in range(6):
        n = 70 + 10 * (i % 3)
        sx = "".join(rng.choice("ACGT") for _ in range(n))
        sy = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                     for c in sx)
        anchors = [(j, j) for j in range(10, n - 10, 15)]
        reads.append((sx, sy, n, len(sy), anchors))
    sm = StateMachine5()
    pa = Dna5PallasAligner(AlignmentParams(), interpret=True, group=2)

    e1 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                expectations=True)
    e2 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                expectations=True, mesh=data_mesh)
    red = {k: np.asarray(v) for k, v in e2["expectations_reduced"].items()}
    exp = e1["expectations"]
    assert np.allclose(red["trans"], exp["trans"].sum(0), rtol=2e-3,
                       atol=1e-4)
    assert np.allclose(red["emis"], exp["emis"].sum(0), rtol=2e-3,
                       atol=1e-4)
    want = float(exp["likelihood"].sum())
    assert abs(float(red["likelihood"]) - want) <= 1e-4 * abs(want) + 1e-2


def test_mesh_vanilla_em(data_mesh):
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import StateMachine3Vanilla
    from cpecan_tpu.ops.pallas_fb import VanillaPallasAligner

    model = load_pore_model(fixture_path("template_median68pA.model"))
    _sm_syn, reads = _signal_reads(n_reads=6, seed=11)
    sm = StateMachine3Vanilla(model, strand="template")
    pa = VanillaPallasAligner(AlignmentParams(), interpret=True, group=2)

    e1 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                expectations=True)
    e2 = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                expectations=True, mesh=data_mesh)
    red = {k: np.asarray(v) for k, v in e2["expectations_reduced"].items()}
    exp = e1["expectations"]
    assert np.allclose(red["skip_bins"], exp["skip_bins"].sum(0),
                       rtol=2e-3, atol=1e-4)
    want = float(exp["likelihood"].sum())
    assert abs(float(red["likelihood"]) - want) <= 1e-4 * abs(want) + 1e-2


def test_mesh_em_pipeline(data_mesh):
    """calculate_expectations_pallas(mesh=...) produces the same merged
    HmmDiscrete as the per-read finalize path."""
    import random

    from cpecan_tpu.io.cigar import parse_cigar_line
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner
    from cpecan_tpu.pipeline.em import (EmOptions, PipelineHmm,
                                        _shard_alignments,
                                        calculate_expectations_pallas)

    rng = random.Random(5)
    seqs = {}
    alns = []
    for i in range(6):
        sx = "".join(rng.choice("ACGT") for _ in range(90))
        sy = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                     for c in sx)
        seqs[f"x{i}"] = sx
        seqs[f"y{i}"] = sy
        alns.append(parse_cigar_line(
            f"cigar: y{i} 0 {len(sy)} + x{i} 0 90 + 0 M 90"))
    options = EmOptions(train_emissions=True)
    hmm = PipelineHmm("fiveState")
    hmm.equalise()
    sm = hmm.to_state_machine()
    shards = _shard_alignments(alns, options, random.Random(1))
    pa = Dna5PallasAligner(options.realign_params, interpret=True, group=2)
    h1 = calculate_expectations_pallas(shards, seqs, sm,
                                       options.realign_params, pa)
    h2 = calculate_expectations_pallas(shards, seqs, sm,
                                       options.realign_params, pa,
                                       mesh=data_mesh)
    assert np.allclose(h1.transitions, h2.transitions, rtol=2e-3,
                       atol=1e-4)
    assert np.allclose(h1.emissions, h2.emissions, rtol=2e-3, atol=1e-4)
    assert abs(h1.likelihood - h2.likelihood) <= (
        1e-4 * abs(h1.likelihood) + 1e-2)


def test_mesh_sm4_posteriors_and_em(data_mesh):
    """StateMachine4 on the mesh: exact pair parity + psum EM reduce
    (closes the r4 gap — sm4 inherited run(mesh=...) untested)."""
    from cpecan_tpu.models.state_machines import StateMachine4
    from cpecan_tpu.ops.pallas_fb import (Sm4PallasAligner,
                                          extract_pairs_auto)

    sm_syn, reads = _signal_reads(n_reads=6, seed=13)
    sm = StateMachine4(sm_syn.model)
    params = AlignmentParams()
    pa = Sm4PallasAligner(params, interpret=True, group=2)

    out1 = pa.run(sm, reads, compact_k=512)
    out2 = pa.run(sm, reads, compact_k=512, mesh=data_mesh)
    for i in range(len(reads)):
        p1 = extract_pairs_auto(out1, i, out1["prep"]["bands"][i].n_diag,
                                params.threshold)
        p2 = extract_pairs_auto(out2, i, out2["prep"]["bands"][i].n_diag,
                                params.threshold)
        assert set(p1) == set(p2), (i, set(p1) ^ set(p2))

    e1 = pa.run(sm, reads, expectations=True)
    e2 = pa.run(sm, reads, expectations=True, mesh=data_mesh)
    red = {k: np.asarray(v) for k, v in e2["expectations_reduced"].items()}
    exp = e1["expectations"]
    assert np.allclose(red["trans"], exp["trans"].sum(0), rtol=2e-3,
                       atol=1e-4)
    want = float(exp["likelihood"].sum())
    assert abs(float(red["likelihood"]) - want) <= 1e-4 * abs(want) + 1e-2


def test_mesh_echelon_posteriors(data_mesh, template_model):
    """Echelon on the mesh: the multi-state posterior windows
    ([NP, R, W] per diagonal) shard like any other read-group payload;
    pair expansion must match the single-device run exactly."""
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.pallas_fb import (EchelonPallasAligner,
                                          extract_echelon_pairs)

    rng = np.random.default_rng(6)
    mm = template_model.match_model
    reads = []
    for r in range(6):
        n = 40 + 6 * r
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
    pa = EchelonPallasAligner(params, interpret=True, group=2)
    out1 = pa.run(sm, reads)
    out2 = pa.run(sm, reads, mesh=data_mesh)
    for i in range(len(reads)):
        nd1 = out1["prep"]["bands"][i].n_diag
        nd2 = out2["prep"]["bands"][i].n_diag
        p1 = extract_echelon_pairs(out1, i, nd1, params.threshold)
        p2 = extract_echelon_pairs(out2, i, nd2, params.threshold)
        assert set(p1) == set(p2), (i, set(p1) ^ set(p2))


def _small_hdp_model():
    from cpecan_tpu.hdp.nanopore_hdp import flat_hdp_model_2
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3Hdp
    from cpecan_tpu.io.poremodel import load_pore_model

    model_path = fixture_path("template_median68pA.model")
    model = load_pore_model(model_path)
    nhdp = flat_hdp_model_2("ACGT", 6, 1.0, 1.0, 1.0, 1.0,
                            30.0, 110.0, 120, model_path)
    rng = np.random.default_rng(2)
    mm = model.match_model
    ref = "".join(rng.choice(list("ACGT"), 50))
    l_x = 50 - 5
    kidx = seq_to_kmer_indices(ref)
    kmers_train, signals = [], []
    for p in range(l_x):
        for _ in range(4):
            kmers_train.append(ref[p:p + 6])
            signals.append(mm[kidx[p], 0] + rng.normal(0, 1.0))
    nhdp.update_from_assignments(kmers_train, signals)
    nhdp.execute_gibbs_sampling(num_samples=4, burn_in=100, thinning=25)
    nhdp.finalize_distributions()
    return StateMachine3Hdp(nhdp), model, ref, l_x, kidx


def test_mesh_hdp_posteriors_and_em(data_mesh):
    """The streamed HDP spec on the mesh (r4 gap: run(mesh=...) raised
    NotImplementedError): the per-read density stream builds SHARDED
    (the A @ Wp^T matmul and skew-gather are read-parallel) and feeds
    the kernels under shard_map; pair decisions must match the
    single-device run exactly, and the psum EM reduce must match the
    summed per-read finalize."""
    from cpecan_tpu.ops.pallas_fb import (HdpPallasAligner,
                                          extract_pairs_auto)

    sm, model, ref, l_x, kidx = _small_hdp_model()
    rng = np.random.default_rng(3)
    mm = model.match_model
    reads = []
    for j in range(6):
        n_ev = l_x - 2 * j
        events = np.zeros((n_ev, 3))
        for i in range(n_ev):
            events[i, 0] = mm[kidx[min(i, l_x - 1)], 0] + rng.normal(0, 0.5)
            events[i, 1] = 1.0
            events[i, 2] = 0.01
        anchors = []
        px = py = -1
        for x in range(8, l_x - 8, 10):
            y = min(x, n_ev - 2)
            if x > px and y > py:
                anchors.append((x, y))
                px, py = x, y
        reads.append((ref, events, l_x, n_ev, anchors))

    params = AlignmentParams(threshold=0.1)
    pa = HdpPallasAligner(params, interpret=True, group=2)
    out1 = pa.run(sm, reads, compact_k=512)
    out2 = pa.run(sm, reads, compact_k=512, mesh=data_mesh)
    for i in range(len(reads)):
        p1 = extract_pairs_auto(out1, i, out1["prep"]["bands"][i].n_diag,
                                params.threshold)
        p2 = extract_pairs_auto(out2, i, out2["prep"]["bands"][i].n_diag,
                                params.threshold)
        assert set(p1) == set(p2), (i, set(p1) ^ set(p2))

    e1 = pa.run(sm, reads, expectations=True)
    e2 = pa.run(sm, reads, expectations=True, mesh=data_mesh)
    red = {k: np.asarray(v) for k, v in e2["expectations_reduced"].items()}
    exp = e1["expectations"]
    assert np.allclose(red["trans"], exp["trans"].sum(0), rtol=2e-3,
                       atol=1e-4)
    want = float(exp["likelihood"].sum())
    assert abs(float(red["likelihood"]) - want) <= 1e-4 * abs(want) + 1e-2
