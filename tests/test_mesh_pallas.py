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
