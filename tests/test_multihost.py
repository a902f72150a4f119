"""Multi-host controller + fast5 pipeline wiring tests (single-process:
initialize is a no-op, the mesh spans the virtual CPU devices from
conftest's XLA_FLAGS)."""

import numpy as np
import pytest
from cpecan_tpu.fixtures import fixture_path

import jax

from cpecan_tpu.parallel.multihost import (MultiHostEmController,
                                           global_data_mesh,
                                           initialize_distributed,
                                           is_primary, local_shard_bounds)


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False
    assert is_primary()


def test_global_mesh_spans_devices():
    mesh = global_data_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_local_shard_bounds_single_process():
    start, stop = local_shard_bounds(10)
    assert (start, stop) == (0, 10)


def test_controller_checkpointing(tmp_path):
    c = MultiHostEmController(checkpoint_dir=str(tmp_path))
    c.save(0, {"w": np.arange(3.0)}, meta={"lik": -1.0})
    c.save(1, {"w": np.arange(3.0) * 2}, meta={"lik": -0.5})
    step, arrays, meta = c.restore()
    assert step == 1
    assert meta["lik"] == -0.5
    np.testing.assert_array_equal(arrays["w"], [0.0, 2.0, 4.0])


def test_run_isolated_bisects_poisoned_item():
    """One poisoned item: the batch completes, the item is skipped and
    reported, every other item is processed exactly once (the jobTree
    job-retry semantics the reference's cluster EM inherited)."""
    from cpecan_tpu.parallel.multihost import run_isolated

    calls = []

    def fn(sub):
        calls.append(list(sub))
        if 13 in sub:
            raise ValueError("poisoned")
        return sum(sub)

    items = list(range(20))
    results, skipped = run_isolated(items, fn, retries=1,
                                    log=lambda m: None)
    assert skipped == [(13, "poisoned")]
    covered = [i for sub, _ in results for i in sub]
    assert sorted(covered) == [i for i in items if i != 13]
    assert sum(r for _, r in results) == sum(items) - 13
    # bounded: O(retries * log n) re-runs, not O(n)
    assert len(calls) < 3 * (len(items).bit_length() + 1) * 2


def test_run_shards_poisoned_read_em():
    """A poisoned read (non-monotone anchors) inside an EM E-step: the
    controller's run_shards completes the batch, records the failure, and
    the merged model equals the clean run minus that read
    (the VERDICT's elastic-recovery bar; reference analogue:
    scripts/signalAlign.py:52-58 + jobTree retries)."""
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    sm, reads = _synthetic_batch(n_reads=6, n_ref=70, n_events=60, seed=2)
    poisoned = 3
    bad = list(reads[poisoned])
    bad[4] = [(30, 20), (10, 30)]  # non-monotone anchors -> prepare raises
    reads[poisoned] = tuple(bad)

    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True, group=2)

    def estep(sub_idxs):
        out = pa.run(sm, [reads[i] for i in sub_idxs], expectations=True,
                     ragged_left=True, ragged_right=True)
        exp = out["expectations"]
        return {k: np.asarray(v).sum(axis=0) for k, v in exp.items()}

    c = MultiHostEmController(log=lambda m: None)
    results, skipped = c.run_shards([list(range(len(reads)))], estep,
                                    retries=1)
    assert [i for i, _err in skipped] == [poisoned]
    assert c.skipped_report and c.skipped_report[0][0] == poisoned
    trans = sum(r["trans"] for _, r in results)

    clean = estep([i for i in range(len(reads)) if i != poisoned])
    # f32 kernels: different group compositions change window unions and
    # roll alignments, so accumulators agree to f32 rounding, not bits
    np.testing.assert_allclose(trans, clean["trans"], rtol=1e-3,
                               atol=1e-6)


@pytest.mark.slow
def test_two_process_distributed_em(tmp_path):
    """Run the REAL thing: two jax.distributed CPU processes (2 local
    devices each) execute one psum-reduced EM E-step over a global
    4-device mesh.  Both hosts must hold the identical reduced model, it
    must equal the single-process sum, and only host 0 may write the
    checkpoint.  Mirrors cPecanEmTest.py:56-113 (distribution tested by
    running the actual pipeline locally)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # the worker sets its own XLA_FLAGS device count
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-4000:]

    r0 = np.load(tmp_path / "result_0.npz")
    r1 = np.load(tmp_path / "result_1.npz")
    # identical psum-reduced model on both hosts
    np.testing.assert_allclose(r0["trans"], r1["trans"], rtol=1e-12)
    np.testing.assert_allclose(r0["likelihood"], r1["likelihood"],
                               rtol=1e-12)

    # the reduced counts equal the single-process per-read sum
    from cpecan_tpu.align import AlignmentParams, \
        get_expectations_using_anchors
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
    from tests.test_parallel import _synthetic_read
    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    rng = np.random.default_rng(5)
    reads = [_synthetic_read(rng, model, n_ref=60, n_events=50)
             for _ in range(4)]
    sm = StateMachine3SignalStrawman(model)
    want = np.zeros((3, 3))
    want_lik = 0.0
    for ref, events, l_x, l_y, anchors in reads:
        acc = get_expectations_using_anchors(sm, ref, events, l_x, l_y,
                                             anchors, AlignmentParams())
        want += np.asarray(acc["trans"])
        want_lik += float(acc["likelihood"])
    np.testing.assert_allclose(r0["raw_trans"], want, rtol=1e-9)
    np.testing.assert_allclose(float(r0["likelihood"]), want_lik, rtol=1e-9)

    # only host 0 wrote the checkpoint
    ckpt = tmp_path / "ckpt"
    assert ckpt.exists() and any(ckpt.iterdir())
    from cpecan_tpu.utils.checkpoint import CheckpointManager
    step, arrays, meta = CheckpointManager(str(ckpt)).restore()
    assert step == 0
    assert meta["writer"] == 0, "host 1 must not write checkpoints"
    np.testing.assert_allclose(arrays["trans"], r0["trans"], rtol=1e-12)


def test_prepare_fast5_reads(tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from cpecan_tpu.pipeline.signal_align_batch import prepare_fast5_reads
    from tests.test_fast5 import _make_fast5

    f5dir = tmp_path / "fast5"
    f5dir.mkdir()
    _make_fast5(f5dir / "a.fast5")
    _make_fast5(f5dir / "b.fast5")
    (f5dir / "broken.fast5").write_bytes(b"not hdf5")

    calls = []

    def guide_fn(twod_fasta, name):
        calls.append(name)
        if name == "b":
            return False  # unmapped read is skipped
        return f"cigar: {name} 0 7 + ref 0 7 + 1 M 7"

    msgs = []
    pairs = prepare_fast5_reads(
        sorted(str(p) for p in f5dir.glob("*.fast5")),
        str(tmp_path / "work"), guide_fn=guide_fn, log=msgs.append)
    assert len(pairs) == 1
    npread, cigar = pairs[0]
    assert npread.endswith("a.npRead")
    assert cigar.startswith("cigar: a")
    assert calls == ["a", "b"]
    assert any("broken" in m for m in msgs)
    assert any("skipping" in m for m in msgs)
