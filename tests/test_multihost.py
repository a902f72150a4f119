"""Multi-host controller + fast5 pipeline wiring tests (single-process:
initialize is a no-op, the mesh spans the virtual CPU devices from
conftest's XLA_FLAGS)."""

import numpy as np
import pytest

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
