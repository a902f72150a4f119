"""Aux-subsystem tests: checkpoint/resume, leveled logging, profiling
timers (SURVEY §5 — subsystems the reference lacks or does via text files).
"""

import random

import numpy as np
import pytest

from cpecan_tpu.utils.checkpoint import (CheckpointManager, load_checkpoint,
                                         rng_state_from_json,
                                         rng_state_to_json, save_checkpoint)
from cpecan_tpu.utils.logging import get_log_level, set_log_level
from cpecan_tpu.utils.profiling import Timer


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt_00000003.npz")
    arrays = {"w": np.arange(6, dtype=np.float64).reshape(2, 3)}
    save_checkpoint(path, 3, arrays, meta={"lik": -12.5, "note": "hi"})
    step, arr, meta = load_checkpoint(path)
    assert step == 3
    np.testing.assert_array_equal(arr["w"], arrays["w"])
    assert meta == {"lik": -12.5, "note": "hi"}


def test_checkpoint_manager_retention_and_restore(tmp_path):
    m = CheckpointManager(str(tmp_path), keep=2)
    for step in range(5):
        m.save(step, arrays={"x": np.array([step])}, meta={"s": step})
    assert m._steps() == [3, 4]  # retention pruned old checkpoints
    step, arr, meta = m.restore()
    assert step == 4 and meta["s"] == 4 and arr["x"][0] == 4


def test_checkpoint_manager_empty(tmp_path):
    assert CheckpointManager(str(tmp_path)).restore() is None


def test_rng_state_json_roundtrip():
    rng = random.Random(42)
    rng.random()
    state = rng_state_to_json(rng)
    rng2 = rng_state_from_json(state)
    assert [rng.random() for _ in range(5)] == \
        [rng2.random() for _ in range(5)]


def test_meta_key_reserved(tmp_path):
    with pytest.raises(ValueError):
        save_checkpoint(str(tmp_path / "c.npz"), 0,
                        {"__meta__": np.zeros(1)})


def test_log_levels():
    set_log_level("DEBUG")
    assert get_log_level() == "DEBUG"
    set_log_level("off")
    assert get_log_level() == "OFF"
    with pytest.raises(ValueError):
        set_log_level("verbose")


def test_timer():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    rep = t.report()
    assert rep["a"][1] == 2 and rep["b"][1] == 1
    assert "a" in t.summary()


def test_em_checkpoint_resume(tmp_path):
    """An interrupted 5-state EM run resumed from its checkpoint produces
    the same model as an uninterrupted run."""
    from cpecan_tpu.pipeline.em import (EmOptions, PipelineHmm,
                                        expectation_maximisation)
    from cpecan_tpu.io.cigar import parse_cigar_line

    rng = np.random.default_rng(0)
    seq1 = "".join(rng.choice(list("ACGT"), 60))
    seq2 = seq1[:30] + seq1[35:]
    sequences = {"s1": seq1, "s2": seq2}
    aln = parse_cigar_line(
        f"cigar: s2 0 {len(seq2)} + s1 0 {len(seq1)} + 0 "
        f"M 30 D 5 M {len(seq2) - 30}")
    opts = EmOptions(iterations=4, random_start=False)

    full = expectation_maximisation(sequences, [aln], opts,
                                    rng=random.Random(7))
    # run 2 iterations to a checkpoint, then resume for the rest
    opts2 = EmOptions(iterations=2, random_start=False)
    ck = str(tmp_path / "ckpts")
    expectation_maximisation(sequences, [aln], opts2, rng=random.Random(7),
                             checkpoint_dir=ck)
    resumed = expectation_maximisation(sequences, [aln], opts,
                                       rng=random.Random(99),
                                       checkpoint_dir=ck, resume=True)
    np.testing.assert_allclose(resumed.transitions, full.transitions,
                               rtol=1e-12)
    np.testing.assert_allclose(resumed.emissions, full.emissions, rtol=1e-12)
    assert resumed.running_likelihoods[-1] == \
        pytest.approx(full.running_likelihoods[-1])
