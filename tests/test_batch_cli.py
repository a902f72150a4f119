"""Batch-driver CLI tests (signalAlign.py / trainModels.py / cPecanEm.py
equivalents)."""

import os
import random
import shutil
from cpecan_tpu.fixtures import fixture_path

import pytest

from cpecan_tpu.cli.batch import (em_main, signal_align_batch_main,
                                  train_models_main)

REF = fixture_path("ZymoRef.txt")
NPREAD = fixture_path("ZymoC_ch_1_file1.npRead")
TMODEL = fixture_path("template_median68pA.model")
CMODEL = fixture_path("complement_median68pA_pop2.model")


def test_em_cli(tmp_path):
    rng = random.Random(9)
    seq_x = "".join(rng.choice("ACGT") for _ in range(150))
    seq_y = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                    for c in seq_x)
    (tmp_path / "seqs.fa").write_text(f">s1\n{seq_x}\n>s2\n{seq_y}\n")
    (tmp_path / "alns.cig").write_text(
        f"cigar: s2 0 {len(seq_y)} + s1 0 {len(seq_x)} + 0 M {len(seq_x)}\n")
    model = tmp_path / "model.hmm"
    matrix = tmp_path / "matrix.txt"
    assert em_main(["--sequences", str(tmp_path / "seqs.fa"),
                    "--alignments", str(tmp_path / "alns.cig"),
                    "--outputModel", str(model),
                    "--iterations", "2", "--trainEmissions",
                    "--outputLastzScoringMatrix", str(matrix)]) == 0
    from cpecan_tpu.pipeline.em import PipelineHmm
    hmm = PipelineHmm.load(str(model))
    assert hmm.likelihood != 0.0
    assert "gap_open_penalty" in matrix.read_text()


def test_em_cli_checkpoint_resume(tmp_path):
    rng = random.Random(3)
    seq_x = "".join(rng.choice("ACGT") for _ in range(100))
    (tmp_path / "seqs.fa").write_text(f">s1\n{seq_x}\n>s2\n{seq_x}\n")
    (tmp_path / "alns.cig").write_text(
        f"cigar: s2 0 {len(seq_x)} + s1 0 {len(seq_x)} + 0 M {len(seq_x)}\n")
    common = ["--sequences", str(tmp_path / "seqs.fa"),
              "--alignments", str(tmp_path / "alns.cig"),
              "--outputModel", str(tmp_path / "m.hmm"),
              "--checkpoint_dir", str(tmp_path / "ckpt")]
    assert em_main(common + ["--iterations", "1"]) == 0
    assert em_main(common + ["--iterations", "2", "--resume"]) == 0
    assert os.path.exists(tmp_path / "ckpt" / "ckpt_00000001.npz")


def _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread):
    from tests.test_signal_cli import _guide_cigar
    return _guide_cigar(tmp_path, zymo_reference_seq, zymo_npread)


@pytest.mark.slow
def test_signal_align_batch_cli(tmp_path, zymo_reference_seq, zymo_npread):
    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    reads = tmp_path / "reads"
    reads.mkdir()
    # the guide's query name keys the read file
    qname = guide.split()[1]
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    (tmp_path / "guides.cig").write_text(guide + "\n")
    out = tmp_path / "out"
    rc = signal_align_batch_main(
        ["-d", str(reads), "-r", REF, "-o", str(out),
         "-smt", "threeState", "--guides", str(tmp_path / "guides.cig")])
    assert rc == 0
    tsvs = [f for f in os.listdir(out) if f.endswith(".tsv")]
    assert tsvs
    rows = (out / tsvs[0]).read_text().splitlines()
    assert len(rows) > 100


@pytest.mark.slow
def test_train_models_cli(tmp_path, zymo_reference_seq, zymo_npread):
    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    reads = tmp_path / "reads"
    reads.mkdir()
    qname = guide.split()[1]
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    (tmp_path / "guides.cig").write_text(guide + "\n")
    out = tmp_path / "out"
    rc = train_models_main(
        ["-d", str(reads), "-r", REF, "-o", str(out), "-i", "2",
         "-T", TMODEL, "-C", CMODEL,
         "--guides", str(tmp_path / "guides.cig"),
         "--checkpoint_dir", str(out / "ckpt")])
    assert rc == 0
    assert (out / "template_trained.hmm").exists()
    assert (out / "ckpt" / "ckpt_00000001.npz").exists()


@pytest.mark.slow
def test_run_batch_fast_pallas(tmp_path, zymo_reference_seq, zymo_npread):
    """Batched Pallas signalAlign pipeline vs the per-read CLI path on the
    Zymo read: same tsv schema, near-identical pair decisions."""
    from cpecan_tpu.pipeline.signal_align_batch import run_batch, \
        run_batch_fast

    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    qname = guide.split()[1]
    reads = tmp_path / "reads"
    reads.mkdir()
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    pairs = [(str(reads / f"{qname}.npRead"), guide)]

    fast_out = tmp_path / "fast"
    results = run_batch_fast(REF, pairs, str(fast_out),
                             template_model_file=TMODEL,
                             complement_model_file=CMODEL,
                             log=lambda m: None)
    assert len(results) == 1 and results[0][1]
    fast_rows = (fast_out / f"{qname}.tsv").read_text().splitlines()
    assert len(fast_rows) > 1000  # both strands
    assert all(len(r.split("\t")) == 15 for r in fast_rows[:50])

    scan_out = tmp_path / "scan"
    run_batch(REF, pairs, str(scan_out), sm_type="threeState", banded=True,
              log=lambda m: None)
    scan_rows = (scan_out / f"{qname}.tsv").read_text().splitlines()

    def pair_set(rows):
        return {(r.split("\t")[1], r.split("\t")[4], r.split("\t")[5])
                for r in rows}
    fast_set = pair_set(fast_rows)
    scan_set = pair_set(scan_rows)
    inter = len(fast_set & scan_set)
    assert inter >= 0.98 * len(scan_set), (len(fast_set), len(scan_set),
                                           inter)


def test_run_batch_fast_vanilla(tmp_path, zymo_reference_seq, zymo_npread):
    """run_batch_fast with the vanilla machine (the reference's default
    vanillaAlign model) vs the scan run_batch on the Zymo read.  The
    vanilla machine is more sensitive to exact-total vs windowed-
    traceback-total differences than strawman (its own goldens are 999
    banded vs 953 unbanded), so the decision-overlap bar sits a little
    below the strawman test's 0.98."""
    from cpecan_tpu.pipeline.signal_align_batch import run_batch, \
        run_batch_fast

    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    qname = guide.split()[1]
    reads = tmp_path / "reads"
    reads.mkdir()
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    pairs = [(str(reads / f"{qname}.npRead"), guide)]

    fast_out = tmp_path / "fastv"
    results = run_batch_fast(REF, pairs, str(fast_out),
                             template_model_file=TMODEL,
                             complement_model_file=CMODEL,
                             log=lambda m: None, sm_type="vanilla")
    assert len(results) == 1 and results[0][1]
    fast_rows = (fast_out / f"{qname}.tsv").read_text().splitlines()
    assert len(fast_rows) > 1000
    assert all(len(r.split("\t")) == 15 for r in fast_rows[:50])

    scan_out = tmp_path / "scanv"
    run_batch(REF, pairs, str(scan_out), sm_type="vanilla", banded=True,
              log=lambda m: None)
    scan_rows = (scan_out / f"{qname}.tsv").read_text().splitlines()

    def pair_set(rows):
        return {(r.split("\t")[1], r.split("\t")[4], r.split("\t")[5])
                for r in rows}
    fast_set = pair_set(fast_rows)
    scan_set = pair_set(scan_rows)
    inter = len(fast_set & scan_set)
    assert inter >= 0.96 * len(scan_set), (len(fast_set), len(scan_set),
                                           inter)


@pytest.mark.slow  # vanilla variant covers the fast tier
def test_run_batch_fast_four_state(tmp_path, zymo_reference_seq,
                                   zymo_npread):
    """run_batch_fast with the fourState machine vs the scan run_batch on
    the Zymo read (the reference drives all four vanillaAlign machines
    through its batch pipeline, scripts/nanoporeLib.py:824-835)."""
    from cpecan_tpu.pipeline.signal_align_batch import run_batch, \
        run_batch_fast

    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    qname = guide.split()[1]
    reads = tmp_path / "reads"
    reads.mkdir()
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    pairs = [(str(reads / f"{qname}.npRead"), guide)]

    fast_out = tmp_path / "fast4"
    results = run_batch_fast(REF, pairs, str(fast_out),
                             template_model_file=TMODEL,
                             complement_model_file=CMODEL,
                             log=lambda m: None, sm_type="fourState")
    assert len(results) == 1 and results[0][1]
    fast_rows = (fast_out / f"{qname}.tsv").read_text().splitlines()
    assert len(fast_rows) > 1000
    assert all(len(r.split("\t")) == 15 for r in fast_rows[:50])

    scan_out = tmp_path / "scan4"
    run_batch(REF, pairs, str(scan_out), sm_type="fourState", banded=True,
              log=lambda m: None)
    scan_rows = (scan_out / f"{qname}.tsv").read_text().splitlines()

    def pair_set(rows):
        return {(r.split("\t")[1], r.split("\t")[4], r.split("\t")[5])
                for r in rows}
    fast_set = pair_set(fast_rows)
    scan_set = pair_set(scan_rows)
    inter = len(fast_set & scan_set)
    assert inter >= 0.96 * len(scan_set), (len(fast_set), len(scan_set),
                                           inter)


@pytest.mark.slow  # engine-echelon comparator is the costly part
def test_run_batch_fast_echelon(tmp_path, zymo_reference_seq, zymo_npread):
    """run_batch_fast with the echelon machine vs the scan run_batch on
    the Zymo read — the last of the four vanillaAlign machines through
    the one fast driver (vanillaAlign.c:550-601).  Echelon's multi-state
    posteriors expand to (x+n, y) pairs host-side; per-read scaling
    covers the match model and the skip bins on device."""
    from cpecan_tpu.pipeline.signal_align_batch import run_batch, \
        run_batch_fast

    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    qname = guide.split()[1]
    reads = tmp_path / "reads"
    reads.mkdir()
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    pairs = [(str(reads / f"{qname}.npRead"), guide)]

    fast_out = tmp_path / "faste"
    results = run_batch_fast(REF, pairs, str(fast_out),
                             template_model_file=TMODEL,
                             complement_model_file=CMODEL,
                             log=lambda m: None, sm_type="echelon",
                             threshold=0.15)
    assert len(results) == 1 and results[0][1]
    fast_rows = (fast_out / f"{qname}.tsv").read_text().splitlines()
    assert len(fast_rows) > 1000
    assert all(len(r.split("\t")) == 15 for r in fast_rows[:50])

    scan_out = tmp_path / "scane"
    run_batch(REF, pairs, str(scan_out), sm_type="echelon", banded=True,
              threshold=0.15, log=lambda m: None)
    scan_rows = (scan_out / f"{qname}.tsv").read_text().splitlines()

    def pair_set(rows):
        return {(r.split("\t")[1], r.split("\t")[4], r.split("\t")[5])
                for r in rows}
    fast_set = pair_set(fast_rows)
    scan_set = pair_set(scan_rows)
    inter = len(fast_set & scan_set)
    assert inter >= 0.96 * len(scan_set), (len(fast_set), len(scan_set),
                                           inter)


def test_run_batch_fast_poisoned_read_isolated(tmp_path, zymo_reference_seq,
                                               zymo_npread, monkeypatch):
    """A read that blows up mid-drain (kernel/extraction/tsv stage) is
    isolated by the chunk retry: the batch completes, the poisoned read is
    reported failed, the other reads' tsvs are written
    (scripts/signalAlign.py:52-58 semantics at the fast-path chunk
    level)."""
    from cpecan_tpu.cli import signal_align as sa
    from cpecan_tpu.pipeline.signal_align_batch import run_batch_fast

    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    gf = guide.split()
    reads = tmp_path / "reads"
    reads.mkdir()
    pairs = []
    for label in ("good_a", "poison", "good_b"):
        dst = reads / f"{label}.npRead"
        shutil.copy(NPREAD, dst)
        pairs.append((str(dst), " ".join([gf[0], label] + gf[2:])))

    real_write = sa.write_posterior_probs

    def bomb(fh, read_label, *a, **k):
        if read_label == "poison":
            raise RuntimeError("injected tsv failure")
        return real_write(fh, read_label, *a, **k)

    monkeypatch.setattr(sa, "write_posterior_probs", bomb)
    out_dir = tmp_path / "fastp"
    results = run_batch_fast(REF, pairs, str(out_dir),
                             template_model_file=TMODEL,
                             complement_model_file=CMODEL,
                             log=lambda m: None)
    by_label = {r[0]: r for r in results}
    assert by_label["good_a"][1] and by_label["good_b"][1]
    assert not by_label["poison"][1]
    assert "injected tsv failure" in by_label["poison"][2]
    assert (out_dir / "good_a.tsv").exists()
    assert (out_dir / "good_b.tsv").exists()


def test_run_batch_fast_unknown_rejected():
    from cpecan_tpu.pipeline.signal_align_batch import run_batch_fast
    with pytest.raises(ValueError, match="sm_type"):
        run_batch_fast(REF, [], "/tmp/x", template_model_file=TMODEL,
                       complement_model_file=CMODEL, sm_type="sixState")


@pytest.mark.slow
def test_run_batch_fast_mesh(tmp_path, zymo_reference_seq, zymo_npread):
    """run_batch_fast(mesh=...) end-to-end on the Zymo read: the sharded
    pipeline must produce the same tsv pair rows as the single-device
    fast path (mesh pair parity is exact, tests/test_mesh_pallas.py)."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    from cpecan_tpu.pipeline.signal_align_batch import run_batch_fast

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))

    guide = _zymo_guides(tmp_path, zymo_reference_seq, zymo_npread)
    qname = guide.split()[1]
    reads = tmp_path / "reads"
    reads.mkdir()
    shutil.copy(NPREAD, reads / f"{qname}.npRead")
    pairs = [(str(reads / f"{qname}.npRead"), guide)]

    out1 = tmp_path / "single"
    res1 = run_batch_fast(REF, pairs, str(out1),
                          template_model_file=TMODEL,
                          complement_model_file=CMODEL,
                          log=lambda m: None)
    out2 = tmp_path / "mesh"
    res2 = run_batch_fast(REF, pairs, str(out2),
                          template_model_file=TMODEL,
                          complement_model_file=CMODEL,
                          log=lambda m: None, mesh=mesh)
    assert len(res1) == len(res2) == 1 and res1[0][1] and res2[0][1]
    rows1 = (out1 / f"{qname}.tsv").read_text().splitlines()
    rows2 = (out2 / f"{qname}.tsv").read_text().splitlines()
    assert set(rows1) == set(rows2)
    assert len(rows1) > 1000
