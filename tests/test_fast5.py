"""fast5 -> npRead conversion tests.

Mirrors the behavior of the reference's NanoporeRead 2D-event-map
construction (scripts/nanoporeLib.py:359-531) on synthetic HDF5 files —
the reference ships no fast5 fixture, so we build one with the same layout
(dragonet 1.15.0 addresses) and known ground-truth maps.
"""

import io

import numpy as np
import pytest

from cpecan_tpu.io.fast5 import (
    alignment_table_sequence, calculate_lambda, fast5_to_npread,
    find_kmer_overlap, transform_events, twod_event_map, write_model,
    write_npread, StrandData, TEMPLATE_SKIP_BINS)
from cpecan_tpu.io.npread import load_npread
from cpecan_tpu.io.poremodel import load_pore_model

h5py = pytest.importorskip("h5py")

K = 3  # small kmers keep the hand-built table readable


def test_find_kmer_overlap():
    assert find_kmer_overlap("ACG", "CGT") == 1   # shift by 1
    assert find_kmer_overlap("ACG", "GTT") == 2   # shift by 2
    assert find_kmer_overlap("ACG", "TTT") == 3   # no overlap


def test_alignment_table_sequence():
    # kmers walked along "ACGTA": ACG, CGT (x2 repeat), GTA
    kmers = [b"ACG", b"CGT", b"CGT", b"GTA"]
    assert alignment_table_sequence(kmers) == "ACGTA"


def test_twod_event_map_semantics():
    seq = "ACGTA"  # kmers: ACG CGT GTA
    # template gap at CGT is back-filled with GTA's event; complement gap at
    # GTA repeats CGT's event
    table = [(0, 0, b"ACG"), (-1, 1, b"CGT"), (2, -1, b"GTA")]
    t_map, c_map = twod_event_map(seq, table, K)
    assert t_map.tolist() == [0, 2, 2, 2, 2]  # gap+match backfill, tail x2
    assert c_map.tolist() == [0, 1, 1, 1, 1]  # gap repeats previous
    assert len(t_map) == len(seq)


def test_twod_event_map_missing_kmer_repeats_previous():
    seq = "ACGTA"
    # table skips the middle kmer CGT entirely
    table = [(0, 0, b"ACG"), (5, 7, b"GTA")]
    t_map, c_map = twod_event_map(seq, table, K)
    assert t_map.tolist() == [0, 0, 5, 5, 5]
    assert c_map.tolist() == [0, 0, 7, 7, 7]


def test_twod_event_map_repeat_kmer_uses_first():
    seq = "ACGCGC"  # kmers: ACG CGC GCG CGC
    table = [(0, 0, b"ACG"), (1, 1, b"CGC"), (2, 2, b"GCG"), (3, 3, b"CGC")]
    t_map, _ = twod_event_map(seq, table, K)
    # second CGC row is consumed for the second occurrence
    assert t_map.tolist() == [0, 1, 2, 3, 3, 3]


def test_transform_events_drift():
    ev = np.array([[10.0, 2.0, 1.0, 0.1],
                   [10.0, 4.0, 1.0, 0.1],
                   [10.0, 6.0, 1.0, 0.1]])
    out = transform_events(ev, drift=0.5)
    assert np.allclose(out[:, 0], [10.0, 9.0, 8.0])
    assert np.allclose(ev[:, 0], 10.0)  # input untouched


def test_write_model_roundtrip(tmp_path):
    n = 8
    rng = np.random.default_rng(0)
    lm = rng.uniform(50, 80, n)
    ls = rng.uniform(0.5, 2, n)
    nm = rng.uniform(0.5, 2, n)
    ns = rng.uniform(0.05, 0.2, n)
    path = tmp_path / "m.model"
    with open(path, "w") as fh:
        write_model(fh, lm, ls, nm, ns, TEMPLATE_SKIP_BINS)
    pm = load_pore_model(path, n_kmers=n)
    assert np.allclose(pm.match_model[:, 0], lm)
    assert np.allclose(pm.match_model[:, 4], calculate_lambda(nm, ns))
    assert np.allclose(pm.gap_y_model[:, 1], ls * 1.75)  # scaled line 3
    assert np.allclose(pm.skip_bins, TEMPLATE_SKIP_BINS)


def _events_dtype():
    return np.dtype([("mean", "<f8"), ("start", "<f8"), ("stdv", "<f8"),
                     ("length", "<f8")])


def _model_dtype():
    return np.dtype([("kmer", "S3"), ("level_mean", "<f8"),
                     ("level_stdv", "<f8"), ("sd_mean", "<f8"),
                     ("sd_stdv", "<f8"), ("weight", "<f8")])


def _make_fast5(path, seq="ACGTACG", n_events=6, drift=0.1,
                template_model_file="custom_template.model",
                complement_model_file="complement_median68pA_pop2.model"):
    """Synthetic dragonet-1.15.0 2D fast5 with a gapless alignment table."""
    rng = np.random.default_rng(1)
    kmers = [seq[i:i + K].encode() for i in range(len(seq) - K + 1)]
    aln_dtype = np.dtype([("template", "<i8"), ("complement", "<i8"),
                          ("kmer", "S3")])
    table = np.array([(i, i, k) for i, k in enumerate(kmers)],
                     dtype=aln_dtype)

    events = np.zeros(n_events, dtype=_events_dtype())
    events["mean"] = rng.uniform(50, 80, n_events)
    events["start"] = np.arange(n_events, dtype=np.float64)
    events["stdv"] = rng.uniform(0.5, 2, n_events)
    events["length"] = 0.05

    model = np.zeros(4 ** K, dtype=_model_dtype())
    model["level_mean"] = rng.uniform(50, 80, 4 ** K)
    model["level_stdv"] = rng.uniform(0.5, 2, 4 ** K)
    model["sd_mean"] = rng.uniform(0.5, 2, 4 ** K)
    model["sd_stdv"] = rng.uniform(0.05, 0.2, 4 ** K)

    with h5py.File(path, "w") as f5:
        g2d = f5.create_group("Analyses/Basecall_2D_000")
        g2d.attrs["dragonet version"] = "1.15.0"
        f5.create_dataset(
            "Analyses/Basecall_2D_000/BaseCalled_2D/Alignment", data=table)
        f5["Analyses/Basecall_2D_000/BaseCalled_2D/Fastq"] = \
            f"@read1 2d\n{seq}\n+\n{'!' * len(seq)}\n"
        for strand, model_file in (("template", template_model_file),
                                   ("complement", complement_model_file)):
            f5.create_dataset(
                f"Analyses/Basecall_2D_000/BaseCalled_{strand}/Events",
                data=events)
            m = f5.create_dataset(
                f"Analyses/Basecall_2D_000/BaseCalled_{strand}/Model",
                data=model)
            m.attrs.update({"scale": 1.1, "shift": 2.5, "drift": drift,
                            "var": 1.0, "scale_sd": 1.0, "var_sd": 1.0})
            s = f5.create_group(
                f"Analyses/Basecall_2D_000/Summary/basecall_1d_{strand}")
            s.attrs["model_file"] = f"/models/{model_file}"
    return seq, events, model


def test_fast5_to_npread_end_to_end(tmp_path):
    f5_path = tmp_path / "read.fast5"
    seq, events, model = _make_fast5(f5_path)
    npread_path = tmp_path / "read.npRead"
    fasta_path = tmp_path / "read.fa"
    t_model_path = tmp_path / "t.model"

    ok, t_out, c_out = fast5_to_npread(
        str(f5_path), str(npread_path), twod_fasta_path=str(fasta_path),
        template_model_path=str(t_model_path), log=lambda m: None)
    assert ok
    assert t_out == str(t_model_path)  # non-default template model exported
    assert c_out is None               # default complement model skipped

    npr = load_npread(npread_path)
    assert npr.read_length == len(seq)
    assert npr.twod_read == seq
    assert npr.n_template_events == len(events)
    assert npr.template_params.scale == 1.1
    assert npr.template_params.shift == 2.5
    # event map covers every base and the complement map is reversed
    assert npr.template_event_map.shape == (len(seq),)
    t_map, c_map = npr.template_event_map, npr.complement_event_map
    assert t_map.tolist() == [0, 1, 2, 3, 4, 4, 4]
    assert c_map.tolist() == t_map.tolist()[::-1]
    # drift correction applied: mean_i = raw_i - start_i * drift
    assert np.allclose(npr.template_events[:, 0],
                       events["mean"] - events["start"] * 0.1)

    pm = load_pore_model(t_model_path, n_kmers=4 ** K)
    assert np.allclose(pm.match_model[:, 0], model["level_mean"])

    fasta = fasta_path.read_text()
    assert seq in fasta


def test_fast5_cli(tmp_path):
    from cpecan_tpu.cli.fast5_to_npread import main
    f5_path = tmp_path / "read.fast5"
    _make_fast5(f5_path)
    npread_path = tmp_path / "read.npRead"
    assert main([str(f5_path), str(npread_path),
                 "--template-model", str(tmp_path / "t.model")]) == 0
    assert load_npread(npread_path).read_length == 7


def test_write_npread_reverses_complement_map(tmp_path):
    ev = np.array([[60.0, 0.0, 1.0, 0.05], [61.0, 1.0, 1.0, 0.05]])
    t = StrandData(events=ev, event_map=np.array([0, 1, 1]),
                   scale=1.0, shift=0.0, drift=0.0, var=1.0, scale_sd=1.0,
                   var_sd=1.0, model_id="m", model_table=None)
    c = StrandData(events=ev, event_map=np.array([1, 0, 0]),
                   scale=1.0, shift=0.0, drift=0.0, var=1.0, scale_sd=1.0,
                   var_sd=1.0, model_id="m", model_table=None)
    buf = io.StringIO()
    write_npread(buf, "ACG", t, c)
    lines = buf.getvalue().splitlines()
    assert lines[2].split() == ["0", "1", "1"]
    assert lines[4].split() == ["0", "0", "1"]  # reversed


def test_strand_event_map():
    from cpecan_tpu.io.fast5 import strand_event_map
    moves = [0, 1, 0, 2, 1, 0]
    probs = [0.5, 0.5, 0.9, 0.5, 0.5, 0.1]
    m = strand_event_map(moves, probs, kmer_length=3)
    # event 2 (move 0, higher prob) replaces event 1's mapping; move 2
    # back-fills one position with the previous event
    assert m.tolist() == [0, 2, 2, 3, 4, 4, 4]
