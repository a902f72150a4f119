"""Analysis/post-processing tests (process_posteriors, summarize_alignments,
duration_analysis, kmerIndex equivalents)."""

import io
import os

import numpy as np
import pytest

from cpecan_tpu.analysis import (collect_event_durations,
                                 compare_alignment_sets, process_posteriors,
                                 verify_kmer_ranks)


def _tsv_row(ref_pos, strand, event_idx, prob, contig="ref", kmer="ACGTAC"):
    # the 15-column posterior tsv written by cli.signal_align
    return (f"{contig}\t{ref_pos}\t{kmer}\tread1\t{strand}\t{event_idx}\t"
            f"65.2\t1.1\t0.05\t3\t64.9\t1.0\t{prob}\t60.0\t59.9\n")


def test_process_posteriors(tmp_path):
    d = tmp_path / "tsvs"
    d.mkdir()
    (d / "read1.vanilla.forward.tsv").write_text(
        _tsv_row(10, "t", 5, 0.9) + _tsv_row(11, "c", 6, 0.4))
    out = io.StringIO()
    n = process_posteriors(str(d), out=out)
    assert n == 2
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("#F/B")
    cols = lines[1].split("\t")
    assert cols[0] == "vanilla" and cols[1] == "forward"
    assert cols[2] == "10" and cols[5] == "t"
    assert float(cols[9]) == 0.9  # posterior column


def _write_set(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as fh:
        for ref_pos, strand, event_idx, prob in rows:
            fh.write(_tsv_row(ref_pos, strand, event_idx, prob))


def test_compare_alignment_sets(tmp_path):
    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    # 3 pairs in set1, 3 in set2, 2 shared -> union 4, jaccard 0.5
    _write_set(s1, "readA_strand.forward.tsv",
               [(1, "t", 1, 0.9), (2, "t", 2, 0.8), (3, "t", 3, 0.7)])
    _write_set(s2, "readA_strand.forward.tsv",
               [(1, "t", 1, 0.95), (2, "t", 2, 0.85), (9, "t", 9, 0.6)])
    report = compare_alignment_sets(s1, s2, threshold=0.01,
                                    out_path=str(tmp_path / "out"))
    assert report["total_pairs"] == 4
    assert report["intersection"] == 2
    assert report["jaccard"] == pytest.approx(0.5)
    assert report["set1_unique"] == 1
    assert report["set2_unique"] == 1
    assert report["set1_intersection_mean_posterior"] == pytest.approx(0.85)
    assert os.path.exists(
        tmp_path / "out" / "set1_intersection_posteriors.pkl")


def test_compare_threshold_filters(tmp_path):
    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    _write_set(s1, "r_strand.forward.tsv", [(1, "t", 1, 0.9),
                                            (2, "t", 2, 0.05)])
    _write_set(s2, "r_strand.forward.tsv", [(1, "t", 1, 0.9)])
    report = compare_alignment_sets(s1, s2, threshold=0.2)
    assert report["total_pairs"] == 1  # low-prob pair filtered out
    assert report["jaccard"] == 1.0


def test_collect_event_durations_npread(tmp_path):
    src = tmp_path / "reads"
    src.mkdir()
    # minimal 6-line npRead: 3-base read, 2 template + 1 complement events
    (src / "a.npRead").write_text(
        "3 2 1 1 0 1 1 1 1 0 1 1 1\n"
        "ACG\n"
        "0 0 1\n"
        "60.0 1.0 0.11 61.0 1.0 0.22\n"
        "0 0 0\n"
        "62.0 1.0 0.33\n")
    dest = tmp_path / "out"
    n = collect_event_durations([str(src)], str(dest), fraction=1.0)
    assert n == 1
    t = (dest / "template_durations.csv").read_text().splitlines()
    assert t == ["0.11,t", "0.22,t"]
    allrows = (dest / "all_durations.csv").read_text().splitlines()
    assert allrows == ["0.11,t", "0.22,t", "0.33,c"]


def test_verify_kmer_ranks():
    assert verify_kmer_ranks(3) == 64
    assert verify_kmer_ranks(6) == 4096


def test_duration_skips_unreadable(tmp_path):
    src = tmp_path / "reads"
    src.mkdir()
    (src / "bad.npRead").write_text("not a real npread\n")
    dest = tmp_path / "out"
    msgs = []
    n = collect_event_durations([str(src)], str(dest), fraction=1.0,
                                log=msgs.append)
    assert n == 0
    assert any("skipping" in m for m in msgs)


def test_legacy_emission_matrix():
    """First rows of the 2-mer match matrix vs the reference's
    code-generated constants (impl/emissionMatrix.c:23-26)."""
    from cpecan_tpu.models.emission_matrix import (M, N, S, V,
                                                   kmer_gap_probs,
                                                   kmer_match_probs,
                                                   kmer_strings)
    mat = kmer_match_probs(2)
    assert mat.shape == (25, 25)
    want_row0 = [M+M, M+V, M+S, M+V, M+N, V+M, V+V, V+S, V+V, V+N,
                 S+M, S+V, S+S, S+V, S+N, V+M, V+V, V+S, V+V, V+N,
                 N+M, N+V, N+S, N+V, N+N]
    np.testing.assert_allclose(mat[0], want_row0, rtol=1e-12)
    want_row1 = [M+V, M+M, M+V, M+S, M+N, V+V, V+M, V+V, V+S, V+N,
                 S+V, S+M, S+V, S+S, S+N, V+V, V+M, V+V, V+S, V+N,
                 N+V, N+M, N+V, N+S, N+N]
    np.testing.assert_allclose(mat[1], want_row1, rtol=1e-12)
    np.testing.assert_allclose(mat, mat.T)  # symmetric
    gaps = kmer_gap_probs(2)
    np.testing.assert_allclose(gaps, -3.2188758248682006, rtol=1e-12)
    assert kmer_strings(2)[:3] == ["AA", "AC", "AG"]
