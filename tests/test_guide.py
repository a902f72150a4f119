"""Guide-alignment utility tests (nanoporeLib parse_cigar / exonerated_bwa
/ TargetRegions equivalents)."""

import numpy as np

from cpecan_tpu.io.guide import (TargetRegions, get_proceding_kmers,
                                 make_temp_sequence, parse_cigar,
                                 sam_to_guide_cigar)


def test_parse_cigar_clipping_and_ops():
    # 5S 10M 2I 3D 4M 6S against ref pos 100 (1-based)
    qs, qe, rs, re_, ops = parse_cigar("5S10M2I3D4M6S", 100)
    assert qs == 5               # soft clip offsets query start
    assert qe == 5 + 10 + 2 + 4  # M + I consume query
    assert rs == 99              # fence-post
    assert re_ == 99 + 10 + 3 + 4
    assert ops == "M 10 I 2 D 3 M 4"


def _sam(flag=0, rname="ref1", pos=10, cigar="4S8M"):
    return ("@SQ\tSN:ref1\tLN:1000\n"
            f"read1\t{flag}\t{rname}\t{pos}\t60\t{cigar}\t*\t0\t0\t"
            "ACGTACGTACGT\t*\n")


def test_sam_to_guide_cigar_forward():
    guide, strand = sam_to_guide_cigar(_sam())
    assert strand == "+"
    assert guide == "cigar: read1 4 12 + ref1 9 17 + 1 M 8"


def test_sam_to_guide_cigar_reverse_swaps_ref_coords():
    guide, strand = sam_to_guide_cigar(_sam(flag=16))
    assert strand == "-"
    assert guide == "cigar: read1 4 12 + ref1 17 9 - 1 M 8"


def test_sam_to_guide_cigar_unmapped_and_bad_flag():
    assert sam_to_guide_cigar(_sam(flag=4, cigar="*")) == (False, False)
    assert sam_to_guide_cigar(_sam(flag=2048)) == (False, False)
    assert sam_to_guide_cigar("@HD\tVN:1.6\n") == (False, False)


def test_target_regions(tmp_path):
    tsv = tmp_path / "regions.tsv"
    np.savetxt(tsv, np.array([[100, 200], [500, 400]]), fmt="%d")
    tr = TargetRegions(str(tsv))
    assert tr.check_aligned_region(50, 250)      # contains [100,200]
    assert tr.check_aligned_region(510, 380)     # swapped + sorted row
    assert not tr.check_aligned_region(150, 180)  # only partial overlap
    guide, _ = sam_to_guide_cigar(_sam(pos=150, cigar="20M"),
                                  target_regions=tr)
    assert guide is False  # region [100,200] not contained in [149,169]


def test_make_temp_sequence(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">r1\nACGT\n>r2\nTTTT\n")
    out = tmp_path / "seq.txt"
    make_temp_sequence(str(fa), True, str(out))
    assert out.read_text() == "ACGT\n"
    make_temp_sequence(str(fa), False, str(out))
    assert out.read_text() == "ACGT\n"  # ACGT is its own revcomp


def test_get_proceding_kmers():
    assert get_proceding_kmers("ACG") == ["ACG", "CCG", "GCG", "TCG"]


def test_real_bwa_guide_roundtrip(tmp_path):
    """Run the REAL bwa path end to end (index + mem -x ont2d -> guide
    cigar), like scripts/nanoporeLib.py:202-235 does; skipped where the
    bwa binary is absent (it is runtime-gated, PARITY §2.10)."""
    import numpy as np
    import pytest
    from cpecan_tpu.io.guide import (bwa_available, exonerated_bwa,
                                     get_bwa_index)

    if not bwa_available():
        pytest.skip("bwa binary not on PATH")
    rng = np.random.default_rng(7)
    ref = "".join(rng.choice(list("ACGT"), 600))
    read = ref[100:400]
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(">ref\n" + ref + "\n")
    read_fa = tmp_path / "read.fa"
    read_fa.write_text(">r1\n" + read + "\n")
    prefix = get_bwa_index(str(ref_fa), str(tmp_path))
    cigar = exonerated_bwa(prefix, str(read_fa))
    assert cigar and cigar.startswith("cigar:")
    from cpecan_tpu.io.cigar import parse_cigar_line
    aln = parse_cigar_line(cigar)
    # bwa must find the embedded region
    assert aln.start1 >= 90 and aln.end1 <= 410
