"""vanillaAlign-equivalent CLI end-to-end test on the Zymo fixture."""

import io
import subprocess

import numpy as np
import pytest

from cpecan_tpu.cli.signal_align import main as signal_main
from cpecan_tpu.ops.blast import LASTZ_ARGS, find_lastz

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"


def _guide_cigar(tmp_path, zymo_reference_seq, zymo_npread):
    lastz = find_lastz()
    if lastz is None:
        pytest.skip("lastz unavailable")
    ref_fa = tmp_path / "ref.fa"
    read_fa = tmp_path / "read.fa"
    ref_fa.write_text(">ref\n" + zymo_reference_seq + "\n")
    read_fa.write_text(">read2d\n" + zymo_npread.twod_read + "\n")
    res = subprocess.run([lastz] + LASTZ_ARGS + [str(ref_fa), str(read_fa)],
                         capture_output=True, text=True, check=True)
    lines = [l for l in res.stdout.splitlines() if l.startswith("cigar:")]
    assert lines
    return lines[0]


@pytest.mark.slow
def test_signal_align_strawman_banded(tmp_path, zymo_reference_seq,
                                      zymo_npread):
    cig = _guide_cigar(tmp_path, zymo_reference_seq, zymo_npread)
    posts = tmp_path / "posteriors.tsv"
    out = io.StringIO()
    signal_main(["-s", "-b", "-q", NPREAD, "-r", REF, "-T", TMODEL,
                 "-C", CMODEL, "-u", str(posts), "-L", "zymo_read"],
                stdin=io.StringIO(cig + "\n"), stdout=out)
    summary = out.getvalue()
    assert "zymo_read" in summary
    rows = posts.read_text().splitlines()
    assert len(rows) > 500
    cols = rows[0].split("\t")
    assert len(cols) == 15
    assert cols[4] in ("t", "c")
    p = float(cols[12])
    assert 0.0 <= p <= 1.0
    # both strands present
    strands = {r.split("\t")[4] for r in rows}
    assert strands == {"t", "c"}


@pytest.mark.slow
def test_signal_align_expectations_mode(tmp_path, zymo_reference_seq,
                                        zymo_npread):
    cig = _guide_cigar(tmp_path, zymo_reference_seq, zymo_npread)
    t_exp = tmp_path / "t.expectations"
    c_exp = tmp_path / "c.expectations"
    signal_main(["-s", "-q", NPREAD, "-r", REF, "-T", TMODEL, "-C", CMODEL,
                 "-t", str(t_exp), "-c", str(c_exp)],
                stdin=io.StringIO(cig + "\n"), stdout=io.StringIO())
    from cpecan_tpu.models.hmm import ContinuousPairHmm
    t_hmm = ContinuousPairHmm.load(str(t_exp))
    c_hmm = ContinuousPairHmm.load(str(c_exp))
    assert t_hmm.transitions.sum() > 0
    assert c_hmm.transitions.sum() > 0
    assert np.isfinite(t_hmm.likelihood) and t_hmm.likelihood < 0
