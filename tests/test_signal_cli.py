"""vanillaAlign-equivalent CLI end-to-end test on the Zymo fixture."""

import io
import subprocess

import numpy as np
import pytest

from cpecan_tpu.cli.signal_align import main as signal_main
from cpecan_tpu.ops.blast import LASTZ_ARGS, find_lastz
from cpecan_tpu.fixtures import fixture_path

REF = fixture_path("ZymoRef.txt")
NPREAD = fixture_path("ZymoC_ch_1_file1.npRead")
TMODEL = fixture_path("template_median68pA.model")
CMODEL = fixture_path("complement_median68pA_pop2.model")


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


def test_native_tsv_formatter_byte_identity(zymo_npread):
    """native/tsv_format.cc vs the CPython %-format block: identical bytes,
    including exact-decimal rounding ties (dtoa is round-half-even on the
    exact binary value), -0.0, subnormals, inf/nan, huge magnitudes, and
    % characters in labels."""
    import cpecan_tpu.cli.signal_align as sa
    from cpecan_tpu.constants import COMPLEMENT, PAIR_ALIGNMENT_PROB_1
    from cpecan_tpu.constants import TEMPLATE
    from cpecan_tpu.io.poremodel import load_pore_model, scale_model

    if sa._native_tsv() is None:
        pytest.skip("no C++ toolchain for the native formatter")
    npr = zymo_npread
    model = load_pore_model(TMODEL)
    npp = npr.template_params
    scaled = scale_model(model, npp.scale, npp.shift, npp.var, npp.scale_sd,
                         npp.var_sd)
    ref_seq = open(REF).readline().strip()
    target = ref_seq[:900]

    def run(native, events, strand, forward, label, contig, ap):
        real = sa._native_tsv
        if not native:
            sa._native_tsv = lambda: None
        try:
            fh = io.StringIO()
            sa.write_posterior_probs(
                fh, label, scaled.match_model, npp.scale, npp.shift, events,
                target, forward, contig, 3, 7, ap, strand)
        finally:
            sa._native_tsv = real
        return fh.getvalue()

    rng = np.random.default_rng(0)
    n = 400
    x = np.sort(rng.integers(1, 800, n))
    y = np.sort(rng.integers(1, len(npr.template_events) - 4, n))
    ap = np.stack([rng.integers(1, PAIR_ALIGNMENT_PROB_1, n), x, y], axis=1)
    adversarial = npr.template_events.copy()
    adversarial[:, 0] = rng.choice(
        [0.0078125, -0.0, 0.0234375, 1e13, -1e13, np.inf, -np.inf, np.nan,
         5e-324, 1.5, 2.5, -5e-7, 123456789.0078125, 8.999999e12],
        size=len(adversarial))
    cases = [
        (npr.template_events, TEMPLATE, True, "lbl", "zymo"),
        (npr.template_events, COMPLEMENT, True, "read_1", "zymo"),
        (npr.template_events, TEMPLATE, False, "r%s%d", "100%ctg"),
        (adversarial, COMPLEMENT, False, "adv", "zymo"),
    ]
    for events, strand, forward, label, contig in cases:
        a = run(True, events, strand, forward, label, contig, ap)
        b = run(False, events, strand, forward, label, contig, ap)
        assert a == b
        assert len(a.splitlines()) == n
