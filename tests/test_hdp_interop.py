"""Reference text-format HDP serialization (impl/hdp.c:2876-3278,
impl/nanopore_hdp.c:828-867) and cross-HDP distribution comparisons
(impl/hdp.c:2766-2822, impl/nanopore_hdp.c:418-443)."""

import io
import os
from cpecan_tpu.fixtures import fixture_path

import numpy as np
import pytest

from cpecan_tpu.hdp.hdp import (BASE, DATA_PT, MIDDLE,
                                HierarchicalDirichletProcess,
                                compare_hdp_distrs_hellinger_distance,
                                compare_hdp_distrs_kl_divergence,
                                compare_hdp_distrs_l2_distance,
                                compare_hdp_distrs_shannon_jensen_distance)
from cpecan_tpu.hdp.text_io import (deserialize_hdp_text,
                                    deserialize_nhdp_text,
                                    serialize_hdp_text, serialize_nhdp_text)

MODEL = fixture_path("template_median68pA.model")


def _tiny_sampled_hdp(seed, sample_gamma=False):
    """4 leaves under one root, two well-separated signal clusters."""
    rng = np.random.default_rng(seed)
    data = np.concatenate([rng.normal(-2.0, 0.5, 150),
                           rng.normal(2.0, 0.5, 150)])
    dp_ids = np.concatenate([rng.integers(0, 2, 150),
                             rng.integers(2, 4, 150)])
    kwargs = dict(grid_start=-8.0, grid_stop=8.0, grid_length=120,
                  mu=0.0, nu=1.0, alpha=2.0, beta=5.0, seed=seed)
    if sample_gamma:
        hdp = HierarchicalDirichletProcess(
            5, 2, gamma_alpha=[2.0, 2.0], gamma_beta=[0.5, 0.5], **kwargs)
    else:
        hdp = HierarchicalDirichletProcess(5, 2, gamma=[4.0, 4.0], **kwargs)
    for leaf in range(4):
        hdp.set_dir_proc_parent(leaf, 4)
    hdp.finalize_structure()
    hdp.pass_data(data, dp_ids)
    # burn_in/thinning are factor iterations; one sweep here is ~450 of
    # them, so this runs ~8 sweeps before the first retained sample
    hdp.execute_gibbs_sampling(num_samples=8, burn_in=3500, thinning=100)
    hdp.finalize_distributions()
    return hdp


@pytest.mark.parametrize("sample_gamma", [False, True])
def test_hdp_text_roundtrip(sample_gamma):
    hdp = _tiny_sampled_hdp(3, sample_gamma=sample_gamma)
    buf = io.StringIO()
    serialize_hdp_text(hdp, buf)
    buf.seek(0)
    hdp2 = deserialize_hdp_text(buf)

    assert hdp2.num_dps == hdp.num_dps
    assert hdp2.depth == hdp.depth
    assert hdp2.sample_gamma == sample_gamma
    np.testing.assert_array_equal(hdp2.gamma, hdp.gamma)
    np.testing.assert_array_equal(hdp2.data, hdp.data)
    np.testing.assert_array_equal(hdp2.data_pt_dp_id, hdp.data_pt_dp_id)
    if sample_gamma:
        np.testing.assert_array_equal(hdp2.w_aux, hdp.w_aux)
        np.testing.assert_array_equal(hdp2.s_aux, hdp.s_aux)
    for dp, dp2 in zip(hdp.dps, hdp2.dps):
        assert dp2.num_factor_children == dp.num_factor_children
        assert (dp2.parent.id if dp2.parent else -1) == \
               (dp.parent.id if dp.parent else -1)
        assert len(dp2.factors) == len(dp.factors)
        by_type = lambda fs: sorted(f.factor_type for f in fs)
        assert by_type(dp2.factors) == by_type(dp.factors)
    # factor-tree shape: same number of data points under each base factor
    def leaf_count(fctr):
        if fctr.factor_type == DATA_PT:
            return 1
        return sum(leaf_count(c) for c in fctr.children)
    counts = sorted(leaf_count(f) for f in hdp.base_dp.factors)
    counts2 = sorted(leaf_count(f) for f in hdp2.base_dp.factors)
    assert counts2 == counts
    # base factor NIG params survive %.17g exactly
    params = sorted(tuple(f.params) for f in hdp.base_dp.factors)
    params2 = sorted(tuple(f.params) for f in hdp2.base_dp.factors)
    assert params2 == params
    # densities identical on and off the grid
    assert hdp2.splines_finalized
    x = np.linspace(-6.3, 6.3, 41)
    for dp_id in range(hdp.num_dps):
        np.testing.assert_allclose(hdp2.dir_proc_density_vec(x, dp_id),
                                   hdp.dir_proc_density_vec(x, dp_id),
                                   rtol=1e-12, atol=1e-15)


def test_hdp_text_unfinalized_distrs_roundtrip():
    """Mid-training state (no splines): posteriors + factors round-trip."""
    hdp = _tiny_sampled_hdp(11)
    hdp.splines_finalized = False  # pretend splines not finalized
    buf = io.StringIO()
    serialize_hdp_text(hdp, buf)
    buf.seek(0)
    hdp2 = deserialize_hdp_text(buf)
    assert not hdp2.splines_finalized
    for dp, dp2 in zip(hdp.dps, hdp2.dps):
        if dp.posterior_predictive is not None:
            np.testing.assert_array_equal(dp2.posterior_predictive,
                                          dp.posterior_predictive)


def test_cross_hdp_metric_axioms():
    """compare_hdp_distrs* on two independently-sampled HDPs
    (impl/hdp.c:2766-2822): zero on self, non-negative, symmetric when the
    master grids agree, and consistent with the within-HDP metrics."""
    a = _tiny_sampled_hdp(1)
    b = _tiny_sampled_hdp(7)
    metrics = (compare_hdp_distrs_kl_divergence,
               compare_hdp_distrs_l2_distance,
               compare_hdp_distrs_shannon_jensen_distance,
               compare_hdp_distrs_hellinger_distance)
    for m in metrics:
        # identical DP through the cross-HDP path: distance ~ 0 (hellinger
        # floors at sqrt(1 - integral(p)) ~ 0.02 because the density
        # integrates to slightly under 1 on the finite grid — a property of
        # the metric itself, impl/hdp.c:2635-2645)
        tol = 0.05 if m is compare_hdp_distrs_hellinger_distance else 1e-7
        assert abs(m(a, 0, a, 0)) < tol
        for i in range(a.num_dps):
            for j in range(b.num_dps):
                d_ab = m(a, i, b, j)
                assert d_ab >= 0.0
                # same grid on both sides -> symmetric
                assert abs(m(b, j, a, i) - d_ab) < 1e-6
    # cross-HDP metric on one HDP's own pair == the within-HDP metric
    assert abs(compare_hdp_distrs_l2_distance(a, 0, a, 2)
               - a.l2_distance(0, 2)) < 1e-9
    # different clusters are farther apart than resamples of the same one
    same = compare_hdp_distrs_l2_distance(a, 0, b, 0)
    diff = compare_hdp_distrs_l2_distance(a, 0, b, 2)
    assert diff > same


def test_cross_hdp_requires_finalized():
    a = _tiny_sampled_hdp(1)
    b = _tiny_sampled_hdp(7)
    b.splines_finalized = False
    with pytest.raises(ValueError):
        compare_hdp_distrs_kl_divergence(a, 0, b, 0)


@pytest.mark.skipif(not os.path.exists(MODEL),
                    reason="reference model unavailable")
def test_nhdp_text_roundtrip_and_compare(tmp_path):
    """serialize_nhdp/deserialize_nhdp (impl/nanopore_hdp.c:828-867) +
    kmer-keyed cross-NHDP comparison (compare_nhdp_distrs_*,
    impl/nanopore_hdp.c:418-443)."""
    from cpecan_tpu.hdp.nanopore_hdp import (
        compare_nhdp_distrs_l2_distance, flat_hdp_model)

    rng = np.random.default_rng(5)

    def build(seed):
        nhdp = flat_hdp_model("AC", 2, 4.0, 4.0, 30.0, 90.0, 100, MODEL)
        # the minION-derived NIG prior has nu ~ 77 and beta ~ 6.5e4 (the
        # preserved impl/nanopore_hdp.c:141 bug reads level means as noise,
        # so the prior factor sd is ~59 pA) — fine for real event data near
        # the model levels, but the synthetic 4-cluster data here can never
        # split under it; weaken to a vague prior so the sampler separates
        nhdp.hdp.nu = 1.0
        nhdp.hdp.two_alpha = 6.0
        nhdp.hdp.beta = 10.0
        kmers = rng.integers(0, 4, 400)
        signals = rng.normal(45.0 + 8.0 * kmers, 2.0)
        nhdp.hdp.pass_data(signals, kmers)
        nhdp.hdp.rng = np.random.default_rng(seed)
        nhdp.execute_gibbs_sampling(8, 5000, 120, backend="python")
        nhdp.finalize_distributions()
        return nhdp

    n1 = build(2)
    path = str(tmp_path / "nhdp.txt")
    serialize_nhdp_text(n1, path)
    n2 = deserialize_nhdp_text(path)
    assert n2.alphabet == n1.alphabet
    assert n2.kmer_length == n1.kmer_length
    x = np.linspace(32.0, 88.0, 30)
    for kmer in ("AA", "AC", "CA", "CC"):
        np.testing.assert_allclose(
            [n2.kmer_density(v, kmer) for v in x],
            [n1.kmer_density(v, kmer) for v in x], rtol=1e-12, atol=1e-15)
    # kmer-keyed cross-NHDP metric between the original and its round-trip
    assert abs(compare_nhdp_distrs_l2_distance(n1, "AA", n2, "AA")) < 1e-9
    assert compare_nhdp_distrs_l2_distance(n1, "AA", n2, "CC") > 0.01
