"""HDP tests: NIG MLE local max (tests/hdpTests.c:40-69), metric axioms
(:110-237), serialization round trips, and Gibbs sampling on real fixture
data."""

import math
import os
from cpecan_tpu.fixtures import fixture_path

import numpy as np
import pytest

from cpecan_tpu.hdp.hdp import HierarchicalDirichletProcess
from cpecan_tpu.hdp.math_utils import mle_normal_inverse_gamma_params
from cpecan_tpu.hdp.nanopore_hdp import (NanoporeHDP, flat_hdp_model_2,
                                         kmer_id, multiset_number,
                                         word_id_to_multiset_id)

FIXTURE_DIR = os.path.dirname(fixture_path("test_hdp/data.txt"))


def _norm_gamma_joint_log_likelihood(mus, taus, mu_0, nu, alpha, beta):
    # tests/hdpTests.c:13-36
    ll = 0.0
    for mu, tau in zip(mus, taus):
        ll += (0.5 * math.log(nu) + alpha * math.log(beta)
               + (alpha - 0.5) * math.log(tau)
               - beta * tau - 0.5 * nu * tau * (mu - mu_0) ** 2
               - math.lgamma(alpha) - 0.5 * math.log(2.0 * math.pi))
    return ll


def test_mle_params_local_max():
    mus = [-20.1, 2.8, -11.7, -39.3, -0.4]
    taus = [0.01, 0.005, 0.0023, 0.013, 0.008]
    mu_0, nu, alpha, beta = mle_normal_inverse_gamma_params(mus, taus)
    best = _norm_gamma_joint_log_likelihood(mus, taus, mu_0, nu, alpha, beta)
    for i in range(-2, 3):
        for j in range(-2, 3):
            for k in range(-2, 3):
                for l in range(-2, 3):
                    cand = _norm_gamma_joint_log_likelihood(
                        mus, taus, 2.0 ** i * mu_0, 2.0 ** j * nu,
                        2.0 ** k * alpha, 2.0 ** l * beta)
                    assert cand <= best + 1e-7


def test_kmer_indexing():
    # tests/nanoporeHdpTests.c:21-103
    assert kmer_id("AAAAAA", "ACGT", 6) == 0
    assert kmer_id("AAAAAC", "ACGT", 6) == 1
    assert kmer_id("TTTTTT", "ACGT", 6) == 4 ** 6 - 1
    assert multiset_number(4, 6) == 84
    # multiset ids cover [0, 84) exactly for 6-mers over ACGT
    ids = {word_id_to_multiset_id(k, 4, 6) for k in range(4 ** 6)}
    assert ids == set(range(84))


@pytest.fixture(scope="module")
def sampled_hdp():
    data = np.loadtxt(os.path.join(FIXTURE_DIR, "data.txt"))
    dp_ids = np.loadtxt(os.path.join(FIXTURE_DIR, "dps.txt"), dtype=np.int64)
    # subsample for test speed (the C test uses all 50k)
    keep = slice(0, 4000)
    data, dp_ids = data[keep], dp_ids[keep]
    # structure from tests/hdpTests.c:118-137: 8 leaves, 2 middles, 1 root
    hdp = HierarchicalDirichletProcess(
        11, 3, gamma=[5.0, 5.0, 5.0], grid_start=-10.0, grid_stop=10.0,
        grid_length=250, mu=0.0, nu=1.0, alpha=2.0, beta=10.0, seed=42)
    for leaf in range(4):
        hdp.set_dir_proc_parent(leaf, 8)
    for leaf in range(4, 8):
        hdp.set_dir_proc_parent(leaf, 9)
    hdp.set_dir_proc_parent(8, 10)
    hdp.set_dir_proc_parent(9, 10)
    hdp.finalize_structure()
    hdp.pass_data(data, dp_ids)
    hdp.execute_gibbs_sampling(num_samples=30, burn_in=2000, thinning=50)
    hdp.finalize_distributions()
    return hdp


@pytest.mark.slow
def test_distr_metric_axioms(sampled_hdp):
    hdp = sampled_hdp
    n = hdp.num_dps
    for name, true_metric in (("kl_divergence", False),
                              ("hellinger_distance", True),
                              ("l2_distance", True),
                              ("shannon_jensen_distance", True)):
        memo = hdp.metric_memo(name)
        for i in range(n):
            assert abs(memo(i, i)) < 1e-9
            for j in range(i):
                d = memo(i, j)
                assert d >= 0.0
                assert abs(memo(j, i) - d) < 1e-9
        if true_metric:
            for i in range(n - 2):
                for j in range(i + 1, n - 1):
                    for k in range(j + 1, n):
                        assert memo(i, j) + memo(j, k) >= memo(i, k) - 1e-4


@pytest.mark.slow
def test_densities_integrate_to_one(sampled_hdp):
    hdp = sampled_hdp
    grid = np.linspace(-12, 12, 1000)
    for dp_id in range(hdp.num_dps):
        dens = hdp.dir_proc_density_vec(grid, dp_id)
        total = np.trapezoid(dens, grid)
        assert 0.9 < total < 1.1, (dp_id, total)


@pytest.mark.slow
def test_hdp_serialization_roundtrip(sampled_hdp, tmp_path):
    hdp = sampled_hdp
    path = str(tmp_path / "hdp.json")
    hdp.serialize(path)
    hdp2 = HierarchicalDirichletProcess.deserialize(path)
    x = np.linspace(-5, 5, 20)
    for dp_id in (0, 5, 8, 10):
        d1 = hdp.dir_proc_density_vec(x, dp_id)
        d2 = hdp2.dir_proc_density_vec(x, dp_id)
        np.testing.assert_allclose(d1, d2, rtol=1e-10)
    # the deserialized sampler can continue sampling
    hdp2.splines_finalized = False
    for dp in hdp2.dps:
        if dp.observed:
            dp.posterior_predictive = dp.posterior_predictive * hdp2.samples_taken
    hdp2.execute_gibbs_sampling(num_samples=hdp2.samples_taken + 2,
                                burn_in=0, thinning=50)


def test_nhdp_build_and_sample(template_model, tmp_path):
    model_path = fixture_path("template_median68pA.model")
    nhdp = flat_hdp_model_2("ACGT", 6, 1.0, 1.0, 1.0, 1.0,
                            30.0, 90.0, 100, model_path)
    assert nhdp.hdp.num_dps == 4 ** 6 + 1
    # feed a tiny synthetic alignment: a few kmers with gaussian signals
    rng = np.random.default_rng(0)
    kmers = ["AAAAAA", "ACGTAC", "TTTTTT"] * 40
    signals = np.concatenate([rng.normal(m, 1.0, 40)
                              for m in (55.0, 65.0, 75.0)])
    order = np.argsort(rng.random(120))
    kmers = [kmers[i] for i in range(120)]
    nhdp.update_from_assignments(kmers, signals)
    nhdp.execute_gibbs_sampling(num_samples=10, burn_in=100, thinning=20)
    nhdp.finalize_distributions()
    d_mid = nhdp.kmer_density(55.0, "AAAAAA")
    d_far = nhdp.kmer_density(90.0, "AAAAAA")
    assert d_mid > d_far >= 0.0
    grid, tables, slopes = nhdp.density_tables()
    assert tables.shape == (4 ** 6, 100)


def test_hdp_state_machine_alignment(template_model):
    """HDP-emission alignment end to end: train a small flat NHDP on
    synthetic signals, then align a read with StateMachine3Hdp."""
    import jax.numpy as jnp
    from cpecan_tpu.align import AlignmentParams, \
        get_aligned_pairs_without_banding
    from cpecan_tpu.models.state_machines import StateMachine3Hdp
    from cpecan_tpu.models.kmers import seq_to_kmer_indices

    model_path = fixture_path("template_median68pA.model")
    nhdp = flat_hdp_model_2("ACGT", 6, 1.0, 1.0, 1.0, 1.0,
                            30.0, 110.0, 120, model_path)
    rng = np.random.default_rng(1)
    ref = "".join(rng.choice(list("ACGT"), 40))
    l_x = 40 - 5
    kidx = seq_to_kmer_indices(ref)
    mm = template_model.match_model
    # train the HDP on signals drawn near each ref kmer's model level
    kmers_train = []
    signals = []
    for p in range(l_x):
        for _ in range(6):
            kmers_train.append(ref[p:p + 6])
            signals.append(mm[kidx[p], 0] + rng.normal(0, 1.0))
    nhdp.update_from_assignments(kmers_train, signals)
    nhdp.execute_gibbs_sampling(num_samples=8, burn_in=200, thinning=40)
    nhdp.finalize_distributions()

    # a clean read along the reference
    events = np.zeros((l_x, 3))
    for i in range(l_x):
        events[i, 0] = mm[kidx[i], 0] + rng.normal(0, 0.5)
        events[i, 1] = 1.0
        events[i, 2] = 0.01
    sm = StateMachine3Hdp(nhdp)
    pairs = get_aligned_pairs_without_banding(
        sm, ref, events, l_x, l_x, AlignmentParams(threshold=0.2))
    got = {(x, y) for _, x, y in pairs}
    diag_hits = sum(1 for x, y in got if x == y)
    assert diag_hits >= l_x * 0.7, (diag_hits, l_x)


def test_hdp_hmm_roundtrip(tmp_path):
    from cpecan_tpu.models.hmm import HdpHmm
    hmm = HdpHmm(threshold=0.1)
    hmm.transitions[:] = np.arange(9).reshape(3, 3) + 1.0
    hmm.kmer_gap_probs[:10] = 0.5
    hmm.add_assignment("ACGTAC", 63.2)
    hmm.add_assignment("TTTGCA", 55.1)
    path = tmp_path / "hdp.hmm"
    with open(path, "w") as fh:
        hmm.write(fh)
    hmm2 = HdpHmm.load(str(path))
    np.testing.assert_allclose(hmm2.transitions, hmm.transitions)
    assert hmm2.kmer_assignments == ["ACGTAC", "TTTGCA"]
    assert hmm2.event_assignments == pytest.approx([63.2, 55.1])
    assert hmm2.threshold == pytest.approx(0.1)


def test_assignment_collection_from_pairs(template_model):
    """collect_assignments_from_pairs (fast path) harvests the same
    (kmer, event) assignments as the engine-tensor collector."""
    import jax.numpy as jnp
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.models.hmm import HdpHmm
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
    from cpecan_tpu.ops.band import _plan_from_windows, make_band
    from cpecan_tpu.ops.engine import (backward_pass, extract_aligned_pairs,
                                       forward_pass, make_control)

    rng = np.random.default_rng(9)
    ref = "".join(rng.choice(list("ACGT"), 50))
    l_x = 50 - 5
    kidx = seq_to_kmer_indices(ref)
    mm = template_model.match_model
    events = np.zeros((l_x, 3))
    for i in range(l_x):
        events[i, 0] = mm[kidx[i], 0] + rng.normal(0, 0.6)
        events[i, 1] = 1.0
        events[i, 2] = 0.01
    sm = StateMachine3SignalStrawman(template_model)
    params = AlignmentParams(threshold=0.01)
    band = make_band([], l_x, l_x, params.diagonal_expansion)
    n = band.n_diag
    plan = _plan_from_windows([(0, n, n)], False, n)
    plan.refresh[:] = False
    plan.refresh[0] = True
    ctrl = make_control(band, plan)
    problem = sm.build(ref, events, ((band.max_width + 7) // 8) * 8,
                       dtype=jnp.float64)
    all_fwd = forward_pass(problem, ctrl, problem.feats)
    out = backward_pass(problem, ctrl, problem.feats, all_fwd)

    h1 = HdpHmm(threshold=0.2)
    h1.collect_assignments(out["posteriors"], out["step_d"],
                           out["step_base"], ref, events, n)
    h2 = HdpHmm(threshold=0.2)
    pairs = extract_aligned_pairs(out, params.threshold)
    h2.collect_assignments_from_pairs(pairs, ref, events)
    assert h1.number_of_assignments > 0
    a1 = sorted(zip(h1.kmer_assignments, h1.event_assignments))
    a2 = sorted(zip(h2.kmer_assignments, h2.event_assignments))
    assert a1 == a2


def test_k_means_and_init_factors():
    """k_means (impl/hdp.c:1154-1251) + k_means_init_factors (:1287-1435):
    hierarchical k-means factor banks replace the single-chain init; the
    python Gibbs sampler continues from them."""
    from cpecan_tpu.hdp.hdp import (HierarchicalDirichletProcess, k_means)

    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal(0, 0.3, 50), rng.normal(10, 0.3, 50)])
    a, c = k_means(2, data, 100, 3, np.random.default_rng(1))
    assert len(set(a[:50].tolist())) == 1
    assert len(set(a[50:].tolist())) == 1
    assert a[0] != a[-1]
    assert sorted(np.round(np.sort(c)).tolist()) == [0.0, 10.0]

    hdp = HierarchicalDirichletProcess(
        5, 2, gamma=[2.0, 2.0], grid_start=-5.0, grid_stop=15.0,
        grid_length=50, mu=5.0, nu=1.0, alpha=2.0, beta=5.0, seed=3)
    for leaf in range(4):
        hdp.set_dir_proc_parent(leaf, 4)
    hdp.finalize_structure()
    dp_ids = (np.arange(len(data)) % 4).tolist()
    hdp.pass_data(data, dp_ids)
    hdp.k_means_init_factors()

    # every data point hangs under a middle factor that chains to a base
    # factor; counts are consistent
    assert hdp.base_dp.factors
    n_data_factors = 0
    for dp in hdp.dps:
        if not dp.observed or dp.children:
            continue
        for f in dp.factors:
            for child in f.children:
                assert child.data_pt_idx is not None
                n_data_factors += 1
            assert f.parent in hdp.base_dp.factors
    assert n_data_factors == len(data)
    # multiple clusters were actually created at the leaf level
    assert any(len(dp.factors) > 1 for dp in hdp.dps if dp.observed)

    hdp.execute_gibbs_sampling(num_samples=3, burn_in=20, thinning=5,
                               backend="python")
    hdp.finalize_distributions()
    d0 = hdp.dir_proc_density(0.0, 0)
    d5 = hdp.dir_proc_density(5.0, 0)
    assert np.isfinite(d0) and d0 >= 0.0 and np.isfinite(d5)
