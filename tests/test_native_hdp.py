"""Native (C++/OpenMP) Gibbs sampler vs the pure-Python backend.

Parity is distributional (different RNG streams): both backends sampling
the same mixture data must produce close posterior densities, and the
native path must satisfy the same structural invariants the reference's
HDP tests assert (tests/hdpTests.c:110-236).
"""

import numpy as np
import pytest

from cpecan_tpu.hdp.hdp import HierarchicalDirichletProcess
from cpecan_tpu.hdp.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def _make_hdp(seed, sample_gamma=False):
    # 4 leaves under 2 middles under 1 root; bimodal leaf data
    kwargs = dict(grid_start=-8.0, grid_stop=8.0, grid_length=120,
                  mu=0.0, nu=1.0, alpha=2.0, beta=5.0, seed=seed)
    if sample_gamma:
        hdp = HierarchicalDirichletProcess(
            7, 3, gamma_alpha=[2.0, 2.0, 2.0], gamma_beta=[0.5, 0.5, 0.5],
            **kwargs)
    else:
        hdp = HierarchicalDirichletProcess(7, 3, gamma=[4.0, 4.0, 4.0],
                                           **kwargs)
    for leaf in range(2):
        hdp.set_dir_proc_parent(leaf, 4)
    for leaf in range(2, 4):
        hdp.set_dir_proc_parent(leaf, 5)
    hdp.set_dir_proc_parent(4, 6)
    hdp.set_dir_proc_parent(5, 6)
    hdp.finalize_structure()
    rng = np.random.default_rng(7)
    n = 400
    dp_ids = rng.integers(0, 4, n)
    centers = np.where(dp_ids < 2, -2.0, 2.0)
    data = rng.normal(centers, 0.7)
    hdp.pass_data(data, dp_ids)
    return hdp


def _density_table(hdp):
    hdp.finalize_distributions()
    x = np.linspace(-6, 6, 200)
    return np.stack([hdp.dir_proc_density_vec(x, i)
                     for i in range(hdp.num_dps)]), x


def test_native_matches_python_distributionally():
    h_native = _make_hdp(seed=1)
    h_native.execute_gibbs_sampling(40, burn_in=500, thinning=25,
                                    backend="native")
    h_python = _make_hdp(seed=2)
    h_python.execute_gibbs_sampling(40, burn_in=500, thinning=25,
                                    backend="python")
    dn, x = _density_table(h_native)
    dp, _ = _density_table(h_python)
    for i in range(dn.shape[0]):
        # densities integrate to ~1 on both backends
        assert 0.85 < np.trapezoid(dn[i], x) < 1.15
        # total-variation-style distance between backends is small
        tv = 0.5 * np.trapezoid(np.abs(dn[i] - dp[i]), x)
        assert tv < 0.25, (i, tv)
    # leaves 0/1 (centered -2) must differ from leaves 2/3 (centered +2)
    tv_across = 0.5 * np.trapezoid(np.abs(dn[0] - dn[2]), x)
    assert tv_across > 0.3


def test_native_gamma_sampling_runs():
    hdp = _make_hdp(seed=3, sample_gamma=True)
    g0 = hdp.gamma.copy()
    hdp.execute_gibbs_sampling(15, burn_in=200, thinning=20,
                               backend="native")
    assert hdp.samples_taken == 15
    assert np.all(np.isfinite(hdp.gamma)) and np.all(hdp.gamma > 0)
    assert not np.allclose(hdp.gamma, g0)  # gammas were resampled
    hdp.finalize_distributions()
    x = np.linspace(-6, 6, 100)
    d = hdp.dir_proc_density_vec(x, 0)
    assert np.all(d >= 0) and d.max() > 0.05


def test_auto_backend_prefers_native():
    hdp = _make_hdp(seed=4)
    hdp.execute_gibbs_sampling(5, burn_in=50, thinning=10, backend="auto")
    assert hdp.samples_taken == 5


def test_metric_axioms_on_native_densities():
    hdp = _make_hdp(seed=5)
    hdp.execute_gibbs_sampling(25, burn_in=300, thinning=25,
                               backend="native")
    hdp.finalize_distributions()
    for name in ("hellinger_distance", "l2_distance",
                 "shannon_jensen_distance"):
        memo = hdp.metric_memo(name)
        n = hdp.num_dps
        for i in range(n):
            assert abs(memo(i, i)) < 1e-9
            for j in range(i):
                assert memo(i, j) >= 0
                assert abs(memo(i, j) - memo(j, i)) < 1e-9
        for i in range(n - 2):
            for j in range(i + 1, n - 1):
                for k in range(j + 1, n):
                    assert memo(i, j) + memo(j, k) >= memo(i, k) - 1e-4
