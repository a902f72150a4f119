"""Emission-pdf unit tests against brute-force formulas — ports of the
reference's pdf ladder (tests/signalPairwiseTest.c:20-158: standardNormal,
normal, inverseGaussian, getLogGaussPdfMatchProb, bivariateGaussPdf,
twoDistributionPdf, poissonPosteriorProb)."""

import math

import numpy as np

from cpecan_tpu.models.emissions import (log_bivariate_gauss_pdf,
                                         log_gauss_pdf, log_inv_gauss_pdf,
                                         poisson_posterior_prob)
from cpecan_tpu.models.kmers import kmer_index
from cpecan_tpu.fixtures import fixture_path


def _normal_pdf(x, mu, sigma):
    return (1.0 / (sigma * math.sqrt(2.0 * math.pi))
            * math.exp(-((x - mu) ** 2) / (2.0 * sigma * sigma)))


def _inverse_gaussian_pdf(x, mu, lam):
    return (math.sqrt(lam / (2.0 * math.pi * x ** 3))
            * math.exp(-lam * (x - mu) ** 2 / (2.0 * mu * mu * x)))


def test_log_gauss_pdf_matches_brute_force():
    """test_getLogGaussPdfMatchProb (signalPairwiseTest.c:116-134)."""
    # standard normal at 0
    assert float(log_gauss_pdf(0.0, 0.0, 1.0)) == \
        __import__("pytest").approx(math.log(_normal_pdf(0.0, 0.0, 1.0)),
                                    abs=1e-3)
    # against the real template model's AAAAAA row
    from cpecan_tpu.io.poremodel import load_pore_model
    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    k = kmer_index("AAAAAA")
    mu, sd = model.match_model[k, 0], model.match_model[k, 1]
    got = float(log_gauss_pdf(62.784241, mu, sd))
    assert got == __import__("pytest").approx(
        math.log(_normal_pdf(62.784241, mu, sd)), abs=1e-3)


def test_log_inv_gauss_pdf_matches_brute_force():
    """test_inverseGaussianPdf ladder (signalPairwiseTest.c:30-44)."""
    for x, mu, lam in ((0.664989, 0.8, 1.7), (1.2, 0.9, 3.0)):
        got = float(log_inv_gauss_pdf(x, mu, lam))
        want = math.log(_inverse_gaussian_pdf(x, mu, lam))
        assert abs(got - want) < 1e-6
    # guards: non-positive inputs go to log-zero
    assert float(log_inv_gauss_pdf(-1.0, 0.8, 1.7)) < -1e300 / 2
    assert float(log_inv_gauss_pdf(0.5, 0.0, 1.7)) < -1e300 / 2


def test_two_distribution_pdf():
    """test_twoDistributionPdf (signalPairwiseTest.c:82-98): the vanilla
    match prob is gauss(level) + invGauss(noise) of the kmer's model row."""
    from cpecan_tpu.io.poremodel import (LEVEL_MEAN, LEVEL_SD, NOISE_LAMBDA,
                                         NOISE_MEAN, load_pore_model)
    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    k = kmer_index("AAAAAA")
    row = model.match_model[k]
    level, noise = 62.784241, 0.664989
    got = (float(log_gauss_pdf(level, row[LEVEL_MEAN], row[LEVEL_SD]))
           + float(log_inv_gauss_pdf(noise, row[NOISE_MEAN],
                                     row[NOISE_LAMBDA])))
    want = (math.log(_normal_pdf(level, row[LEVEL_MEAN], row[LEVEL_SD]))
            + math.log(_inverse_gaussian_pdf(noise, row[NOISE_MEAN],
                                             row[NOISE_LAMBDA])))
    assert abs(got - want) < 1e-3


def test_bivariate_gauss_pdf():
    """test_bivariateGaussPdfMatchProb (signalPairwiseTest.c:136-158):
    with correlation 0 the bivariate pdf factors into the product of the
    marginals."""
    level, noise = 62.784241, 0.664989
    mu_l, sd_l, mu_n, sd_n = 62.0, 0.8, 0.7, 0.05
    got = float(log_bivariate_gauss_pdf(level, noise, mu_l, sd_l,
                                        mu_n, sd_n, 0.0))
    want = (math.log(_normal_pdf(level, mu_l, sd_l))
            + math.log(_normal_pdf(noise, mu_n, sd_n)))
    assert abs(got - want) < 1e-9
    # nonzero correlation shifts the density
    got_c = float(log_bivariate_gauss_pdf(level, noise, mu_l, sd_l,
                                          mu_n, sd_n, 0.3))
    assert got_c != got


def test_poisson_posterior_prob_ordering():
    """test_poissonPosteriorProb (signalPairwiseTest.c:100-114): for the
    fixture event duration, dur_1 is the mode and probabilities fall off
    monotonically for n >= 1."""
    duration = np.asarray(0.00332005312085)
    probs = [float(poisson_posterior_prob(n, duration)) for n in range(6)]
    assert probs[0] < probs[1]
    assert probs[1] > probs[2] > probs[3] > probs[4] > probs[5]
