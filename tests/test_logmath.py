"""logAdd parity tests (mirrors tests/pairwiseAlignerTest.c:139-158)."""

import math

import numpy as np

from cpecan_tpu.constants import LOG_ZERO
from cpecan_tpu.logmath import log_add, log_add_exact


def _c_lookup(x):
    assert 0.0 <= x <= 7.5
    if x <= 1.00:
        return ((-0.009350833524763 * x + 0.130659527668286) * x + 0.498799810682272) * x + 0.693203116424741
    if x <= 2.50:
        return ((-0.014532321752540 * x + 0.139942324101744) * x + 0.495635523139337) * x + 0.692140569840976
    if x <= 4.50:
        return ((-0.004605031767994 * x + 0.063427417320019) * x + 0.695956496475118) * x + 0.514272634594009
    return ((-0.000458661602210 * x + 0.009695946122598) * x + 0.930734667215156) * x + 0.168037164329057


def _c_log_add(x, y):
    if x < y:
        return y if (x == LOG_ZERO or y - x >= 7.5) else _c_lookup(y - x) + x
    return x if (y == LOG_ZERO or x - y >= 7.5) else _c_lookup(x - y) + y


def test_log_add_matches_c_reference():
    rng = np.random.default_rng(0)
    xs = rng.uniform(-50, 10, size=2000)
    ys = xs + rng.uniform(-20, 20, size=2000)
    got = np.asarray(log_add(xs, ys))
    want = np.array([_c_log_add(x, y) for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(got, want)


def test_log_add_accuracy():
    # the reference asserts exp(logAdd(log i, log j)) ~ i + j within 1e-3
    # over i, j uniform in (0, 1) (test_logAdd, tests/pairwiseAlignerTest.c:139-149)
    rng = np.random.default_rng(1)
    for _ in range(1000):
        i = rng.random()
        j = rng.random()
        got = math.exp(float(log_add(math.log(i), math.log(j))))
        assert abs(got - (i + j)) < 1e-3


def test_log_add_infinities():
    assert float(log_add(LOG_ZERO, LOG_ZERO)) == LOG_ZERO
    assert float(log_add(LOG_ZERO, 1.5)) == 1.5
    assert float(log_add(2.5, LOG_ZERO)) == 2.5
    assert float(log_add_exact(LOG_ZERO, LOG_ZERO)) == LOG_ZERO
