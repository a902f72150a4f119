"""Band geometry parity (mirrors tests/pairwiseAlignerTest.c test_diagonal
and test_bands, :22-137)."""

import numpy as np

from cpecan_tpu.ops.band import band_construct, diagonal_width, full_band, make_band


def test_diagonal_math():
    # test_diagonal (tests/pairwiseAlignerTest.c:22-60): xay=5, xmyL=-3, xmyR=5
    xay, xmy_l, xmy_r = 5, -3, 5
    assert diagonal_width(xmy_l, xmy_r) == 5
    assert (xay + xmy_r) // 2 == 5
    assert (xay - xmy_r) // 2 == 0
    assert (xay + xmy_l) // 2 == 1
    assert (xay - xmy_l) // 2 == 4


def test_bands_reference_case():
    """test_bands (tests/pairwiseAlignerTest.c:74-137): anchors
    (1,0),(2,1),(3,3) on lX=6, lY=5, expansion=2."""
    anchors = [(1, 0), (2, 1), (3, 3)]
    xmy_l, xmy_r = band_construct(anchors, 6, 5, 2)
    # expected diagonals from the reference test
    expected = [
        (0, 0, 0),
        (1, -1, 1),
        (2, -2, 2),
        (3, -1, 3),
        (4, -2, 4),
        (5, -1, 3),
        (6, -2, 4),
        (7, -3, 3),
        (8, -2, 2),
        (9, -1, 3),
        (10, 0, 2),
        (11, 1, 1),
    ]
    for xay, lo, hi in expected:
        assert xmy_l[xay] == lo, (xay, xmy_l[xay], lo)
        assert xmy_r[xay] == hi, (xay, xmy_r[xay], hi)


def test_full_band_covers_matrix():
    band = full_band(4, 6)
    assert band.n_diag == 10
    # diagonal d spans all cells x in [max(0, d-lY), min(d, lX)]
    for d in range(11):
        x_min = max(0, d - 6)
        x_max = min(d, 4)
        assert band.x_lo[d] == x_min
        assert band.x_lo[d] + band.width[d] - 1 == x_max


def test_band_x_layout_consistency():
    rng = np.random.default_rng(2)
    for _ in range(20):
        l_x = int(rng.integers(5, 60))
        l_y = int(rng.integers(5, 60))
        anchors = []
        x = y = -1
        while True:
            x += int(rng.integers(1, 8))
            y += int(rng.integers(1, 8))
            if x >= l_x or y >= l_y:
                break
            anchors.append((x, y))
        band = make_band(anchors, l_x, l_y, 4)
        assert band.width.min() >= 1
        for d in range(band.n_diag + 1):
            x_lo = band.x_lo[d]
            x_hi = x_lo + band.width[d] - 1
            assert 0 <= x_lo <= x_hi
            assert x_hi <= min(d, l_x)
            assert d - x_lo <= l_y


def test_vectorized_band_construct_matches_loop():
    from cpecan_tpu.ops.band import _band_construct_loop
    rng = np.random.default_rng(11)
    for trial in range(40):
        l_x = int(rng.integers(1, 120))
        l_y = int(rng.integers(1, 120))
        n_anchor = int(rng.integers(0, min(l_x, l_y)))
        xs = np.sort(rng.choice(l_x, n_anchor, replace=False))
        ys = np.sort(rng.choice(l_y, n_anchor, replace=False))
        anchors = list(zip(xs.tolist(), ys.tolist()))
        exp = int(rng.integers(0, 11)) * 2
        want = _band_construct_loop(anchors, l_x, l_y, exp)
        got = band_construct(anchors, l_x, l_y, exp)
        np.testing.assert_array_equal(got[0], want[0], err_msg=str(trial))
        np.testing.assert_array_equal(got[1], want[1], err_msg=str(trial))


def test_batched_make_bands_matches_make_band():
    from cpecan_tpu.ops.band import make_bands
    rng = np.random.default_rng(13)
    cases = []
    for _ in range(60):
        l_x = int(rng.integers(1, 200))
        l_y = int(rng.integers(1, 200))
        n_anchor = int(rng.integers(0, min(l_x, l_y)))
        xs = np.sort(rng.choice(l_x, n_anchor, replace=False))
        ys = np.sort(rng.choice(l_y, n_anchor, replace=False))
        cases.append((list(zip(xs.tolist(), ys.tolist())), l_x, l_y))
    cases.append(([], 0, 7))   # zero-length edges
    cases.append(([], 5, 0))
    for exp in (0, 2, 20):
        got = make_bands([c[0] for c in cases], [c[1] for c in cases],
                         [c[2] for c in cases], exp)
        for (a, l_x, l_y), bb in zip(cases, got):
            want = make_band(a, l_x, l_y, exp)
            assert (want.l_x, want.l_y) == (bb.l_x, bb.l_y)
            for f in ("xmy_l", "xmy_r", "x_lo", "width"):
                np.testing.assert_array_equal(
                    getattr(bb, f), getattr(want, f),
                    err_msg=f"{f} exp={exp} lx={l_x} ly={l_y}")


def test_batched_make_bands_rejects_bad_anchors():
    from cpecan_tpu.ops.band import make_bands
    import pytest
    with pytest.raises(ValueError):
        make_bands([[(5, 5), (4, 8)]], [20], [20], 2)  # non-monotone x
    with pytest.raises(ValueError):
        make_bands([[(5, 25)]], [20], [20], 2)         # y out of range
