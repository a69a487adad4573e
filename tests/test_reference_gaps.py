"""Cases from the reference suite that the round-1 port left out.

Each class mirrors specific reference tests (file:test named in the
docstring) so TEST_MAP.md's per-file claims hold case-by-case.
"""
import numpy as np
import pytest

import gridpp_tpu as gridpp


def _values5():
    v = np.reshape(np.arange(25), [5, 5]).astype(float)
    v[1, 3] = np.nan
    v[2, 4] = np.nan
    return v


class TestQuantileFastGaps:
    """test_neighbourhood_quantile_fast.py cases."""

    def test_single_threshold(self):
        field = np.reshape(np.arange(9), [3, 3])
        for halfwidth in [0, 1, 2]:
            out = gridpp.neighbourhood_quantile_fast(field, 0.9, halfwidth,
                                                     [0])
            np.testing.assert_array_equal(out, np.zeros([3, 3]))

    def test_two_thresholds(self):
        field = np.reshape(np.arange(9), [3, 3])
        out = gridpp.neighbourhood_quantile_fast(field, 0.9, 0, [0, 1])
        assert ((out >= 0) & (out <= 1)).all()

    def test_missing(self):
        empty = np.zeros([5, 5])
        empty[0:3, 0:3] = np.nan
        out = gridpp.neighbourhood_quantile_fast(empty, 0.5, 1, [0, 1])
        assert np.isnan(out[0:2, 0:2]).all()

    def test_quantile_golden(self):
        values = _values5()
        thresholds = gridpp.get_neighbourhood_thresholds(values, 100)
        out = gridpp.neighbourhood_quantile_fast(values, 0.5, 1, thresholds)
        assert out[2][2] == 12
        assert out[2][3] == 12.5
        out = gridpp.neighbourhood_quantile_fast(
            np.full([100, 100], np.nan), 0.5, 1, thresholds)
        assert np.isnan(out).all()
        out = gridpp.neighbourhood_quantile_fast(np.zeros([100, 100]), 0.5,
                                                 1, thresholds)
        assert (out == 0).all()
        out = gridpp.neighbourhood_quantile(values, 0.5, 1)
        assert out[2][2] == 12.5
        assert out[2][3] == 13
        assert out[0][4] == 4

    def test_varying_quantile(self):
        values = np.array([[0, 1], [2, 3], [4, 5]], dtype=float)
        quantiles = np.ones(values.shape) * 0.5
        thresholds = [0, 0.25, 0.5, 0.75, 1]
        gridpp.neighbourhood_quantile_fast(values, quantiles, 1, thresholds)
        values = np.nan * np.zeros(values.shape)
        np.testing.assert_array_equal(
            values, gridpp.neighbourhood_quantile_fast(values, quantiles,
                                                       1, thresholds))

    def test_varying_quantile_3d(self):
        rng = np.random.default_rng(1000)
        values = rng.random((100, 50, 2))
        quantiles = np.ones(values[:, :, 0].shape) * 0.5
        thresholds = [0, 0.25, 0.5, 0.75, 1]
        gridpp.neighbourhood_quantile_fast(values, quantiles, 1, thresholds)
        values = np.nan * np.zeros(values.shape)
        np.testing.assert_array_equal(
            values[:, :, 0],
            gridpp.neighbourhood_quantile_fast(values, quantiles, 1,
                                               thresholds))

    def test_all_same(self):
        field = np.zeros([10, 10])
        thresholds = [0, 0.1, 0.2, 0.5, 1, 2, 5, 10, 20, 50, 100]
        for quantile in [0, 0.001, 0.999, 1]:
            out = gridpp.neighbourhood_quantile_fast(field, quantile, 5,
                                                     thresholds)
            np.testing.assert_array_almost_equal(out, field)


class TestBilinearGaps:
    """test_bilinear.py vertical_parallel and weird cases."""

    def test_vertical_parallel(self):
        values = np.array([[0, 1], [2, 3]], dtype=np.float32)
        lons = [[-10, -11], [-9, -10]]
        lats = [[54, 55], [54, 55.1]]
        grid = gridpp.Grid(lats, lons)
        out = gridpp.bilinear(grid, gridpp.Points([55], [-10]), values)
        assert np.isfinite(out[0])
        # Trygveasp's Ireland example
        lons = np.transpose([[-10.2027884, -9.97075176],
                             [-10.2363253, -10.0035467]])
        lats = np.transpose([[54.8651619, 54.884182],
                             [54.9986267, 55.0177078]])
        grid = gridpp.Grid(lats, lons)
        out = gridpp.bilinear(grid, gridpp.Points([55], [-10]), values)
        assert np.isfinite(out[0])

    def test_weird(self):
        x = np.reshape([-117.3010559, -116.8340607, -117.2735291,
                        -116.803299], [2, 2]).transpose()
        y = np.reshape([57.71018982, 57.69472504, 57.95975876,
                        57.94418716], [2, 2]).transpose()
        x0 = -117.299057 - x[0][0]
        y0 = 57.71475601 - y[0][0]
        x = x - x[0][0]
        y = y - y[0][0]
        values = np.reshape(np.arange(4), [2, 2]).transpose().astype(float)
        for _ in range(2):
            x = x.transpose()
            y = y.transpose()
            values = values.transpose()
            grid = gridpp.Grid(y, x)
            points = gridpp.Points([y0], [x0])
            q = gridpp.bilinear(grid, points, values)
            assert q[0] == pytest.approx(0.04017778, abs=1e-6)


class TestKDTreeGaps:
    """test_kdtree.py duplicate/radius/distance-fast cases."""

    def test_duplicate_points(self):
        tree = gridpp.KDTree([50, 50, 51], [0, 0, 10])
        idx = tree.get_neighbours(50, 0.001, 1000)
        assert len(idx) == 2 and 0 in idx and 1 in idx

    def test_duplicate_points_identical(self):
        tree = gridpp.KDTree([50, 50, 51], [0, 0, 10])
        idx = tree.get_neighbours(50, 0, 1000)
        assert len(idx) == 2 and 0 in idx and 1 in idx

    def test_radius_match(self):
        points = gridpp.Points([0, 1000, 2000], [0, 0, 0], [0, 0, 0],
                               [0, 0, 0], gridpp.Cartesian)
        np.testing.assert_array_equal(
            points.get_neighbours(900, 0, 501), [1])
        np.testing.assert_array_equal(
            points.get_neighbours(900, 0, 99.99), [])
        np.testing.assert_array_equal(points.get_neighbours(0, 0, 1000),
                                      [0])
        np.testing.assert_array_equal(points.get_neighbours(0, 0, 1001),
                                      [0, 1])
        np.testing.assert_array_equal(
            points.get_neighbours(0, 0, 1001, False), [1])

    def test_calc_distance_fast(self):
        config = [
            [60, 10, 60, 10, 10, 0],
            [90, 10, -90, 10, 10, 20037508],
            [0, 0, 0, 180, 10, 20037508],
            [60, 10, 61, 11, 400, 124080.79],
            [89, 0, 90, 0, 10, 111319.62],
            [89, 0, 90, 180, 10, 111319.62],
            [89, 0, 89.9, 180, 6000, 111319.62],
        ]
        for lat0, lon0, lat1, lon1, delta, expected in config:
            d = gridpp.KDTree.calc_distance_fast(lat0, lon0, lat1, lon1)
            assert abs(d - expected) <= delta, (lat0, lon0, lat1, lon1)


class TestUtilGaps:
    """test_util.py RandomChoice battery + num_missing_values."""

    def test_randomchoice_missing(self):
        ar = [1, np.nan, 2, 3, np.nan, np.nan]
        for _ in range(10):
            assert gridpp.calc_statistic(ar, gridpp.RandomChoice) in \
                (1, 2, 3)

    def test_randomchoice_most_missing(self):
        ar = np.nan * np.zeros(1000)
        ar[100] = 1
        assert gridpp.calc_statistic(ar, gridpp.RandomChoice) == 1

    def test_randomchoice_only_missing(self):
        assert np.isnan(gridpp.calc_statistic(np.nan * np.zeros(1000),
                                              gridpp.RandomChoice))

    def test_num_missing_values(self):
        assert gridpp.num_missing_values([[0, np.nan, 1, np.nan]]) == 2
        assert gridpp.num_missing_values([[np.nan, np.nan]]) == 2
        assert gridpp.num_missing_values([[0, 0, 1, 1]]) == 0
        assert gridpp.num_missing_values([[0, np.nan], [1, np.nan]]) == 2
        assert gridpp.num_missing_values(
            [[np.nan, np.nan], [np.nan, np.nan]]) == 4
        assert gridpp.num_missing_values([[]]) == 0

    def test_calc_statistics_2d(self):
        values = np.reshape(np.arange(9), [3, 3])
        np.testing.assert_array_almost_equal(
            gridpp.calc_statistic(values, gridpp.Mean), [1, 4, 7])
