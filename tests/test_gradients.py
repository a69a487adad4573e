"""Gradient tests ported from reference tests/test_calc_gradient.py,
test_simple_gradient.py, test_full_gradient.py (golden values)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp

lats, lons = np.meshgrid([0, 1, 2], [0, 1, 2])
elevs = np.zeros([3, 3])
elevs[0, 0] = -10
elevs[1, 1] = 10
points = gridpp.Points([-1, 0.9], [-1, 0.9], [-5, 5])
grid = gridpp.Grid(lats, lons, elevs)


class TestCalcGradient:
    def test_simple(self):
        base = np.expand_dims([0, 1, 2, 7, 15], 0)
        values = np.expand_dims([0, 1, 2, 1, 0], 0)
        gradient = gridpp.calc_gradient(base, values,
                                        gridpp.LinearRegression, 1, 0, 0,
                                        -11)
        np.testing.assert_array_almost_equal(
            gradient, [[1, 1, -0.064516, -0.151163, -1 / 8]], decimal=5)

    def test_small(self):
        base = np.expand_dims([0, 1, 2], 0)
        values = np.expand_dims([0, 1, 2], 0)
        gradient = gridpp.calc_gradient(base, values,
                                        gridpp.LinearRegression, 5, 0, 0,
                                        -11)
        np.testing.assert_array_almost_equal(gradient, [[1, 1, 1]],
                                             decimal=5)

    def test_num_min(self):
        base = np.expand_dims([0, 1, 2, 3, np.nan], 0)
        values = np.expand_dims([np.nan, 1, 2, 3, 4], 0)
        gradient = gridpp.calc_gradient(base, values,
                                        gridpp.LinearRegression, 1, 2, 0,
                                        -11)
        np.testing.assert_array_almost_equal(gradient,
                                             [[-11, 1, 1, 1, -11]],
                                             decimal=5)

    def test_invalid_arguments(self):
        base = np.zeros([3, 2])
        values = np.zeros([3, 2])
        with pytest.raises(ValueError):
            gridpp.calc_gradient(np.zeros([3, 2]), np.zeros([2, 3]),
                                 gridpp.LinearRegression, 5, 0, 0, -11)
        with pytest.raises(ValueError):
            gridpp.calc_gradient(base, values, gridpp.LinearRegression,
                                 -1, 0, 0, -11)
        with pytest.raises(ValueError):
            gridpp.calc_gradient(base, values, gridpp.LinearRegression,
                                 5, -1, 0, -11)
        with pytest.raises(ValueError):
            gridpp.calc_gradient(base, values, gridpp.LinearRegression,
                                 5, 0, -1, -11)

    def test_nan_block_runs(self):
        rng = np.random.default_rng(0)
        base = rng.random((10, 10))
        base[3:8, 3:8] = np.nan
        values = rng.random((10, 10))
        out = gridpp.calc_gradient(base, values, gridpp.LinearRegression,
                                   1, 0, 0, 1)
        assert out.shape == (10, 10)

    def test_minmax(self):
        base = np.expand_dims([0.0, 1, 2, 3, 4], 0)
        values = np.expand_dims([0.0, 2, 4, 6, 8], 0)
        out = gridpp.calc_gradient(base, values, gridpp.MinMax, 1, 0, 0, -11)
        np.testing.assert_array_almost_equal(out, [[2, 2, 2, 2, 2]])


class TestSimpleGradient:
    def test_dimension_mismatch(self):
        with pytest.raises(Exception):
            gridpp.simple_gradient(grid, points, np.zeros([3, 2]), 0)
        with pytest.raises(Exception):
            gridpp.simple_gradient(grid, grid, np.zeros([3, 2]), 0)

    def test_missing_gradient(self):
        values = np.zeros([3, 3])
        output = gridpp.simple_gradient(grid, points, values, np.nan)
        np.testing.assert_array_almost_equal(output, [np.nan, np.nan])

    def test_missing_values(self):
        values = np.zeros([3, 3])
        values[1, 1] = np.nan
        output = gridpp.simple_gradient(grid, points, values, 1)
        np.testing.assert_array_almost_equal(output, [5, np.nan])

    def test_no_grid_elev(self):
        grid0 = gridpp.Grid(lats, lons)
        values = np.reshape(np.arange(9), [3, 3])
        for gradient in [0, 1]:
            output = gridpp.simple_gradient(grid0, points, values, gradient)
            np.testing.assert_array_almost_equal(output, [np.nan, np.nan])

    def test_no_point_elev(self):
        points0 = gridpp.Points([-1, 0.9], [-1, 0.9])
        values = np.reshape(np.arange(9), [3, 3])
        for gradient in [0, 1]:
            output = gridpp.simple_gradient(grid, points0, values, gradient)
            np.testing.assert_array_almost_equal(output, [np.nan, np.nan])

    def test_basic_correction(self):
        # point 0: NN is (0,0) elev -10, point elev -5 -> diff +5
        # point 1: NN is (1,1) elev 10, point elev 5 -> diff -5
        values = np.zeros([3, 3])
        output = gridpp.simple_gradient(grid, points, values, 1)
        np.testing.assert_array_almost_equal(output, [5, -5])


class TestFullGradient:
    def test_matches_simple_for_constant_gradient(self):
        rng = np.random.default_rng(0)
        values = rng.random((3, 3)).astype(np.float32)
        eg = np.full((3, 3), 2.0, np.float32)
        out_full = gridpp.full_gradient(grid, points, values, eg)
        out_simple = gridpp.simple_gradient(grid, points, values, 2.0)
        np.testing.assert_allclose(out_full, out_simple, atol=1e-5)
