"""Tests for statistics/quantile/interpolate utilities.

Cases modelled on the behavioural spec in reference tests/test_util.py and
tests/test_interpolate.py (hand-computed expectations, NaN propagation,
invalid-argument sweeps).
"""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestCalcStatistic:
    def test_mean(self):
        assert gridpp.calc_statistic([2, 4, 6], gridpp.Mean) == 4

    def test_mean_with_nan(self):
        assert gridpp.calc_statistic([2, np.nan, 6], gridpp.Mean) == 4

    def test_all_nan(self):
        assert np.isnan(gridpp.calc_statistic([np.nan, np.nan], gridpp.Mean))

    def test_empty(self):
        assert np.isnan(gridpp.calc_statistic([], gridpp.Mean))

    def test_sum(self):
        assert gridpp.calc_statistic([2, 4, 6], gridpp.Sum) == 12

    def test_count(self):
        assert gridpp.calc_statistic([2, np.nan, 6], gridpp.Count) == 2

    def test_min_max(self):
        assert gridpp.calc_statistic([3, 1, 2], gridpp.Min) == 1
        assert gridpp.calc_statistic([3, 1, 2], gridpp.Max) == 3

    def test_median(self):
        assert gridpp.calc_statistic([1, 2, 3, 4], gridpp.Median) == 2.5

    def test_variance_std(self):
        x = [1.0, 2.0, 3.0, 4.0]
        assert gridpp.calc_statistic(x, gridpp.Variance) == pytest.approx(1.25)
        assert gridpp.calc_statistic(x, gridpp.Std) == pytest.approx(np.sqrt(1.25))

    def test_variance_stability(self):
        # Large mean, small variance: the K-shift must keep this stable
        x = np.array([1e7, 1e7 + 1, 1e7 + 2], dtype=np.float32)
        assert gridpp.calc_statistic(x, gridpp.Variance) == pytest.approx(
            2.0 / 3, rel=1e-3)

    def test_2d(self):
        out = gridpp.calc_statistic([[2, 4], [6, 8]], gridpp.Mean)
        np.testing.assert_array_almost_equal(out, [3, 7])

    def test_random_choice(self):
        out = gridpp.calc_statistic([5, np.nan, 5], gridpp.RandomChoice)
        assert out == 5


class TestCalcQuantile:
    def test_basic(self):
        x = [1.0, 2.0, 3.0, 4.0, 5.0]
        assert gridpp.calc_quantile(x, 0) == 1
        assert gridpp.calc_quantile(x, 1) == 5
        assert gridpp.calc_quantile(x, 0.5) == 3
        assert gridpp.calc_quantile(x, 0.25) == 2

    def test_interpolated(self):
        assert gridpp.calc_quantile([1.0, 2.0], 0.5) == 1.5
        assert gridpp.calc_quantile([0.0, 10.0], 0.3) == pytest.approx(3.0)

    def test_with_nan(self):
        assert gridpp.calc_quantile([1, np.nan, 3], 0.5) == 2

    def test_invalid_quantile(self):
        with pytest.raises(ValueError):
            gridpp.calc_quantile([1, 2, 3], 1.5)
        with pytest.raises(ValueError):
            gridpp.calc_quantile([1, 2, 3], -0.5)

    def test_nan_quantile(self):
        assert np.isnan(gridpp.calc_quantile([1, 2, 3], np.nan))

    def test_2d(self):
        out = gridpp.calc_quantile([[1, 2, 3], [4, 5, 6]], 0.5)
        np.testing.assert_array_almost_equal(out, [2, 5])

    def test_3d_varying(self):
        array = np.zeros([2, 2, 3], np.float32)
        array[0, 0] = [1, 2, 3]
        array[0, 1] = [4, 5, 6]
        array[1, 0] = [7, 8, 9]
        array[1, 1] = [10, 11, 12]
        q = np.array([[0, 0.5], [1, 0.5]], np.float32)
        out = gridpp.calc_quantile(array, q)
        np.testing.assert_array_almost_equal(out, [[1, 5], [9, 11]])


class TestInterpolate:
    def test_basic(self):
        assert gridpp.interpolate(1.5, [1, 2], [10, 20]) == 15

    def test_outside(self):
        assert gridpp.interpolate(0, [1, 2], [10, 20]) == 10
        assert gridpp.interpolate(3, [1, 2], [10, 20]) == 20

    def test_exact(self):
        assert gridpp.interpolate(2, [1, 2, 3], [10, 20, 30]) == 20

    def test_flat_interior(self):
        # Repeated x in the middle: average of the interval endpoints
        assert gridpp.interpolate(2, [1, 2, 2, 3], [10, 20, 30, 40]) == 25

    def test_flat_at_lower_edge(self):
        # Flat interval touching only the lower boundary: use interior value
        assert gridpp.interpolate(1, [1, 1, 2], [10, 20, 30]) == 20

    def test_flat_at_upper_edge(self):
        assert gridpp.interpolate(2, [1, 2, 2], [10, 20, 30]) == 20

    def test_flat_entire(self):
        assert gridpp.interpolate(1, [1, 1], [10, 20]) == 15

    def test_vectorized(self):
        out = gridpp.interpolate([0.5, 1.5, 2.5], [1, 2], [10, 20])
        np.testing.assert_array_almost_equal(out, [10, 15, 20])

    def test_nan_x(self):
        assert np.isnan(gridpp.interpolate(np.nan, [1, 2], [10, 20]))

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            gridpp.interpolate(1, [1, 2], [10])


class TestLowerUpperIndex:
    def test_basic(self):
        values = [1.0, 2.0, 3.0]
        assert gridpp.get_lower_index(2.5, values) == 1
        assert gridpp.get_upper_index(2.5, values) == 2
        assert gridpp.get_lower_index(2.0, values) == 1
        assert gridpp.get_upper_index(2.0, values) == 1

    def test_repeated(self):
        values = [1.0, 2.0, 2.0, 3.0]
        assert gridpp.get_lower_index(2.0, values) == 1
        assert gridpp.get_upper_index(2.0, values) == 2


class TestCalcEvenQuantiles:
    def test_more_than_data(self):
        out = gridpp.calc_even_quantiles([1, 2, 3], 5)
        np.testing.assert_array_almost_equal(out, [1, 2, 3])

    def test_num_2(self):
        out = gridpp.calc_even_quantiles([1, 2, 3, 4, 5, 6], 2)
        np.testing.assert_array_almost_equal(out, [1, 6])

    def test_repeated_low(self):
        out = gridpp.calc_even_quantiles([0, 0, 0, 0, 0, 1, 2, 3, 4, 5], 3)
        assert out[0] == 0
        assert 1 in out

    def test_empty(self):
        assert len(gridpp.calc_even_quantiles([], 3)) == 0
        assert len(gridpp.calc_even_quantiles([1, 2], 0)) == 0


class TestMisc:
    def test_num_missing_values(self):
        assert gridpp.num_missing_values([[1, np.nan], [np.nan, 4]]) == 2

    def test_init_vec(self):
        v = gridpp.init_vec2(2, 3, 1.5)
        assert v.shape == (2, 3)
        assert v[0, 0] == 1.5
        v = gridpp.init_vec2(2, 3)
        assert np.all(np.isnan(v))
        iv = gridpp.init_ivec3(2, 3, 4, 7)
        assert iv.shape == (2, 3, 4)
        assert iv[1, 2, 3] == 7

    def test_is_valid(self):
        assert gridpp.is_valid(1.0)
        assert not gridpp.is_valid(np.nan)
        assert not gridpp.is_valid(np.inf)

    def test_convert_coordinates(self):
        s, x, y, z = gridpp.convert_coordinates(90, 0, gridpp.Geodetic)
        assert s
        assert abs(z - 6.378137e6) < 1
        assert abs(x) < 1
        s, x, y, z = gridpp.convert_coordinates(5, 7, gridpp.Cartesian)
        assert x == 7 and y == 5 and z == 0

    def test_point_in_rectangle(self):
        A = gridpp.Point(0, 0)
        B = gridpp.Point(0, 1)
        C = gridpp.Point(1, 1)
        D = gridpp.Point(1, 0)
        assert gridpp.point_in_rectangle(A, B, C, D, gridpp.Point(0.5, 0.5))
        assert not gridpp.point_in_rectangle(A, B, C, D, gridpp.Point(2, 2))
