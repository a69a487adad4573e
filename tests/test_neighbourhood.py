"""Neighbourhood statistics tests.

The 5x5 grid with NaNs and the expectations are the behavioural spec from
reference tests/test_neighbourhood.py (hand-computed values).
"""
import numpy as np
import pytest

import gridpp_tpu as gridpp

"""
20 21 22 23 24
15 16 17 18 19
10 11 12 13 nan
5  6  7  nan  9
0  1  2  3  4
"""
values = np.reshape(range(25), [5, 5]).astype(float)
values[1, 3] = np.nan
values[2, 4] = np.nan

BOTH = [gridpp.neighbourhood, gridpp.neighbourhood_brute_force]


class TestInvalidArguments:
    def test_negative_halfwidth(self):
        for func in BOTH:
            with pytest.raises(ValueError):
                func(np.ones([5, 5]), -1, gridpp.Mean)

    def test_quantile_statistic(self):
        with pytest.raises(Exception):
            gridpp.neighbourhood(np.ones([5, 5]), 1, gridpp.Quantile)


class TestEmpty:
    def test_empty(self):
        for statistic in [gridpp.Mean, gridpp.Min, gridpp.Max, gridpp.Median,
                          gridpp.Std, gridpp.Variance]:
            for func in BOTH:
                output = func([[]], 1, statistic)
                assert output.ndim == 2 and output.size == 0


class TestMissing:
    def test_missing(self):
        empty = np.zeros([5, 5])
        empty[0:3, 0:3] = np.nan
        for func in BOTH:
            for statistic in [gridpp.Mean, gridpp.Min, gridpp.Max,
                              gridpp.Median, gridpp.Std, gridpp.Variance,
                              gridpp.RandomChoice]:
                output = func(empty, 1, statistic)
                assert np.isnan(np.array(output)[0:2, 0:2]).all()
            output = func(empty, 1, gridpp.Count)
            np.testing.assert_array_almost_equal(
                output, [[0, 0, 2, 4, 4], [0, 0, 3, 6, 6], [2, 3, 5, 7, 6],
                         [4, 6, 7, 8, 6], [4, 6, 6, 6, 4]])


class TestStatistics:
    def test_mean(self):
        for func in BOTH:
            output = func(values, 1, gridpp.Mean)
            assert output[2][2] == 12.5
            assert output[0][4] == pytest.approx(5.3333, abs=1e-4)
            output = func(values, 100, gridpp.Mean)
            assert (np.abs(np.array(output) - 12.086956) < 0.0001).all()
            output = np.array(func(values, 0, gridpp.Mean)).flatten()
            idx = np.where(np.isnan(output) == 0)[0]
            assert (np.isnan(output) == np.isnan(values.flatten())).all()
            assert (output[idx] == values.flatten()[idx]).all()

    def test_count(self):
        for func in BOTH:
            output = func(values, 1, gridpp.Count)
            assert output[2][2] == 8
            assert output[0][4] == 3
            output = func(values, 100, gridpp.Count)
            assert (np.abs(np.array(output) - 23) < 0.0001).all()
            output = np.array(func(values, 0, gridpp.Count))
            np.testing.assert_array_almost_equal(
                output, [[1, 1, 1, 1, 1], [1, 1, 1, 0, 1], [1, 1, 1, 1, 0],
                         [1, 1, 1, 1, 1], [1, 1, 1, 1, 1]])

    def test_min(self):
        for func in BOTH:
            output = func(values, 1, gridpp.Min)
            assert output[2][2] == 6
            assert output[0][4] == 3
            output = func(values, 100, gridpp.Min)
            assert (np.array(output) == 0).all()

    def test_max(self):
        for func in BOTH:
            output = func(values, 1, gridpp.Max)
            assert output[2][2] == 18
            assert output[0][4] == 9
            output = func(values, 100, gridpp.Max)
            assert (np.array(output) == 24).all()

    def test_std_variance(self):
        x = np.random.default_rng(7).random((20, 20)).astype(np.float32)
        fast_var = gridpp.neighbourhood(x, 2, gridpp.Variance)
        fast_std = gridpp.neighbourhood(x, 2, gridpp.Std)
        np.testing.assert_allclose(fast_std, np.sqrt(fast_var), atol=1e-5)

    def test_median(self):
        out = gridpp.neighbourhood(values, 1, gridpp.Median)
        assert out[2][2] == 12.5


class TestRandomChoice:
    def test_random_choice(self):
        vals = np.reshape([0, np.nan, 2, 3], [2, 2])
        output = gridpp.neighbourhood(vals, 0, gridpp.RandomChoice)
        np.testing.assert_array_almost_equal(output, vals)
        output = gridpp.neighbourhood(vals, 1, gridpp.RandomChoice)
        for i in range(2):
            for j in range(2):
                assert output[i, j] in [0, 2, 3]

    def test_random_choice_only_missing(self):
        vals = np.nan * np.zeros([10, 10])
        output = gridpp.neighbourhood(vals, 3, gridpp.RandomChoice)
        assert np.isnan(output).all()


class TestConsistency:
    def test_fast_vs_brute(self):
        rng = np.random.default_rng(1000)
        x = rng.random((40, 50)).astype(np.float32)
        x[rng.random((40, 50)) < 0.2] = np.nan
        for h in [0, 1, 3, 7]:
            for stat in [gridpp.Mean, gridpp.Min, gridpp.Max, gridpp.Sum,
                         gridpp.Count]:
                fast = gridpp.neighbourhood(x, h, stat)
                brute = gridpp.neighbourhood_brute_force(x, h, stat)
                np.testing.assert_allclose(fast, brute, rtol=1e-5, atol=1e-5)

    def test_3d(self):
        rng = np.random.default_rng(1000)
        v2 = rng.random((50, 50)).astype(np.float32)
        v3 = np.repeat(v2[:, :, None], 5, axis=2)
        for halfwidth in [0, 1, 5]:
            for func in BOTH:
                out2 = func(v2, halfwidth, gridpp.Mean)
                out3 = func(v3, halfwidth, gridpp.Mean)
                np.testing.assert_array_almost_equal(out2, out3, 5)

    def test_overflow(self):
        n = int(1e3)
        vals = np.array(np.arange(1, n) ** 3, dtype=np.float64)
        vals = np.expand_dims(vals, 1)
        output = gridpp.neighbourhood(vals, 0, gridpp.Mean)
        np.testing.assert_array_almost_equal(
            np.zeros(vals.shape), output / vals - 1, 6)


class TestQuantile:
    def test_quantile(self):
        out = gridpp.neighbourhood_quantile(values, 0.5, 1)
        assert out[2][2] == 12.5
        out = gridpp.neighbourhood_quantile(values, 0, 1)
        assert out[2][2] == 6
        out = gridpp.neighbourhood_quantile(values, 1, 1)
        assert out[2][2] == 18

    def test_quantile_vs_brute_median(self):
        rng = np.random.default_rng(3)
        x = rng.random((30, 30)).astype(np.float32)
        q = gridpp.neighbourhood_quantile(x, 0.5, 2)
        m = gridpp.neighbourhood_brute_force(x, 2, gridpp.Median)
        np.testing.assert_allclose(q, m, atol=1e-6)

    def test_quantile_3d(self):
        rng = np.random.default_rng(4)
        x3 = rng.random((10, 10, 4)).astype(np.float32)
        out = gridpp.neighbourhood_quantile(x3, 0.5, 1)
        assert out.shape == (10, 10)

    def test_invalid(self):
        with pytest.raises(ValueError):
            gridpp.neighbourhood_quantile(values, 1.5, 1)
        with pytest.raises(ValueError):
            gridpp.neighbourhood_quantile(values, 0.5, -1)


class TestQuantileFast:
    def test_reference_golden(self):
        # Golden values from reference tests/test_neighbourhood_quantile_fast.py
        thresholds = gridpp.get_neighbourhood_thresholds(values, 100)
        output = np.array(
            gridpp.neighbourhood_quantile_fast(values, 0.5, 1, thresholds))
        assert output[2][2] == 12    # approximation artifact; exact is 12.5
        assert output[2][3] == 12.5  # approximation artifact; exact is 13

        output = np.array(gridpp.neighbourhood_quantile_fast(
            np.full([50, 50], np.nan), 0.5, 1, thresholds))
        assert np.isnan(output).all()

        output = np.array(gridpp.neighbourhood_quantile_fast(
            np.zeros([50, 50]), 0.5, 1, thresholds))
        assert (output == 0).all()

    def test_single_threshold(self):
        field = np.reshape(np.arange(9), [3, 3])
        for halfwidth in [0, 1, 2]:
            output = gridpp.neighbourhood_quantile_fast(
                field, 0.9, halfwidth, [0])
            np.testing.assert_array_equal(output, np.zeros([3, 3]))

    def test_nan_quantile_field(self):
        field = np.ones([5, 5])
        output = gridpp.neighbourhood_quantile_fast(field, np.nan, 1, [0, 1])
        assert np.isnan(output).all()

    def test_missing_block(self):
        empty = np.zeros([5, 5])
        empty[0:3, 0:3] = np.nan
        output = gridpp.neighbourhood_quantile_fast(empty, 0.5, 1, [0, 1])
        assert np.isnan(np.array(output)[0:2, 0:2]).all()

    def test_quantile_field(self):
        rng = np.random.default_rng(6)
        x = rng.random((10, 10)).astype(np.float32)
        qfield = np.full((10, 10), 0.5, np.float32)
        thresholds = gridpp.get_neighbourhood_thresholds(x, 10)
        out_scalar = gridpp.neighbourhood_quantile_fast(x, 0.5, 1, thresholds)
        out_field = gridpp.neighbourhood_quantile_fast(x, qfield, 1, thresholds)
        np.testing.assert_allclose(out_scalar, out_field, atol=1e-6)

    def test_ens(self):
        rng = np.random.default_rng(8)
        x3 = rng.random((10, 10, 5)).astype(np.float32)
        thresholds = gridpp.get_neighbourhood_thresholds(x3, 10)
        out = gridpp.neighbourhood_quantile_fast(x3, 0.5, 1, thresholds)
        assert out.shape == (10, 10)
        assert np.isfinite(out).all()

    def test_invalid_quantile(self):
        with pytest.raises(ValueError):
            gridpp.neighbourhood_quantile_fast(values, 1.5, 1, [1, 2])
        with pytest.raises(ValueError):
            gridpp.neighbourhood_quantile_fast(
                values, np.full((5, 5), 2.0), 1, [1, 2])
        with pytest.raises(ValueError):
            gridpp.neighbourhood_quantile_fast(
                values, np.full((3, 3), 0.5), 1, [1, 2])

    def test_empty_thresholds(self):
        out = gridpp.neighbourhood_quantile_fast(values, 0.5, 1, [])
        assert np.isnan(out).all()


class TestThresholds:
    def test_basic(self):
        out = gridpp.get_neighbourhood_thresholds(values, 5)
        assert len(out) > 0
        with pytest.raises(ValueError):
            gridpp.get_neighbourhood_thresholds(values, 0)
