"""window() tests (ported from reference tests/test_window.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


@pytest.fixture
def inputs():
    x = np.ones([5, 5], float)
    for i in range(5):
        for j in range(5):
            x[i, j] = i + j
    return x


@pytest.fixture
def inputs_nan(inputs):
    x = inputs.copy()
    x[3, 3] = np.nan
    return x


class TestWindow:
    def test_sum(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Sum, False, False, False)
        np.testing.assert_array_equal(
            output, [[1, 3, 6, 9, 7], [3, 6, 9, 12, 9], [5, 9, 12, 15, 11],
                     [7, 12, 15, 18, 13], [9, 15, 18, 21, 15]])

    def test_count(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Count, False, False, False)
        np.testing.assert_array_equal(output, np.tile([2, 3, 3, 3, 2], (5, 1)))

    def test_mean(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Mean, False, False, False)
        np.testing.assert_array_equal(
            output, [[0.5, 1, 2, 3, 3.5], [1.5, 2, 3, 4, 4.5],
                     [2.5, 3, 4, 5, 5.5], [3.5, 4, 5, 6, 6.5],
                     [4.5, 5, 6, 7, 7.5]])

    def test_min(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Min, False, False, False)
        np.testing.assert_array_equal(
            output, [[0, 0, 1, 2, 3], [1, 1, 2, 3, 4], [2, 2, 3, 4, 5],
                     [3, 3, 4, 5, 6], [4, 4, 5, 6, 7]])

    def test_max(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Max, False, False, False)
        np.testing.assert_array_equal(
            output, [[1, 2, 3, 4, 4], [2, 3, 4, 5, 5], [3, 4, 5, 6, 6],
                     [4, 5, 6, 7, 7], [5, 6, 7, 8, 8]])

    def test_sum_before(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Sum, True, False, False)
        np.testing.assert_array_equal(
            output, [[0, 1, 3, 6, 9], [1, 3, 6, 9, 12], [2, 5, 9, 12, 15],
                     [3, 7, 12, 15, 18], [4, 9, 15, 18, 21]])

    def test_sum_missing_edge(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Sum, True, False, True)
        expected = np.array(
            [[np.nan, np.nan, 3, 6, 9], [np.nan, np.nan, 6, 9, 12],
             [np.nan, np.nan, 9, 12, 15], [np.nan, np.nan, 12, 15, 18],
             [np.nan, np.nan, 15, 18, 21]])
        np.testing.assert_array_equal(output, expected)

    def test_count_nan(self, inputs_nan):
        for keep_missing in [False, True]:
            for missing_edges in [False, True]:
                output = gridpp.window(inputs_nan, 3, gridpp.Count, True,
                                       keep_missing, missing_edges)
                np.testing.assert_array_equal(
                    output, [[1, 2, 3, 3, 3], [1, 2, 3, 3, 3],
                             [1, 2, 3, 3, 3], [1, 2, 3, 2, 2],
                             [1, 2, 3, 3, 3]])
                output = gridpp.window(inputs_nan, 3, gridpp.Count, False,
                                       keep_missing, missing_edges)
                np.testing.assert_array_equal(
                    output, [[2, 3, 3, 3, 2], [2, 3, 3, 3, 2],
                             [2, 3, 3, 3, 2], [2, 3, 2, 2, 1],
                             [2, 3, 3, 3, 2]])

    def test_sum_keep_missing(self, inputs_nan):
        output = gridpp.window(inputs_nan, 3, gridpp.Sum, True, True, False)
        np.testing.assert_array_equal(
            output, [[0, 1, 3, 6, 9], [1, 3, 6, 9, 12], [2, 5, 9, 12, 15],
                     [3, 7, 12, np.nan, np.nan], [4, 9, 15, 18, 21]])

    def test_window_bigger_than_array(self):
        small = np.ones([2, 2], float)
        output = gridpp.window(small, 5, gridpp.Sum, False, False, False)
        np.testing.assert_array_equal(output, [[2, 2], [2, 2]])
        output = gridpp.window(small, 5, gridpp.Sum, False, False, True)
        assert np.isnan(output).all()

    def test_before_running(self):
        inp = [[0, 1, 2, np.nan, 3, 4, 5]]
        output = gridpp.window(inp, 2, gridpp.Sum, True, False, False)
        np.testing.assert_array_equal(output, [[0, 1, 3, 2, 3, 7, 9]])
        output = gridpp.window(inp, 2, gridpp.Sum, True, True, False)
        np.testing.assert_array_equal(
            output, [[0, 1, 3, np.nan, np.nan, 7, 9]])
        output = gridpp.window(inp, 2, gridpp.Sum, True, False, True)
        np.testing.assert_array_equal(output, [[np.nan, 1, 3, 2, 3, 7, 9]])

    def test_count_before(self, inputs):
        out = gridpp.window(inputs, 3, gridpp.Count, True, False, False)
        np.testing.assert_array_equal(out, np.tile([1, 2, 3, 3, 3], (5, 1)))
        # missing_edges does not mask Count (window.cpp)
        out = gridpp.window(inputs, 3, gridpp.Count, True, False, True)
        np.testing.assert_array_equal(out, np.tile([1, 2, 3, 3, 3], (5, 1)))

    def test_mixed_flags_before(self):
        x = [[0, 1, 2, np.nan, 3, 4, 5]]
        out = gridpp.window(x, 2, gridpp.Sum, True, False, False)
        np.testing.assert_array_equal(out, [[0, 1, 3, 2, 3, 7, 9]])
        out = gridpp.window(x, 2, gridpp.Sum, True, True, False)
        np.testing.assert_array_equal(out, [[0, 1, 3, np.nan, np.nan, 7, 9]])
        out = gridpp.window(x, 2, gridpp.Sum, True, False, True)
        np.testing.assert_array_equal(out, [[np.nan, 1, 3, 2, 3, 7, 9]])
        out = gridpp.window(x, 2, gridpp.Sum, True, True, True)
        np.testing.assert_array_equal(out,
                                      [[np.nan, 1, 3, np.nan, np.nan, 7, 9]])

    def test_mixed_flags_centered(self):
        x = [[0, 1, 2, np.nan, 3, 4, 5]]
        out = gridpp.window(x, 3, gridpp.Sum, False, False, False)
        np.testing.assert_array_equal(out, [[1, 3, 3, 5, 7, 12, 9]])
        out = gridpp.window(x, 3, gridpp.Sum, False, True, False)
        np.testing.assert_array_equal(
            out, [[1, 3, np.nan, np.nan, np.nan, 12, 9]])
        out = gridpp.window(x, 3, gridpp.Sum, False, False, True)
        np.testing.assert_array_equal(out,
                                      [[np.nan, 3, 3, 5, 7, 12, np.nan]])
        out = gridpp.window(x, 3, gridpp.Sum, False, True, True)
        np.testing.assert_array_equal(
            out, [[np.nan, 3, np.nan, np.nan, np.nan, 12, np.nan]])

    def test_window_bigger_than_array_missing_edges(self):
        out = gridpp.window([[1, 1], [1, 1]], 5, gridpp.Sum, False, False,
                            True)
        np.testing.assert_array_equal(
            out, [[np.nan, np.nan], [np.nan, np.nan]])

    def test_empty_shapes(self):
        out = gridpp.window(np.zeros((10, 0)), 3, gridpp.Sum)
        assert out.shape == (10, 0)
        out = gridpp.window(np.zeros((0, 10)), 3, gridpp.Sum)
        assert out.shape == (0, 0)
        out = gridpp.window(np.zeros((0, 0)), 3, gridpp.Sum)
        assert out.shape == (0, 0)

    def test_long_length(self):
        out = gridpp.window([[0, 1, 2, 3]], 1001, gridpp.Sum, False, False,
                            False)
        np.testing.assert_array_equal(out, [[6, 6, 6, 6]])
        out = gridpp.window([[1], [2]], 1001, gridpp.Sum, False, False,
                            False)
        np.testing.assert_array_equal(out, [[1], [2]])

    def test_invalid_length(self):
        with pytest.raises(ValueError):
            gridpp.window(np.ones([2, 2]), 0, gridpp.Mean, False, False,
                          False)
        with pytest.raises(ValueError):
            gridpp.window(np.ones([2, 2]), 2, gridpp.Mean, False, False,
                          False)

    def test_median_brute(self, inputs):
        output = gridpp.window(inputs, 3, gridpp.Median, False, False, False)
        np.testing.assert_array_equal(
            output, [[0.5, 1, 2, 3, 3.5], [1.5, 2, 3, 4, 4.5],
                     [2.5, 3, 4, 5, 5.5], [3.5, 4, 5, 6, 6.5],
                     [4.5, 5, 6, 7, 7.5]])
