"""Tests for apply_curve, quantile mapping, monotonize, metric optimizer,
transforms (modelled on reference tests/test_apply_curve.py,
test_quantile_mapping.py, test_monotonize.py, test_metric_optimizer.py,
test_transform.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestApplyCurve:
    def test_empty_curve(self):
        for inp in [0, [0, 1], [[0], [1]]]:
            with pytest.raises(ValueError):
                gridpp.apply_curve(inp, [], [], gridpp.OneToOne, gridpp.OneToOne)
            with pytest.raises(ValueError):
                gridpp.apply_curve(inp, [1, 2], [], gridpp.OneToOne,
                                   gridpp.OneToOne)

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            gridpp.apply_curve(0, [1, 2, 3], [1, 2], gridpp.OneToOne,
                               gridpp.OneToOne)

    def test_identity_curve(self):
        fcst = [1.0, 2.0, 3.0]
        out = gridpp.apply_curve(fcst, fcst, fcst, gridpp.OneToOne,
                                 gridpp.OneToOne)
        np.testing.assert_array_almost_equal(out, fcst)

    def test_interpolation(self):
        curve_fcst = [1.0, 2.0, 3.0]
        curve_ref = [2.0, 4.0, 6.0]
        assert gridpp.apply_curve(1.5, curve_ref, curve_fcst,
                                  gridpp.OneToOne, gridpp.OneToOne) == 3.0
        assert gridpp.apply_curve(2.0, curve_ref, curve_fcst,
                                  gridpp.OneToOne, gridpp.OneToOne) == 4.0

    def test_extrapolation_policies(self):
        curve_fcst = [1.0, 2.0, 4.0]
        curve_ref = [2.0, 4.0, 6.0]
        # Above curve: input 5, largest fcst 4, largest ref 6
        assert gridpp.apply_curve(5, curve_ref, curve_fcst, gridpp.OneToOne,
                                  gridpp.OneToOne) == 7.0  # slope 1
        assert gridpp.apply_curve(5, curve_ref, curve_fcst, gridpp.OneToOne,
                                  gridpp.Zero) == 6.0  # slope 0
        assert gridpp.apply_curve(5, curve_ref, curve_fcst, gridpp.OneToOne,
                                  gridpp.Unchanged) == 5.0
        # MeanSlope: (6-2)/(4-1) = 4/3
        assert gridpp.apply_curve(
            5, curve_ref, curve_fcst, gridpp.OneToOne,
            gridpp.MeanSlope) == pytest.approx(6 + 4 / 3)
        # NearestSlope above: (6-4)/(4-2) = 1
        assert gridpp.apply_curve(5, curve_ref, curve_fcst, gridpp.OneToOne,
                                  gridpp.NearestSlope) == pytest.approx(7.0)
        # Below curve: input 0, smallest fcst 1, ref 2
        assert gridpp.apply_curve(0, curve_ref, curve_fcst, gridpp.OneToOne,
                                  gridpp.OneToOne) == 1.0
        assert gridpp.apply_curve(0, curve_ref, curve_fcst, gridpp.Zero,
                                  gridpp.OneToOne) == 2.0

    def test_2d(self):
        fcst = np.array([[1.0, 2.0], [3.0, 2.5]])
        out = gridpp.apply_curve(fcst, [2.0, 4.0, 6.0], [1.0, 2.0, 3.0],
                                 gridpp.OneToOne, gridpp.OneToOne)
        np.testing.assert_array_almost_equal(out, [[2, 4], [6, 5]])

    def test_gridded_curves(self):
        fcst = np.array([[1.0, 2.0]])
        curve_fcst = np.zeros([1, 2, 3], np.float32)
        curve_ref = np.zeros([1, 2, 3], np.float32)
        curve_fcst[0, 0] = [0, 1, 2]
        curve_ref[0, 0] = [0, 10, 20]
        curve_fcst[0, 1] = [0, 2, 4]
        curve_ref[0, 1] = [0, 100, 200]
        out = gridpp.apply_curve(fcst, curve_ref, curve_fcst,
                                 gridpp.OneToOne, gridpp.OneToOne)
        np.testing.assert_array_almost_equal(out, [[10, 100]])

    def test_nan_propagates(self):
        out = gridpp.apply_curve([np.nan], [1.0, 2.0], [1.0, 2.0],
                                 gridpp.OneToOne, gridpp.OneToOne)
        assert np.isnan(out).all()


class TestQuantileMapping:
    def test_basic(self):
        ref = [2.0, 4.0, 6.0]
        fcst = [1.0, 2.0, 3.0]
        curve_ref, curve_fcst = gridpp.quantile_mapping_curve(ref, fcst)
        np.testing.assert_array_almost_equal(curve_ref, [2, 4, 6])
        np.testing.assert_array_almost_equal(curve_fcst, [1, 2, 3])

    def test_unsorted(self):
        ref = [6.0, 2.0, 4.0]
        fcst = [3.0, 1.0, 2.0]
        curve_ref, curve_fcst = gridpp.quantile_mapping_curve(ref, fcst)
        np.testing.assert_array_almost_equal(curve_ref, [2, 4, 6])
        np.testing.assert_array_almost_equal(curve_fcst, [1, 2, 3])

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        fcst = rng.normal(0, 1, 100).astype(np.float32)
        ref = fcst * 2 + 1
        curve_ref, curve_fcst = gridpp.quantile_mapping_curve(ref, fcst)
        out = gridpp.apply_curve(fcst, curve_ref, curve_fcst,
                                 gridpp.OneToOne, gridpp.OneToOne)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            gridpp.quantile_mapping_curve([1, 2], [1, 2, 3])

    def test_invalid_quantiles(self):
        with pytest.raises(ValueError):
            gridpp.quantile_mapping_curve([1, 2], [1, 2], [1.5])

    def test_empty(self):
        curve_ref, curve_fcst = gridpp.quantile_mapping_curve([], [])
        assert len(curve_ref) == 0 and len(curve_fcst) == 0


class TestMonotonize:
    def test_empty(self):
        with pytest.raises(Exception):
            gridpp.monotonize_curve([], [])
        with pytest.raises(Exception):
            gridpp.monotonize_curve([1, 2], [])

    def test_size_mismatch(self):
        with pytest.raises(Exception):
            gridpp.monotonize_curve([1, 2, 3], [1, 2])

    def test_ok(self):
        curve_y, curve_x = gridpp.monotonize_curve([1, 2, 3], [1, 2, 3])
        np.testing.assert_array_equal(curve_y, [1, 2, 3])
        np.testing.assert_array_equal(curve_x, [1, 2, 3])

    def test_x_repeat(self):
        curve_y, curve_x = gridpp.monotonize_curve([0, 1, 2, 3], [0, 1, 1, 3])
        np.testing.assert_array_equal(curve_y, [0, 3])
        np.testing.assert_array_equal(curve_x, [0, 3])

    def test_x_repeat_lower(self):
        curve_y, curve_x = gridpp.monotonize_curve([0, 1, 2, 3], [0, 0, 1, 3])
        np.testing.assert_array_equal(curve_y, [2, 3])
        np.testing.assert_array_equal(curve_x, [1, 3])

    def test_x_repeat_upper(self):
        curve_y, curve_x = gridpp.monotonize_curve([0, 1, 2, 3], [0, 1, 3, 3])
        np.testing.assert_array_equal(curve_y, [0, 1])
        np.testing.assert_array_equal(curve_x, [0, 1])

    def test_knot(self):
        curve_y, curve_x = gridpp.monotonize_curve([0, 1, 1, 2, 3],
                                                   [0, 3, 2, 1, 5])
        np.testing.assert_array_equal(curve_y, [0, 3])
        np.testing.assert_array_equal(curve_x, [0, 5])

    def test_upper_knot(self):
        curve_y, curve_x = gridpp.monotonize_curve([0, 1, 2, 3], [0, 1, 3, 2])
        np.testing.assert_array_equal(curve_y, [0, 1])
        np.testing.assert_array_equal(curve_x, [0, 1])

    def test_lower_knot(self):
        x = [-8, -9, -7, -6, -3, -1, 0, 1, 2, 3]
        y = [0, 0, 1, 2, 3, 5, 3, 6, 7, 9]
        curve_y, curve_x = gridpp.monotonize_curve(y, x)
        np.testing.assert_array_equal(curve_y, [1, 2, 3, 5, 3, 6, 7, 9])
        np.testing.assert_array_equal(curve_x, [-7, -6, -3, -1, 0, 1, 2, 3])

    def test_two_knots_in_a_row(self):
        x = [0, 10, 20, 30, 25, 32, 31, 33]
        y = [0, 1, 2, 3, 4, 5, 6, 7]
        curve_y, curve_x = gridpp.monotonize_curve(y, x)
        np.testing.assert_array_equal(curve_y, [0, 1, 2, 7])
        np.testing.assert_array_equal(curve_x, [0, 10, 20, 33])


class TestMetricOptimizer:
    def test_calc_score_contingency(self):
        # a=3, b=1, c=2, d=4
        assert gridpp.calc_score(3, 1, 2, 4, gridpp.Ts) == pytest.approx(
            3 / 6)
        assert gridpp.calc_score(3, 1, 2, 4, gridpp.Pc) == pytest.approx(
            7 / 10)

    def test_calc_score_vectors(self):
        ref = [0, 0, 1, 1, 5, 5]
        fcst = [0, 0, 1, 1, 5, 5]
        # Perfect forecast: threshold 0.5 -> a=4 b=0 c=0 d=2
        assert gridpp.calc_score(ref, fcst, 0.5, gridpp.Ts) == 1.0

    def test_get_optimal_threshold(self):
        rng = np.random.default_rng(0)
        obs = rng.normal(0, 1, 1000).astype(np.float32)
        fcst = obs + 2  # biased forecast
        threshold = 0.0
        out = gridpp.get_optimal_threshold(obs, fcst, threshold, gridpp.Ets)
        # Optimal forecast threshold should be near 2
        assert out == pytest.approx(2.0, abs=0.2)

    def test_metric_optimizer_curve(self):
        rng = np.random.default_rng(1)
        obs = rng.normal(0, 1, 500).astype(np.float32)
        fcst = obs * 2
        ref_out, fcst_out = gridpp.metric_optimizer_curve(
            obs, fcst, [-0.5, 0.0, 0.5], gridpp.Ets)
        assert len(ref_out) == len(fcst_out)
        for r, f in zip(ref_out, fcst_out):
            assert r == pytest.approx(2 * f, abs=0.3)

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            gridpp.get_optimal_threshold([1, 2], [1, 2, 3], 0, gridpp.Ets)


class TestTransforms:
    def test_identity(self):
        transform = gridpp.Identity()
        for ar in [1, [1, 1], [[1, 1], [1, 1]]]:
            np.testing.assert_equal(ar, transform.forward(ar))
            np.testing.assert_equal(ar, transform.backward(ar))

    def test_boxcox(self):
        transform = gridpp.BoxCox(0.1)
        inputs = [0, 1, 2, 3]
        answers = [-10, 0, 0.7177340984, 1.1612319946]
        for i, a in zip(inputs, answers):
            assert transform.forward(i) == pytest.approx(a, abs=1e-5)
            assert transform.backward(a) == pytest.approx(i, abs=1e-5)
        out = transform.forward(np.array(inputs))
        np.testing.assert_array_almost_equal(out, answers, 5)

    def test_log(self):
        transform = gridpp.Log()
        assert transform.forward(np.exp(1)) == pytest.approx(1, abs=1e-5)
        assert transform.backward(1) == pytest.approx(np.exp(1), abs=1e-5)

    def test_missing(self):
        for transform in [gridpp.BoxCox(0.1), gridpp.Log()]:
            out = transform.forward([1, np.nan, 3])
            np.testing.assert_equal(np.isnan(out), [False, True, False])

    def test_gamma(self):
        transform = gridpp.Gamma(1, 2, 0.01)
        inputs = [0, 1.99]
        answers = [-2.576693296432495, 0.3374749]
        for i, a in zip(inputs, answers):
            assert transform.forward(i) == pytest.approx(a, abs=1e-4)
            assert transform.backward(a) == pytest.approx(i, abs=1e-2)

    def test_gamma_nan(self):
        transform = gridpp.Gamma(1, 2, 0.01)
        assert np.isnan(transform.forward(np.nan))
        assert np.isnan(transform.backward(np.nan))

    def test_gamma_invalid(self):
        for value in [-1, 0, np.nan]:
            with pytest.raises(ValueError):
                gridpp.Gamma(value, 2, 0.01)
            with pytest.raises(ValueError):
                gridpp.Gamma(2, value, 0.01)
        for value in [-1, np.nan]:
            with pytest.raises(ValueError):
                gridpp.Gamma(1, 2, value)

    def test_started_boxcox(self):
        transform = gridpp.StartedBoxCox(0.5, 1.0)
        # Below scaling: identity
        assert transform.forward(0.5) == pytest.approx(0.5)
        assert transform.backward(0.5) == pytest.approx(0.5)
        # Roundtrip above scaling
        for v in [1.5, 3.0, 10.0]:
            assert transform.backward(transform.forward(v)) == pytest.approx(
                v, rel=1e-5)
        with pytest.raises(ValueError):
            gridpp.StartedBoxCox(0, 1)
        with pytest.raises(ValueError):
            gridpp.StartedBoxCox(1, 0)
