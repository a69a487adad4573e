"""Meteo diagnostics tests (ported golden values from reference
tests/test_humidity.py, test_pressure.py, test_qnh.py, test_wind.py,
test_distribution.py, test_sea_level_pressure.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestHumidity:
    def test_relative_humidity(self):
        t = [270, 270, 293.15, 293.15, 300, 400]
        td = [160, 260, 293.15, 289.783630, 300, 370]
        rh = [0, 0.4605, 1, 0.817590594291687, 1, 1]
        for i in range(len(t)):
            assert gridpp.relative_humidity(t[i], td[i]) == pytest.approx(
                rh[i], abs=1e-4)
        np.testing.assert_almost_equal(gridpp.relative_humidity(t, td), rh, 4)

    def test_relative_humidity_invalid(self):
        assert np.isnan(gridpp.relative_humidity(np.nan, 293.15))
        assert np.isnan(gridpp.relative_humidity(293.15, np.nan))

    def test_dewpoint(self):
        t = [293.15, 293.15, 300]
        rh = [1, 0.8, 1]
        td = [293.15, 289.783630, 300]
        for i in range(len(t)):
            assert gridpp.dewpoint(t[i], rh[i]) == pytest.approx(td[i],
                                                                 abs=1e-3)
        np.testing.assert_almost_equal(gridpp.dewpoint(t, rh), td, 3)

    def test_wetbulb(self):
        t = [270, 300, 270, 240]
        p = [100000, 101000, 100000, 50000]
        rh = [0.8, 0.7, 1, 0.9]
        ans = [269.02487, 296.13763, 269.92218, 239.83798]
        for i in range(len(t)):
            assert gridpp.wetbulb(t[i], p[i], rh[i]) == pytest.approx(
                ans[i], abs=1e-3)
        np.testing.assert_almost_equal(gridpp.wetbulb(t, p, rh), ans, 3)

    def test_size_mismatch(self):
        with pytest.raises(Exception):
            gridpp.relative_humidity([293.15], [290, 290])
        with pytest.raises(Exception):
            gridpp.dewpoint([293.15], [0.9, 0.9])
        with pytest.raises(Exception):
            gridpp.wetbulb([293.15], [101325], [0.9, 0.9])


class TestPressure:
    def test_basic(self):
        assert gridpp.pressure(0, 1000, 101325, 288.15) == pytest.approx(
            89996.7, abs=2)
        assert gridpp.pressure(1000, 0, 89996.7, 288.15) == pytest.approx(
            101325, abs=2)
        assert gridpp.pressure(0, 1000, 101325, 258.15) == pytest.approx(
            88765.2, abs=2)
        assert gridpp.pressure(0, 0, 0) == 0
        assert gridpp.pressure(0, 1000, 0) == 0

    def test_vector(self):
        out = gridpp.pressure([0, 0], [1000, 0], [101325, 101325],
                              [288.15, 288.15])
        np.testing.assert_allclose(out, [89996.7, 101325], atol=2)

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            gridpp.pressure([0], [0, 0], [101325], [288.15])


class TestQnh:
    def test_values(self):
        p = [101325, 90000, 90000, 110000]
        alt = [0, 1000, 0, -1000]
        expected = [101325, 101463.21875, 90000, 97752.90742927508]
        for i in range(len(p)):
            assert gridpp.qnh(p[i], alt[i]) == pytest.approx(expected[i],
                                                             abs=0.5)
        np.testing.assert_almost_equal(gridpp.qnh(p, alt), expected, 1)

    def test_no_pressure(self):
        for altitude in [-1000, 0, 1000]:
            assert gridpp.qnh(0, altitude) == 0

    def test_invalid(self):
        assert np.isnan(gridpp.qnh([-1], [0]))[0]
        assert np.isnan(gridpp.qnh([101325], [np.nan]))[0]
        with pytest.raises(Exception):
            gridpp.qnh([101325], [0, 20])


class TestWind:
    xs = [0, -1, 1, 0, 1]
    ys = [0, -1, 1, 1, 0]
    speeds = [0, np.sqrt(2), np.sqrt(2), 1, 1]
    directions = [180, 45, 225, 180, 270]

    def test_speed(self):
        np.testing.assert_array_almost_equal(
            self.speeds, gridpp.wind_speed(self.xs, self.ys))

    def test_direction(self):
        np.testing.assert_array_almost_equal(
            self.directions, gridpp.wind_direction(self.xs, self.ys))

    def test_missing(self):
        for func in [gridpp.wind_speed, gridpp.wind_direction]:
            assert np.isnan(func(0, np.nan))
            assert np.isnan(func(np.nan, 0))

    def test_empty(self):
        np.testing.assert_array_almost_equal(gridpp.wind_speed([], []), [])


class TestGammaInv:
    def test_values(self):
        output = gridpp.gamma_inv([0.5, 0.5, 0.5], [1, 2, 7.5], [2, 2, 1])
        np.testing.assert_array_almost_equal(output, [1.386, 3.357, 7.169], 3)

    def test_invalid(self):
        for bad in ([-0.1], [1.1], [np.nan]):
            with pytest.raises(ValueError):
                gridpp.gamma_inv(bad, [1], [1])
        for bad in ([-1], [np.nan]):
            with pytest.raises(ValueError):
                gridpp.gamma_inv([0.1], bad, [1])
            with pytest.raises(ValueError):
                gridpp.gamma_inv([0.1], [1], bad)


class TestSeaLevelPressure:
    def test_high_altitude(self):
        # altitude >= 50m uses the exponential form; check plausibility
        out = gridpp.sea_level_pressure(100000.0, 100.0, 288.15)
        assert out > 100000.0
        assert out < 103000.0

    def test_low_altitude(self):
        out = gridpp.sea_level_pressure(101000.0, 10.0, 288.15)
        assert out > 101000.0
        assert out < 101500.0

    def test_zero_altitude(self):
        out = gridpp.sea_level_pressure(101325.0, 0.0, 288.15)
        assert out == pytest.approx(101325.0, abs=10)

    def test_invalid(self):
        with pytest.raises(RuntimeError):
            gridpp.sea_level_pressure(101325.0, np.nan, 288.15)
        with pytest.raises(RuntimeError):
            gridpp.sea_level_pressure(101325.0, 0.0, np.nan)
        with pytest.raises(RuntimeError):
            gridpp.sea_level_pressure(-1.0, 0.0, 288.15)
        with pytest.raises(RuntimeError):
            gridpp.sea_level_pressure(101325.0, 0.0, 288.15, 1.5)
