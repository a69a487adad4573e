"""local_distribution_correction tests (semantics from reference
local_distribution_correction.cpp and tests/test_local_distribution_correction.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


def make_setup(bg_value=2.0, n=5):
    y, x = np.meshgrid(np.arange(n) * 1000.0, np.arange(n) * 1000.0,
                       indexing="ij")
    grid = gridpp.Grid(y, x, 0 * y, 0 * y, gridpp.Cartesian)
    background = np.full((n, n), bg_value, np.float32)
    points = gridpp.Points([2000.0, 2500.0, 1500.0], [2000.0, 2500.0, 1500.0],
                           [0, 0, 0], [0, 0, 0], gridpp.Cartesian)
    return grid, background, points


class TestLDC:
    def test_no_obs_in_range(self):
        grid, background, points = make_setup()
        structure = gridpp.BarnesStructure(100.0)  # tiny radius
        out = gridpp.local_distribution_correction(
            grid, background, points, [1.0, 1.0, 1.0], [1.0, 1.0, 1.0],
            structure, 0.1, 0.9, 1)
        np.testing.assert_array_almost_equal(out, background)

    def test_zero_background_stays_zero(self):
        grid, background, points = make_setup(bg_value=0.0)
        structure = gridpp.BarnesStructure(5000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [2.0, 3.0, 4.0], [1.0, 2.0, 3.0],
            structure, 0.0, 1.0, 1)
        # background < 0.01 -> 0 (rule 1)
        np.testing.assert_array_almost_equal(out, background)

    def test_above_curve_bias_preserved(self):
        grid, background, points = make_setup(bg_value=10.0)
        structure = gridpp.BarnesStructure(50000.0)
        # obs systematically 1 higher than fcst; bg above the curve end
        out = gridpp.local_distribution_correction(
            grid, background, points, [3.0, 4.0, 5.0], [2.0, 3.0, 4.0],
            structure, 0.0, 1.0, 1)
        np.testing.assert_allclose(out, 11.0, atol=1e-4)

    def test_no_obs_rain(self):
        grid, background, points = make_setup(bg_value=0.05)
        structure = gridpp.BarnesStructure(50000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
            structure, 0.0, 1.0, 1)
        # ref_last == 0, bg < 0.1 -> 0 (rule 2b)
        np.testing.assert_array_almost_equal(out, np.zeros_like(background))

    def test_within_curve_maps_toward_obs(self):
        grid, background, points = make_setup(bg_value=2.5)
        structure = gridpp.BarnesStructure(50000.0)
        # fcst curve [1, 2, 4]; obs curve [2, 4, 8] (double bias)
        out = gridpp.local_distribution_correction(
            grid, background, points, [2.0, 4.0, 8.0], [1.0, 2.0, 4.0],
            structure, 0.0, 1.0, 1)
        # mapped value is above the raw background (obs wetter), blended
        assert np.all(out > 2.5)

    def test_clear_air_return_rule_2a(self):
        """ref curve all zero and bg < 3x fcst curve end -> 0 (rule 2a,
        local_distribution_correction.cpp:163-166)."""
        grid, background, points = make_setup(bg_value=2.0)
        structure = gridpp.BarnesStructure(50000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
            structure, 0.0, 1.0, 1)
        # bg=2.0 < 3*1.0 -> clear-air return, zeroed
        np.testing.assert_array_almost_equal(out, 0 * background)

    def test_unsampled_convection_rule_2c(self):
        """ref curve zero but large radar values (bg >= 3x fcst end and
        bg >= 0.1) -> keep the radar value (rule 2c, lines 170-176)."""
        grid, background, points = make_setup(bg_value=9.0)
        structure = gridpp.BarnesStructure(50000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
            structure, 0.0, 1.0, 1)
        np.testing.assert_array_almost_equal(out, background)

    def test_above_curve_exact_bias(self):
        """Rule 3 preserves the curve-end bias exactly: out = bg +
        (ref_end - fcst_end) (lines 179-186)."""
        grid, background, points = make_setup(bg_value=20.0)
        structure = gridpp.BarnesStructure(50000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [5.0, 6.0, 10.0], [2.0, 3.0, 4.0],
            structure, 0.0, 1.0, 1)
        np.testing.assert_allclose(out, 20.0 + (10.0 - 4.0), atol=1e-4)

    def test_min_points_gate(self):
        """Fewer in-radius pairs than min_points -> background unchanged
        (lines 114, count >= min_points)."""
        grid, background, points = make_setup(bg_value=2.5)
        structure = gridpp.BarnesStructure(50000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [3.0, 4.0, 5.0], [1.0, 2.0, 4.0],
            structure, 0.0, 1.0, 50)
        np.testing.assert_array_almost_equal(out, background)

    def test_negative_obs_screened(self):
        """Negative obs/background pairs are dropped before the curve
        build (lines 99-102); all-negative obs -> no pairs -> unchanged."""
        grid, background, points = make_setup(bg_value=2.5)
        structure = gridpp.BarnesStructure(50000.0)
        out = gridpp.local_distribution_correction(
            grid, background, points, [-1.0, -2.0, -3.0], [1.0, 2.0, 4.0],
            structure, 0.0, 1.0, 1)
        np.testing.assert_array_almost_equal(out, background)

    def test_nan_obs_screened(self):
        """A NaN pair among valid ones is dropped, not poisoning the
        output (reference is_valid screen before the curve build)."""
        grid, background, _ = make_setup(bg_value=2.5)
        structure = gridpp.BarnesStructure(50000.0)
        pts4 = gridpp.Points([2000.0, 2500.0, 1500.0, 1800.0],
                             [2000.0, 2500.0, 1500.0, 1800.0],
                             [0, 0, 0, 0], [0, 0, 0, 0], gridpp.Cartesian)
        out = gridpp.local_distribution_correction(
            grid, background, pts4, [3.0, 4.0, 5.0, np.nan],
            [1.0, 2.0, 4.0, 2.0], structure, 0.0, 1.0, 1)
        assert np.isfinite(out).all()
        assert out.shape == background.shape

    def test_native_matches_jitted_path(self, monkeypatch):
        """The threaded C++ curve-build (csrc ldc_host) and the jitted
        fallback (ops/ldc.ldc_block) agree on a random dense problem."""
        from gridpp_tpu.api import ldc as ldc_mod
        rng = np.random.default_rng(7)
        n = 12
        y, x = np.meshgrid(np.arange(n) * 800.0, np.arange(n) * 800.0,
                           indexing="ij")
        grid = gridpp.Grid(y, x, 0 * y, 0 * y, gridpp.Cartesian)
        background = (rng.gamma(1.5, 2.0, (n, n))).astype(np.float32)
        num = 40
        points = gridpp.Points(rng.uniform(0, n * 800.0, num),
                               rng.uniform(0, n * 800.0, num),
                               np.zeros(num), np.zeros(num),
                               gridpp.Cartesian)
        pobs = rng.gamma(1.5, 2.0, (2, num)).astype(np.float32)
        pbg = rng.gamma(1.5, 2.0, (2, num)).astype(np.float32)
        pobs[0, 3] = np.nan  # screened pair
        structure = gridpp.BarnesStructure(4000.0)
        args = (grid, background, points, pobs, pbg, structure, 0.1,
                0.9, 2)
        native_out = gridpp.local_distribution_correction(*args)
        monkeypatch.setattr(ldc_mod, "_ldc_native",
                            lambda *a, **k: None)
        jax_out = gridpp.local_distribution_correction(*args)
        np.testing.assert_allclose(native_out, jax_out, rtol=2e-5,
                                   atol=2e-5)

    def test_size_mismatch(self):
        grid, background, points = make_setup()
        structure = gridpp.BarnesStructure(5000.0)
        with pytest.raises(ValueError):
            gridpp.local_distribution_correction(
                grid, background, points, [[1.0, 1.0, 1.0]],
                [[1.0, 1.0]], structure, 0.1, 0.9, 1)

    def test_multi_time(self):
        grid, background, points = make_setup(bg_value=2.5)
        structure = gridpp.BarnesStructure(50000.0)
        pobs = np.array([[2.0, 4.0, 8.0], [3.0, 5.0, 7.0]], np.float32)
        pbg = np.array([[1.0, 2.0, 4.0], [1.5, 2.5, 3.5]], np.float32)
        out = gridpp.local_distribution_correction(
            grid, background, points, pobs, pbg, structure, 0.0, 1.0, 1)
        assert out.shape == background.shape
        assert np.isfinite(out).all()
