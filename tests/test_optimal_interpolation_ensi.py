"""Ensemble OI tests (ported from reference
tests/test_optimal_interpolation_ens.py plus consistency checks)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestBasic:
    def test_no_obs(self):
        bpoints = gridpp.Points([0], [0])
        e = 3
        points = gridpp.Points([], [])
        structure = gridpp.BarnesStructure(500000)
        background = np.zeros([1, e])
        pbackground = np.zeros([0, e])
        output = gridpp.optimal_interpolation_ensi(
            bpoints, background, points, [], [], pbackground, structure, 10)
        np.testing.assert_almost_equal(output, background)

    def test_some_missing_obs(self):
        bpoints = gridpp.Points([0], [0])
        e = 3
        points = gridpp.Points([0, 0.1], [0, 0.1])
        structure = gridpp.BarnesStructure(500000)
        pobs = [np.nan, 0]
        background = np.zeros([1, e])
        pbackground = np.zeros([2, e])
        output = gridpp.optimal_interpolation_ensi(
            bpoints, background, points, pobs, [1, 1], pbackground,
            structure, 10)
        np.testing.assert_almost_equal(output, background)

    def test_zero_spread_no_update(self):
        """With zero ensemble spread at obs points the gain is zero and the
        background is returned exactly."""
        rng = np.random.default_rng(0)
        n = 5
        e = 4
        y = np.arange(n) * 1000.0
        bpoints = gridpp.Points(y, np.zeros(n), np.zeros(n), np.zeros(n),
                                gridpp.Cartesian)
        points = gridpp.Points([2000.0], [0], [0], [0], gridpp.Cartesian)
        structure = gridpp.BarnesStructure(1000)
        background = np.zeros((n, e), np.float32)
        background += rng.normal(0, 0.1, (1, e)).astype(np.float32)
        pbackground = np.full((1, e), 0.3, np.float32)  # no spread
        out = gridpp.optimal_interpolation_ensi(
            bpoints, background, points, [1.0], [0.5], pbackground,
            structure, 10)
        np.testing.assert_allclose(out, background, atol=1e-5)

    def test_mean_update(self):
        """With ensemble spread at obs points the analysis mean moves
        toward the observation."""
        rng = np.random.default_rng(0)
        n = 9
        e = 8
        y = np.arange(n) * 1000.0
        bpoints = gridpp.Points(y, np.zeros(n), np.zeros(n), np.zeros(n),
                                gridpp.Cartesian)
        points = gridpp.Points([2000.0], [0], [0], [0], gridpp.Cartesian)
        structure = gridpp.BarnesStructure(1000)
        background = rng.normal(0, 1, (n, e)).astype(np.float32)
        pbackground = background[[2]]  # ensemble at the obs location
        pobs = np.array([5.0])
        out = gridpp.optimal_interpolation_ensi(
            bpoints, background, points, pobs, [0.5], pbackground,
            structure, 10)
        assert np.mean(out[2]) > np.mean(background[2])
        # spread should shrink at the observed location
        assert np.std(out[2]) < np.std(background[2])
        # beyond the localization radius (~3646 m from the obs at y=2000)
        np.testing.assert_allclose(out[8], background[8], atol=1e-4)

    def test_grid_form(self):
        rng = np.random.default_rng(1)
        y, x = np.meshgrid(np.arange(0, 5000, 1000),
                           np.arange(0, 5000, 1000), indexing="ij")
        grid = gridpp.Grid(y, x, np.zeros(y.shape), np.zeros(y.shape),
                           gridpp.Cartesian)
        e = 3
        background = rng.normal(0, 1, (5, 5, e)).astype(np.float32)
        points = gridpp.Points([2000.0], [2000.0], [0], [0], gridpp.Cartesian)
        pbackground = rng.normal(0, 1, (1, e)).astype(np.float32)
        out = gridpp.optimal_interpolation_ensi(
            grid, background, points, [2.0], [0.5], pbackground,
            gridpp.BarnesStructure(1500), 10)
        assert out.shape == (5, 5, e)
        assert np.isfinite(out).all()

    def test_invalid_member_passthrough(self):
        """A member with any invalid value is left untouched."""
        rng = np.random.default_rng(3)
        bpoints = gridpp.Points([0.0, 1000.0], [0, 0], [0, 0], [0, 0],
                                gridpp.Cartesian)
        e = 4
        background = rng.normal(1, 0.5, (2, e)).astype(np.float32)
        background[0, 1] = np.nan  # member 1 invalid
        points = gridpp.Points([0.0], [0], [0], [0], gridpp.Cartesian)
        # obs-point ensemble = gridpoint-0 ensemble -> positive covariance
        pbackground = np.where(np.isfinite(background[[0]]),
                               background[[0]], 1.0)
        out = gridpp.optimal_interpolation_ensi(
            bpoints, background, points, [5.0], [0.5], pbackground,
            gridpp.BarnesStructure(1000), 10)
        # member 1 untouched everywhere
        assert np.isnan(out[0, 1])
        assert out[1, 1] == background[1, 1]
        # other members' mean updated toward obs
        valid = [0, 2, 3]
        assert np.mean(out[0, valid]) > np.mean(background[0, valid])

    def test_invalid_args(self):
        bpoints = gridpp.Points([0], [0])
        with pytest.raises(ValueError):
            gridpp.optimal_interpolation_ensi(
                bpoints, np.zeros([1, 3]), gridpp.Points([0], [0]), [1],
                [1], np.zeros([1, 3]), gridpp.BarnesStructure(1000), -1)
        with pytest.raises(ValueError):
            gridpp.optimal_interpolation_ensi(
                bpoints, np.zeros([2, 3]), gridpp.Points([0], [0]), [1],
                [1], np.zeros([1, 3]), gridpp.BarnesStructure(1000), 10)


class TestNativeHostSolver:
    """Threaded native EnSI solver vs the XLA path."""

    def _problem(self, seed=0, ny=30, nx=36, p=120, e=6):
        rng = np.random.default_rng(seed)
        lats, lons = np.meshgrid(np.linspace(55, 58, ny),
                                 np.linspace(5, 8, nx), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points(rng.uniform(55.05, 57.95, p),
                               rng.uniform(5.05, 7.95, p))
        bg = rng.normal(280, 5, (ny, nx, e)).astype(np.float32)
        nn = grid.nearest_map(points.lats, points.lons)
        pback = bg.reshape(-1, e)[nn]
        pobs = (pback.mean(axis=1) + rng.normal(0, 1, p)).astype(np.float32)
        pobs[::13] = np.nan
        sig = np.full(p, 1.2, np.float32)
        return grid, points, bg, pobs, sig, pback

    @pytest.mark.parametrize("allow", [True, False])
    def test_matches_xla(self, allow, monkeypatch):
        from gridpp_tpu.api import oi as oi_api
        grid, points, bg, pobs, sig, pback = self._problem(seed=allow)
        structure = gridpp.BarnesStructure(25000.0)
        out_nat = gridpp.optimal_interpolation_ensi(
            grid, bg, points, pobs, sig, pback, structure, 8, allow)
        monkeypatch.setattr(oi_api, "_native_kernel_type", lambda s: None)
        out_xla = gridpp.optimal_interpolation_ensi(
            grid, bg, points, pobs, sig, pback, structure, 8, allow)
        close = np.isclose(out_nat, out_xla, atol=5e-4, rtol=1e-4,
                           equal_nan=True)
        # rank/radius-boundary flips can touch isolated cells (see the
        # deterministic solver's parity notes); bound fraction and size
        assert close.mean() > 0.99
        rel = np.abs(out_nat - out_xla) / np.maximum(np.abs(out_xla), 1.0)
        assert np.nanmax(rel) < 5e-3

    def test_conditioning_guard_native(self, capsys):
        # zero sigmas blow up Rinv: native must fall back + warn like the
        # XLA path (oi_ensi.cpp:557-566)
        grid, points, bg, pobs, sig, pback = self._problem(seed=3)
        structure = gridpp.BarnesStructure(25000.0)
        out = gridpp.optimal_interpolation_ensi(
            grid, bg, points, pobs, np.zeros_like(sig), pback,
            structure, 8)
        np.testing.assert_array_equal(out, bg)
        assert "Condition number error" in capsys.readouterr().out

    def test_chunked_blocks_native(self, monkeypatch):
        # force the per-block candidate path through the native EnSI
        # solver at a small size (mirrors the deterministic solver's
        # chunked test)
        from gridpp_tpu.api import oi as oi_api
        from gridpp_tpu.api import oi_ensi as ensi_api
        monkeypatch.setattr(ensi_api, "_BALL_QUERY_MAX", 400)
        monkeypatch.setattr(ensi_api, "_BLOCK", 384)
        grid, points, bg, pobs, sig, pback = self._problem(seed=7)
        structure = gridpp.BarnesStructure(25000.0)
        out_nat = gridpp.optimal_interpolation_ensi(
            grid, bg, points, pobs, sig, pback, structure, 8)
        monkeypatch.setattr(oi_api, "_native_kernel_type", lambda s: None)
        out_xla = gridpp.optimal_interpolation_ensi(
            grid, bg, points, pobs, sig, pback, structure, 8)
        close = np.isclose(out_nat, out_xla, atol=5e-4, rtol=1e-4,
                           equal_nan=True)
        assert close.mean() > 0.99
