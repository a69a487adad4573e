"""Deterministic OI tests (ported from reference
tests/test_optimal_interpolation.py — the behavioural spec including the
analytic 3-point expectation and the invalid-argument sweep)."""
import collections

import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestInvalidArguments:
    def test_sweep(self):
        ok_args = collections.OrderedDict({
            'grid': gridpp.Grid([[0, 0, 0]], [[0, 2500, 10000]],
                                [[0, 0, 0]], [[0, 0, 0]], gridpp.Cartesian),
            'background': np.zeros([1, 3]),
            'points': gridpp.Points([0], [2500], [0], [0], gridpp.Cartesian),
            'pobs': [1],
            'pratios': [0.1],
            'pbackground': [0],
            'structure': gridpp.BarnesStructure(2500),
            'max_points': 10,
        })
        x = np.zeros([3, 2])
        invalid_args = {
            'grid': [gridpp.Grid(x, x, x, x, gridpp.Cartesian),
                     gridpp.Grid([[0, 0, 0]], [[0, 2500, 10000]])],
            'points': [gridpp.Points([0, 1], [0, 2500], [0, 0], [0, 0],
                                     gridpp.Cartesian),
                       gridpp.Points([0], [2500])],
            'pratios': [np.zeros(11)],
            'pobs': [np.zeros([11])],
            'background': [np.zeros([2, 11])],
            'pbackground': [np.zeros(21)],
            'max_points': [-1],
        }
        for key, args in invalid_args.items():
            for arg in args:
                args0 = ok_args.copy()
                args0[key] = arg
                q = [args0[f] for f in args0]
                with pytest.raises(ValueError):
                    gridpp.optimal_interpolation(*q)


class TestSimple:
    def test_simple_1d(self):
        n = 3
        y = [[0, 0, 0]]
        x = [[0, 2500, 10000]]
        grid = gridpp.Grid(y, x, y, y, gridpp.Cartesian)
        points = gridpp.Points([0], [2500], [0], [0], gridpp.Cartesian)
        structure = gridpp.BarnesStructure(2500)
        background = np.zeros([1, n])
        output = gridpp.optimal_interpolation(
            grid, background, points, [1], [0.1], [0], structure, 10)
        np.testing.assert_array_almost_equal(
            output,
            np.array([[np.exp(-0.5) / 1.1, 1 / 1.1, np.exp(-0.5 * 9) / 1.1]]),
            decimal=5)

    def test_simple_grid_full(self):
        n = 3
        y = [[0, 0, 0]]
        x = [[0, 2500, 10000]]
        grid = gridpp.Grid(y, x, y, y, gridpp.Cartesian)
        points = gridpp.Points([0], [2500], [0], [0], gridpp.Cartesian)
        structure = gridpp.BarnesStructure(2500)
        output, variance = gridpp.optimal_interpolation_full(
            grid, np.zeros([1, n]), np.ones([1, n]), points, [1], [0.1],
            [0], [1], structure, 10)
        assert variance[0, 1] == pytest.approx(0.1 / 1.1, abs=1e-5)

    def test_simple_points_full(self):
        n = 3
        y = [0, 0, 0]
        x = [0, 2500, 10000]
        bpoints = gridpp.Points(y, x, y, y, gridpp.Cartesian)
        points = gridpp.Points([0], [2500], [0], [0], gridpp.Cartesian)
        structure = gridpp.BarnesStructure(2500)
        output, variance = gridpp.optimal_interpolation_full(
            bpoints, np.zeros(n), np.ones(n), points, np.array([1]),
            np.array([0.1]), np.array([0]), np.array([1]), structure, 10)
        assert variance[1] == pytest.approx(0.1 / 1.1, abs=1e-5)


class TestSemantics:
    def test_missing_values(self):
        obs = np.array([1, np.nan, 2, 3, np.nan, np.nan, 4, np.nan])
        n = len(obs)
        y = np.arange(0, n * 1000, 1000).astype(np.float64)
        background = np.zeros(n)
        points = gridpp.Points(y, np.zeros(n), np.zeros(n), np.zeros(n),
                               gridpp.Cartesian)
        ratios = np.ones(n)
        structure = gridpp.BarnesStructure(1000, 0)
        analysis = gridpp.optimal_interpolation(
            points, background, points, obs, ratios, background, structure,
            100)
        keep = np.where(np.isfinite(obs))[0]
        points1 = gridpp.Points(y[keep], np.zeros(len(keep)),
                                np.zeros(len(keep)), np.zeros(len(keep)),
                                gridpp.Cartesian)
        analysis1 = gridpp.optimal_interpolation(
            points, background, points1, obs[keep], ratios[keep],
            background[keep], structure, 100)
        np.testing.assert_array_almost_equal(analysis, analysis1, decimal=5)

    def test_extrapolation(self):
        n = 5
        y = np.linspace(0, 1000, n)
        x = np.zeros(n)
        bpoints = gridpp.Points(y, x, x, x, gridpp.Cartesian)
        points = gridpp.Points([0, 100, 900, 1000], [0, 0, 0, 0],
                               [0, 0, 0, 0], [0, 0, 0, 0], gridpp.Cartesian)
        pratios = 0.1 * np.ones(4)
        structure = gridpp.BarnesStructure(500)
        pobs = [0, 1, 1, 0]
        background = np.zeros(n)
        pbackground = np.zeros(4)
        output0 = gridpp.optimal_interpolation(
            bpoints, background, points, pobs, pratios, pbackground,
            structure, 10, False)
        output1 = gridpp.optimal_interpolation(
            bpoints, background, points, pobs, pratios, pbackground,
            structure, 10, True)
        assert np.max(output0) == pytest.approx(1, abs=1e-5)
        assert np.max(output1) > 1
        idx = np.where(output1 < 1)[0]
        np.testing.assert_array_almost_equal(output0[idx], output1[idx],
                                             decimal=5)

    def test_no_obs(self):
        bpoints = gridpp.Points([0], [0])
        points = gridpp.Points([], [])
        structure = gridpp.BarnesStructure(500)
        background = np.zeros(1)
        output = gridpp.optimal_interpolation(
            bpoints, background, points, [], [], [], structure, 10)
        np.testing.assert_almost_equal(output, background)

    def test_nan_background(self):
        # Invalid background cells are returned untouched
        y = [[0, 0]]
        x = [[0, 1000]]
        grid = gridpp.Grid(y, x, y, y, gridpp.Cartesian)
        points = gridpp.Points([0], [0], [0], [0], gridpp.Cartesian)
        structure = gridpp.BarnesStructure(2500)
        background = np.array([[np.nan, 0.0]], np.float32)
        out = gridpp.optimal_interpolation(
            grid, background, points, [1], [0.1], [0], structure, 10)
        assert np.isnan(out[0, 0])
        assert out[0, 1] > 0

    def test_max_points_limits(self):
        # With max_points=1 only the strongest observation is used
        n = 3
        y = np.array([0., 1000., 2000.])
        bpoints = gridpp.Points(y, np.zeros(n), np.zeros(n), np.zeros(n),
                                gridpp.Cartesian)
        points = gridpp.Points([0., 2000.], [0, 0], [0, 0], [0, 0],
                               gridpp.Cartesian)
        structure = gridpp.BarnesStructure(1000)
        background = np.zeros(n)
        out1 = gridpp.optimal_interpolation(
            bpoints, background, points, [1., 2.], [0.1, 0.1], [0., 0.],
            structure, 1)
        # Gridpoint 0 should only see obs 0: analysis = 1/1.1
        assert out1[0] == pytest.approx(1 / 1.1, abs=1e-4)
        assert out1[2] == pytest.approx(2 / 1.1, abs=1e-4)


class TestCrossValidation:
    def test_cross_validation_grid(self):
        np.random.seed(1000)
        y, x = np.meshgrid(np.arange(0, 3500, 500), np.arange(0, 3500, 500))
        grid = gridpp.Grid(y, x, np.zeros(x.shape), np.zeros(x.shape),
                           gridpp.Cartesian)
        background = np.zeros(y.shape)

        obs = np.array([10., 20., 30.])
        x_o = np.array([1000., 2000., 3000.])
        y_o = np.array([1000., 2000., 3000.])
        n = len(obs)
        points = gridpp.Points(y_o, x_o, np.zeros(n), np.zeros(n),
                               gridpp.Cartesian)
        background_o = gridpp.nearest(grid, points, background)
        ratios = np.ones(n)
        k = 0
        ii = np.arange(n) != k
        points_cv = gridpp.Points(y_o[ii], x_o[ii], np.zeros(n - 1),
                                  np.zeros(n - 1), gridpp.Cartesian)
        structure = gridpp.BarnesStructure(1000, 0)
        structure_cv = gridpp.CrossValidation(structure, 750)

        analysis = gridpp.optimal_interpolation(
            grid, background, points_cv, obs[ii], ratios[ii],
            background_o[ii], structure, 100)
        analysis_cv = gridpp.optimal_interpolation(
            points, background_o, points, obs, ratios, background_o,
            structure_cv, 100)
        assert gridpp.nearest(grid, points, analysis)[k] == pytest.approx(
            analysis_cv[k], abs=1e-4)


class TestDensePath:
    def test_dense_matches_host_candidates(self, monkeypatch):
        """The fully-on-device selection must match the host spatial-query
        path exactly."""
        import gridpp_tpu.api.oi as oi_api
        rng = np.random.default_rng(5)
        n = 9000
        y = rng.uniform(0, 200_000.0, n)
        x = rng.uniform(0, 200_000.0, n)
        bpoints = gridpp.Points(y, x, np.zeros(n), np.zeros(n),
                                gridpp.Cartesian)
        p = 600
        points = gridpp.Points(rng.uniform(0, 200_000.0, p),
                               rng.uniform(0, 200_000.0, p),
                               np.zeros(p), np.zeros(p), gridpp.Cartesian)
        structure = gridpp.BarnesStructure(5000.0)
        background = rng.normal(0, 1, n).astype(np.float32)
        pback = rng.normal(0, 1, p).astype(np.float32)
        pobs = pback + rng.normal(0, 0.5, p).astype(np.float32)
        ratios = np.full(p, 0.1, np.float32)

        # n * p = 5.4M > 4M -> dense path used
        out_dense = gridpp.optimal_interpolation(
            bpoints, background, points, pobs, ratios, pback, structure, 10)

        # Force the host-candidate path
        real = oi_api._oi_points_dense
        monkeypatch.setattr(oi_api, "_oi_points_dense",
                            lambda *a, **k: (_ for _ in ()).throw(
                                AssertionError("should not be called")))
        monkeypatch.setattr(oi_api, "_BLOCK", oi_api._BLOCK)
        # temporarily raise the dense threshold by monkeypatching the size
        # check: easiest is to call with a points subset > 32768? Instead
        # patch _oi_points_dense back and compare through the public API by
        # shrinking n*p below the threshold per-call is not possible, so
        # drive the internal host path directly:
        monkeypatch.setattr(oi_api, "_oi_points_dense", real)
        from gridpp_tpu.api.oi import _candidates, _resolved_fields
        from gridpp_tpu.ops.oi import make_oi_kernel
        import jax.numpy as jnp
        loc = structure.localization_np(bpoints.lats, bpoints.lons)
        cand, mask = _candidates(bpoints, points, loc, 10)
        origin = bpoints.xyz.mean(axis=0)
        p1_all = _resolved_fields(bpoints, structure, origin)
        o_fields = {k: jnp.asarray(v) for k, v in _resolved_fields(
            points, structure, origin).items()}
        cand_j = jnp.asarray(cand)
        kern = make_oi_kernel(structure, 10, True)
        out_host, _ = kern(
            {k: jnp.asarray(v)[:, None] for k, v in p1_all.items()},
            {k: jnp.take(v, cand_j, axis=0) for k, v in o_fields.items()},
            jnp.asarray(mask), jnp.asarray(background),
            jnp.ones(n, np.float32),
            jnp.take(jnp.asarray(pobs), cand_j, axis=0),
            jnp.take(jnp.asarray(pback), cand_j, axis=0),
            jnp.take(jnp.asarray(ratios), cand_j, axis=0))
        np.testing.assert_allclose(out_dense, np.asarray(out_host),
                                   atol=2e-5)


class TestPipeline:
    def test_matches_separate_calls(self):
        rng = np.random.default_rng(0)
        n = 40
        lats, lons = np.meshgrid(np.linspace(55, 58, n),
                                 np.linspace(5, 8, n), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        p = 30
        points = gridpp.Points(rng.uniform(55, 58, p),
                               rng.uniform(5, 8, p))
        structure = gridpp.BarnesStructure(50000)
        background = rng.normal(280, 5, (n, n)).astype(np.float32)
        pobs = rng.normal(280, 5, p).astype(np.float32)
        ratios = np.full(p, 0.1, np.float32)

        pipe = gridpp.Pipeline(grid, points, structure, halfwidth=3,
                               max_points=5)
        fused = pipe(background, pobs, ratios)

        smoothed = gridpp.neighbourhood(background, 3, gridpp.Mean)
        pback = gridpp.nearest(grid, points, smoothed)
        expected = gridpp.optimal_interpolation(
            grid, smoothed, points, pobs, ratios, pback, structure, 5)
        np.testing.assert_allclose(fused, expected, atol=2e-4)

    def test_no_smoothing(self):
        rng = np.random.default_rng(1)
        n = 20
        lats, lons = np.meshgrid(np.linspace(55, 57, n),
                                 np.linspace(5, 7, n), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points([56.0], [6.0])
        structure = gridpp.BarnesStructure(50000)
        background = np.zeros((n, n), np.float32)
        pipe = gridpp.Pipeline(grid, points, structure, halfwidth=0,
                               max_points=5)
        out = pipe(background, np.array([1.0]), np.array([0.1]))
        pback = gridpp.nearest(grid, points, background)
        expected = gridpp.optimal_interpolation(
            grid, background, points, [1.0], [0.1], pback, structure, 5)
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestTiledPipeline:
    """The tile-union serving path must match the flat path exactly."""

    def _problem(self, seed=0, ny=50, nx=70, p=40):
        rng = np.random.default_rng(seed)
        lats, lons = np.meshgrid(np.linspace(55, 58, ny),
                                 np.linspace(5, 8, nx), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points(rng.uniform(55, 58, p),
                               rng.uniform(5, 8, p))
        structure = gridpp.BarnesStructure(50000)
        background = rng.normal(280, 5, (ny, nx)).astype(np.float32)
        pobs = rng.normal(280, 5, p).astype(np.float32)
        ratios = np.full(p, 0.1, np.float32)
        return grid, points, structure, background, pobs, ratios

    def test_matches_flat_path(self):
        grid, points, structure, background, pobs, ratios = self._problem()
        flat = gridpp.Pipeline(grid, points, structure, halfwidth=3,
                               max_points=5, tiled=False)
        # tile shape that does NOT divide the grid: padding path covered
        tiled = gridpp.Pipeline(grid, points, structure, halfwidth=3,
                                max_points=5, tiled=True, tile_shape=(16, 32))
        a = flat(background, pobs, ratios)
        b = tiled(background, pobs, ratios)
        np.testing.assert_allclose(b, a, atol=1e-5)

    def test_matches_api_with_missing_obs(self):
        grid, points, structure, background, pobs, ratios = self._problem(1)
        rng = np.random.default_rng(2)
        pobs = pobs.copy()
        pobs[rng.random(pobs.size) < 0.3] = np.nan
        tiled = gridpp.Pipeline(grid, points, structure, halfwidth=0,
                                max_points=5, candidates=40, tiled=True,
                                tile_shape=(16, 32))
        out = tiled(background, pobs, ratios)
        pback = gridpp.nearest(grid, points, background)
        expected = gridpp.optimal_interpolation(
            grid, background, points, pobs, ratios, pback, structure, 5)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_nan_background_cells(self):
        grid, points, structure, background, pobs, ratios = self._problem(3)
        background = background.copy()
        background[5:9, 11:20] = np.nan
        tiled = gridpp.Pipeline(grid, points, structure, halfwidth=0,
                                max_points=5, tiled=True, tile_shape=(16, 32))
        flat = gridpp.Pipeline(grid, points, structure, halfwidth=0,
                               max_points=5, tiled=False)
        a = flat(background, pobs, ratios)
        b = tiled(background, pobs, ratios)
        np.testing.assert_allclose(b, a, atol=1e-5)
        assert np.isnan(b[6, 12])


class TestNativeHostSolver:
    """The threaded native OI solver (csrc oi_host_solve) vs the XLA
    path, which stays authoritative for unsupported structures."""

    def _problem(self, seed=0, ny=40, nx=50, p=150):
        rng = np.random.default_rng(seed)
        lats, lons = np.meshgrid(np.linspace(55, 58, ny),
                                 np.linspace(5, 8, nx), indexing="ij")
        elevs = rng.uniform(0, 800, (ny, nx)).astype(np.float32)
        lafs = rng.uniform(0, 1, (ny, nx)).astype(np.float32)
        grid = gridpp.Grid(lats, lons, elevs, lafs)
        points = gridpp.Points(rng.uniform(55.05, 57.95, p),
                               rng.uniform(5.05, 7.95, p),
                               rng.uniform(0, 700, p),
                               rng.uniform(0, 1, p))
        bg = rng.normal(280, 5, (ny, nx)).astype(np.float32)
        bg[3, 4] = np.nan  # invalid background passthrough
        nn = grid.nearest_map(points.lats, points.lons)
        pback = bg.reshape(-1)[nn]
        pobs = (pback + rng.normal(0, 1, p)).astype(np.float32)
        pobs[::17] = np.nan  # invalid obs are dropped
        ratios = np.full(p, 0.1, np.float32)
        return grid, points, bg, pobs, ratios, pback

    def _compare(self, structure, monkeypatch, allow=True, seed=0):
        from gridpp_tpu.api import oi as oi_api
        grid, points, bg, pobs, ratios, pback = self._problem(seed)
        assert oi_api._native_kernel_type(structure) is not None
        # Strict comparison with max_points=0 (every in-radius obs): the
        # top-k rank boundary is ulp-sensitive (two correct f32
        # implementations can flip which of two near-equal-rho obs makes
        # the cut), so the strict check removes the rank boundary...
        out_nat = gridpp.optimal_interpolation(
            grid, bg, points, pobs, ratios, pback, structure, 0, allow)
        # ...and cells with an obs within ~5 cm of the localization
        # boundary are excluded (FMA rounding of the chord distance can
        # flip the radius test).
        out_nat10 = gridpp.optimal_interpolation(
            grid, bg, points, pobs, ratios, pback, structure, 10, allow)
        monkeypatch.setattr(oi_api, "_native_kernel_type", lambda s: None)
        out_xla = gridpp.optimal_interpolation(
            grid, bg, points, pobs, ratios, pback, structure, 0, allow)
        out_xla10 = gridpp.optimal_interpolation(
            grid, bg, points, pobs, ratios, pback, structure, 10, allow)
        bp = grid.to_points()
        d = np.sqrt(((bp.xyz[:, None, :]
                      - points.xyz[None, :, :]) ** 2).sum(-1))
        locv = structure.localization_np(bp.lats, bp.lons)
        interior = ~(np.abs(d - locv[:, None]) < 0.05).any(
            axis=1).reshape(out_nat.shape)
        assert interior.mean() > 0.9  # the mask must stay a sliver
        # Ill-conditioned local systems (strongly correlated obs, e.g.
        # hmax keeping every in-radius rho >= 0.3) legitimately differ
        # between the native double solve (reference-precision Armadillo
        # semantics) and the f32 XLA solve by ~1e-3 relative; systematic
        # bugs would mismatch everywhere, so bound fraction AND size.
        close = np.isclose(out_nat[interior], out_xla[interior],
                           atol=2e-4, rtol=1e-5, equal_nan=True)
        assert close.mean() > 0.995, f"{(~close).sum()} cells mismatch"
        rel = np.abs(out_nat - out_xla)[interior] / np.maximum(
            np.abs(out_xla), 1.0)[interior]
        assert np.nanmax(rel) < 5e-3
        # max_points=10: allow rare rank-boundary flips, bound their size
        close10 = np.isclose(out_nat10, out_xla10, atol=2e-4, rtol=1e-5,
                             equal_nan=True)
        assert close10.mean() > 0.99
        rel = np.abs(out_nat10 - out_xla10) / np.maximum(
            np.abs(out_xla10), 1.0)
        assert np.nanmax(rel) < 5e-3

    def test_barnes(self, monkeypatch):
        self._compare(gridpp.BarnesStructure(20000.0, 200.0, 0.3),
                      monkeypatch)

    def test_barnes_hmax(self, monkeypatch):
        self._compare(gridpp.BarnesStructure(20000.0, 0.0, 0.0, 30000.0),
                      monkeypatch, seed=1)

    def test_barnes_no_extrapolation(self, monkeypatch):
        self._compare(gridpp.BarnesStructure(20000.0, 200.0, 0.3),
                      monkeypatch, allow=False, seed=2)

    def test_cressman(self, monkeypatch):
        self._compare(gridpp.CressmanStructure(30000.0, 300.0, 0.5),
                      monkeypatch, seed=3)

    def test_soar(self, monkeypatch):
        self._compare(gridpp.SoarStructure(15000.0, 200.0, 0.0),
                      monkeypatch, seed=4)

    def test_toar(self, monkeypatch):
        self._compare(gridpp.ToarStructure(15000.0, 0.0, 0.4),
                      monkeypatch, seed=5)

    def test_powerlaw(self, monkeypatch):
        self._compare(gridpp.PowerlawStructure(15000.0, 250.0, 0.0),
                      monkeypatch, seed=6)

    def test_spatial_barnes(self, monkeypatch):
        rng = np.random.default_rng(7)
        ny, nx = 30, 30
        lats, lons = np.meshgrid(np.linspace(55, 57, ny),
                                 np.linspace(5, 7, nx), indexing="ij")
        sgrid = gridpp.Grid(lats, lons)
        h = rng.uniform(15000, 40000, (ny, nx)).astype(np.float32)
        v = np.full((ny, nx), 200.0, np.float32)
        w = np.zeros((ny, nx), np.float32)
        self._compare(gridpp.BarnesStructure(sgrid, h, v, w), monkeypatch,
                      seed=7)

    def test_chunked_blocks(self, monkeypatch):
        # force the per-block candidate path at a small size
        from gridpp_tpu.api import oi as oi_api
        monkeypatch.setattr(oi_api, "_BALL_QUERY_MAX", 500)
        monkeypatch.setattr(oi_api, "_BLOCK", 512)
        self._compare(gridpp.BarnesStructure(20000.0, 150.0, 0.0),
                      monkeypatch, seed=8)

    def test_variance_output(self, monkeypatch):
        from gridpp_tpu.api import oi as oi_api
        grid, points, bg, pobs, ratios, pback = self._problem(9)
        bvar = np.ones_like(bg)
        structure = gridpp.BarnesStructure(20000.0)
        out_n, var_n = gridpp.optimal_interpolation_full(
            grid, bg, bvar, points, pobs, ratios * 1.0, pback,
            np.ones_like(pback), structure, 10)
        monkeypatch.setattr(oi_api, "_native_kernel_type", lambda s: None)
        out_x, var_x = gridpp.optimal_interpolation_full(
            grid, bg, bvar, points, pobs, ratios * 1.0, pback,
            np.ones_like(pback), structure, 10)
        np.testing.assert_allclose(out_n, out_x, atol=2e-4, rtol=1e-5)
        np.testing.assert_allclose(var_n, var_x, atol=2e-4, rtol=1e-5)
