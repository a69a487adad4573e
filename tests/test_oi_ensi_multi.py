"""Tests for the ensi_multi variants (semantics from oi_ensi_multi.cpp)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


def setup(n=7, e=6, seed=0):
    rng = np.random.default_rng(seed)
    y = np.arange(n) * 1000.0
    bpoints = gridpp.Points(y, np.zeros(n), np.zeros(n), np.zeros(n),
                            gridpp.Cartesian)
    points = gridpp.Points([2000.0, 4000.0], [0, 0], [0, 0], [0, 0],
                           gridpp.Cartesian)
    structure = gridpp.BarnesStructure(1500.0)
    background = rng.normal(0, 1, (n, e)).astype(np.float32)
    bg_corr = background + rng.normal(0, 0.3, (n, e)).astype(np.float32)
    bratios = np.ones(n, np.float32)
    pback = np.stack([background[2], background[4]]).astype(np.float32)
    pback_corr = np.stack([bg_corr[2], bg_corr[4]]).astype(np.float32)
    pratios = np.full(2, 0.1, np.float32)
    return (bpoints, points, structure, background, bg_corr, bratios,
            pback, pback_corr, pratios)


class TestEbe:
    def test_updates_toward_obs(self):
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        pobs = pback + 2.0  # per-member obs above background
        out = gridpp.optimal_interpolation_ensi_multi_ebe(
            bpoints, bratios, background, bg_corr, points, pobs, pratios,
            pback, pback_corr, structure, 10)
        assert out.shape == background.shape
        # increments positive at observed gridpoints
        assert np.mean(out[2] - background[2]) > 0
        # far point (y=6000, >loc radius ~5470? Barnes(1500)->5468) small
        assert np.isfinite(out).all()

    def test_no_obs(self):
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        empty = gridpp.Points([], [], type=gridpp.Cartesian)
        out = gridpp.optimal_interpolation_ensi_multi_ebe(
            bpoints, bratios, background, bg_corr, empty,
            np.zeros((0, 6)), np.zeros(0), np.zeros((0, 6)),
            np.zeros((0, 6)), structure, 10)
        np.testing.assert_array_equal(out, background)

    def test_invalid_args(self):
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        with pytest.raises(ValueError):
            gridpp.optimal_interpolation_ensi_multi_ebe(
                bpoints, bratios, background, bg_corr, points,
                np.zeros((3, 6)), pratios, pback, pback_corr, structure, 10)
        with pytest.raises(ValueError):
            gridpp.optimal_interpolation_ensi_multi_ebe(
                bpoints, bratios[:-1], background, bg_corr, points,
                pback, pratios, pback, pback_corr, structure, 10)


class TestEbesc:
    def test_matches_deterministic_shape(self):
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        pobs = pback + 1.0
        out = gridpp.optimal_interpolation_ensi_multi_ebesc(
            bpoints, bratios, background, points, pobs, pratios, pback,
            structure, 10)
        assert out.shape == background.shape
        assert np.mean(out[2] - background[2]) > 0

    def test_ebesc_matches_oi_per_member(self):
        """With static correlations, each member's update equals the
        deterministic OI increment for that member's innovations."""
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        pobs = pback + np.array([[1.0], [2.0]], np.float32)
        out = gridpp.optimal_interpolation_ensi_multi_ebesc(
            bpoints, bratios, background, points, pobs, pratios, pback,
            structure, 10)
        for e in range(background.shape[1]):
            det = gridpp.optimal_interpolation(
                bpoints, background[:, e], points, pobs[:, e], pratios,
                pback[:, e], structure, 10)
            np.testing.assert_allclose(out[:, e], det, atol=1e-4)


class TestRobustness:
    def test_utem_conditioning_guard(self, capsys):
        """Zero obs-error ratios blow up Rinv; the reference falls back
        to the raw background at such gridpoints and warns
        (oi_ensi_multi.cpp:1106-1110, 1300-1304)."""
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        pobs = np.array([2.0, 1.0], np.float32)  # utem: scalar obs/point
        out = gridpp.optimal_interpolation_ensi_multi_utem(
            bpoints, bratios, background, bg_corr, points, pobs,
            np.zeros(2, np.float32), pback, pback_corr, structure, 10)
        np.testing.assert_array_equal(out, background)
        assert "Condition number error" in capsys.readouterr().out

    def test_anti_extrapolation_bounds_members(self):
        """allow_extrapolation=False clamps member increments into the
        observed innovation range (oi_ensi_multi.cpp anti-extrap
        filters); analyses never overshoot max innovation."""
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        pobs = pback + 2.0
        free = gridpp.optimal_interpolation_ensi_multi_ebe(
            bpoints, bratios, background, bg_corr, points, pobs, pratios,
            pback, pback_corr, structure, 10, True)
        clamped = gridpp.optimal_interpolation_ensi_multi_ebe(
            bpoints, bratios, background, bg_corr, points, pobs, pratios,
            pback, pback_corr, structure, 10, False)
        assert free.shape == clamped.shape
        # clamped increments are bounded by the largest innovation
        inc = clamped - background
        assert np.nanmax(inc) <= np.nanmax(pobs - pback) + 1e-4

    def test_member_screening_nan_background(self):
        """A member invalid anywhere on the grid or at the obs points is
        excluded from the update everywhere and passed through
        unchanged (oi_ensi_multi.cpp:396-419 valid-ens screening)."""
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        background = background.copy()
        background[3, 1] = np.nan  # member 1 invalid at one gridpoint
        pback2 = np.stack([background[2], background[4]]).astype(np.float32)
        pobs = np.where(np.isfinite(pback2), pback2 + 2.0, 2.0)
        out = gridpp.optimal_interpolation_ensi_multi_ebe(
            bpoints, bratios, background, bg_corr, points,
            pobs, pratios, pback2, pback_corr, structure, 10)
        # member 1 untouched (including its NaN)
        np.testing.assert_array_equal(out[:, 1], background[:, 1])
        # other members still updated
        assert np.mean(out[2, [0, 2, 3, 4, 5]]
                       - background[2, [0, 2, 3, 4, 5]]) > 0


class TestUtem:
    def test_runs_and_updates(self):
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        pobs = np.array([2.0, 1.0], np.float32)
        out = gridpp.optimal_interpolation_ensi_multi_utem(
            bpoints, bratios, background, bg_corr, points, pobs, pratios,
            pback, pback_corr, structure, 10)
        assert out.shape == background.shape
        assert np.isfinite(out).all()
        assert not np.allclose(out[2], background[2])

    def test_no_obs(self):
        (bpoints, points, structure, background, bg_corr, bratios,
         pback, pback_corr, pratios) = setup()
        empty = gridpp.Points([], [], type=gridpp.Cartesian)
        out = gridpp.optimal_interpolation_ensi_multi_utem(
            bpoints, bratios, background, bg_corr, empty, np.zeros(0),
            np.zeros(0), np.zeros((0, 6)), np.zeros((0, 6)), structure, 10)
        np.testing.assert_array_equal(out, background)


class TestInvalidArgumentSweeps:
    """ok_args sweeps matching oi_ensi_multi.cpp:34-133 (grid form) and
    329-420/629-700/862-960 (points form) up-front validation: every
    malformed input raises ValueError (not IndexError/broadcast errors)."""

    E = 4

    def grid_args(self):
        e = self.E
        lats, lons = np.meshgrid([0.0, 1000.0, 2000.0], [0.0, 1000.0],
                                 indexing="ij")
        grid = gridpp.Grid(lats, lons, np.zeros((3, 2)), np.zeros((3, 2)),
                           gridpp.Cartesian)
        import collections
        return collections.OrderedDict({
            "bgrid": grid,
            "bratios": np.ones((3, 2), np.float32),
            "background": np.zeros((3, 2, e), np.float32),
            "background_corr": np.ones((3, 2, e), np.float32),
            "points": gridpp.Points([0.0], [0.0], [0], [0],
                                    gridpp.Cartesian),
            "pobs": np.ones((1, e), np.float32),
            "pratios": np.full(1, 0.1, np.float32),
            "pbackground": np.zeros((1, e), np.float32),
            "pbackground_corr": np.ones((1, e), np.float32),
            "structure": gridpp.BarnesStructure(2500.0),
            "max_points": 10,
        })

    def points_args(self):
        e = self.E
        import collections
        bpoints = gridpp.Points([0.0, 1000.0, 2000.0], [0, 0, 0],
                                [0, 0, 0], [0, 0, 0], gridpp.Cartesian)
        return collections.OrderedDict({
            "bgrid": bpoints,
            "bratios": np.ones(3, np.float32),
            "background": np.zeros((3, e), np.float32),
            "background_corr": np.ones((3, e), np.float32),
            "points": gridpp.Points([0.0], [0.0], [0], [0],
                                    gridpp.Cartesian),
            "pobs": np.ones((1, e), np.float32),
            "pratios": np.full(1, 0.1, np.float32),
            "pbackground": np.zeros((1, e), np.float32),
            "pbackground_corr": np.ones((1, e), np.float32),
            "structure": gridpp.BarnesStructure(2500.0),
            "max_points": 10,
        })

    def invalid(self, grid_form):
        e = self.E
        bad_bg = ([np.zeros((4, 2, e)), np.zeros((3, 3, e)),
                   np.zeros((3, 2))] if grid_form else
                  [np.zeros((4, e)), np.zeros(3)])
        return {
            "background": bad_bg,
            "background_corr": bad_bg,
            "bratios": ([np.ones((4, 2)), np.ones((3, 3))] if grid_form
                        else [np.ones(4)]),
            "points": [gridpp.Points([0.0], [0.0]),  # geodetic mismatch
                       gridpp.Points([0, 1000.0], [0, 0], [0, 0], [0, 0],
                                     gridpp.Cartesian)],
            "pobs": [np.ones(1, np.float32),          # 1-D (r3: IndexError)
                     np.ones((2, e), np.float32),     # wrong S
                     np.ones((1, e + 1), np.float32)],  # wrong E
            "pratios": [np.full(2, 0.1), np.full((1, 1), 0.1)],
            "pbackground": [np.zeros((2, e)), np.zeros(e),
                            np.zeros((1, e + 1))],
            "pbackground_corr": [np.zeros((2, e)), np.zeros(e),
                                 np.zeros((1, e + 1))],
            "max_points": [-1],
        }

    def sweep(self, fn, ok, drop=(), pobs_1d=False):
        invalid = self.invalid(grid_form=not isinstance(
            ok["bgrid"], gridpp.Points))
        for key in drop:
            invalid.pop(key, None)
        if pobs_1d:
            invalid["pobs"] = [np.ones((1, self.E), np.float32),
                               np.ones(2, np.float32)]
        for key, bads in invalid.items():
            for bad in bads:
                args = ok.copy()
                args[key] = bad
                for name in drop:
                    args.pop(name, None)
                with pytest.raises(ValueError, match="."):
                    fn(*args.values())

    def test_ebe_grid(self):
        self.sweep(gridpp.optimal_interpolation_ensi_multi_ebe,
                   self.grid_args())

    def test_ebe_points(self):
        self.sweep(gridpp.optimal_interpolation_ensi_multi_ebe,
                   self.points_args())

    def test_ebesc_grid(self):
        ok = self.grid_args()
        self.sweep(gridpp.optimal_interpolation_ensi_multi_ebesc, ok,
                   drop=("background_corr", "pbackground_corr"))

    def test_ebesc_points(self):
        self.sweep(gridpp.optimal_interpolation_ensi_multi_ebesc,
                   self.points_args(),
                   drop=("background_corr", "pbackground_corr"))

    def test_utem_grid(self):
        ok = self.grid_args()
        ok["pobs"] = np.ones(1, np.float32)  # utem: scalar obs per point
        self.sweep(gridpp.optimal_interpolation_ensi_multi_utem, ok,
                   pobs_1d=True)

    def test_utem_points(self):
        ok = self.points_args()
        ok["pobs"] = np.ones(1, np.float32)
        self.sweep(gridpp.optimal_interpolation_ensi_multi_utem, ok,
                   pobs_1d=True)

    def test_ok_args_actually_ok(self):
        g = self.grid_args()
        out = gridpp.optimal_interpolation_ensi_multi_ebe(*g.values())
        assert out.shape == (3, 2, self.E)
        p = self.points_args()
        out = gridpp.optimal_interpolation_ensi_multi_ebe(*p.values())
        assert out.shape == (3, self.E)
        g = self.grid_args()
        g.pop("background_corr")
        g.pop("pbackground_corr")
        out = gridpp.optimal_interpolation_ensi_multi_ebesc(*g.values())
        assert out.shape == (3, 2, self.E)
        g = self.grid_args()
        g["pobs"] = np.ones(1, np.float32)
        out = gridpp.optimal_interpolation_ensi_multi_utem(*g.values())
        assert out.shape == (3, 2, self.E)


class TestMultiEnsiPipeline:
    """Device serving path (MultiEnsiPipeline) vs the host parity API.

    The serving path gathers pbackground (and pbackground_corr) from the
    background via the grid's nearest map, so the host API is called
    with exactly those gathered values.
    """

    def _mk(self, seed=0, ny=12, nx=15, p=25, e=5):
        rng = np.random.default_rng(seed)
        lats, lons = np.meshgrid(np.linspace(55, 57, ny),
                                 np.linspace(5, 7, nx), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points(rng.uniform(55.05, 56.95, p),
                               rng.uniform(5.05, 6.95, p))
        structure = gridpp.BarnesStructure(60000.0)
        bg = rng.normal(280, 5, (ny, nx, e)).astype(np.float32)
        bgc = (bg + rng.normal(0, 1, (ny, nx, e))).astype(np.float32)
        nn = grid.nearest_map(points.lats, points.lons)
        pback = bg.reshape(-1, e)[nn]
        pbackc = bgc.reshape(-1, e)[nn]
        pobs_e = (pback + rng.normal(0, 1, (p, e))).astype(np.float32)
        pratios = np.full(p, 0.1, np.float32)
        bratios = np.ones((ny, nx), np.float32)
        return (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
                pratios, bratios)

    @pytest.mark.parametrize("allow", [True, False])
    def test_ebesc_parity(self, allow):
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         pratios, bratios) = self._mk()
        host = gridpp.optimal_interpolation_ensi_multi_ebesc(
            grid, bratios, bg, points, pobs_e, pratios, pback,
            structure, 10, allow)
        pipe = gridpp.MultiEnsiPipeline(grid, points, structure,
                                        variant="ebesc", max_points=10,
                                        allow_extrapolation=allow,
                                        bratios=bratios)
        dev = pipe(bg, pobs_e, pratios)
        np.testing.assert_allclose(dev, host, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("allow", [True, False])
    def test_ebe_parity(self, allow):
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         pratios, bratios) = self._mk(seed=1)
        host = gridpp.optimal_interpolation_ensi_multi_ebe(
            grid, bratios, bg, bgc, points, pobs_e, pratios, pback,
            pbackc, structure, 10, allow)
        pipe = gridpp.MultiEnsiPipeline(grid, points, structure,
                                        variant="ebe", max_points=10,
                                        allow_extrapolation=allow,
                                        bratios=bratios)
        dev = pipe(bg, pobs_e, pratios, background_corr=bgc)
        np.testing.assert_allclose(dev, host, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("allow", [True, False])
    def test_utem_parity(self, allow):
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         pratios, bratios) = self._mk(seed=2)
        pobs = pobs_e[:, 0].copy()
        host = gridpp.optimal_interpolation_ensi_multi_utem(
            grid, bratios, bg, bgc, points, pobs, pratios, pback,
            pbackc, structure, 10, allow)
        pipe = gridpp.MultiEnsiPipeline(grid, points, structure,
                                        variant="utem", max_points=10,
                                        allow_extrapolation=allow,
                                        bratios=bratios)
        dev = pipe(bg, pobs, pratios, background_corr=bgc)
        np.testing.assert_allclose(dev, host, atol=5e-4, rtol=1e-4)

    def test_missing_obs_cycle(self):
        """NaN obs this cycle: masked out of the shortlist, like the host
        API's validity screening."""
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         pratios, bratios) = self._mk(seed=3)
        pobs_e[::3] = np.nan
        keep = np.isfinite(pobs_e[:, 0])
        host = gridpp.optimal_interpolation_ensi_multi_ebesc(
            grid, bratios, bg, points, pobs_e, pratios, pback,
            structure, 10)
        pipe = gridpp.MultiEnsiPipeline(grid, points, structure,
                                        variant="ebesc", max_points=10,
                                        candidates=25, bratios=bratios)
        dev = pipe(bg, pobs_e, pratios)
        np.testing.assert_allclose(dev, host, atol=2e-4, rtol=1e-4)
        assert keep.sum() > 0  # the cycle still assimilated something

    def test_requires_corr(self):
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         pratios, bratios) = self._mk(seed=4)
        pipe = gridpp.MultiEnsiPipeline(grid, points, structure,
                                        variant="utem")
        with pytest.raises(ValueError):
            pipe(bg, pobs_e[:, 0], pratios)
        with pytest.raises(ValueError):
            gridpp.MultiEnsiPipeline(grid, points, structure,
                                     variant="nope")


class TestNativeHostSolvers:
    """Threaded native ebe/ebesc/utem solvers vs the XLA kernels."""

    def _problem(self, seed=0, ny=24, nx=30, p=90, e=5):
        rng = np.random.default_rng(seed)
        lats, lons = np.meshgrid(np.linspace(55, 57.5, ny),
                                 np.linspace(5, 7.5, nx), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points(rng.uniform(55.05, 57.45, p),
                               rng.uniform(5.05, 7.45, p))
        bg = rng.normal(280, 5, (ny, nx, e)).astype(np.float32)
        bgc = (bg + rng.normal(0, 1, (ny, nx, e))).astype(np.float32)
        nn = grid.nearest_map(points.lats, points.lons)
        pback = bg.reshape(-1, e)[nn]
        pbackc = bgc.reshape(-1, e)[nn]
        pobs_e = (pback + rng.normal(0, 1, (p, e))).astype(np.float32)
        pobs_e[::11] = np.nan
        ratios = np.full(p, 0.1, np.float32)
        bratios = np.ones((ny, nx), np.float32)
        structure = gridpp.BarnesStructure(40000.0)
        return (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
                ratios, bratios)

    def _assert_close(self, a, b):
        close = np.isclose(a, b, atol=5e-4, rtol=1e-4, equal_nan=True)
        assert close.mean() > 0.99, f"{(~close).sum()} mismatches"
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1.0)
        assert np.nanmax(rel) < 5e-3

    @pytest.mark.parametrize("allow", [True, False])
    def test_ebe(self, allow, monkeypatch):
        from gridpp_tpu.api import oi_ensi_multi as m
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         ratios, bratios) = self._problem(seed=int(allow))
        out_nat = gridpp.optimal_interpolation_ensi_multi_ebe(
            grid, bratios, bg, bgc, points, pobs_e, ratios, pback,
            pbackc, structure, 8, allow)
        monkeypatch.setattr(m, "_native_ready", lambda s: None)
        out_xla = gridpp.optimal_interpolation_ensi_multi_ebe(
            grid, bratios, bg, bgc, points, pobs_e, ratios, pback,
            pbackc, structure, 8, allow)
        self._assert_close(out_nat, out_xla)

    @pytest.mark.parametrize("allow", [True, False])
    def test_ebesc(self, allow, monkeypatch):
        from gridpp_tpu.api import oi_ensi_multi as m
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         ratios, bratios) = self._problem(seed=2 + int(allow))
        out_nat = gridpp.optimal_interpolation_ensi_multi_ebesc(
            grid, bratios, bg, points, pobs_e, ratios, pback,
            structure, 8, allow)
        monkeypatch.setattr(m, "_native_ready", lambda s: None)
        out_xla = gridpp.optimal_interpolation_ensi_multi_ebesc(
            grid, bratios, bg, points, pobs_e, ratios, pback,
            structure, 8, allow)
        self._assert_close(out_nat, out_xla)

    @pytest.mark.parametrize("allow", [True, False])
    def test_utem(self, allow, monkeypatch):
        from gridpp_tpu.api import oi_ensi_multi as m
        (grid, points, structure, bg, bgc, pback, pbackc, pobs_e,
         ratios, bratios) = self._problem(seed=4 + int(allow))
        pobs = pobs_e[:, 0].copy()
        out_nat = gridpp.optimal_interpolation_ensi_multi_utem(
            grid, bratios, bg, bgc, points, pobs, ratios, pback,
            pbackc, structure, 8, allow)
        monkeypatch.setattr(m, "_native_ready", lambda s: None)
        out_xla = gridpp.optimal_interpolation_ensi_multi_utem(
            grid, bratios, bg, bgc, points, pobs, ratios, pback,
            pbackc, structure, 8, allow)
        self._assert_close(out_nat, out_xla)
