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
