"""Tests for gridding, count, distance, fill, doping, masking, search
(golden values ported from the reference test suite)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestGridding:
    def setup_method(self):
        y, x = np.meshgrid(np.linspace(0, 1, 2), np.linspace(0, 1, 3))
        self.grid = gridpp.Grid(y, x, 0 * y, 0 * y, gridpp.Cartesian)
        self.grid_as_points = self.grid.to_points()
        self.points = gridpp.Points([-0.2, 0.5, 1], [-0.2, 0.5, 1],
                                    [0, 0, 0], [0, 0, 0], gridpp.Cartesian)
        self.values = [1, 2, 3]

    def test_min_num(self):
        expected_list = {
            0: [[1, np.nan], [2, 5], [np.nan, 3]],
            1: [[1, np.nan], [2, 5], [np.nan, 3]],
            2: [[np.nan, np.nan], [np.nan, 5], [np.nan, np.nan]],
        }
        for grid in [self.grid, self.grid_as_points]:
            for min_num, expected in expected_list.items():
                output = gridpp.gridding(grid, self.points, self.values,
                                         0.6, min_num, gridpp.Sum)
                np.testing.assert_array_almost_equal(
                    output.flatten(), np.array(expected).flatten())

    def test_statistic(self):
        expected_list = {
            gridpp.Sum: [[1, np.nan], [2, 5], [np.nan, 3]],
            gridpp.Mean: [[1, np.nan], [2, 2.5], [np.nan, 3]],
            gridpp.Count: [[1, 0], [1, 2], [0, 1]],
        }
        for grid in [self.grid, self.grid_as_points]:
            for statistic, expected in expected_list.items():
                output = gridpp.gridding(grid, self.points, self.values,
                                         0.6, 0, statistic)
                np.testing.assert_array_almost_equal(
                    output.flatten(), np.array(expected).flatten())

    def test_radius(self):
        expected_list = {
            0.001: [[np.nan, np.nan], [np.nan, np.nan], [np.nan, 3]],
            0.6: [[1, np.nan], [2, 5], [np.nan, 3]],
            10: [[6, 6], [6, 6], [6, 6]],
        }
        for radius, expected in expected_list.items():
            output = gridpp.gridding(self.grid, self.points, self.values,
                                     radius, 0, gridpp.Sum)
            np.testing.assert_array_almost_equal(
                output.flatten(), np.array(expected).flatten())

    def test_invalid(self):
        with pytest.raises(ValueError):
            gridpp.gridding(self.grid, self.points, [1, 2], 0.6, 0,
                            gridpp.Sum)
        with pytest.raises(ValueError):
            gridpp.gridding(self.grid, self.points, self.values, -1, 0,
                            gridpp.Sum)
        with pytest.raises(ValueError):
            gridpp.gridding(self.grid, self.points, self.values, 0.6, -1,
                            gridpp.Sum)

    def test_gridding_nearest(self):
        output = gridpp.gridding_nearest(self.grid, self.points, self.values,
                                         0, gridpp.Mean)
        assert output.shape == tuple(self.grid.size())
        # point 0 (-0.2,-0.2) maps to cell (0,0); point 1 (0.5,0.5) to some
        # middle cell; point 2 (1,1) to the last cell
        assert output.flatten()[0] == 1
        assert np.nansum(output) == 6

    def test_gridding_nearest_min_num(self):
        output = gridpp.gridding_nearest(self.grid, self.points, self.values,
                                         2, gridpp.Mean)
        assert np.isnan(output).all()

    def test_gridding_nearest_order_stat_trailing_empty_cells(self):
        """Order statistics with unoccupied trailing cells: empty
        segments at the end of the scatter used to index past the value
        array (regression)."""
        y, x = np.meshgrid(np.arange(4) * 1000.0, np.arange(4) * 1000.0,
                           indexing="ij")
        grid = gridpp.Grid(y, x, type=gridpp.Cartesian)
        # all points land in cell (0, 0); every other cell (incl. the
        # last) is empty
        points = gridpp.Points([0.0, 10.0, 20.0], [0.0, 10.0, 20.0],
                               type=gridpp.Cartesian)
        vals = np.array([3.0, 1.0, 2.0], np.float32)
        for stat, expected in ((gridpp.Max, 3.0), (gridpp.Min, 1.0),
                               (gridpp.Median, 2.0)):
            out = gridpp.gridding_nearest(grid, points, vals, 1, stat)
            assert out[0, 0] == expected
            assert np.isnan(out.flatten()[1:]).all()


class TestCountDistance:
    def test_count(self):
        y, x = np.meshgrid([0, 1000, 2000], [0, 1000, 2000], indexing="ij")
        grid = gridpp.Grid(y, x, type=gridpp.Cartesian)
        points = gridpp.Points([0, 1000], [0, 1000], type=gridpp.Cartesian)
        out = gridpp.count(points, grid, 1100.0)
        assert out.shape == (3, 3)
        # verify against brute force
        pxyz = points.xyz
        gxyz = grid.index.xyz
        d = np.linalg.norm(gxyz[:, None] - pxyz[None], axis=-1)
        expected = (d <= 1100).sum(axis=1).reshape(3, 3)
        np.testing.assert_array_equal(out, expected)

    def test_distance(self):
        points = gridpp.Points([0, 1000], [0, 0], type=gridpp.Cartesian)
        opoints = gridpp.Points([500], [0], type=gridpp.Cartesian)
        out = gridpp.distance(points, opoints, 1)
        np.testing.assert_array_almost_equal(out, [500])
        out = gridpp.distance(points, opoints, 2)
        np.testing.assert_array_almost_equal(out, [500])


class TestFillMissing:
    def test_linear(self):
        values0 = np.reshape(np.arange(25), [5, 5]).astype(float)
        values = values0.copy()
        values[2, 1:4] = np.nan
        values[1, 1] = np.nan
        output = gridpp.fill_missing(values)
        np.testing.assert_array_equal(output, values0)

    def test_missing_on_edge(self):
        values0 = np.reshape(np.arange(25), [5, 5]).astype(float)
        values = values0.copy()
        values[1, 1] = np.nan
        values[1, 3:5] = np.nan
        values[1, 0:2] = np.nan
        output = gridpp.fill_missing(values)
        np.testing.assert_array_equal(output, values0)

    def test_missing_on_y_edge(self):
        values0 = np.reshape(np.arange(24), [3, 8]).astype(float)
        values = values0.copy()
        values[1:, 1] = np.nan
        output = gridpp.fill_missing(values)
        np.testing.assert_array_equal(output, values0)

    def test_missing_on_both_edges(self):
        values0 = np.reshape(np.arange(25), [5, 5]).astype(float)
        values = values0.copy()
        values[3:5, 3:5] = np.nan
        output = gridpp.fill_missing(values)
        np.testing.assert_array_equal(output[0:3, :], values0[0:3, :])
        np.testing.assert_array_equal(output[:, 0:3], values0[:, 0:3])
        assert np.isnan(output[3:5, 3:5]).all()


class TestFillDoping:
    def setup_method(self):
        y, x = np.meshgrid(np.arange(5) * 1000.0, np.arange(5) * 1000.0,
                           indexing="ij")
        self.grid = gridpp.Grid(y, x, 0 * y, 0 * y, gridpp.Cartesian)
        self.background = np.zeros((5, 5), np.float32)

    def test_fill_inside(self):
        points = gridpp.Points([2000.0], [2000.0], [0], [0],
                               gridpp.Cartesian)
        out = gridpp.fill(self.grid, self.background, points, [1100.0],
                          9.0, False)
        assert out[2, 2] == 9
        assert out[2, 1] == 9 and out[1, 2] == 9
        assert out[0, 0] == 0
        assert (out == 9).sum() == 5

    def test_fill_outside(self):
        points = gridpp.Points([2000.0], [2000.0], [0], [0],
                               gridpp.Cartesian)
        out = gridpp.fill(self.grid, self.background, points, [1100.0],
                          9.0, True)
        assert out[2, 2] == 0
        assert out[0, 0] == 9
        assert (out == 0).sum() == 5

    def test_doping_square(self):
        points = gridpp.Points([2000.0], [2000.0], [0], [0],
                               gridpp.Cartesian)
        out = gridpp.doping_square(self.grid, self.background, points,
                                   [5.0], [1])
        assert (out == 5).sum() == 9
        assert out[2, 2] == 5

    def test_doping_circle(self):
        points = gridpp.Points([2000.0], [2000.0], [0], [0],
                               gridpp.Cartesian)
        out = gridpp.doping_circle(self.grid, self.background, points,
                                   [5.0], [1100.0])
        assert (out == 5).sum() == 5

    def test_doping_elev_gate(self):
        elevs = np.zeros((5, 5), np.float32)
        elevs[2, 2] = 500.0
        y, x = np.meshgrid(np.arange(5) * 1000.0, np.arange(5) * 1000.0,
                           indexing="ij")
        grid = gridpp.Grid(y, x, elevs, 0 * y, gridpp.Cartesian)
        points = gridpp.Points([2000.0], [2000.0], [0.0], [0],
                               gridpp.Cartesian)
        out = gridpp.doping_circle(grid, self.background, points, [5.0],
                                   [1100.0], 100.0)
        assert out[2, 2] == 0  # gated out by elevation diff
        assert out[2, 1] == 5

    def test_validation(self):
        points = gridpp.Points([0.0], [0.0], [0], [0], gridpp.Cartesian)
        with pytest.raises(ValueError):
            gridpp.fill(self.grid, self.background, points, [-1], 9.0, False)
        with pytest.raises(ValueError):
            gridpp.doping_square(self.grid, self.background, points, [5.0],
                                 [-1])
        with pytest.raises(ValueError):
            gridpp.doping_circle(self.grid, self.background, points, [5.0],
                                 [1000.0], -1)


class TestMasking:
    def setup_method(self):
        y, x = np.meshgrid([0.0, 1000.0], [0.0, 1000.0], indexing="ij")
        self.igrid = gridpp.Grid(y, x, type=gridpp.Cartesian)
        self.ogrid = gridpp.Grid(y, x, type=gridpp.Cartesian)

    def test_downscale_probability(self):
        values = np.zeros((2, 2, 4), np.float32)
        values[0, 0] = [1, 2, 3, 4]
        threshold = np.full((2, 2), 2.5, np.float32)
        out = gridpp.downscale_probability(self.igrid, self.ogrid, values,
                                           threshold, gridpp.Gt)
        assert out[0, 0] == 0.5
        assert out[1, 1] == 0.0
        values[1, 1] = [np.nan] * 4
        out = gridpp.downscale_probability(self.igrid, self.ogrid, values,
                                           threshold, gridpp.Gt)
        assert np.isnan(out[1, 1])

    def test_mask_threshold_consensus(self):
        tvals = np.zeros((2, 2, 4), np.float32)
        tvals[0, 0] = [1, 2, 3, 4]
        vtrue = np.full((2, 2, 4), 10.0, np.float32)
        vfalse = np.full((2, 2, 4), 20.0, np.float32)
        threshold = np.full((2, 2), 2.5, np.float32)
        out = gridpp.mask_threshold_downscale_consensus(
            self.igrid, self.ogrid, vtrue, vfalse, tvals, threshold,
            gridpp.Leq, gridpp.Mean)
        assert out[0, 0] == 15.0  # two members true, two false
        assert out[1, 1] == 10.0  # all thresholds 0 <= 2.5 -> true

    def test_mask_threshold_quantile(self):
        tvals = np.zeros((2, 2, 4), np.float32)
        vtrue = np.tile(np.array([1, 2, 3, 4], np.float32), (2, 2, 1))
        vfalse = np.zeros((2, 2, 4), np.float32)
        threshold = np.full((2, 2), 2.5, np.float32)
        out = gridpp.mask_threshold_downscale_quantile(
            self.igrid, self.ogrid, vtrue, vfalse, tvals, threshold,
            gridpp.Leq, 0.5)
        assert out[0, 0] == 2.5


class TestNeighbourhoodSearch:
    def test_basic_mean(self):
        array = np.array([[1.0, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32)
        search = np.ones((3, 3), np.float32)
        out = gridpp.neighbourhood_search(array, search, 1, 0.5, 1.5, 0.1)
        # all cells in target -> windowed mean
        expected = gridpp.neighbourhood(array, 1, gridpp.Mean)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_no_target_passthrough(self):
        array = np.array([[1.0, 2], [3, 4]], np.float32)
        search = np.zeros((2, 2), np.float32)
        # target range far away; delta large -> no fallback
        out = gridpp.neighbourhood_search(array, search, 1, 5.0, 6.0, 10.0)
        np.testing.assert_array_equal(out, array)

    def test_apply_array(self):
        array = np.array([[1.0, 2], [3, 4]], np.float32)
        search = np.ones((2, 2), np.float32)
        apply = np.array([[1, 0], [0, 0]], np.int32)
        out = gridpp.neighbourhood_search(array, search, 1, 0.5, 1.5, 0.1,
                                          apply)
        assert out[0, 0] == pytest.approx(2.5)  # mean of all 4
        assert out[0, 1] == 2 and out[1, 0] == 3 and out[1, 1] == 4

    def test_validation(self):
        with pytest.raises(ValueError):
            gridpp.neighbourhood_search(np.ones((2, 2)), np.ones((2, 2)),
                                        1, 2.0, 1.0, 0.1)
        with pytest.raises(ValueError):
            gridpp.neighbourhood_search(np.ones((2, 2)), np.ones((3, 2)),
                                        1, 0.0, 1.0, 0.1)


class TestSmart:
    def test_basic(self):
        y, x = np.meshgrid(np.arange(3) * 1000.0, np.arange(3) * 1000.0,
                           indexing="ij")
        grid = gridpp.Grid(y, x, 0 * y, 0 * y, gridpp.Cartesian)
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        structure = gridpp.BarnesStructure(2000.0)
        out = gridpp.smart(grid, grid, values, 1, structure)
        # num=1 -> nearest (highest rho) cell = itself
        np.testing.assert_array_almost_equal(out, values)


class TestStaticCorr:
    def test_basic(self):
        points = gridpp.Points([0.0, 1000.0], [0, 0], [0, 0], [0, 0],
                               gridpp.Cartesian)
        knots = gridpp.Points([0.0, 2000.0], [0, 0], [0, 0], [0, 0],
                              gridpp.Cartesian)
        structure = gridpp.BarnesStructure(1000.0)
        out = gridpp.staticcorr_points(points, knots, structure, 10)
        assert out.shape == (2, 2)
        assert out[0, 0] == pytest.approx(1.0, abs=1e-6)
        assert out[0, 1] == pytest.approx(np.exp(-2), abs=1e-5)
        assert out[1, 0] == pytest.approx(np.exp(-0.5), abs=1e-6)


class TestNeighbourhoodScore:
    def test_perfect_forecast(self):
        y, x = np.meshgrid(np.arange(5) * 1000.0, np.arange(5) * 1000.0,
                           indexing="ij")
        grid = gridpp.Grid(y, x, type=gridpp.Cartesian)
        # obs at every grid point matching the forecast
        points = grid.to_points()
        fcst = np.zeros((5, 5), np.float32)
        fcst[2:, :] = 2.0
        ref = fcst.ravel()
        out = gridpp.neighbourhood_score(grid, points, fcst, ref, 1,
                                         gridpp.Ts, 1.0)
        # Perfect forecast -> TS = 1 wherever events exist in the window
        assert out.shape == (5, 5)
        assert np.nanmax(out) == pytest.approx(1.0)

    def test_validation(self):
        y, x = np.meshgrid(np.arange(3) * 1000.0, np.arange(3) * 1000.0,
                           indexing="ij")
        grid = gridpp.Grid(y, x, type=gridpp.Cartesian)
        points = grid.to_points()
        with pytest.raises(ValueError):
            gridpp.neighbourhood_score(grid, points, np.zeros((3, 3)),
                                       np.zeros(9), 0, gridpp.Ts, 1.0)


class TestSwigParity:
    def test_inputs(self):
        assert gridpp.test_vec_input([1, 2, 3]) == 6
        assert gridpp.test_ivec_input([1, 2, 3]) == 6
        assert gridpp.test_vec2_input(np.ones((2, 2))) == 4
        assert gridpp.test_vec3_input(np.ones((2, 2, 2))) == 8

    def test_outputs(self):
        assert gridpp.test_vec_output().shape == (3,)
        assert (gridpp.test_vec2_output() == -1).all()
        assert gridpp.test_ivec3_output().shape == (3, 3, 3)
        val, arr = gridpp.test_vec_argout()
        assert arr.shape == (10,)
        with pytest.raises(NotImplementedError):
            gridpp.test_not_implemented_exception()


class TestGriddingNativeParity:
    """Native fused radius_stat vs the scipy list + segment-statistic
    path, on NaN-laden random obs (cross-implementation strategy of the
    reference's own fast-vs-brute tests)."""

    @pytest.mark.parametrize("stat", [
        gridpp.Mean, gridpp.Min, gridpp.Median, gridpp.Max, gridpp.Std,
        gridpp.Variance, gridpp.Sum, gridpp.Count])
    @pytest.mark.parametrize("min_num", [0, 2])
    def test_vs_scipy_path(self, stat, min_num):
        from gridpp_tpu.api import gridding as gmod
        from gridpp_tpu.constants import Statistic, MV
        import itertools

        rng = np.random.default_rng(7)
        n = 25
        lats, lons = np.meshgrid(np.linspace(50, 51, n),
                                 np.linspace(5, 6, n), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        num = 800
        pts = gridpp.Points(rng.uniform(50, 51, num),
                            rng.uniform(5, 6, num),
                            np.zeros(num), np.zeros(num))
        vals = rng.normal(0, 10, num).astype(np.float32)
        vals[rng.random(num) < 0.2] = np.nan
        radius = 8000.0

        got = gridpp.gridding(grid, pts, vals, radius, min_num, stat)

        # independent reference: scipy radius lists + segment statistic
        from gridpp_tpu.core import coords
        q = np.stack(coords.convert_coordinates_np(
            lats.ravel().astype(np.float64),
            lons.ravel().astype(np.float64),
            pts.get_coordinate_type()), axis=-1)
        lists = pts.index.tree.query_ball_point(q, r=radius, workers=-1)
        lens = np.fromiter((len(l) for l in lists), np.int64,
                           count=len(lists))
        flat = np.fromiter(itertools.chain.from_iterable(lists), np.int64,
                           count=int(lens.sum()))
        res = gmod._segment_statistic(vals[flat], lens, int(stat))
        want = np.full(len(lists), MV, np.float32)
        allowed = lens >= min_num if min_num > 0 else np.ones(len(lists),
                                                             bool)
        nonzero = allowed & (lens > 0)
        want[nonzero] = res[nonzero]
        if int(stat) == Statistic.Count:
            want[allowed & (lens == 0)] = 0
        np.testing.assert_allclose(got.ravel(), want, rtol=1e-5,
                                   atol=1e-5, equal_nan=True)
