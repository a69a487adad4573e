"""Ported golden-value tests for downscale_probability,
mask_threshold_downscale_consensus/_quantile, and distance (reference
tests/test_downscale_probability.py,
test_mask_threshold_downscale_consensus.py, test_distance.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestDownscaleProbability:
    def setup_method(self):
        lons1, lats1 = np.meshgrid([10, 30], [50, 30])
        lons2, lats2 = np.meshgrid([5, 15, 25], [45, 35, 25])
        self.grid1 = gridpp.Grid(lats1, lons1)
        self.grid2 = gridpp.Grid(lats2, lons2)
        self.values = np.moveaxis(np.array(
            [[[-1., -1.], [-1., -1.]],
             [[0., 0.], [0., 0.]],
             [[1., 1.], [1., 1.]]]), 0, -1)
        self.thresholds = np.array([[-2., -0.5, 0.5],
                                    [0., 1., -1.],
                                    [2., 0.5, 0.]])

    def test_leq(self):
        output = gridpp.downscale_probability(
            self.grid1, self.grid2, self.values, self.thresholds, gridpp.Leq)
        np.testing.assert_array_almost_equal(
            output, [[0., 1 / 3, 2 / 3], [2 / 3, 1., 1 / 3],
                     [1., 2 / 3, 2 / 3]])

    def test_gt(self):
        output = gridpp.downscale_probability(
            self.grid1, self.grid2, self.values, self.thresholds, gridpp.Gt)
        np.testing.assert_array_almost_equal(
            output, [[1., 2 / 3, 1 / 3], [1 / 3, 0., 2 / 3],
                     [0., 1 / 3, 1 / 3]])

    def test_geq_with_nan(self):
        self.values[1, 1, 0] = np.nan
        output = gridpp.downscale_probability(
            self.grid1, self.grid2, self.values, self.thresholds, gridpp.Geq)
        np.testing.assert_array_almost_equal(
            output, [[1., 2 / 3, 1 / 3], [2 / 3, 1 / 3, 1.],
                     [0., 1 / 3, 1.]])

    def test_lt_with_all_nan(self):
        self.values[0, 0, :] = np.nan
        output = gridpp.downscale_probability(
            self.grid1, self.grid2, self.values, self.thresholds, gridpp.Lt)
        np.testing.assert_array_almost_equal(
            output, [[np.nan, np.nan, 2 / 3], [1 / 3, 2 / 3, 0.],
                     [1., 2 / 3, 1 / 3]])


class TestMaskThreshold:
    def setup_method(self):
        lons1, lats1 = np.meshgrid([10, 30], [50, 30])
        lons2, lats2 = np.meshgrid([5, 15, 25], [45, 35, 25])
        self.grid1 = gridpp.Grid(lats1, lons1)
        self.grid2 = gridpp.Grid(lats2, lons2)
        self.threshold_values = np.moveaxis(np.array(
            [[[-1., -1.], [-1., -1.]],
             [[0., 0.], [0., 0.]],
             [[1., 1.], [1., 1.]]]), 0, -1)
        self.thresholds = np.array([[-2., -0.5, 0.5],
                                    [0., 1., -1.],
                                    [2., 0.5, 0.]])
        self.valuestrue = np.moveaxis(np.array(
            [[[10., 5.], [3., 2.]],
             [[0., 1.], [4., 0.]],
             [[3., 0.], [0., 6.]]]), 0, -1)
        self.valuesfalse = np.zeros((2, 2, 3))

    def test_leq_mean(self):
        output = gridpp.mask_threshold_downscale_consensus(
            self.grid1, self.grid2, self.valuestrue, self.valuesfalse,
            self.threshold_values, self.thresholds, gridpp.Leq, gridpp.Mean)
        np.testing.assert_array_almost_equal(
            output, [[0., 3 + 1 / 3, 2.], [2 + 1 / 3, 2 + 1 / 3, 2 / 3],
                     [2 + 1 / 3, 2 + 1 / 3, 2 / 3]])

    def test_leq_sum(self):
        output = gridpp.mask_threshold_downscale_consensus(
            self.grid1, self.grid2, self.valuestrue, self.valuesfalse,
            self.threshold_values, self.thresholds, gridpp.Leq, gridpp.Sum)
        np.testing.assert_array_almost_equal(
            output, [[0., 10., 6.], [7., 7., 2.], [7., 7., 2.]])

    def test_gt_median(self):
        output = gridpp.mask_threshold_downscale_consensus(
            self.grid1, self.grid2, self.valuestrue, self.valuesfalse,
            self.threshold_values, self.thresholds, gridpp.Gt, gridpp.Median)
        np.testing.assert_array_almost_equal(
            output, [[3., 0., 0.], [0., 0., 0.], [0., 0., 0.]])

    def test_lt_max(self):
        output = gridpp.mask_threshold_downscale_consensus(
            self.grid1, self.grid2, self.valuestrue, self.valuesfalse,
            self.threshold_values, self.thresholds, gridpp.Lt, gridpp.Max)
        np.testing.assert_array_almost_equal(
            output, [[0., 10., 5.], [3., 4., 0.], [4., 4., 2.]])

    def test_geq_count_with_nan(self):
        self.threshold_values[0, 1, 0] = np.nan
        output = gridpp.mask_threshold_downscale_consensus(
            self.grid1, self.grid2, self.valuestrue, self.valuesfalse,
            self.threshold_values, self.thresholds, gridpp.Geq, gridpp.Count)
        np.testing.assert_array_almost_equal(
            output, [[3., 3., 2.], [3., 3., 3.], [3., 3., 3.]])

    def test_leq_quantile(self):
        output = gridpp.mask_threshold_downscale_quantile(
            self.grid1, self.grid2, self.valuestrue, self.valuesfalse,
            self.threshold_values, self.thresholds, gridpp.Leq, 0.25)
        np.testing.assert_array_almost_equal(
            output, [[0., 0., 0.5], [1.5, 1.5, 0.], [1.5, 1.5, 0.]])


class TestDistanceGolden:
    def test_point_to_grid_cartesian(self):
        lons, lats = np.meshgrid([0, 1000, 2000], [0, 1000])
        grid = gridpp.Grid(lats, lons, 0 * lats, 0 * lats, gridpp.Cartesian)
        points = gridpp.Points([0, 0], [0, 600], [0, 0], [0, 0],
                               gridpp.Cartesian)
        np.testing.assert_array_almost_equal(
            gridpp.distance(points, grid, 1),
            [[0, 400, 1400],
             [1000, np.sqrt(1000 ** 2 + 400 ** 2),
              np.sqrt(1000 ** 2 + 1400 ** 2)]], 2)
        np.testing.assert_array_almost_equal(
            gridpp.distance(points, grid, 2),
            [[600, 1000, 2000],
             [np.sqrt(1000 ** 2 + 600 ** 2), np.sqrt(2) * 1000,
              np.sqrt(1000 ** 2 + 2000 ** 2)]], 2)

    def test_grid_to_point_geodetic(self):
        lons, lats = np.meshgrid([0, 1, 2], [0, 1])
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points([0, 0], [0, 0.6])
        np.testing.assert_array_almost_equal(
            gridpp.distance(grid, points, 1), [0, 44528], 0)
        np.testing.assert_array_almost_equal(
            gridpp.distance(grid, points, 2), [111319.49, 66791.7], 0)

    def test_grid_to_point_cartesian(self):
        lons, lats = np.meshgrid([0, 1000, 2000], [0, 1000])
        grid = gridpp.Grid(lats, lons, 0 * lats, 0 * lats, gridpp.Cartesian)
        points = gridpp.Points([0, 0], [0, 600], [0, 0], [0, 0],
                               gridpp.Cartesian)
        np.testing.assert_array_almost_equal(
            gridpp.distance(grid, points, 1), [0, 400], 2)
        np.testing.assert_array_almost_equal(
            gridpp.distance(grid, points, 2), [1000, 600], 2)
