"""Tests for Grid/Points/KDTree domain objects (modelled on reference
tests/test_grid.py, test_points.py, test_kdtree.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestGrid:
    def test_size(self):
        np.testing.assert_array_equal(
            [2, 3],
            gridpp.Grid([[0, 0, 0], [1, 1, 1]], [[0, 1, 2], [0, 1, 2]]).size())
        np.testing.assert_array_equal([0, 0], gridpp.Grid().size())
        np.testing.assert_array_equal(
            [0, 0], gridpp.Grid(np.zeros([0, 0]), np.zeros([0, 0])).size())

    def test_attrs(self):
        grid = gridpp.Grid([[0, 1], [1, 2]], [[3, 4], [4, 5]],
                           [[6, 7], [7, 8]], [[0.1, 0.2], [0.1, 0.2]])
        np.testing.assert_array_almost_equal(grid.get_elevs(),
                                             [[6, 7], [7, 8]])
        np.testing.assert_array_almost_equal(
            grid.get_lafs(), [[0.1, 0.2], [0.1, 0.2]])

    def test_missing_elevs_filled(self):
        grid = gridpp.Grid([[0, 1]], [[0, 1]])
        assert np.all(np.isnan(grid.get_elevs()))

    def test_mismatched_sizes(self):
        with pytest.raises(ValueError):
            gridpp.Grid([[0, 1]], [[0, 1, 2]])

    def test_nearest_neighbour(self):
        grid = gridpp.Grid([[0, 0, 0], [1, 1, 1]], [[0, 1, 2], [0, 1, 2]])
        nn = grid.get_nearest_neighbour(0.9, 1.1)
        np.testing.assert_array_equal(nn, [1, 1])

    def test_get_box(self):
        lats, lons = np.meshgrid([0, 1, 2], [0, 1, 2], indexing="ij")
        grid = gridpp.Grid(lats, lons)
        found, y1, x1, y2, x2 = grid.get_box(0.5, 0.5)
        assert found
        assert (y1, x1, y2, x2) == (0, 0, 1, 1)
        found, *_ = grid.get_box(10, 10)
        assert not found

    def test_cartesian(self):
        grid = gridpp.Grid([[0, 0, 0], [1000, 1000, 1000]],
                           [[0, 1000, 2000], [0, 1000, 2000]],
                           type=gridpp.Cartesian)
        nn = grid.get_nearest_neighbour(900, 1100)
        np.testing.assert_array_equal(nn, [1, 1])


class TestPoints:
    def test_size(self):
        assert gridpp.Points([0, 1], [0, 1]).size() == 2
        assert gridpp.Points().size() == 0

    def test_attrs(self):
        points = gridpp.Points([0, 1], [10, 11], [20, 21], [30, 31])
        np.testing.assert_array_almost_equal(points.get_lats(), [0, 1])
        np.testing.assert_array_almost_equal(points.get_lons(), [10, 11])
        np.testing.assert_array_almost_equal(points.get_elevs(), [20, 21])
        np.testing.assert_array_almost_equal(points.get_lafs(), [30, 31])

    def test_unequal_sizes(self):
        with pytest.raises(ValueError):
            gridpp.Points([0, 1], [0])
        with pytest.raises(ValueError):
            gridpp.Points([0, 1], [0, 1], [0])

    def test_nearest(self):
        points = gridpp.Points([0, 1000, 2000], [0, 0, 0],
                               [0, 0, 0], [0, 0, 0], gridpp.Cartesian)
        assert points.get_nearest_neighbour(900, 0) == 1

    def test_neighbours_radius(self):
        points = gridpp.Points([0, 1000, 2000], [0, 0, 0],
                               [0, 0, 0], [0, 0, 0], gridpp.Cartesian)
        idx = points.get_neighbours(0, 0, 1500)
        assert set(np.asarray(idx).tolist()) == {0, 1}
        # a point exactly radius away along an axis is excluded: the
        # reference's within(box) prefilter is boundary-exclusive
        # (kdtree.cpp:46-53; its test_radius_match asserts this)
        idx = points.get_neighbours(0, 0, 1000)
        assert set(np.asarray(idx).tolist()) == {0}
        idx = points.get_neighbours(0, 0, 1001)
        assert set(np.asarray(idx).tolist()) == {0, 1}
        # exclude match (point 1 at exactly 1000 still box-excluded)
        idx = points.get_neighbours(0, 0, 1001, False)
        assert set(np.asarray(idx).tolist()) == {1}
        idx = points.get_neighbours(0, 0, 1000, False)
        assert set(np.asarray(idx).tolist()) == set()

    def test_subset(self):
        points = gridpp.Points([0, 1, 2, 2, 4], [0] * 5)
        sub = points.subset([0, 2])
        np.testing.assert_array_almost_equal(sub.get_lats(), [0, 2])
        with pytest.raises(ValueError):
            points.subset([10])

    def test_get_in_domain(self):
        lats, lons = np.meshgrid([0, 1, 2], [0, 1, 2], indexing="ij")
        grid = gridpp.Grid(lats, lons)
        points = gridpp.Points([0.5, 5.0], [0.5, 5.0])
        inside = points.get_in_domain(grid)
        assert inside.size() == 1
        np.testing.assert_array_almost_equal(inside.get_lats(), [0.5])


class TestKDTree:
    def test_distance(self):
        self_dist = gridpp.KDTree.calc_distance(0, 0, 0, 0)
        assert self_dist == 0
        d = gridpp.KDTree.calc_distance(0, 0, 0.001, 0.001)
        assert d == pytest.approx(157.43, abs=0.1)

    def test_straight_distance(self):
        p0 = gridpp.Point(0, 0)
        p1 = gridpp.Point(0.001, 0.001)
        d = gridpp.KDTree.calc_straight_distance(p0, p1)
        assert d == pytest.approx(157.43, abs=0.1)

    def test_rad2deg(self):
        assert gridpp.KDTree_rad2deg(1) == pytest.approx(180 / 3.14159265, abs=1e-5)
        assert gridpp.KDTree_rad2deg(0) == 0

    def test_queries(self):
        tree = gridpp.KDTree([50, 50, 51], [0, 0, 10])
        assert tree.size() == 3
        assert tree.get_coordinate_type() == gridpp.Geodetic
        nn = tree.get_nearest_neighbour(51, 10.1)
        assert nn == 2

    def test_cartesian(self):
        tree = gridpp.KDTree([0, 1000, 2000], [0, 1000, 2000],
                             gridpp.Cartesian)
        assert tree.get_nearest_neighbour(100, 100) == 0

    def test_pole(self):
        tree = gridpp.KDTree([89, 89, 90], [0, 180, 0])
        assert tree.get_nearest_neighbour(90, 90) == 2
