"""Tests for nearest/bilinear downscaling (modelled on reference
tests/test_nearest.py, test_bilinear.py, test_downscaling.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


def make_grids():
    ilats, ilons = np.meshgrid([0, 1, 2], [0, 1, 2], indexing="ij")
    igrid = gridpp.Grid(ilats, ilons)
    olats, olons = np.meshgrid([0.4, 1.6], [0.4, 1.6], indexing="ij")
    ogrid = gridpp.Grid(olats, olons)
    return igrid, ogrid


class TestNearest:
    def test_grid_to_grid(self):
        igrid, ogrid = make_grids()
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        out = gridpp.nearest(igrid, ogrid, values)
        np.testing.assert_array_almost_equal(out, [[0, 2], [6, 8]])

    def test_grid_to_grid_3d(self):
        igrid, ogrid = make_grids()
        values = np.arange(18, dtype=np.float32).reshape(2, 3, 3)
        out = gridpp.nearest(igrid, ogrid, values)
        assert out.shape == (2, 2, 2)
        np.testing.assert_array_almost_equal(out[0], [[0, 2], [6, 8]])
        np.testing.assert_array_almost_equal(out[1], [[9, 11], [15, 17]])

    def test_grid_to_points(self):
        igrid, _ = make_grids()
        points = gridpp.Points([0.4, 1.6], [0.4, 1.6])
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        out = gridpp.nearest(igrid, points, values)
        np.testing.assert_array_almost_equal(out, [0, 8])

    def test_points_to_points(self):
        ipoints = gridpp.Points([0, 1, 2], [0, 1, 2])
        opoints = gridpp.Points([0.1, 1.9], [0.1, 1.9])
        out = gridpp.nearest(ipoints, opoints, [10.0, 20.0, 30.0])
        np.testing.assert_array_almost_equal(out, [10, 30])

    def test_points_to_grid(self):
        ipoints = gridpp.Points([0, 2], [0, 2])
        _, ogrid = make_grids()
        out = gridpp.nearest(ipoints, ogrid, [10.0, 30.0])
        np.testing.assert_array_almost_equal(out, [[10, 30], [30, 30]])

    def test_size_mismatch(self):
        igrid, ogrid = make_grids()
        with pytest.raises(ValueError):
            gridpp.nearest(igrid, ogrid, np.zeros([2, 2]))

    def test_nan_propagation(self):
        igrid, ogrid = make_grids()
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        values[0, 0] = np.nan
        out = gridpp.nearest(igrid, ogrid, values)
        assert np.isnan(out[0, 0])
        assert out[1, 1] == 8


class TestBilinear:
    def test_identity_on_grid_points(self):
        # Output points coincide with input grid points -> exact values
        igrid, _ = make_grids()
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        out = gridpp.bilinear(igrid, igrid, values)
        np.testing.assert_array_almost_equal(out, values, decimal=5)

    def test_midpoint(self):
        ilats, ilons = np.meshgrid([0, 1], [0, 1], indexing="ij")
        igrid = gridpp.Grid(ilats, ilons)
        points = gridpp.Points([0.5], [0.5])
        out = gridpp.bilinear(igrid, points, [[0.0, 1.0], [2.0, 3.0]])
        np.testing.assert_array_almost_equal(out, [1.5])

    def test_quarter_point(self):
        ilats, ilons = np.meshgrid([0, 1], [0, 1], indexing="ij")
        igrid = gridpp.Grid(ilats, ilons)
        points = gridpp.Points([0.25], [0.75])
        out = gridpp.bilinear(igrid, points, [[0.0, 1.0], [2.0, 3.0]])
        np.testing.assert_array_almost_equal(out, [0.25 * 2 + 0.75], decimal=5)

    def test_outside_falls_back_to_nearest(self):
        igrid, _ = make_grids()
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        points = gridpp.Points([10.0], [10.0])
        out = gridpp.bilinear(igrid, points, values)
        np.testing.assert_array_almost_equal(out, [8])

    def test_nan_corner_falls_back_to_nearest(self):
        ilats, ilons = np.meshgrid([0, 1], [0, 1], indexing="ij")
        igrid = gridpp.Grid(ilats, ilons)
        points = gridpp.Points([0.4], [0.4])
        out = gridpp.bilinear(igrid, points, [[0.0, 1.0], [np.nan, 3.0]])
        np.testing.assert_array_almost_equal(out, [0.0])

    def test_3d(self):
        igrid, ogrid = make_grids()
        values = np.ones([2, 3, 3], np.float32)
        values[1] *= 4
        out = gridpp.bilinear(igrid, ogrid, values)
        assert out.shape == (2, 2, 2)
        np.testing.assert_array_almost_equal(out[0], np.ones([2, 2]))
        np.testing.assert_array_almost_equal(out[1], 4 * np.ones([2, 2]))

    def test_size_mismatch(self):
        igrid, ogrid = make_grids()
        with pytest.raises(ValueError):
            gridpp.bilinear(igrid, ogrid, np.zeros([2, 2]))


class TestDownscaling:
    def test_dispatch(self):
        igrid, ogrid = make_grids()
        values = np.arange(9, dtype=np.float32).reshape(3, 3)
        out_n = gridpp.downscaling(igrid, ogrid, values, gridpp.Nearest)
        out_b = gridpp.downscaling(igrid, ogrid, values, gridpp.Bilinear)
        np.testing.assert_array_almost_equal(
            out_n, gridpp.nearest(igrid, ogrid, values))
        np.testing.assert_array_almost_equal(
            out_b, gridpp.bilinear(igrid, ogrid, values))

    def test_invalid_downscaler(self):
        igrid, ogrid = make_grids()
        with pytest.raises(ValueError):
            gridpp.downscaling(igrid, ogrid, np.zeros([3, 3]), 99)

    def test_readme_example(self):
        # The README quickstart shape: 200x200 noise -> 400x400 nearest
        rng = np.random.default_rng(0)
        lats_i, lons_i = np.meshgrid(np.linspace(0, 10, 50),
                                     np.linspace(0, 10, 50), indexing="ij")
        lats_o, lons_o = np.meshgrid(np.linspace(0, 10, 100),
                                     np.linspace(0, 10, 100), indexing="ij")
        igrid = gridpp.Grid(lats_i, lons_i)
        ogrid = gridpp.Grid(lats_o, lons_o)
        values = rng.normal(size=(50, 50)).astype(np.float32)
        out = gridpp.downscaling(igrid, ogrid, values, gridpp.Nearest)
        assert out.shape == (100, 100)
        # every output value must exist in the input
        assert np.isin(out, values).all()
