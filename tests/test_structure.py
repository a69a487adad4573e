"""Structure function tests (ported from reference tests/test_structure.py
and test_barnes_structure.py)."""
import numpy as np
import pytest

import gridpp_tpu as gridpp


class TestValidation:
    def test_invalid_h(self):
        for cls in [gridpp.BarnesStructure, gridpp.CressmanStructure]:
            for h in [-1, np.nan]:
                with pytest.raises(Exception):
                    cls(h)
                with pytest.raises(Exception):
                    cls(h, 100)

    def test_invalid_v_w(self):
        for cls in [gridpp.BarnesStructure, gridpp.CressmanStructure]:
            for bad in [-1, np.nan]:
                with pytest.raises(Exception):
                    cls(2000, bad)
                with pytest.raises(Exception):
                    cls(2000, 100, bad)

    def test_invalid_hmax(self):
        with pytest.raises(Exception):
            gridpp.BarnesStructure(2000, 100, 0, -1)

    def test_invalid_cv(self):
        barnes = gridpp.BarnesStructure(2000)
        for dist in [-1, np.nan]:
            with pytest.raises(Exception):
                gridpp.CrossValidation(barnes, dist)


class TestCorr:
    def test_basic(self):
        x = [0, 1000, 2000, 3000, np.nan]
        barnes = gridpp.BarnesStructure(2000)
        cases = [
            (barnes, False,
             [1, 0.8824968934059143, 0.6065306663513184,
              0.32465246319770813, 0]),
            (gridpp.CressmanStructure(2000), False, [1, 0.6, 0, 0, 0]),
            (gridpp.CrossValidation(barnes, 1000), True,
             [0, 0, 0.6065306663513184, 0.32465246319770813, 0]),
        ]
        for structure, is_cv, corr in cases:
            for i in range(len(x)):
                p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
                p2 = gridpp.Point(x[i], 0, 0, 0, gridpp.Cartesian)
                funcs = [structure.corr_background] if is_cv else \
                    [structure.corr, structure.corr_background]
                for func in funcs:
                    assert func(p1, p2) == pytest.approx(corr[i], abs=1e-6)
                    assert func(p2, p1) == pytest.approx(corr[i], abs=1e-6)
                    if not is_cv and not np.isnan(x[i]):
                        assert func(p2, p2) == pytest.approx(1, abs=1e-6)

    def test_invalid_elevation(self):
        h = 2000
        p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        p2 = gridpp.Point(1000, 0, 0, 0, gridpp.Cartesian)
        p3 = gridpp.Point(1000, 0, float("nan"), 0, gridpp.Cartesian)
        for cls in [gridpp.BarnesStructure, gridpp.CressmanStructure]:
            for v in [0, 100]:
                s = cls(h, v)
                assert s.corr(p1, p3) == pytest.approx(s.corr(p1, p2),
                                                       abs=1e-6)

    def test_hmax(self):
        p0 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        dist_ans = {0: 1, 1000: 0.8824968934059143, 2000: 0.6065306663513184,
                    3000: 0.32465246319770813}
        for hmax in [0, 1000, 2000, 10000]:
            structure = gridpp.BarnesStructure(2000, 0, 0, hmax)
            for dist, ans in dist_ans.items():
                corr = structure.corr(
                    p0, gridpp.Point(dist, 0, 0, 0, gridpp.Cartesian))
                if dist > hmax:
                    assert corr == 0
                else:
                    assert corr == pytest.approx(ans, abs=1e-6)

    def test_localization(self):
        # Barnes default min_rho=0.0013 -> localization = sqrt(-2 ln
        # 0.0013)*h
        s = gridpp.BarnesStructure(2500)
        p = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        expected = np.sqrt(-2 * np.log(0.0013)) * 2500
        assert s.localization_distance(p) == pytest.approx(expected, rel=1e-5)
        # Cressman localization = h
        s = gridpp.CressmanStructure(2500)
        assert s.localization_distance(p) == pytest.approx(2500)


class TestSpatial:
    def test_spatial(self):
        y = [[0, 0]]
        x = [[0, 2500]]
        grid = gridpp.Grid(y, x, y, y, gridpp.Cartesian)
        h = [[2500, 1]]
        v = [[0, 0]]
        laf = [[0, 0]]
        min_rho = 0.1
        structure = gridpp.BarnesStructure(grid, h, v, laf, min_rho)
        p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        p2 = gridpp.Point(0, 2500, 0, 0, gridpp.Cartesian)
        expected = np.sqrt(-2 * np.log(min_rho)) * 2500
        assert structure.localization_distance(p1) == pytest.approx(
            expected, abs=1e-3)
        assert structure.corr(p1, p2) == pytest.approx(0.6, abs=0.05)
        expected = np.sqrt(-2 * np.log(min_rho)) * 1
        assert structure.localization_distance(p2) == pytest.approx(
            expected, abs=1e-3)
        assert structure.corr(p2, p1) == pytest.approx(0, abs=0.05)

    def test_spatial_invalid_arguments(self):
        y, x = np.meshgrid(np.linspace(0, 1, 2), np.linspace(0, 1, 3))
        grid = gridpp.Grid(y, x, y, y, gridpp.Cartesian)
        valid = np.ones([3, 2])
        for inval in [np.ones([3, 4]), np.ones([2, 2]), np.ones([2, 4])]:
            with pytest.raises(ValueError):
                gridpp.BarnesStructure(grid, inval, valid, valid)
            with pytest.raises(ValueError):
                gridpp.BarnesStructure(grid, valid, inval, valid)
            with pytest.raises(ValueError):
                gridpp.BarnesStructure(grid, valid, valid, inval)

    def test_spatial_oi(self):
        # Spatially varying length scale through OI
        y = np.zeros((1, 5))
        x = np.arange(5, dtype=np.float64).reshape(1, 5) * 1000
        grid = gridpp.Grid(y, x, y, y, gridpp.Cartesian)
        h = np.full((1, 5), 2000.0)
        structure = gridpp.BarnesStructure(grid, h, np.zeros((1, 5)),
                                           np.zeros((1, 5)), 0.0013)
        scalar = gridpp.BarnesStructure(2000)
        points = gridpp.Points([0], [2000], [0], [0], gridpp.Cartesian)
        bg = np.zeros((1, 5))
        out_spatial = gridpp.optimal_interpolation(
            grid, bg, points, [1], [0.1], [0], structure, 10)
        out_scalar = gridpp.optimal_interpolation(
            grid, bg, points, [1], [0.1], [0], scalar, 10)
        np.testing.assert_array_almost_equal(out_spatial, out_scalar, 5)


class TestMultiple:
    def test_multiple_structure(self):
        s1 = gridpp.CressmanStructure(2000, 2000, 2000)
        s2 = gridpp.CressmanStructure(200, 200, 200)
        s3 = gridpp.CressmanStructure(2, 2, 2)
        structure = gridpp.MultipleStructure(s1, s2, s3)
        expected = 0.6
        cases = [
            (gridpp.Point(1000, 0, 0, 0, gridpp.Cartesian), expected),
            (gridpp.Point(0, 0, 100, 0, gridpp.Cartesian), expected),
            (gridpp.Point(0, 0, 0, 1, gridpp.Cartesian), expected),
            (gridpp.Point(1000, 0, 100, 1, gridpp.Cartesian), expected ** 3),
        ]
        p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        for p2, ans in cases:
            assert structure.corr(p1, p2) == pytest.approx(ans, abs=1e-6)

    def test_multiple_through_oi(self):
        s1 = gridpp.CressmanStructure(5000, 11, 22)
        s2 = gridpp.CressmanStructure(33, 200, 44)
        s3 = gridpp.CressmanStructure(55, 66, 2)
        structure = gridpp.MultipleStructure(s1, s2, s3)
        p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        p2 = gridpp.Point(0, 2500, 0, 0, gridpp.Cartesian)
        p3 = gridpp.Point(0, 2500, 100, 1, gridpp.Cartesian)
        assert structure.corr(p1, p2) == pytest.approx(0.6, abs=1e-6)
        assert structure.corr(p1, p3) == pytest.approx(0.6 ** 3, abs=1e-6)

        n = 3
        bpoints = gridpp.Points([0, 0, 0], [0, 0, 0], [0, 0, 100],
                                [0, 0, 1], gridpp.Cartesian)
        points = gridpp.Points([0], [2500], [0], [0], gridpp.Cartesian)
        background = np.zeros([n])
        output = gridpp.optimal_interpolation(
            bpoints, background, points, [1], [1], [0], structure, 10)
        np.testing.assert_array_almost_equal(output, [0.3, 0.3, 0.6 ** 3 / 2],
                                             decimal=5)

    def test_clone(self):
        h, v, w = 850, 92, 0.44
        structures = [
            gridpp.BarnesStructure(h, v, w),
            gridpp.CressmanStructure(h, v, w),
            gridpp.MultipleStructure(gridpp.BarnesStructure(1.3 * h, v, w),
                                     gridpp.BarnesStructure(h, 1.3 * v, w),
                                     gridpp.BarnesStructure(h, v, 1.3 * w)),
            gridpp.CrossValidation(gridpp.BarnesStructure(h, v, w), 1000),
        ]
        p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        p2 = gridpp.Point(500, 0, 50, 0.25, gridpp.Cartesian)
        for structure in structures:
            clone = structure.clone()
            assert structure.corr(p1, p2) == clone.corr(p1, p2)
            assert structure.corr_background(p1, p2) == \
                clone.corr_background(p1, p2)


class TestOtherKernels:
    def test_soar_toar_powerlaw(self):
        p1 = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        p2 = gridpp.Point(2000, 0, 0, 0, gridpp.Cartesian)
        v = 2000 / 2000
        assert gridpp.SoarStructure(2000).corr(p1, p2) == pytest.approx(
            (1 + v) * np.exp(-v), abs=1e-6)
        assert gridpp.ToarStructure(2000).corr(p1, p2) == pytest.approx(
            (1 + v + v * v / 3) * np.exp(-v), abs=1e-6)
        assert gridpp.PowerlawStructure(2000).corr(p1, p2) == pytest.approx(
            1 / (1 + 0.5 * v * v), abs=1e-6)

    def test_identity_at_zero(self):
        p = gridpp.Point(0, 0, 0, 0, gridpp.Cartesian)
        for cls in [gridpp.SoarStructure, gridpp.ToarStructure,
                    gridpp.PowerlawStructure]:
            assert cls(2000).corr(p, p) == pytest.approx(1, abs=1e-6)
