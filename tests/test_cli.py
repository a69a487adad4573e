"""CLI client tests: Setup parsing, FileFake, NetCDF round-trip on the
reference fixtures, calibrator behaviours (reference
src/client/Testing/*)."""
import os
import shutil

import numpy as np
import pytest

import gridpp_tpu as gridpp
from gridpp_tpu.client import main
from gridpp_tpu.client.file import FileFake, FileNetcdf
from gridpp_tpu.client.options import Options
from gridpp_tpu.client.parameter_file import ParameterFileText
from gridpp_tpu.client.schemes import Calibrator, Downscaler
from gridpp_tpu.client.setup import Setup

FIXTURES = "/root/reference/tests/files"
HAS_FIXTURES = os.path.isdir(FIXTURES)


class TestOptions:
    def test_basic(self):
        o = Options(["radius=3", "stat=mean", "flag=0"])
        assert o.get("radius", type=int) == 3
        assert o.get("stat") == "mean"
        assert o.get("flag", type=bool) is False
        assert o.get("missing", 7, int) == 7
        assert o.get_floats("missing", [1.0]) == [1.0]


class TestSetup:
    def test_parse(self):
        setup = Setup(["in.nc", "out.nc", "-v", "air_temperature_2m",
                       "-d", "bilinear", "-c", "neighbourhood", "radius=2"])
        assert setup.input_names == ["in.nc"]
        assert setup.output_names == ["out.nc"]
        vc = setup.variable_configurations[0]
        assert vc.variable == "air_temperature_2m"
        assert type(vc.downscaler).__name__ == "DownscalerBilinear"
        assert len(vc.calibrators) == 1

    def test_default_downscaler(self):
        setup = Setup(["in.nc", "out.nc", "-v", "x"])
        assert type(setup.variable_configurations[0]
                    .downscaler).__name__ == "DownscalerNearestNeighbour"

    def test_unknown_scheme(self):
        with pytest.raises(RuntimeError):
            Setup(["in.nc", "out.nc", "-v", "x", "-d", "bogus"])
        with pytest.raises(RuntimeError):
            Setup(["in.nc", "out.nc", "-v", "x", "-c", "bogus"])


class TestCalibrators:
    def test_accumulate(self):
        f = FileFake(nt=4, ne=1)
        cal = Calibrator.get_scheme("accumulate", "precip", Options())
        raw = f.get_field("precip").copy()
        cal.calibrate(f)
        out = f.get_field("precip")
        # acc[0]=0; acc[t]=sum of raw[1..t] (Accumulate.cpp semantics)
        np.testing.assert_allclose(out[0], 0)
        np.testing.assert_allclose(out[2], raw[1] + raw[2], atol=1e-5)

    def test_deaccumulate(self):
        f = FileFake(nt=3, ne=1)
        raw = f.get_field("precip").copy()
        cal = Calibrator.get_scheme("deaccumulate", "precip", Options())
        cal.calibrate(f)
        out = f.get_field("precip")
        assert np.isnan(out[0]).all()
        np.testing.assert_allclose(out[1], raw[1] - raw[0], atol=1e-5)

    def test_qc(self):
        f = FileFake(nt=1, ne=1)
        cal = Calibrator.get_scheme("qc", "t", Options(["min=3", "max=10"]))
        cal.calibrate(f)
        out = f.get_field("t")
        assert out.min() >= 3 and out.max() <= 10

    def test_sort(self):
        f = FileFake(nt=1, ne=5)
        cal = Calibrator.get_scheme("sort", "t", Options())
        cal.calibrate(f)
        out = f.get_field("t")
        assert (np.diff(out, axis=-1) >= 0).all()

    def test_neighbourhood(self):
        f = FileFake(nt=1, ne=1)
        raw = f.get_field("t").copy()
        cal = Calibrator.get_scheme("neighbourhood", "t",
                                    Options(["radius=1"]))
        cal.calibrate(f)
        out = f.get_field("t")
        exp = gridpp.neighbourhood(raw[0, :, :, 0], 1, gridpp.Mean)
        np.testing.assert_allclose(out[0, :, :, 0], exp, atol=1e-5)


@pytest.mark.skipif(not HAS_FIXTURES, reason="reference fixtures missing")
class TestNetcdf:
    def test_read(self):
        f = FileNetcdf(os.path.join(FIXTURES, "10x10.nc"))
        assert f.grid.size() == [10, 10]
        field = f.get_field("air_temperature_2m")
        assert field.ndim == 4
        assert field.shape[1:3] == (10, 10)

    def test_cli_roundtrip(self, tmp_path):
        target = str(tmp_path / "t.nc")
        shutil.copy(os.path.join(FIXTURES, "10x10.nc"), target)
        before = FileNetcdf(target).get_field("air_temperature_2m").copy()
        rc = main([target, target, "-v", "air_temperature_2m",
                   "-d", "nearestNeighbour",
                   "-c", "neighbourhood", "radius=2"])
        assert rc == 0
        after = FileNetcdf(target).get_field("air_temperature_2m")
        exp = gridpp.neighbourhood(before[0, :, :, 0], 2, gridpp.Mean)
        np.testing.assert_allclose(after[0, :, :, 0], exp, atol=1e-4)

    def test_parameter_files(self):
        pf = ParameterFileText(os.path.join(FIXTURES, "parameters.txt"))
        assert not pf.spatial
        assert len(pf.parameters_at_time(0)) == 8
        pf2 = ParameterFileText(
            os.path.join(FIXTURES, "parametersKriging.txt"))
        points, params = pf2.to_points()
        assert points.size() == 5

    def test_parameter_file_netcdf(self):
        from gridpp_tpu.client.parameter_file import (ParameterFileNetcdf,
                                                      get_parameter_file)
        pf = ParameterFileNetcdf(os.path.join(FIXTURES, "10x10_param.nc"))
        assert pf.is_location_dependent()
        points, params = pf.to_points(0)
        assert points.size() == 100
        assert params.shape == (100, 2)
        # xy-transposed file carries the same values, different dim order
        pf_xy = ParameterFileNetcdf(
            os.path.join(FIXTURES, "10x10_param_xy.nc"))
        lats = points.get_lats()
        lons = points.get_lons()
        rows = pf.params_for_locations(0, lats, lons)
        rows_xy = pf_xy.params_for_locations(0, lats, lons)
        np.testing.assert_allclose(rows, rows_xy)
        # autodetection by magic bytes
        auto = get_parameter_file(os.path.join(FIXTURES, "10x10_param.nc"))
        assert isinstance(auto, ParameterFileNetcdf)
        auto_txt = get_parameter_file(
            os.path.join(FIXTURES, "parameters.txt"))
        assert isinstance(auto_txt, ParameterFileText)

    def test_cli_oi(self, tmp_path):
        target = str(tmp_path / "oi.nc")
        shutil.copy(os.path.join(FIXTURES, "10x10.nc"), target)
        rc = main([target, target, "-v", "air_temperature_2m",
                   "-d", "bilinear", "-c", "oi", "d=100000", "maxLocations=5",
                   "-p", os.path.join(FIXTURES, "parametersKriging.txt")])
        assert rc == 0
        out = FileNetcdf(target).get_field("air_temperature_2m")
        assert np.isfinite(out).any()


class TestNewCalibrators:
    def test_cloud(self):
        f = FileFake(nt=1, ne=2)
        precip = f.get_field("precip")
        precip[:] = 0.0
        precip[0, 0, 0, 0] = 1.0  # precip in one member
        cloud = f.get_field("cloud")
        cloud[:] = 0.2
        cal = Calibrator.get_scheme("cloud", "cloud",
                                    Options(["precipVariable=precip",
                                             "value=0.9"]))
        cal.calibrate(f)
        out = f.get_field("cloud")
        assert out[0, 0, 0, 0] == np.float32(0.9)
        assert out[0, 0, 0, 1] == np.float32(0.2)
        assert out[0, 1, 1, 0] == np.float32(0.2)

    def test_zaga_inv_cdf_golden(self):
        # Golden values from reference Testing/CalibratorZaga.cpp:131-154
        from gridpp_tpu.client.schemes import _zaga_inv_cdf, _zaga_params
        par = np.array([-1.1, 1.4, 0.05, -0.05, 2.03, -0.05, 0.82, -2.71])

        def inv_cdf(q, mean, frac):
            p0, shape, scale = _zaga_params(np.float64(mean),
                                            np.float64(frac), par)
            return _zaga_inv_cdf(np.float64(q), p0, shape, scale,
                                 np.bool_(True))

        np.testing.assert_allclose(inv_cdf(0.003, 3, 0.7), 0, atol=1e-6)
        np.testing.assert_allclose(inv_cdf(0.188, 3, 0.7), 0, atol=1e-6)
        np.testing.assert_allclose(inv_cdf(0.5, 3, 0.7), 1.3596177,
                                   rtol=1e-5)
        np.testing.assert_allclose(inv_cdf(0.8, 3, 0.7), 3.4923909,
                                   rtol=1e-5)
        np.testing.assert_allclose(inv_cdf(0.99999, 3, 0.7), 24.551832,
                                   rtol=1e-4)
        np.testing.assert_allclose(inv_cdf(0.732, 0.4, 0.1), 0.5198217,
                                   rtol=1e-5)
        np.testing.assert_allclose(inv_cdf(0.8, 0.4, 0.1), 0.797209,
                                   rtol=1e-5)
        np.testing.assert_allclose(inv_cdf(0.52, 0.4, 0.1), 0, atol=1e-6)
        np.testing.assert_allclose(inv_cdf(0.95, 0, 0), 0.27228063,
                                   rtol=1e-5)
        np.testing.assert_allclose(inv_cdf(0.88, 0, 0), 0, atol=1e-6)

    def test_zaga_p0(self):
        # Testing/CalibratorZaga.cpp:121-124: all-zero params -> P0=0.5
        from gridpp_tpu.client.schemes import _zaga_params
        par = np.zeros(8)
        p0, _, _ = _zaga_params(np.float64(5), np.float64(0), par)
        np.testing.assert_allclose(p0, 0.5)
        p0, _, _ = _zaga_params(np.float64(5), np.float64(0.5), par)
        np.testing.assert_allclose(p0, 0.5)

    def test_zaga_calibrate(self, tmp_path):
        # Ensemble is replaced by ZAGA quantiles, rank-shuffled
        pf = tmp_path / "zaga.txt"
        pf.write_text("time p1 p2 p3 p4 p5 p6 p7 p8\n"
                      "0 -1.1 1.4 0.05 -0.05 2.03 -0.05 0.82 -2.71\n")
        par = ParameterFileText(str(pf))
        f = FileFake(nt=1, ne=4)
        field = f.get_field("precip")
        field[:] = 0.0
        field[0, 0, 0] = [3.0, 1.0, 5.0, 2.0]
        cal = Calibrator.get_scheme("zaga", "precip", Options())
        cal.calibrate(f, par)
        out = f.get_field("precip")
        # ranks preserved: member 2 (largest raw) largest calibrated
        cell = out[0, 0, 0]
        assert np.argmax(cell) == 2 and np.argmin(cell) == 1
        assert np.isfinite(out).all()

    def test_shuffle(self):
        raw = np.array([3.0, 1.0, 5.0, 2.0])
        cal = np.array([10.0, 20.0, 30.0, 40.0])
        out = Calibrator.shuffle(raw, cal)
        np.testing.assert_allclose(out, [30.0, 10.0, 40.0, 20.0])
        # invalid member -> unshuffled
        raw2 = np.array([3.0, np.nan, 5.0, 2.0])
        out2 = Calibrator.shuffle(raw2, cal)
        np.testing.assert_allclose(out2, cal)

    def test_bct(self, tmp_path):
        pf = tmp_path / "bct.txt"
        # mu = ensmean, sigma = exp(-1), nu ~ 0.1, tau = exp(2)
        pf.write_text("time p1 p2 p3 p4 p5 p6 p7\n"
                      "0 0 1 -1 0 0.1 0 2\n")
        par = ParameterFileText(str(pf))
        f = FileFake(nt=1, ne=4)
        field = f.get_field("wind")
        field[:] = 5.0
        field[0, 0, 0] = [4.0, 5.0, 6.0, 5.0]
        cal = Calibrator.get_scheme("bct", "wind", Options())
        cal.calibrate(f, par)
        out = f.get_field("wind")
        assert np.isfinite(out).all()
        # median of calibrated distribution should be near mu = ensmean
        assert 2.0 < np.median(out[0, 0, 0]) < 8.0
        # rank order preserved
        assert np.argmax(out[0, 0, 0]) == 2

    def test_kriging_single_station(self, tmp_path):
        pf = tmp_path / "kr.txt"
        # one station at the grid's corner with bias 2.0
        pf.write_text("time lat lon elev p1\n0 50 0 0 2.0\n")
        par = ParameterFileText(str(pf))
        f = FileFake(ny=10, nx=10, nt=1, ne=1)
        raw = f.get_field("t").copy()
        cal = Calibrator.get_scheme(
            "kriging", "t", Options(["radius=2000000",
                                     "efoldDist=1000000"]))
        cal.calibrate(f, par)
        out = f.get_field("t")
        # at the station the full bias is added (weight ~ 1)
        np.testing.assert_allclose(out[0, 0, 0, 0] - raw[0, 0, 0, 0], 2.0,
                                   atol=0.1)
        # weight decays away from the station
        assert (out[0, 9, 9, 0] - raw[0, 9, 9, 0]) < 2.0

    def test_kriging_radius_cutoff(self, tmp_path):
        pf = tmp_path / "kr2.txt"
        pf.write_text("time lat lon elev p1\n0 50 0 0 2.0\n")
        par = ParameterFileText(str(pf))
        f = FileFake(ny=10, nx=10, nt=1, ne=1)
        raw = f.get_field("t").copy()
        cal = Calibrator.get_scheme(
            "kriging", "t", Options(["radius=1000", "efoldDist=1000"]))
        cal.calibrate(f, par)
        out = f.get_field("t")
        # far cells unchanged
        np.testing.assert_allclose(out[0, 9, 9, 0], raw[0, 9, 9, 0])

    def test_kriging_requires_spatial(self, tmp_path):
        pf = tmp_path / "kr3.txt"
        pf.write_text("time p1\n0 2.0\n")
        par = ParameterFileText(str(pf))
        f = FileFake(nt=1, ne=1)
        cal = Calibrator.get_scheme("kriging", "t", Options())
        with pytest.raises(RuntimeError):
            cal.calibrate(f, par)

    def test_coastal(self, tmp_path):
        from gridpp_tpu.core.grid import Grid
        pf = tmp_path / "co.txt"
        # a=0, b=1, c=1 at one location covering the whole grid
        pf.write_text("time lat lon elev p1 p2 p3\n0 55 5 0 0 1 1\n")
        par = ParameterFileText(str(pf))
        f = FileFake(ny=6, nx=6, nt=1, ne=1)
        # LAF ramp along x: laf(x) = x/5
        lats = np.asarray(f.grid.get_lats())
        lons = np.asarray(f.grid.get_lons())
        lafs = np.tile(np.linspace(0, 1, 6), (6, 1))
        f.grid = Grid(lats, lons, np.zeros_like(lats), lafs)
        field = f.get_field("t")
        field[:] = np.arange(6)[None, None, :, None] * 1.0  # t = x index
        cal = Calibrator.get_scheme(
            "coastal", "t", Options(["searchRadius=1", "minLafDiff=0.05"]))
        cal.calibrate(f, par)
        out = f.get_field("t")
        # interior cell x=2: window x in [1,3], lower laf at x=1 (value 1),
        # upper at x=3 (value 3); gradient = (3-1)/(0.6-0.2) = 5
        np.testing.assert_allclose(out[0, 2, 2, 0], 1 + 5.0, atol=1e-4)

    def test_coastal_use_nn(self, tmp_path):
        from gridpp_tpu.core.grid import Grid
        pf = tmp_path / "co2.txt"
        pf.write_text("time lat lon elev p1 p2 p3\n0 55 5 0 1 2 0\n")
        par = ParameterFileText(str(pf))
        f = FileFake(ny=4, nx=4, nt=1, ne=1)
        lats = np.asarray(f.grid.get_lats())
        lons = np.asarray(f.grid.get_lons())
        f.grid = Grid(lats, lons, np.zeros_like(lats),
                      np.zeros_like(lats))  # flat LAF -> no gradient
        field = f.get_field("t")
        field[:] = 3.0
        cal = Calibrator.get_scheme(
            "coastal", "t", Options(["useNN=1"]))
        cal.calibrate(f, par)
        out = f.get_field("t")
        np.testing.assert_allclose(out, 1 + 2 * 3.0, atol=1e-5)


@pytest.mark.skipif(not HAS_FIXTURES, reason="no reference fixtures")
class TestNetcdfWriteFidelity:
    def test_multi_time_roundtrip(self, tmp_path):
        # Regression: scipy's netcdf writer corrupts record variables
        # beyond record 0; the rewrite path must preserve all time steps.
        target = str(tmp_path / "rt.nc")
        shutil.copy(os.path.join(FIXTURES, "10x10.nc"), target)
        f = FileNetcdf(target)
        field = f.get_field("air_temperature_2m").copy()
        f.add_field("air_temperature_2m", field)
        f.write(["air_temperature_2m"], history="test")
        back = FileNetcdf(target)
        np.testing.assert_allclose(back.get_field("air_temperature_2m"),
                                   field)
        # untouched variables preserved exactly, all time steps
        orig = FileNetcdf(os.path.join(FIXTURES, "10x10.nc"))
        np.testing.assert_allclose(
            back.get_field("precipitation_amount"),
            orig.get_field("precipitation_amount"))
        np.testing.assert_allclose(np.asarray(back.times),
                                   np.asarray(orig.times))

    def test_new_variable_created(self, tmp_path):
        # `-vi old -v new` must CREATE the output variable in the file
        # (reference initNewVariable, Testing/FileNetcdf.cpp
        # createNewVariable); write() previously dropped unknown names.
        target = str(tmp_path / "nv.nc")
        shutil.copy(os.path.join(FIXTURES, "10x10.nc"), target)
        rc = main([target, "-vi", "air_temperature_2m", "-v", "t2",
                   "-d", "nearestNeighbour",
                   "-c", "neighbourhood", "radius=1"])
        assert rc == 0
        back = FileNetcdf(target)
        assert back.has_variable("t2")
        t2 = back.get_field("t2")
        orig = back.get_field("air_temperature_2m")
        assert t2.shape[:3] == orig.shape[:3]
        assert t2.shape[3] == 1  # E=1 source: no ens dim created
        assert np.isfinite(t2).all()
        # smoothed: differs from the input variable
        assert not np.allclose(t2[..., 0], orig[..., 0])
