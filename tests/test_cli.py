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

    def test_cli_oi(self, tmp_path):
        target = str(tmp_path / "oi.nc")
        shutil.copy(os.path.join(FIXTURES, "10x10.nc"), target)
        rc = main([target, target, "-v", "air_temperature_2m",
                   "-d", "bilinear", "-c", "oi", "h=100000", "maxPoints=5",
                   "-p", os.path.join(FIXTURES, "parametersKriging.txt")])
        assert rc == 0
        out = FileNetcdf(target).get_field("air_temperature_2m")
        assert np.isfinite(out).any()
