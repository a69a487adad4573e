"""Client Setup FSM / FileNetcdf autodetection / Location / Parameters
batteries — the final sliver of the reference's client gtest suite
(src/client/Testing/{Setup,FileNetcdf,Location,Parameters}.cpp).

Death tests (Util::error) port to RuntimeError/ValueError. Fixtures are
read from the reference checkout (never written); attribute/write tests
operate on a temp copy.
"""
import shutil

import numpy as np
import pytest

from gridpp_tpu.client.file import FileNetcdf
from gridpp_tpu.client.location import Location, Parameters
from gridpp_tpu.client.options import Options
from gridpp_tpu.client.setup import Setup

FIXTURES = "/root/reference/tests/files"


def fx(name):
    return f"{FIXTURES}/{name}"


def args(line):
    return line.split()


# --- Testing/Location.cpp ----------------------------------------------
class TestLocation:
    def test_constructor(self):
        loc = Location(1, 2, 3)
        assert loc.lat() == 1
        assert loc.lon() == 2
        assert loc.elev() == 3

    def test_setters(self):
        loc = Location(1, 2, 3)
        loc.lat(3.2)
        assert (loc.lat(), loc.lon(), loc.elev()) == (
            pytest.approx(3.2), 2, 3)
        loc.lon(4)
        assert (loc.lat(), loc.lon(), loc.elev()) == (
            pytest.approx(3.2), 4, 3)
        loc.elev(-3.5)
        assert (loc.lat(), loc.lon(), loc.elev()) == (
            pytest.approx(3.2), 4, -3.5)

    def test_order(self):
        loc1 = Location(1, 2, 3)
        loc2 = Location(1, 2, 3)
        assert not (loc1 < loc2 or loc2 < loc1)
        for other in [Location(1, 2, 4), Location(1, 3, 2),
                      Location(2, 2, 3)]:
            assert loc1 < other or other < loc1
        # usable in sets like std::set<Location>
        assert len({loc1, loc2, Location(1, 2, 4)}) == 2


# --- Testing/Parameters.cpp --------------------------------------------
class TestParameters:
    def test_empty(self):
        par = Parameters()
        assert par.size() == 0
        assert par.get_values() == []

    def test_access(self):
        par = Parameters([2, 3.3, 0])
        assert par.size() == 3
        assert par[0] == 2
        assert par[1] == pytest.approx(3.3)
        assert par[2] == 0
        assert par.get_values() == pytest.approx([2, 3.3, 0])

    def test_empty_access(self):
        par = Parameters()
        for i in (-1, 0, 1):
            with pytest.raises(ValueError):
                par[i]

    def test_invalid_access(self):
        par = Parameters([2, 3.3, 0])
        for i in (-1, np.nan, 3, 100):
            with pytest.raises(ValueError):
                par[i]

    def test_assignment(self):
        par = Parameters([2, 3.3, 0])
        par[0] = 4
        par[1] = 1
        assert par.get_values() == [4, 1, 0]
        with pytest.raises(ValueError):
            par[3] = 1
        with pytest.raises(ValueError):
            par[-1] = 1


# --- Testing/Setup.cpp --------------------------------------------------
class TestSetup:
    def test_test1(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -c qq "
                       f"-p {fx('parameters.txt')} type=text "
                       "-c accumulate -d smart radius=11"))
        assert len(s.variable_configurations) == 1
        vc = s.variable_configurations[0]
        assert len(vc.calibrators) == 2
        assert vc.variable == "air_temperature_2m"
        assert vc.calibrators[0][1] is not None  # parfile on calibrator 0
        assert vc.calibrators[1][1] is None

    def test_test2_vi(self):
        for line in [
                "-vi air_temperature_2m -v out "
                "-vi air_temperature_2m -v out2",
                "-vi air_temperature_2m -v out -d nearestNeighbour "
                "-vi air_temperature_2m -v out2",
                "-vi air_temperature_2m -v out -d nearestNeighbour "
                "-vi air_temperature_2m -v out2 -d bilinear"]:
            s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} {line}"))
            assert len(s.variable_configurations) == 2
            assert s.variable_configurations[0].input_variable == \
                "air_temperature_2m"
            assert s.variable_configurations[1].input_variable == \
                "air_temperature_2m"
            assert s.variable_configurations[0].variable == "out"
            assert s.variable_configurations[1].variable == "out2"

    def test_test3(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v precipitation_amount -d nearestNeighbour "
                       "-vi air_temperature_2m -v out2"))
        assert len(s.variable_configurations) == 2
        assert s.variable_configurations[0].input_variable == \
            "precipitation_amount"
        assert s.variable_configurations[1].input_variable == \
            "air_temperature_2m"
        assert s.variable_configurations[0].variable == \
            "precipitation_amount"
        assert s.variable_configurations[1].variable == "out2"

    def test_calibrator_options(self):
        for line in [
                "-v air_temperature_2m -c neighbourhood radius=2",
                "-v precipitation_amount -c neighbourhood radius=11 "
                "-v air_temperature_2m -c neighbourhood radius=2"]:
            s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} {line}"))
            vc = s.variable_configurations[-1]
            assert len(vc.calibrators) == 1
            assert vc.calibrators[0][0].options.get("radius", None,
                                                    int) == 2

    def test_calibrator_options_multiple(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -c accumulate "
                       "-c neighbourhood radius=2 -c deaccumulate"))
        vc = s.variable_configurations[0]
        assert len(vc.calibrators) == 3
        for cal, _ in vc.calibrators:
            if type(cal).__name__ == "CalibratorNeighbourhood":
                assert cal.options.get("radius", None, int) == 2
            else:
                assert cal.options.get("radius", None, int) is None

    def test_calibrator_multiple_variables(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -c accumulate "
                       "-v surface_air_pressure -c diagnoseWind "
                       "x=x_wind_10m y=y_wind_10m compute=speed"))
        assert len(s.variable_configurations[0].calibrators) == 1
        assert len(s.variable_configurations[1].calibrators) == 1
        assert type(s.variable_configurations[0].calibrators[0][0]
                    ).__name__ == "CalibratorAccumulate"
        assert type(s.variable_configurations[1].calibrators[0][0]
                    ).__name__ == "CalibratorDiagnoseWind"

    def test_variable_only(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m"))
        assert len(s.variable_configurations) == 1
        vc = s.variable_configurations[0]
        assert vc.variable == "air_temperature_2m"
        assert type(vc.downscaler).__name__ == \
            "DownscalerNearestNeighbour"
        assert vc.calibrators == []

    def test_repeat_variable(self, capsys):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -v air_temperature_2m "
                       "-d smart -c neighbourhood"))
        assert len(s.variable_configurations) == 1
        vc = s.variable_configurations[0]
        # first instance wins: defaults (Setup.cpp:288-366)
        assert type(vc.downscaler).__name__ == \
            "DownscalerNearestNeighbour"
        assert vc.calibrators == []
        assert "already read" in capsys.readouterr().out

    def test_repeat_downscaler(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -d smart "
                       "-d nearestNeighbour"))
        assert type(s.variable_configurations[0].downscaler).__name__ \
            == "DownscalerNearestNeighbour"

    def test_complicated(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -d nearestNeighbour "
                       "-d smart -c neighbourhood -c accumulate "
                       "-c neighbourhood -v precipitation_amount -c qq "
                       f"-p {fx('parameters.txt')} type=text -d gradient"))
        assert len(s.variable_configurations) == 2
        vc = s.variable_configurations[0]
        assert type(vc.downscaler).__name__ == "DownscalerSmart"
        assert [type(c).__name__ for c, _ in vc.calibrators] == \
            ["CalibratorNeighbourhood", "CalibratorAccumulate",
             "CalibratorNeighbourhood"]
        vc = s.variable_configurations[1]
        assert vc.variable == "precipitation_amount"
        assert type(vc.downscaler).__name__ == "DownscalerGradient"
        assert len(vc.calibrators) == 1

    def test_different_input_output_variables(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-vi precipitation_amount -v air_temperature_2m"))
        vc = s.variable_configurations[0]
        assert vc.input_variable == "precipitation_amount"
        assert vc.variable == "air_temperature_2m"
        assert vc.downscaler.input_variable == "precipitation_amount"

    def test_no_output(self):
        for line in ["-v air_temperature_2m",
                     "-v air_temperature_2m -d bilinear"]:
            s = Setup(args(f"{fx('10x10.nc')} {line}"))
            assert len(s.variable_configurations) == 1
            assert s.input_names == [fx("10x10.nc")]
            assert s.output_names == [fx("10x10.nc")]

    def test_variable_options_single(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m write=0"))
        vopts = s.variable_configurations[0].variable_options
        assert vopts.get("write", True, bool) is False
        assert not vopts.has("-d")

    def test_variable_options_multiple(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-v air_temperature_2m -v surface_air_pressure "
                       "write=0 -v relative_humidity_2m -v x_wind_10m "
                       "test=2 -d smart -v y_wind_10m "
                       "-v precipitation_amount new=2.1 -c neighbourhood"))
        vcs = s.variable_configurations
        assert len(vcs) == 6
        assert not vcs[0].variable_options.has("write")
        assert vcs[1].variable_options.get("write", True, bool) is False
        assert not vcs[2].variable_options.has("write")
        assert vcs[3].variable_options.get("test", None, float) == 2
        assert type(vcs[3].downscaler).__name__ == "DownscalerSmart"
        assert not vcs[4].variable_options.has("write")
        assert vcs[5].variable_options.get("new", None,
                                           float) == pytest.approx(2.1)
        assert len(vcs[5].calibrators) == 1

    def test_should_be_valid(self):
        ten = fx("10x10.nc")
        for line in [
                f"{ten} {ten} -v air_temperature_2m -d smart",
                f"{ten} {ten} -v air_temperature_2m -c neighbourhood "
                "-d smart",
                f"{ten} {ten} -v air_temperature_2m -d smart "
                "-c neighbourhood",
                f"{ten} {ten} -v air_temperature_2m -d nearestNeighbour "
                "-v precipitation_amount -d smart",
                f"{ten} {ten} -v air_temperature_2m -d smart numSmart=2 "
                "-c neighbourhood -v precipitation_amount -d smart",
                f"{ten},{ten} {ten},{ten} -v precipitation_amount "
                "-d nearestNeighbour"]:
            Setup(args(line))

    def test_should_be_invalid(self):
        ten = fx("10x10.nc")
        for line in [
                # no variables
                f"{ten} {ten}",
                f"{ten} {ten} -v",
                f"{ten} {ten} -v -d smart",
                # too many files
                f"{ten} {ten} -v -d smart {ten}",
                # nothing after downscaler
                f"{ten} {ten} -v precipitation_amount -d",
                f"{ten} {ten} -v precipitation_amount -d "
                "-c neighbourhood",
                f"{ten} {ten} -v precipitation_amount -c neighbourhood "
                "-d",
                # nothing after calibrator
                f"{ten} {ten} -v precipitation_amount -c",
                f"{ten} {ten} -v precipitation_amount -c -d nearest",
                # parameters before other schemes
                f"{ten} {ten} -p {fx('parameters.txt')} type=text "
                "-v precipitation_amount -c qq",
                f"{ten} {ten} -v precipitation_amount "
                f"-p {fx('parameters.txt')} type=text -c qq",
                # -vi but no -v
                f"{ten} {ten} -vi precipitation_amount",
                # unknown scheme names
                f"{ten} {ten} -v air_temperature_2m -d qwerty123",
                f"{ten} {ten} -v air_temperature_2m -c qwerty123"]:
            with pytest.raises(RuntimeError):
                Setup(args(line))

    def test_invalid_parameter_file(self):
        ten = fx("10x10.nc")
        with pytest.raises(Exception):
            Setup(args(f"{ten} {ten} -v precipitation_amount -c qq "
                       f"-p {fx('parametersw8e9yhd89hywe89d.txt')} "
                       "type=text"))

    def test_default_downscaler(self):
        assert Setup.default_downscaler() != ""

    def test_inputoutput_options(self):
        s = Setup(args(f"{fx('10x10.nc')} option1=1 {fx('10x10.nc')} "
                       "option2=2 -v air_temperature_2m write=1 "
                       "-d smart numSmart=2"))
        assert s.input_options.get("option1", None, int) == 1
        assert not s.input_options.has("option2")
        assert not s.input_options.has("write")
        assert s.output_options.get("option2", None, int) == 2
        assert not s.output_options.has("option1")
        assert not s.output_options.has("write")

    def test_alias(self):
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-va tlevel1 name=air_temperature_2m level=1 "
                       "-v air_temperature_2m -d smart numSmart=2"))
        assert len(s.variable_aliases) == 1
        var = s.variable_aliases["tlevel1"]
        assert var.name == "air_temperature_2m"
        assert var.level == 1


# --- Testing/FileNetcdf.cpp ---------------------------------------------
class TestFileNetcdf:
    def test_missing_altitude(self):
        f = FileNetcdf(fx("validNetcdf1.nc"))
        assert np.isnan(f.grid.get_elevs()[0, 0])

    def test_missing_y(self):
        f = FileNetcdf(fx("validNetcdf2.nc"))
        assert f.grid.size() == [1, 10]
        assert f.num_ens == 10
        assert len(f.times) == 2

    def test_missing_time(self):
        f = FileNetcdf(fx("validNetcdf3.nc"))
        assert f.grid.size() == [3, 3]
        assert f.num_ens == 1
        assert len(f.times) == 1

    def test_missing_x_and_time(self):
        f = FileNetcdf(fx("validNetcdf4.nc"))
        assert f.grid.size() == [10, 1]
        assert f.num_ens == 1
        assert len(f.times) == 1
        field = f.get_field("air_temperature_2m")
        assert field[0, 0, 0, 0] == 21
        assert field[0, 5, 0, 0] == 26

    def test_dim_names(self):
        f = FileNetcdf(fx("validNetcdfDimNames.nc"),
                       Options("xDim=h2 yDim=h1 timeDim=date "
                               "ensDim=member latVar=latVar "
                               "lonVar=lonVar timeVar=date"))
        assert f.grid.size() == [3, 2]
        assert f.num_ens == 2
        assert len(f.times) == 2
        lats, lons = f.grid.get_lats(), f.grid.get_lons()
        for i in range(3):
            for j in range(2):
                assert lats[i, j] == i
                assert lons[i, j] == j
        elevs = f.grid.get_elevs()
        np.testing.assert_array_equal(
            elevs, [[160, -13], [295, 168], [11, -171]])
        field = f.get_field("air_temperature_2m")
        assert field[0, 0, 0, 0] == 1
        assert field[0, 2, 0, 0] == 27
        assert field[0, 2, 0, 1] == 28
        assert field[0, 2, 1, 1] == 32
        assert field[1, 1, 0, 0] == 21
        assert field[1, 1, 1, 0] == 24
        assert field[1, 0, 1, 1] == 12
        assert field[1, 2, 1, 1] == 38

    def test_geopotential(self):
        f = FileNetcdf(fx("validNetcdfGeopotential.nc"))
        elevs = f.grid.get_elevs()
        np.testing.assert_allclose(
            elevs * 9.81, [[90, 80], [30, 40], [14, 99]], rtol=1e-5)

    def test_analysis(self):
        f = FileNetcdf(fx("validNetcdfAnalysis.nc"))
        assert len(f.times) == 1
        assert f.times[0] == 1414130400
        field = f.get_field("air_temperature_2m")
        assert field[0, 0, 0, 0] == 300
        assert field[0, 2, 1, 0] == 303
        assert field[0, 2, 0, 1] == 307
        assert np.isnan(field[0, 0, 0, 1])

    def test_scalar_time(self):
        f = FileNetcdf(fx("validNetcdfAnalysis2.nc"))
        assert len(f.times) == 1
        assert f.times[0] == 1414130400

    def test_no_time_dimension(self):
        f = FileNetcdf(fx("validNetcdf3.nc"))
        assert len(f.times) == 1

    def test_invalid_file(self):
        with pytest.raises(Exception):
            FileNetcdf(fx("validText1.txt"))

    # --- attribute API (on a temp copy) --------------------------------
    @pytest.fixture
    def copy10(self, tmp_path):
        dst = tmp_path / "10x10_copy.nc"
        shutil.copy(fx("10x10.nc"), dst)
        return str(dst)

    def test_overwrite_attribute(self, copy10):
        f = FileNetcdf(copy10)
        f.set_global_attribute("history", "test512")
        assert f.get_global_attribute("history") == "test512"

    def test_add_attribute(self, copy10):
        f = FileNetcdf(copy10)
        f.set_global_attribute("history2", "test123")
        assert f.get_global_attribute("history2") == "test123"

    def test_missing_attribute(self, copy10):
        f = FileNetcdf(copy10)
        assert f.get_global_attribute("qowhoiqfhoiqhdow") == ""

    def test_append_attribute(self, copy10):
        f = FileNetcdf(copy10)
        f.set_global_attribute("history", "empty")
        f.prepend_global_attribute("history", "testing")
        f.append_global_attribute("history", "testing2")
        assert f.get_global_attribute("history") == \
            "testing\nempty\ntesting2"
        f.write([])  # should not raise

    def test_append_attribute_empty(self, copy10):
        f = FileNetcdf(copy10)
        f.prepend_global_attribute("history71623", "value321")
        f.append_global_attribute("history99311", "value15")
        assert f.get_global_attribute("history71623") == "value321"
        assert f.get_global_attribute("history99311") == "value15"

    def test_set_attribute(self, copy10):
        f = FileNetcdf(copy10)
        f.set_global_attribute("att1", "value93824")
        f.append_global_attribute("att1", "append")
        f.set_global_attribute("att1", "value321192839819")
        f.set_attribute("air_temperature_2m", "att1", "value71")
        f.set_attribute("air_temperature_2m", "att1", "value72")
        f.set_attribute("air_temperature_2m", "att1", "value73")
        f.set_global_attribute("att2", "value15")
        f.write(["air_temperature_2m"])
        assert f.get_global_attribute("att1") == "value321192839819"
        assert f.get_global_attribute("att2") == "value15"
        assert f.get_attribute("air_temperature_2m", "att1") == "value73"
        assert f.get_attribute("air_temperature_2m", "att2") == ""
        # persisted through write
        f2 = FileNetcdf(copy10)
        assert f2.get_global_attribute("att1") == "value321192839819"
        assert f2.get_attribute("air_temperature_2m",
                                "att1") == "value73"

    def test_set_attribute_error(self, copy10):
        f = FileNetcdf(copy10)
        with pytest.raises(RuntimeError):
            f.set_attribute("nonvalid_variable", "units", "value93824")
        with pytest.raises(RuntimeError):
            f.get_attribute("q", "att1")

    def test_set_long_attribute(self, copy10, capsys):
        f = FileNetcdf(copy10)
        value = "1234567890" * (10 ** 6) + "1234"  # > cap
        f.append_global_attribute("history", value)
        f.write(["air_temperature_2m"])
        f2 = FileNetcdf(copy10)
        assert len(f2.get_global_attribute("history")) < 1e7


class TestFileNetcdfRegressions:
    """Round-4 self-review regressions."""

    def _write_nc(self, path):
        from scipy.io import netcdf_file
        nc = netcdf_file(str(path), "w", mmap=False)
        nc.createDimension("y", 2)
        nc.createDimension("x", 3)
        lat = nc.createVariable("latitude", "d", ("y", "x"))
        lat[:] = np.arange(6).reshape(2, 3)
        lon = nc.createVariable("longitude", "d", ("y", "x"))
        lon[:] = np.arange(6).reshape(2, 3) * 2
        v = nc.createVariable("air_temperature_2m", "f", ("y", "x"))
        v._FillValue = np.float32(1e20)
        # legitimate -999 data under a DECLARED fill value
        v[:] = np.array([[-999.0, 1.0, 2.0], [3.0, 1e20, 5.0]], np.float32)
        nc.version = np.float64(4.2)  # numeric global attribute
        nc.close()

    def test_declared_fill_preserves_minus999(self, tmp_path):
        path = tmp_path / "t.nc"
        self._write_nc(path)
        f = FileNetcdf(str(path))
        field = f.get_field("air_temperature_2m")
        assert field[0, 0, 0, 0] == -999.0   # NOT converted to NaN
        assert np.isnan(field[0, 1, 1, 0])   # the declared fill is NaN

    def test_numeric_global_attr_roundtrip(self, tmp_path):
        from scipy.io import netcdf_file
        path = tmp_path / "t.nc"
        self._write_nc(path)
        f = FileNetcdf(str(path))
        f.write(["air_temperature_2m"])
        nc = netcdf_file(str(path), "r", mmap=False)
        ver = dict(nc._attributes)["version"]
        # numeric attributes keep their numeric type through write()
        assert not isinstance(ver, (bytes, str))
        assert float(np.asarray(ver)) == 4.2


class TestSetupAliasResolution:
    def test_alias_resolves_input_variable(self, capsys):
        # Setup.cpp:304-316: an input name matching a -va alias uses the
        # alias's underlying variable
        s = Setup(args(f"{fx('10x10.nc')} {fx('10x10.nc')} "
                       "-va tlevel1 name=air_temperature_2m level=1 "
                       "-vi tlevel1 -v out -d nearestNeighbour"))
        vc = s.variable_configurations[0]
        assert vc.input_variable == "air_temperature_2m"
        assert vc.variable == "out"
        assert "Using variable alias" in capsys.readouterr().out

    def test_new_variable_cf_dims(self, tmp_path):
        # CF-style files (dims time/latitude/longitude, 1-D coord vars)
        # leave _ydim/_xdim unresolved; new-variable writes must
        # size-match the dims instead of crashing on a squeeze
        from scipy.io import netcdf_file
        path = str(tmp_path / "cf.nc")
        nc = netcdf_file(path, "w", mmap=False)
        nc.createDimension("time", 2)
        nc.createDimension("latitude", 4)
        nc.createDimension("longitude", 5)
        lat = nc.createVariable("latitude", "d", ("latitude",))
        lat[:] = np.linspace(55, 56, 4)
        lon = nc.createVariable("longitude", "d", ("longitude",))
        lon[:] = np.linspace(5, 6, 5)
        t = nc.createVariable("time", "d", ("time",))
        t[:] = [0, 3600]
        v = nc.createVariable("air_temperature_2m", "f",
                              ("time", "latitude", "longitude"))
        v[:] = np.arange(40, dtype=np.float32).reshape(2, 4, 5)
        nc.close()
        f = FileNetcdf(path)
        fld = f.get_field("air_temperature_2m")
        f.add_field("t2", fld + 1)
        f.write(["t2"])
        back = FileNetcdf(path)
        np.testing.assert_allclose(back.get_field("t2"), fld + 1)
