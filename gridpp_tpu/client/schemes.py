"""Downscalers and calibrators for the CLI pipeline.

Class-based wrappers over the library API, operating on File objects
(reference src/client/Downscaler/*, src/client/Calibrator/*). Fields are
(T, Y, X, E) arrays.
"""
from __future__ import annotations

import numpy as np

import gridpp_tpu as gridpp
from ..constants import MV
from .options import Options

# ---------------------------------------------------------------------------
# Downscalers
# ---------------------------------------------------------------------------


class Downscaler:
    def __init__(self, variable, options: Options):
        self.variable = variable
        self.options = options

    def downscale(self, ifile, ofile):
        field = ifile.get_field(self.variable)  # (T, Y, X, E)
        nt, ny, nx, ne = field.shape
        oy, ox = ofile.grid.size()
        out = np.full((nt, oy, ox, ne), MV, np.float32)
        # (T*E, Y, X) batch through the gather kernels in one call
        batch = np.transpose(field, (0, 3, 1, 2)).reshape(nt * ne, ny, nx)
        res = self._apply(ifile.grid, ofile.grid, batch)
        out = np.transpose(res.reshape(nt, ne, oy, ox), (0, 2, 3, 1))
        ofile.add_field(self.variable, out)

    def _apply(self, igrid, ogrid, batch):
        raise NotImplementedError

    @staticmethod
    def get_scheme(name, variable, options: Options):
        schemes = {
            "nearestNeighbour": DownscalerNearestNeighbour,
            "nearest": DownscalerNearestNeighbour,
            "bilinear": DownscalerBilinear,
            "gradient": DownscalerGradient,
            "bypass": DownscalerBypass,
            "upscale": DownscalerUpscale,
            "pressure": DownscalerPressure,
            "smart": DownscalerSmart,
        }
        if name not in schemes:
            raise RuntimeError(
                f"Could not instantiate downscaler of type '{name}'")
        return schemes[name](variable, options)


class DownscalerNearestNeighbour(Downscaler):
    def _apply(self, igrid, ogrid, batch):
        return gridpp.nearest(igrid, ogrid, batch)


class DownscalerBilinear(Downscaler):
    def _apply(self, igrid, ogrid, batch):
        return gridpp.bilinear(igrid, ogrid, batch)


class DownscalerGradient(Downscaler):
    """Elevation-gradient downscaler (Downscaler/Gradient.cpp), using the
    library's simple_gradient with a configurable constant gradient."""

    def _apply(self, igrid, ogrid, batch):
        elev_gradient = self.options.get("constantGradient", -0.0065, float)
        return gridpp.simple_gradient(igrid, ogrid, batch, elev_gradient)


class DownscalerBypass(Downscaler):
    def downscale(self, ifile, ofile):
        ofile.add_field(self.variable, ifile.get_field(self.variable))


class DownscalerUpscale(Downscaler):
    """Mean of input cells nearest to each output cell
    (Downscaler/Upscale.cpp)."""

    def _apply(self, igrid, ogrid, batch):
        ipoints = igrid.to_points()
        out = []
        for field in batch:
            out.append(gridpp.gridding_nearest(ogrid, ipoints,
                                               field.ravel(), 0,
                                               gridpp.Mean))
        return np.stack(out)


class DownscalerPressure(Downscaler):
    """Nearest + hydrostatic elevation adjustment
    (Downscaler/Pressure.cpp)."""

    def _apply(self, igrid, ogrid, batch):
        near = gridpp.nearest(igrid, ogrid, batch)
        delev = gridpp.nearest(igrid, ogrid, igrid.get_elevs())
        oelev = ogrid.get_elevs()
        valid = np.isfinite(delev) & np.isfinite(oelev)
        out = np.where(valid,
                       gridpp.pressure(np.where(valid, delev, 0).ravel(),
                                       np.where(valid, oelev, 0).ravel(),
                                       np.nan_to_num(near.reshape(
                                           len(batch), -1)).ravel(),
                                       np.full(near.size, 288.15,
                                               np.float32)).reshape(
                                                   near.shape),
                       near)
        return out.astype(np.float32)


class DownscalerSmart(Downscaler):
    """Smart neighbours using elevation similarity via BarnesStructure."""

    def _apply(self, igrid, ogrid, batch):
        num = self.options.get("numSmart", 5, int)
        radius_km = self.options.get("searchRadius", 3, int)
        # approximate the legacy radius (gridpoints) with a length scale
        h = max(radius_km, 1) * 10000.0
        structure = gridpp.BarnesStructure(h, 100.0)
        out = [gridpp.smart(igrid, ogrid, f, num, structure) for f in batch]
        return np.stack(out)


# ---------------------------------------------------------------------------
# Calibrators
# ---------------------------------------------------------------------------


class Calibrator:
    def __init__(self, variable, options: Options):
        self.variable = variable
        self.options = options

    def calibrate(self, ofile, parameter_file=None):
        raise NotImplementedError

    @staticmethod
    def get_scheme(name, variable, options: Options):
        schemes = {
            "accumulate": CalibratorAccumulate,
            "deaccumulate": CalibratorDeaccumulate,
            "neighbourhood": CalibratorNeighbourhood,
            "window": CalibratorWindow,
            "qc": CalibratorQc,
            "qq": CalibratorQq,
            "threshold": CalibratorThreshold,
            "sort": CalibratorSort,
            "altitude": CalibratorAltitude,
            "override": CalibratorOverride,
            "diagnoseWind": CalibratorDiagnoseWind,
            "diagnoseHumidity": CalibratorDiagnoseHumidity,
            "gaussian": CalibratorGaussian,
            "oi": CalibratorOi,
            "qnh": CalibratorQnh,
            "phase": CalibratorPhase,
            "windDirection": CalibratorWindDirection,
            "mask": CalibratorMask,
            "regression": CalibratorRegression,
        }
        if name not in schemes:
            raise RuntimeError(
                f"Could not instantiate calibrator with name '{name}'")
        return schemes[name](variable, options)


class CalibratorAccumulate(Calibrator):
    """Accumulate along time (Calibrator/Accumulate.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        # acc[0] = 0; acc[t] = acc[t-1] + field[t]; missing propagates
        # forward (Accumulate.cpp:22-46)
        field = ofile.get_field(self.variable)
        out = np.zeros_like(field)
        if field.shape[0] > 1:
            tail = field[1:]
            acc = np.cumsum(np.where(np.isfinite(tail), tail, 0), axis=0)
            bad = np.cumsum(~np.isfinite(tail), axis=0) > 0
            out[1:] = np.where(bad, np.nan, acc)
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorDeaccumulate(Calibrator):
    def calibrate(self, ofile, parameter_file=None):
        field = ofile.get_field(self.variable)
        out = np.full_like(field, np.nan)
        out[1:] = field[1:] - field[:-1]
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorNeighbourhood(Calibrator):
    """Spatial smoothing (Calibrator/Neighbourhood.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        radius = self.options.get("radius", 3, int)
        stat = gridpp.get_statistic(self.options.get("stat", "mean"))
        field = ofile.get_field(self.variable)
        out = np.empty_like(field)
        for t in range(field.shape[0]):
            for e in range(field.shape[3]):
                out[t, :, :, e] = gridpp.neighbourhood(field[t, :, :, e],
                                                       radius, stat)
        ofile.add_field(self.variable, out)


class CalibratorWindow(Calibrator):
    """Temporal window statistic (Calibrator/Window.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        length = self.options.get("length", 3, int)
        stat = gridpp.get_statistic(self.options.get("stat", "mean"))
        before = self.options.get("before", False, bool)
        keep_missing = self.options.get("keepMissing", False, bool)
        field = ofile.get_field(self.variable)
        nt, ny, nx, ne = field.shape
        cases = np.transpose(field, (1, 2, 3, 0)).reshape(-1, nt)
        res = gridpp.window(cases, length, stat, before, keep_missing, False)
        out = np.transpose(res.reshape(ny, nx, ne, nt), (3, 0, 1, 2))
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorQc(Calibrator):
    """Clamp to [min, max] (Calibrator/Qc.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        lo = self.options.get("min", -np.inf, float)
        hi = self.options.get("max", np.inf, float)
        field = ofile.get_field(self.variable)
        ofile.add_field(self.variable, np.clip(field, lo, hi))


class CalibratorThreshold(Calibrator):
    """Map values below/above thresholds to new values
    (Calibrator/Threshold.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        thresholds = self.options.get_floats("thresholds")
        values = self.options.get_floats("values")
        field = ofile.get_field(self.variable).copy()
        out = np.full_like(field, values[-1] if values else MV)
        prev = -np.inf
        for thr, val in zip(thresholds, values):
            out = np.where((field > prev) & (field <= thr), val, out)
            prev = thr
        out = np.where(field > prev, values[-1] if values else MV, out)
        out = np.where(np.isfinite(field), out, np.nan)
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorSort(Calibrator):
    """Sort ensemble members (Calibrator/Sort.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        field = ofile.get_field(self.variable)
        ofile.add_field(self.variable, np.sort(field, axis=-1))


class CalibratorAltitude(Calibrator):
    """Overwrite grid altitudes from the parameter file
    (Calibrator/Altitude.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        pass  # altitudes live on the Grid; no field change


class CalibratorOverride(Calibrator):
    """Override values near parameter points (Calibrator/Override.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        if parameter_file is None:
            return
        radius = self.options.get("radius", 0, int)
        points, params = parameter_file.to_points()
        field = ofile.get_field(self.variable)
        out = field.copy()
        for t in range(field.shape[0]):
            for e in range(field.shape[3]):
                out[t, :, :, e] = gridpp.doping_square(
                    ofile.grid, field[t, :, :, e], points,
                    params[:, 0], np.full(points.size(), radius, int))
        ofile.add_field(self.variable, out)


class CalibratorDiagnoseWind(Calibrator):
    """Wind speed/direction from x/y components
    (Calibrator/DiagnoseWind.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        xname = self.options.get("x", "x_wind_10m")
        yname = self.options.get("y", "y_wind_10m")
        compute = self.options.get("compute", "speed")
        x = ofile.get_field(xname)
        y = ofile.get_field(yname)
        if compute == "speed":
            out = gridpp.wind_speed(x.ravel(), y.ravel()).reshape(x.shape)
        else:
            out = gridpp.wind_direction(x.ravel(),
                                        y.ravel()).reshape(x.shape)
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorDiagnoseHumidity(Calibrator):
    """Dewpoint/RH/wetbulb diagnosis (Calibrator/DiagnoseHumidity.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        compute = self.options.get("compute", "dewpoint")
        temp = ofile.get_field(self.options.get("temperature",
                                                "air_temperature_2m"))
        if compute == "dewpoint":
            rh = ofile.get_field(self.options.get("rh",
                                                  "relative_humidity_2m"))
            out = gridpp.dewpoint(temp.ravel(), rh.ravel())
        elif compute == "rh":
            td = ofile.get_field(self.options.get("dewpoint",
                                                  "dew_point_temperature_2m"))
            out = gridpp.relative_humidity(temp.ravel(), td.ravel())
        else:
            rh = ofile.get_field(self.options.get("rh",
                                                  "relative_humidity_2m"))
            p = ofile.get_field(self.options.get("pressure",
                                                 "surface_air_pressure"))
            out = gridpp.wetbulb(temp.ravel(), p.ravel(), rh.ravel())
        ofile.add_field(self.variable, out.reshape(temp.shape).astype(
            np.float32))


class CalibratorGaussian(Calibrator):
    """Gaussian spread calibration: transform members to mean + scaled
    anomalies (a simplified Calibrator/Gaussian.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        field = ofile.get_field(self.variable)
        if parameter_file is None:
            return
        params = parameter_file.parameters_at_time(0)
        a = params[0] if len(params) > 0 else 0.0
        b = params[1] if len(params) > 1 else 1.0
        mean = np.nanmean(field, axis=-1, keepdims=True)
        out = mean + a + b * (field - mean)
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorQq(Calibrator):
    """Quantile mapping using curve parameters (Calibrator/Qq.cpp).

    The parameter file holds alternating (obs, fcst) pairs.
    """

    def calibrate(self, ofile, parameter_file=None):
        if parameter_file is None:
            return
        params = parameter_file.parameters_at_time(0)
        pairs = np.asarray(params, np.float32)
        ref = pairs[0::2]
        fcst = pairs[1::2]
        order = np.argsort(fcst)
        field = ofile.get_field(self.variable)
        out = gridpp.apply_curve(field.reshape(-1), ref[order], fcst[order],
                                 gridpp.OneToOne, gridpp.OneToOne)
        ofile.add_field(self.variable,
                        out.reshape(field.shape).astype(np.float32))


class CalibratorQnh(Calibrator):
    def calibrate(self, ofile, parameter_file=None):
        p = ofile.get_field(self.options.get("pressure",
                                             "surface_air_pressure"))
        elevs = np.asarray(ofile.grid.get_elevs(), np.float32)
        nt, ny, nx, ne = p.shape
        alt = np.broadcast_to(elevs[None, :, :, None], p.shape)
        out = gridpp.qnh(p.ravel(), alt.ravel().astype(np.float32))
        ofile.add_field(self.variable, out.reshape(p.shape).astype(
            np.float32))


class CalibratorPhase(Calibrator):
    """Precipitation phase from temperature thresholds
    (Calibrator/Phase.cpp): 0=none, 1=rain, 2=sleet, 3=snow."""

    def calibrate(self, ofile, parameter_file=None):
        snow = self.options.get("snowThreshold", 273.15, float)
        rain = self.options.get("rainThreshold", 274.15, float)
        temp = ofile.get_field(self.options.get("temperature",
                                                "air_temperature_2m"))
        precip = ofile.get_field(self.options.get("precipitation",
                                                  "precipitation_amount"))
        phase = np.where(precip <= 0, 0.0,
                         np.where(temp <= snow, 3.0,
                                  np.where(temp <= rain, 2.0, 1.0)))
        phase = np.where(np.isfinite(temp) & np.isfinite(precip), phase,
                         np.nan)
        ofile.add_field(self.variable, phase.astype(np.float32))


class CalibratorWindDirection(Calibrator):
    """Scale wind speed by a direction-dependent factor
    (Calibrator/WindDirection.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        if parameter_file is None:
            return
        field = ofile.get_field(self.variable)
        direction = ofile.get_field(self.options.get("directionVariable",
                                                     "wind_direction_10m"))
        params = np.asarray(parameter_file.parameters_at_time(0), np.float32)
        # params: factors at evenly spaced directions 0..360
        n = len(params)
        dirs = np.linspace(0, 360, n)
        factor = np.interp(direction.ravel(), dirs, params).reshape(
            field.shape)
        ofile.add_field(self.variable, (field * factor).astype(np.float32))


class CalibratorMask(Calibrator):
    """Mask out values near/far from parameter points
    (Calibrator/Mask.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        if parameter_file is None:
            return
        keep = self.options.get("keep", True, bool)
        points, params = parameter_file.to_points()
        field = ofile.get_field(self.variable)
        radii = params[:, 0] if params.shape[1] else np.full(points.size(),
                                                            10000.0)
        out = field.copy()
        for t in range(field.shape[0]):
            for e in range(field.shape[3]):
                out[t, :, :, e] = gridpp.fill(ofile.grid, field[t, :, :, e],
                                              points, radii, MV, not keep)
        ofile.add_field(self.variable, out)


class CalibratorRegression(Calibrator):
    """Linear regression correction y = sum(p_i * x^i)
    (Calibrator/Regression.cpp)."""

    def calibrate(self, ofile, parameter_file=None):
        if parameter_file is None:
            return
        params = np.asarray(parameter_file.parameters_at_time(0), np.float64)
        field = ofile.get_field(self.variable)
        out = np.zeros_like(field, np.float64)
        for i, p in enumerate(params):
            out += p * np.power(field.astype(np.float64), i)
        out = np.where(np.isfinite(field), out, np.nan)
        ofile.add_field(self.variable, out.astype(np.float32))


class CalibratorOi(Calibrator):
    """Optimal interpolation against point observations from the parameter
    file (a compact re-design of the 1218-line Calibrator/Oi.cpp on top of
    the library OI)."""

    def calibrate(self, ofile, parameter_file=None):
        if parameter_file is None:
            return
        h = self.options.get("h", 10000.0, float)
        v = self.options.get("v", 100.0, float)
        max_points = self.options.get("maxPoints", 20, int)
        eps2 = self.options.get("epsilon", 0.5, float)
        points, params = parameter_file.to_points()
        obs = params[:, 0]
        structure = gridpp.BarnesStructure(h, v)
        field = ofile.get_field(self.variable)
        out = field.copy()
        for t in range(field.shape[0]):
            for e in range(field.shape[3]):
                bg = field[t, :, :, e]
                pback = gridpp.nearest(ofile.grid, points, bg)
                ratios = np.full(points.size(), eps2, np.float32)
                out[t, :, :, e] = gridpp.optimal_interpolation(
                    ofile.grid, bg, points, obs, ratios, pback, structure,
                    max_points)
        ofile.add_field(self.variable, out)
