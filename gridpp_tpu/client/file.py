"""File abstraction: lazy field cache over NetCDF (reference
src/client/File/{File,Netcdf,Fake}.cpp).

Fields are (T, Y, X, E) numpy arrays cached per variable. FileNetcdf
autodetects common MET-Norway dimension/variable layouts (time, y/x or
lat/lon dims, optional ensemble_member dim) in NetCDF3 files via scipy.
"""
from __future__ import annotations

import os
import shutil

import numpy as np

from ..constants import MV
from ..core.grid import Grid

_LAT_NAMES = ("latitude", "lat", "lats")
_LON_NAMES = ("longitude", "lon", "lons")
_ELEV_NAMES = ("altitude", "surface_geopotential", "elev")
_LAF_NAMES = ("land_area_fraction", "laf")
_TIME_NAMES = ("time",)
_ENS_NAMES = ("ensemble_member", "ens", "member")


class File:
    """Base: holds a Grid, times, and a lazy field cache."""

    def __init__(self):
        self._fields: dict[str, np.ndarray] = {}
        self.grid: Grid | None = None
        self.times: np.ndarray = np.zeros(0)
        self.num_ens = 1
        self.reference_time = None

    def has_variable(self, name) -> bool:
        raise NotImplementedError

    def get_field(self, name) -> np.ndarray:
        """(T, Y, X, E) field, cached."""
        if name not in self._fields:
            self._fields[name] = self._read_field(name)
        return self._fields[name]

    def add_field(self, name, values):
        values = np.asarray(values, np.float32)
        assert values.ndim == 4
        self._fields[name] = values

    def get_cache_size(self) -> int:
        return sum(v.nbytes for v in self._fields.values())

    def _read_field(self, name):
        raise NotImplementedError

    def write(self, variables, history=""):
        raise NotImplementedError

    @staticmethod
    def open(filename, options=None):
        """Autodetect the file backend (File/File.cpp:19-57)."""
        ftype = options.get("type") if options else None
        if ftype == "fake":
            return FileFake()
        return FileNetcdf(filename)


class FileNetcdf(File):
    """NetCDF file with flexible naming (File/Netcdf.cpp)."""

    def __init__(self, filename):
        super().__init__()
        self.filename = filename
        try:
            from scipy.io import netcdf_file
            self._nc = netcdf_file(filename, "r", mmap=False)
            self._backend = "scipy"
        except Exception:
            try:
                import netCDF4
                self._nc = netCDF4.Dataset(filename, "r")
                self._backend = "netcdf4"
            except ImportError:
                raise RuntimeError(
                    f"Cannot open '{filename}': NetCDF4 files need the "
                    "netCDF4 package (not installed); NetCDF3 is supported "
                    "natively")
        self._parse()

    def _var(self, names):
        for name in names:
            if name in self._nc.variables:
                return self._nc.variables[name]
        return None

    def _dim_size(self, names):
        for name in names:
            if name in self._nc.dimensions:
                size = self._nc.dimensions[name]
                if not isinstance(size, int):
                    size = len(size)
                if size is None:  # unlimited: infer from the time var
                    v = self._var([name])
                    size = v.shape[0] if v is not None else 1
                return name, size
        return None, None

    def _parse(self):
        lat_var = self._var(_LAT_NAMES)
        lon_var = self._var(_LON_NAMES)
        if lat_var is None or lon_var is None:
            raise RuntimeError(
                f"File '{self.filename}' has no lat/lon information")
        lats = np.array(lat_var[:], np.float64)
        lons = np.array(lon_var[:], np.float64)
        if lats.ndim == 1:
            lats, lons = np.meshgrid(lats, lons, indexing="ij")
        elevs = None
        elev_var = self._var(_ELEV_NAMES)
        if elev_var is not None:
            ev = np.array(elev_var[:], np.float64)
            while ev.ndim > 2:
                ev = ev[0]
            std_name = getattr(elev_var, "standard_name", "")
            if isinstance(std_name, bytes):
                std_name = std_name.decode()
            if "geopotential" in std_name:
                ev = ev / 9.80665
            elevs = ev
        lafs = None
        laf_var = self._var(_LAF_NAMES)
        if laf_var is not None:
            lv = np.array(laf_var[:], np.float64)
            while lv.ndim > 2:
                lv = lv[0]
            lafs = lv
        self.grid = Grid(lats, lons,
                         elevs if elevs is not None else (),
                         lafs if lafs is not None else ())
        time_var = self._var(_TIME_NAMES)
        self.times = (np.array(time_var[:], np.float64)
                      if time_var is not None else np.zeros(1))
        _, ens_size = self._dim_size(_ENS_NAMES)
        self.num_ens = ens_size or 1
        ref_var = self._var(("forecast_reference_time",))
        if ref_var is not None:
            try:
                self.reference_time = float(np.asarray(ref_var.data))
            except Exception:
                self.reference_time = None

    def has_variable(self, name):
        return name in self._nc.variables

    def _read_field(self, name):
        if name not in self._nc.variables:
            raise RuntimeError(
                f"Variable '{name}' not in file '{self.filename}'")
        var = self._nc.variables[name]
        data = np.array(var[:], np.float32)
        return self._normalize_dims(data, var.dimensions)

    def _normalize_dims(self, data, dims):
        shape = data.shape
        t_ax = e_ax = None
        other = []
        for i, d in enumerate(dims):
            if d in _TIME_NAMES:
                t_ax = i
            elif d in _ENS_NAMES:
                e_ax = i
            else:
                other.append(i)
        # drop singleton level axes from the middle
        while len(other) > 2:
            i = other[0]
            if shape[i] == 1:
                data = np.squeeze(data, axis=i)
                dims = tuple(d for j, d in enumerate(dims) if j != i)
                return self._normalize_dims(data, dims)
            other.pop(0)
        y_ax, x_ax = other[-2], other[-1]
        perm = [a for a in (t_ax, y_ax, x_ax, e_ax) if a is not None]
        data = np.transpose(data, perm)
        if t_ax is None:
            data = data[None]
        if e_ax is None:
            data = data[..., None]
        return data.astype(np.float32)

    def write(self, variables, history=""):
        """Write cached fields back (NetCDF3 via scipy).

        scipy's netcdf append mode corrupts record variables beyond the
        first record when assigned in place, so the file is rewritten
        wholesale: dimensions, attributes, and untouched variables are
        copied; cached fields replace their variables' data.
        """
        from scipy.io import netcdf_file
        updates = {}
        for name in variables:
            if name in self._fields and name in self._nc.variables:
                var = self._nc.variables[name]
                updates[name] = _fit_to_dims(self._fields[name], var.shape)
        # Snapshot everything before closing the read handle
        dims = dict(self._nc.dimensions)
        varspec = []
        for name, var in self._nc.variables.items():
            if name in updates:
                data = updates[name]
            elif var.shape == ():
                data = var.getValue()
            else:
                data = np.array(var[:])
            attrs = dict(getattr(var, "_attributes", {}))
            varspec.append((name, var.dimensions, var.data.dtype, data,
                            attrs))
        gattrs = dict(getattr(self._nc, "_attributes", {}))
        self._nc.close()
        if history:
            prev = gattrs.get("history", b"")
            if isinstance(prev, bytes):
                prev = prev.decode()
            gattrs["history"] = (history + "\n" + prev).encode()
        out = netcdf_file(self.filename, "w", mmap=False)
        for key, value in gattrs.items():
            setattr(out, key, value)
        for name, size in dims.items():
            if size is None:
                # Materialize the unlimited (record) dimension: scipy's
                # writer mangles record-variable data, so emit fixed size.
                size = next((d.shape[i]
                             for _, vdims, _, d, _ in varspec
                             for i, dn in enumerate(vdims) if dn == name
                             and np.ndim(d) > i), 1)
            out.createDimension(name, int(size))
        for name, vdims, dtype, data, attrs in varspec:
            v = out.createVariable(name, dtype.newbyteorder("="), vdims)
            for key, value in attrs.items():
                setattr(v, key, value)
            if len(vdims) == 0:
                # assignValue is broken for 0-d backing arrays in scipy
                v.data[()] = data
            else:
                v[:] = np.asarray(data).astype(dtype)
        out.close()
        self._nc = netcdf_file(self.filename, "r", mmap=False)


def _fit_to_dims(data, target_shape):
    """Reshape a (T, Y, X, E) field back to a variable's dim layout."""
    d = data
    if d.shape[-1] == 1 and len(target_shape) < 4:
        d = d[..., 0]
    try:
        return d.reshape(target_shape)
    except ValueError:
        flat = d.reshape(-1)
        need = int(np.prod(target_shape))
        return flat[:need].reshape(target_shape)


class FileFake(File):
    """Synthetic in-memory 10x10x2x10 file (File/Fake.cpp:2-50)."""

    def __init__(self, ny=10, nx=10, nt=2, ne=10):
        super().__init__()
        lats, lons = np.meshgrid(np.linspace(50, 60, ny),
                                 np.linspace(0, 10, nx), indexing="ij")
        elevs = np.zeros((ny, nx), np.float32)
        self.grid = Grid(lats, lons, elevs)
        self.times = np.arange(nt) * 3600.0
        self.num_ens = ne
        self._ny, self._nx, self._nt, self._ne = ny, nx, nt, ne

    def has_variable(self, name):
        return True

    def _read_field(self, name):
        t = np.arange(self._nt)[:, None, None, None]
        y = np.arange(self._ny)[None, :, None, None]
        x = np.arange(self._nx)[None, None, :, None]
        e = np.arange(self._ne)[None, None, None, :]
        return (y + x + 0.1 * e + t).astype(np.float32)

    def write(self, variables, history=""):
        pass
