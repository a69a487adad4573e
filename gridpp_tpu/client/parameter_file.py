"""Parameter files (reference src/client/ParameterFile/{ParameterFile,
Text}.cpp).

Text format: whitespace table with a header naming `time` and optionally
`lat lon elev` plus parameter columns. Spatial files provide
nearest-location lookup.
"""
from __future__ import annotations

import numpy as np

from ..core.points import Points


class ParameterFileText:
    def __init__(self, filename, options=None):
        self.filename = filename
        self.times = []
        self.spatial = False
        # rows: list of (time, lat, lon, elev, params...)
        lats, lons, elevs = [], [], []
        records = []
        with open(filename) as f:
            header = None
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if header is None:
                    header = line.split()
                    self.columns = header
                    self._time_pos = header.index("time") \
                        if "time" in header else None
                    self._lat_pos = header.index("lat") \
                        if "lat" in header else None
                    self._lon_pos = header.index("lon") \
                        if "lon" in header else None
                    self._elev_pos = header.index("elev") \
                        if "elev" in header else None
                    spatial_cols = sum(p is not None for p in
                                       (self._lat_pos, self._lon_pos,
                                        self._elev_pos))
                    if 0 < spatial_cols < 3:
                        raise RuntimeError(
                            "Partial spatial definitions found")
                    self.spatial = spatial_cols == 3
                    continue
                values = [float(v) for v in line.split()]
                records.append(values)
        skip = {p for p in (self._time_pos, self._lat_pos, self._lon_pos,
                            self._elev_pos) if p is not None}
        param_cols = [i for i in range(len(self.columns)) if i not in skip]
        self._records = records
        self._param_cols = param_cols
        if self.spatial:
            self._lats = np.array([r[self._lat_pos] for r in records])
            self._lons = np.array([r[self._lon_pos] for r in records])
            self._elevs = np.array([r[self._elev_pos] for r in records])
        self._times = np.array(
            [r[self._time_pos] if self._time_pos is not None else 0
             for r in records])
        self._params = np.array([[r[c] for c in param_cols]
                                 for r in records], np.float32)

    def is_location_dependent(self) -> bool:
        """Whether parameters vary by location (ParameterFile.h:16-60)."""
        return self.spatial

    def params_for_locations(self, time, lats, lons):
        """(N, P) parameter rows for N query locations.

        Spatial files resolve each location to its nearest parameter
        point (ParameterFile nearest-location lookup); non-spatial files
        broadcast the single time-matched row.
        """
        lats = np.asarray(lats, np.float64).ravel()
        if not self.spatial:
            row = self.parameters_at_time(time)
            return np.broadcast_to(row, (lats.size, row.size)).copy()
        points, params = self.to_points(time)
        idx = points.index.nearest(lats, np.asarray(lons,
                                                    np.float64).ravel())
        return params[idx]

    def parameters_at_time(self, time):
        """Parameter vector for the nearest available time (non-spatial)."""
        if len(self._times) == 0:
            return np.zeros(0, np.float32)
        i = int(np.argmin(np.abs(self._times - time)))
        return self._params[i]

    def to_points(self, time=None):
        """(Points, params[S, P]) for spatial parameter files."""
        if not self.spatial:
            raise RuntimeError("Parameter file has no locations")
        if time is None:
            mask = np.ones(len(self._times), bool)
        else:
            tsel = self._times[np.argmin(np.abs(self._times - time))]
            mask = self._times == tsel
        points = Points(self._lats[mask], self._lons[mask],
                        self._elevs[mask])
        return points, self._params[mask]


def get_parameter_file(name, options=None):
    """Autodetect parameter format (text only for now)."""
    return ParameterFileText(name, options)
