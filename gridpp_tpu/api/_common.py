"""Shared helpers for the API layer: array coercion and validation.

The reference maps std::invalid_argument to Python ValueError via SWIG
(reference swig/gridpp.i:21-40); API functions here raise ValueError with
equivalent messages so the reference's invalid-argument test sweeps port
unchanged.
"""
from __future__ import annotations

import numpy as np

from ..core.grid import Grid
from ..core.points import Points


def asarray_f32(x, name="values"):
    try:
        arr = np.asarray(x, dtype=np.float32)
    except (TypeError, ValueError) as e:
        raise ValueError(f"Could not convert {name} to a float array: {e}")
    return arr


def require_ndim(arr, ndim, name="values"):
    if arr.ndim != ndim:
        raise ValueError(f"{name} must be {ndim}D")
    return arr


def check_grid_compatible(grid: Grid, values: np.ndarray, tdim: bool = False):
    """compatible_size(Grid, vec2/vec3) (util.cpp:434-444)."""
    shape = values.shape[-2:]
    gy, gx = grid.size()
    if values.size == 0:
        return
    if shape != (gy, gx):
        raise ValueError("Grid size is not the same as values")


def check_points_compatible(points: Points, values: np.ndarray):
    n = values.shape[-1]
    if points.size() != n:
        raise ValueError("Points size is not the same as values")


def check_same_shape(a, b, msg):
    if np.shape(a) != np.shape(b):
        raise ValueError(msg)


def to_numpy(x):
    return np.asarray(x)
