"""Downscaling API: nearest, bilinear, downscaling dispatch.

Mirrors reference src/api/{nearest,bilinear,downscaling}.cpp behaviour.
Grid->Grid / Grid->Points / Points->Grid / Points->Points, 2-D and 3-D
(leading time axis) variants, dispatched on argument types like the SWIG
overloads.
"""
from __future__ import annotations

import weakref

import jax.numpy as jnp
import numpy as np

from ..constants import MV, Downscaler
from ..core.bilinear_weights import compute_bilinear_map
from ..core.grid import Grid
from ..core.points import Points
from ..ops import downscaling as ops
from ._common import asarray_f32, check_grid_compatible, check_points_compatible

__all__ = ["nearest", "bilinear", "downscaling"]


def _target_latlon(target):
    if isinstance(target, Grid):
        return target.lats, target.lons, target.lats.shape
    return target.lats, target.lons, (target.size(),)


def _bilinear_map(igrid: Grid, target):
    cache = getattr(igrid, "_bl_cache", None)
    if cache is None:
        cache = weakref.WeakKeyDictionary()
        igrid._bl_cache = cache
    try:
        return cache[target]
    except (KeyError, TypeError):
        pass
    lats, lons, _ = _target_latlon(target)
    bmap = compute_bilinear_map(igrid, lats, lons)
    try:
        cache[target] = bmap
    except TypeError:
        pass
    return bmap


def nearest(source, target, ivalues):
    """Nearest-neighbour downscale/interpolate (nearest.cpp).

    Dispatch:
      (Grid, Grid, (Y,X)) -> (Yo,Xo);  (Grid, Grid, (T,Y,X)) -> (T,Yo,Xo)
      (Grid, Points, (Y,X)) -> (P,);   (Grid, Points, (T,Y,X)) -> (T,P)
      (Points, Points, (P,)) -> (Po,); (Points, Points, (T,P)) -> (T,Po)
      (Points, Grid, (P,)) -> (Y,X);   (Points, Grid, (T,P)) -> (T,Y,X)
    """
    ivalues = asarray_f32(ivalues)
    qlats, qlons, oshape = _target_latlon(target)

    if isinstance(source, Grid):
        if ivalues.ndim not in (2, 3):
            raise ValueError("values must be 2D or 3D")
        check_grid_compatible(source, ivalues)
        if source.size()[0] == 0 or source.size()[1] == 0:
            return np.full(ivalues.shape[:-2] + oshape, MV, np.float32)
        flat = source.nearest_map(qlats, qlons, cache_obj=target)
    elif isinstance(source, Points):
        if ivalues.ndim not in (1, 2):
            raise ValueError("values must be 1D or 2D")
        check_points_compatible(source, ivalues)
        if source.size() == 0:
            return np.full(ivalues.shape[:-1] + oshape, MV, np.float32)
        flat = source.index.nearest(np.asarray(qlats, np.float64).ravel(),
                                    np.asarray(qlons, np.float64).ravel())
        # Points values are already flat; add a dummy trailing axis pair by
        # treating (..., P) as (..., 1, P) for the shared gather kernel.
        ivalues = ivalues[..., None, :]
    else:
        raise ValueError("source must be a Grid or Points")

    out = ops.nearest_apply(jnp.asarray(ivalues), jnp.asarray(flat))
    return np.asarray(out).reshape(ivalues.shape[:-2] + oshape)


def bilinear(igrid, target, ivalues):
    """Bilinear downscale/interpolate (bilinear.cpp)."""
    if not isinstance(igrid, Grid):
        raise ValueError("Bilinear interpolation requires a Grid source")
    ivalues = asarray_f32(ivalues)
    if ivalues.ndim not in (2, 3):
        raise ValueError("values must be 2D or 3D")
    check_grid_compatible(igrid, ivalues)
    qlats, qlons, oshape = _target_latlon(target)
    if igrid.size()[0] == 0 or igrid.size()[1] == 0:
        return np.full(ivalues.shape[:-2] + oshape, MV, np.float32)
    m = _bilinear_map(igrid, target)
    out = ops.bilinear_apply(
        jnp.asarray(ivalues), jnp.asarray(m.p1), jnp.asarray(m.p2),
        jnp.asarray(m.p3), jnp.asarray(m.p4), jnp.asarray(m.nn),
        jnp.asarray(m.s), jnp.asarray(m.t), jnp.asarray(m.inside))
    return np.asarray(out).reshape(ivalues.shape[:-2] + oshape)


def downscaling(igrid, target, ivalues, downscaler):
    """Dispatch on Downscaler enum (downscaling.cpp:7-61)."""
    downscaler = int(downscaler)
    if downscaler == Downscaler.Nearest:
        return nearest(igrid, target, ivalues)
    if downscaler == Downscaler.Bilinear:
        return bilinear(igrid, target, ivalues)
    raise ValueError("Invalid downscaler")
