"""Points->grid aggregation, neighbour counts and distances.

Reference src/api/{gridding,count,distance}.cpp. All spatial queries run as
batch host precompute; statistics evaluate vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import MV, Statistic
from ..core.grid import Grid
from ..core.points import Points
from ..core import coords
from ..ops import stats as stats_ops
from ._common import asarray_f32, check_points_compatible

__all__ = ["gridding", "gridding_nearest", "count", "distance"]


def _target_latlon_flat(target):
    if isinstance(target, Grid):
        return target.lats.ravel(), target.lons.ravel(), tuple(target.size())
    return target.lats, target.lons, (target.size(),)


def _stat_of_groups(values_list, statistic, min_num):
    statistic = int(statistic)
    out = np.full(len(values_list), MV, np.float32)
    if not values_list:
        return out
    kmax = max((len(v) for v in values_list), default=0)
    if kmax == 0:
        return out
    padded = np.full((len(values_list), kmax), np.nan, np.float32)
    counts = np.zeros(len(values_list), np.int64)
    for i, v in enumerate(values_list):
        padded[i, :len(v)] = v
        counts[i] = len(v)
    from .utils import calc_statistic as host_stat
    if statistic == Statistic.RandomChoice:
        res = np.array([host_stat(row[:c], statistic) if c else MV
                        for row, c in zip(padded, counts)], np.float32)
    else:
        res = np.asarray(stats_ops.nan_statistic(
            jnp.asarray(padded), statistic, axis=-1))
    ok = counts > 0 if min_num <= 0 else counts >= min_num
    # Empty groups produce MV even for Count when no points found
    # (gridding.cpp:22-31 only writes when the radius query is non-empty or
    # min_num allows)
    out[ok] = res[ok]
    if statistic == Statistic.Count:
        out[ok & (counts == 0)] = 0
    return out


def gridding(target, points, values, radius, min_num, statistic):
    """Aggregate point values onto a grid/points by radius query
    (gridding.cpp:6-61)."""
    values = asarray_f32(values).ravel()
    check_points_compatible(points, values)
    if not np.isfinite(radius) or radius < 0:
        raise ValueError("radius must be >= 0")
    if min_num < 0:
        raise ValueError("min_num must be >= 0")
    qlats, qlons, oshape = _target_latlon_flat(target)
    lists = points.index.tree.query_ball_point(
        np.stack(coords.convert_coordinates_np(
            qlats.astype(np.float64), qlons.astype(np.float64),
            points.get_coordinate_type()), axis=-1),
        r=float(radius), workers=-1)
    groups = [values[np.asarray(lst, dtype=np.int64)] for lst in lists]
    # Note: reference computes the statistic whenever min_num allows, even
    # with zero points (calc_statistic of empty -> MV; Count -> 0)
    out = np.full(len(groups), MV, np.float32)
    statistic = int(statistic)
    counts = np.array([len(g) for g in groups])
    allowed = counts >= min_num if min_num > 0 else np.ones(len(groups), bool)
    nonzero = allowed & (counts > 0)
    res = _stat_of_groups([g for g in groups], statistic, 0)
    out[nonzero] = res[nonzero]
    if statistic == Statistic.Count:
        out[allowed & (counts == 0)] = 0
    return out.reshape(oshape)


def gridding_nearest(target, points, values, min_num, statistic):
    """Scatter each point to its nearest cell, then reduce
    (gridding.cpp:63-131)."""
    values = asarray_f32(values).ravel()
    check_points_compatible(points, values)
    if min_num < 0:
        raise ValueError("min_num must be >= 0")
    qlats, qlons, oshape = _target_latlon_flat(target)
    n_out = int(np.prod(oshape))
    if isinstance(target, Grid):
        nn = target.index.nearest(points.lats.astype(np.float64),
                                  points.lons.astype(np.float64))
    else:
        nn = target.index.nearest(points.lats.astype(np.float64),
                                  points.lons.astype(np.float64))
    statistic = int(statistic)
    counts = np.bincount(nn, minlength=n_out)
    out = np.full(n_out, MV, np.float32)
    occupied = counts > 0
    allowed = occupied if min_num <= 0 else occupied & (counts >= min_num)
    if statistic in (Statistic.Mean, Statistic.Sum, Statistic.Count):
        valid = np.isfinite(values)
        vsum = np.bincount(nn, weights=np.where(valid, values, 0),
                           minlength=n_out)
        vcnt = np.bincount(nn, weights=valid.astype(np.float64),
                           minlength=n_out)
        if statistic == Statistic.Count:
            out[allowed] = vcnt[allowed]
        elif statistic == Statistic.Mean:
            res = np.where(vcnt > 0, vsum / np.maximum(vcnt, 1), MV)
            out[allowed] = res[allowed]
        else:
            res = np.where(vcnt > 0, vsum, MV)
            out[allowed] = res[allowed]
    else:
        order = np.argsort(nn, kind="stable")
        sorted_nn = nn[order]
        sorted_v = values[order]
        cells, starts = np.unique(sorted_nn, return_index=True)
        splits = np.split(sorted_v, starts[1:])
        groups = [np.zeros(0, np.float32)] * n_out
        for cell, vals in zip(cells, splits):
            groups[cell] = vals
        res = _stat_of_groups(groups, statistic, 0)
        out[allowed] = res[allowed]
    return out.astype(np.float32).reshape(oshape)


def count(source, target, radius):
    """Neighbour counts within radius (count.cpp)."""
    qlats, qlons, oshape = _target_latlon_flat(target)
    if isinstance(source, Grid):
        index = source.index
    else:
        index = source.index
    out = index.radius_counts(qlats.astype(np.float64),
                              qlons.astype(np.float64), float(radius))
    return out.astype(np.float32).reshape(oshape)


def distance(source, target, num=1):
    """Distance to the num-th nearest source point (distance.cpp).

    k-nearest found in chord space; reported distance is great-circle
    (the reference's calc_distance on the found neighbours).
    """
    if source.get_coordinate_type() != target.get_coordinate_type():
        raise ValueError("Incompatible coordinate types")
    qlats, qlons, oshape = _target_latlon_flat(target)
    qlats = qlats.astype(np.float64).ravel()
    qlons = qlons.astype(np.float64).ravel()
    index = source.index
    idx, _ = index.knearest(qlats, qlons, int(num))
    slats = index.lats
    slons = index.lons
    valid = idx >= 0
    idxc = np.where(valid, idx, 0)
    d = coords.calc_distance_np(qlats[:, None], qlons[:, None],
                                slats[idxc], slons[idxc],
                                source.get_coordinate_type())
    d = np.where(valid, d, 0.0)
    out = d.max(axis=1).astype(np.float32)
    return out.reshape(oshape)
