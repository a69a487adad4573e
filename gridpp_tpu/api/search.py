"""neighbourhood_search, smart neighbours, staticcorr_points API."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MV
from ..core.grid import Grid
from ..core.points import Points
from ..ops.search import neighbourhood_search as search_op
from .. import native
from ._common import asarray_f32
from .oi import _candidates, _resolved_fields

__all__ = ["neighbourhood_search", "smart", "staticcorr_points"]


def neighbourhood_search(array, search_array, halfwidth, search_target_min,
                         search_target_max, search_delta, apply_array=None):
    """Conditional neighbourhood mean (neighbourhood_search.cpp:7-113)."""
    if search_target_min > search_target_max:
        raise ValueError(
            "Search_target_min must be smaller than search_target_max")
    if halfwidth < 0:
        raise ValueError("halfwidth must be positive")
    array = asarray_f32(array)
    search_array = asarray_f32(search_array, "search_array")
    if search_array.shape != array.shape:
        raise ValueError("search_array must either be the same size as array")
    use_apply = apply_array is not None and np.size(apply_array) > 0
    if use_apply:
        apply_array = np.asarray(apply_array)
        if apply_array.shape != array.shape:
            raise ValueError(
                "apply_array must either be empty or same size as array")
    host = native.nb_search(array, search_array, int(halfwidth),
                            float(search_target_min),
                            float(search_target_max), float(search_delta),
                            apply_array if use_apply else None)
    if host is not None:
        return host
    if use_apply:
        apply_j = jnp.asarray(apply_array.astype(np.int32))
    else:
        apply_j = jnp.zeros(array.shape, jnp.int32)
    out = search_op(jnp.asarray(array), jnp.asarray(search_array),
                    int(halfwidth), float(search_target_min),
                    float(search_target_max), float(search_delta),
                    apply_j, bool(use_apply))
    return np.asarray(out)


def smart(igrid: Grid, ogrid: Grid, ivalues, num, structure):
    """Mean of the `num` highest-correlation input cells within the
    localization radius (smart.cpp:12-66)."""
    ivalues = asarray_f32(ivalues)
    gy, gx = igrid.size()
    if ivalues.shape != (gy, gx):
        raise ValueError("Grid size is not the same as values")
    opoints = ogrid.to_points()
    ipoints = igrid.to_points()
    loc = structure.localization_np(opoints.lats, opoints.lons)
    res = _candidates(opoints, ipoints, loc, int(num))
    oy, ox = ogrid.size()
    if res is None:
        return np.full((oy, ox), MV, np.float32)
    cand, mask = res
    p1_all = _resolved_fields(opoints, structure)
    i_fields = _resolved_fields(ipoints, structure)
    cand_j = jnp.asarray(cand)
    p1 = {k: jnp.asarray(v)[:, None] for k, v in p1_all.items()}
    cand_fields = {k: jnp.take(jnp.asarray(v), cand_j, axis=0)
                   for k, v in i_fields.items()}
    rho = structure.corr_jnp(p1, cand_fields)
    rho = jnp.where(jnp.asarray(mask), rho, -jnp.inf)
    k_sel = min(int(num), cand.shape[1])
    vals, sel = jax.lax.top_k(rho, k_sel)
    sel_valid = jnp.isfinite(vals)
    flat_vals = jnp.take(jnp.asarray(ivalues.reshape(-1)),
                         jnp.take_along_axis(cand_j, sel, axis=1), axis=0)
    count = jnp.sum(sel_valid, axis=1)
    total = jnp.sum(jnp.where(sel_valid, flat_vals, 0), axis=1)
    out = jnp.where(count > 0, total / jnp.maximum(count, 1), jnp.nan)
    return np.asarray(out).reshape(oy, ox)


def staticcorr_points(points: Points, knots: Points, structure, max_points):
    """Dense (points x knots) localized correlation rows
    (corr_points.cpp:26-130)."""
    if max_points < 0:
        raise ValueError("max_points must be >= 0")
    if points.get_coordinate_type() != knots.get_coordinate_type():
        raise ValueError(
            "Both background grid and observations points must be of same "
            "coordinate type (lat/lon or x/y)")
    ny = points.size()
    ns = knots.size()
    output = np.zeros((ny, ns), np.float32)
    if ns == 0 or ny == 0:
        return output
    loc = structure.localization_np(points.lats, points.lons)
    res = _candidates(points, knots, loc, int(max_points))
    if res is None:
        return output
    cand, mask = res
    p1_all = _resolved_fields(points, structure)
    k_fields = _resolved_fields(knots, structure)
    cand_j = jnp.asarray(cand)
    p1 = {k: jnp.asarray(v)[:, None] for k, v in p1_all.items()}
    cand_fields = {k: jnp.take(jnp.asarray(v), cand_j, axis=0)
                   for k, v in k_fields.items()}
    rho = structure.corr_background_jnp(p1, cand_fields)
    rho = jnp.where(jnp.asarray(mask) & (rho > 0), rho, -jnp.inf)
    k_sel = min(int(max_points), cand.shape[1]) if max_points > 0 \
        else cand.shape[1]
    vals, sel = jax.lax.top_k(rho, k_sel)
    sel_valid = np.asarray(jnp.isfinite(vals))
    vals_np = np.asarray(jnp.where(jnp.isfinite(vals), vals, 0))
    sel_idx = np.asarray(jnp.take_along_axis(cand_j, sel, axis=1))
    rows = np.repeat(np.arange(ny), k_sel).reshape(ny, k_sel)
    output[rows[sel_valid], sel_idx[sel_valid]] = vals_np[sel_valid]
    return output
