"""NaN-aware statistical primitives (pure JAX, jittable, vmappable).

These reproduce the numerics of the reference's util layer
(reference src/api/util.cpp:19-216: calc_statistic, calc_quantile,
interpolate) as vectorized XLA ops: missing values are NaN, reductions skip
them, and quantiles interpolate between order statistics exactly like the
reference's sort-based implementation.

All functions operate on the LAST axis and broadcast over leading axes, so
vmap/sharding over grid tiles is free.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import Statistic

__all__ = [
    "is_valid",
    "valid_count",
    "nan_quantile",
    "nan_statistic",
    "interpolate",
    "variance_ddof0",
]


def is_valid(x: jax.Array) -> jax.Array:
    """Elementwise validity mask (reference util.cpp:16-18): finite values."""
    return jnp.isfinite(x)


def valid_count(x: jax.Array, axis=-1) -> jax.Array:
    return jnp.sum(is_valid(x), axis=axis)


def nan_quantile(x: jax.Array, q, axis: int = -1) -> jax.Array:
    """Quantile of valid values, interpolating between order statistics.

    Matches reference util.cpp:111-178: sort valid values, take
    lower/upper order statistics at floor/ceil(q*(N-1)) and linearly
    interpolate. q=0/1 reduce to masked min/max. All-invalid rows -> NaN.

    q may be a scalar or an array broadcastable against x without its
    reduction axis (per-cell quantile levels, gridpp.h:1480).
    """
    x = jnp.moveaxis(x, axis, -1)
    t = x.shape[-1]
    if t == 0:
        return jnp.full(x.shape[:-1], jnp.nan, dtype=x.dtype)
    s = jnp.sort(x, axis=-1)  # NaNs sort to the end
    n = jnp.sum(jnp.isfinite(x), axis=-1)  # (...,) valid counts
    q = jnp.asarray(q, dtype=x.dtype)
    qn = q * (n - 1).astype(x.dtype)
    lo = jnp.clip(jnp.floor(qn).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(jnp.ceil(qn).astype(jnp.int32), 0, t - 1)
    lv = jnp.take_along_axis(s, lo[..., None], axis=-1)[..., 0]
    uv = jnp.take_along_axis(s, hi[..., None], axis=-1)[..., 0]
    denom = (hi - lo).astype(x.dtype)
    f = jnp.where(denom > 0, (qn - lo.astype(x.dtype)) / jnp.where(denom > 0, denom, 1), 0)
    val = lv + (uv - lv) * f
    val = jnp.where((n > 0) & jnp.isfinite(q), val, jnp.nan)
    return val


def _masked_sum_count(x, axis=-1):
    m = jnp.isfinite(x)
    total = jnp.sum(jnp.where(m, x, 0), axis=axis)
    count = jnp.sum(m, axis=axis)
    return total, count


def variance_ddof0(x: jax.Array, axis: int = -1) -> jax.Array:
    """Population variance with the reference's K-shift stabilization.

    Reference util.cpp:38-73: var(X) computed as var(X-K) with K the first
    valid element, E[Y^2]-E[Y]^2 form, clamped at 0.
    """
    x = jnp.moveaxis(x, axis, -1)
    m = jnp.isfinite(x)
    # K = first valid element along the axis
    first_idx = jnp.argmax(m, axis=-1)
    k = jnp.take_along_axis(x, first_idx[..., None], axis=-1)
    y = jnp.where(m, x - k, 0)
    count = jnp.sum(m, axis=-1)
    cnt = jnp.maximum(count, 1).astype(x.dtype)
    mean = jnp.sum(y, axis=-1) / cnt
    mean2 = jnp.sum(y * y, axis=-1) / cnt
    var = jnp.maximum(mean2 - mean * mean, 0)
    return jnp.where(count > 0, var, jnp.nan)


def nan_statistic(x: jax.Array, statistic: int, axis: int = -1,
                  quantile=None) -> jax.Array:
    """Reduce the given axis with a gridpp Statistic, skipping NaNs.

    Follows reference util.cpp:19-110. `statistic` must be static under
    jit. Statistic.Quantile requires `quantile`. RandomChoice is not
    implemented here (needs PRNG state; handled at the API layer).
    """
    statistic = int(statistic)
    if statistic in (Statistic.Mean, Statistic.Sum, Statistic.Count):
        total, count = _masked_sum_count(x, axis=axis)
        if statistic == Statistic.Count:
            return count.astype(x.dtype)
        val = jnp.where(statistic == Statistic.Mean,
                        total / jnp.maximum(count, 1), total)
        return jnp.where(count > 0, val, jnp.nan)
    if statistic in (Statistic.Std, Statistic.Variance):
        var = variance_ddof0(x, axis=axis)
        return jnp.sqrt(var) if statistic == Statistic.Std else var
    if statistic == Statistic.Min:
        return nan_quantile(x, 0.0, axis=axis)
    if statistic == Statistic.Median:
        return nan_quantile(x, 0.5, axis=axis)
    if statistic == Statistic.Max:
        return nan_quantile(x, 1.0, axis=axis)
    if statistic == Statistic.Quantile:
        if quantile is None:
            raise ValueError("Statistic.Quantile requires a quantile level")
        return nan_quantile(x, quantile, axis=axis)
    raise ValueError(f"Cannot compute statistic {statistic}")


@partial(jax.jit, static_argnames=())
def interpolate(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """gridpp-style piecewise-linear interpolation (util.cpp:377-432).

    xp must be sorted. Outside [xp[0], xp[-1]] the edge fp value is used.
    At a repeated x-value ("flat interval") the average of the two interval
    endpoints is used, except when the flat interval touches exactly one
    curve boundary, in which case the interior endpoint's value is used.
    Broadcasts over any shape of x; xp/fp are 1-D.
    """
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    x = jnp.asarray(x)
    n = xp.shape[0]
    if n == 0:
        return jnp.full(x.shape, jnp.nan, dtype=fp.dtype if fp.size else jnp.float32)
    left = jnp.searchsorted(xp, x, side="left")
    right = jnp.searchsorted(xp, x, side="right")
    has_exact = right > left
    i0 = jnp.where(has_exact, left, left - 1)   # first == x, else last < x
    i1 = jnp.where(has_exact, right - 1, right)  # last == x, else first > x
    i0c = jnp.clip(i0, 0, n - 1)
    i1c = jnp.clip(i1, 0, n - 1)
    x0 = xp[i0c]
    x1 = xp[i1c]
    y0 = fp[i0c]
    y1 = fp[i1c]
    flat = x0 == x1
    both_edge = (i0 == 0) & (i1 == n - 1)
    y_flat = jnp.where(
        both_edge, (y0 + y1) / 2,
        jnp.where(i0 == 0, y1, jnp.where(i1 == n - 1, y0, (y0 + y1) / 2)))
    dx = jnp.where(flat, 1, x1 - x0)
    y_lin = y0 + (y1 - y0) * (x - x0) / dx
    y = jnp.where(flat, y_flat, y_lin)
    y = jnp.where(x > xp[n - 1], fp[n - 1], y)
    y = jnp.where(x < xp[0], fp[0], y)
    return jnp.where(jnp.isfinite(x), y, jnp.nan)
