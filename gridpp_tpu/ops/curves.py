"""Calibration-curve device ops (reference src/api/curve.cpp).

apply_curve is a vectorized searchsorted-style interpolation with the
reference's five extrapolation policies, batched over cells; per-cell
curves (the gridded-curve variant, curve.cpp:105-133) ride a trailing
curve axis so one XLA program covers both forms.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import Extrapolation

__all__ = ["piecewise_interp", "apply_curve", "calc_score"]


def piecewise_interp(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """gridpp interpolate (util.cpp:377-432) with per-cell curves.

    x: (...); xp/fp: (..., C) sorted along the last axis, broadcastable to
    x's shape. Outside the curve the edge value is used; repeated-x
    intervals follow the reference's averaging rules.
    """
    c = xp.shape[-1]
    if xp.ndim == 1:
        # Shared curve: O(N log C) binary search
        left = jnp.searchsorted(xp, x, side="left")
        right = jnp.searchsorted(xp, x, side="right")
        has_exact = right > left
        i0 = jnp.where(has_exact, left, left - 1)
        i1 = jnp.where(has_exact, right - 1, right)
        i0c = jnp.clip(i0, 0, c - 1)
        i1c = jnp.clip(i1, 0, c - 1)
        x0 = xp[i0c]
        x1 = xp[i1c]
        y0 = fp[i0c]
        y1 = fp[i1c]
        last_x = xp[c - 1]
        first_x = xp[0]
        last_y = fp[c - 1]
        first_y = fp[0]
    else:
        # Per-cell curves (small C): broadcast counting
        xp = jnp.broadcast_to(xp, x.shape + (c,))
        fp = jnp.broadcast_to(fp, x.shape + (c,))
        xb = x[..., None]
        left = jnp.sum(xp < xb, axis=-1)
        right = jnp.sum(xp <= xb, axis=-1)
        has_exact = right > left
        i0 = jnp.where(has_exact, left, left - 1)
        i1 = jnp.where(has_exact, right - 1, right)
        i0c = jnp.clip(i0, 0, c - 1)
        i1c = jnp.clip(i1, 0, c - 1)
        x0 = jnp.take_along_axis(xp, i0c[..., None], axis=-1)[..., 0]
        x1 = jnp.take_along_axis(xp, i1c[..., None], axis=-1)[..., 0]
        y0 = jnp.take_along_axis(fp, i0c[..., None], axis=-1)[..., 0]
        y1 = jnp.take_along_axis(fp, i1c[..., None], axis=-1)[..., 0]
        last_x = xp[..., c - 1]
        first_x = xp[..., 0]
        last_y = fp[..., c - 1]
        first_y = fp[..., 0]
    flat = x0 == x1
    both_edge = (i0 == 0) & (i1 == c - 1)
    y_flat = jnp.where(both_edge, (y0 + y1) / 2,
                       jnp.where(i0 == 0, y1,
                                 jnp.where(i1 == c - 1, y0, (y0 + y1) / 2)))
    dx = jnp.where(flat, 1, x1 - x0)
    y_lin = y0 + (y1 - y0) * (x - x0) / dx
    y = jnp.where(flat, y_flat, y_lin)
    y = jnp.where(x > last_x, last_y, y)
    y = jnp.where(x < first_x, first_y, y)
    return jnp.where(jnp.isfinite(x), y, jnp.nan)


@partial(jax.jit, static_argnames=("policy_below", "policy_above"))
def apply_curve(fcst: jax.Array, curve_ref: jax.Array, curve_fcst: jax.Array,
                policy_below: int, policy_above: int) -> jax.Array:
    """apply_curve (curve.cpp:6-133), vectorized over cells.

    fcst: (...); curve_ref/curve_fcst: (..., C) with curve_fcst sorted.
    """
    c = curve_fcst.shape[-1]
    lo_f = curve_fcst[..., 0]
    hi_f = curve_fcst[..., c - 1]
    lo_r = curve_ref[..., 0]
    hi_r = curve_ref[..., c - 1]
    interp = piecewise_interp(fcst, curve_fcst, curve_ref)

    def extrap(policy: int, nearest_r, nearest_f, d_r, d_f):
        policy = int(policy)
        if policy == Extrapolation.Unchanged:
            return fcst
        if policy == Extrapolation.Zero:
            slope = jnp.zeros_like(fcst)
        elif policy == Extrapolation.OneToOne or c <= 1:
            slope = jnp.ones_like(fcst)
        elif policy == Extrapolation.MeanSlope:
            slope = (hi_r - lo_r) / (hi_f - lo_f)
        elif policy == Extrapolation.NearestSlope:
            slope = d_r / d_f
        else:
            raise ValueError("Unknown extrapolation policy")
        return nearest_r + slope * (fcst - nearest_f)

    if c >= 2:
        below_d_r = curve_ref[..., 1] - curve_ref[..., 0]
        below_d_f = curve_fcst[..., 1] - curve_fcst[..., 0]
        above_d_r = curve_ref[..., c - 1] - curve_ref[..., c - 2]
        above_d_f = curve_fcst[..., c - 1] - curve_fcst[..., c - 2]
    else:
        below_d_r = below_d_f = above_d_r = above_d_f = jnp.ones_like(lo_r)
    below = extrap(policy_below, lo_r, lo_f, below_d_r, below_d_f)
    above = extrap(policy_above, hi_r, hi_f, above_d_r, above_d_f)
    out = jnp.where(fcst < lo_f, below, jnp.where(fcst > hi_f, above, interp))
    return out


def calc_score(a, b, c, d, metric: int):
    """Contingency-table score (metric_optimizer.cpp:207-244), vectorized."""
    from ..constants import Metric
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    metric = int(metric)
    if metric == Metric.Ets:
        n = a + b + c + d
        ar = (a + b) / n * (a + c)
        denom = a + b + c - ar
        return jnp.where(denom == 0, jnp.nan, (a - ar) / denom)
    if metric == Metric.Ts:
        return a / (a + b + c)
    if metric == Metric.Pc:
        return (a + d) / (a + b + c + d)
    if metric == Metric.Kss:
        denom = (a + c) * (b + d)
        return jnp.where(denom == 0, jnp.nan, (a * d - b * c) / denom)
    if metric == Metric.Bias:
        return jnp.where(b == c, 1.0, 1 - jnp.abs(b - c) / (b + c))
    if metric == Metric.Hss:
        denom = (a + c) * (c + d) + (a + b) * (b + d)
        return jnp.where(denom == 0, jnp.nan, 2.0 * (a * d - b * c) / denom)
    raise ValueError("Unknown metric")


def contingency(ref: jax.Array, fcst: jax.Array, threshold, fthreshold):
    """a,b,c,d counts (metric_optimizer.cpp:189-206)."""
    fpos = fcst > fthreshold
    rpos = ref > threshold
    rneg = ref <= threshold  # NaN ref is in neither rpos nor rneg
    a = jnp.sum(fpos & rpos)
    b = jnp.sum(fpos & rneg)
    c = jnp.sum(~fpos & rpos)
    d = jnp.sum(~fpos & rneg)
    return a, b, c, d
