"""Gradient-based downscaling and per-cell gradient estimation.

Reference src/api/{simple_gradient,gradient,calc_gradient}.cpp.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import MV, GradientType, Statistic
from ..core.grid import Grid
from ..core.points import Points
from ..ops import neighbourhood as nops
from ._common import asarray_f32, check_grid_compatible
from .downscaling import downscaling

__all__ = ["simple_gradient", "full_gradient", "full_gradient_debug",
           "calc_gradient"]


def simple_gradient(igrid, target, ivalues, elev_gradient,
                    downscaler=None):
    """Downscale + constant elevation-gradient correction
    (simple_gradient.cpp)."""
    from ..constants import Downscaler
    if downscaler is None:
        downscaler = Downscaler.Nearest
    ivalues = asarray_f32(ivalues)
    check_grid_compatible(igrid, ivalues)
    dvalues = downscaling(igrid, target, ivalues, downscaler)
    delevs = downscaling(igrid, target, igrid.get_elevs(), downscaler)
    oelevs = (target.get_elevs() if isinstance(target, Grid)
              else target.get_elevs())
    corr = (np.asarray(oelevs, np.float32) - delevs) * float(elev_gradient)
    return dvalues + corr


def full_gradient(igrid, target, ivalues, elev_gradient, laf_gradient=None,
                  downscaler=None):
    """Downscale with per-cell elevation and laf gradient fields
    (gradient.cpp:5-130). Gradients are downscaled alongside the values in
    one stacked call, then applied against the target's elevs/lafs."""
    from ..constants import Downscaler
    if downscaler is None:
        downscaler = Downscaler.Nearest
    ivalues = asarray_f32(ivalues)
    is3d = ivalues.ndim == 3
    gy, gx = igrid.size()
    vshape = ivalues.shape[-2:]
    if vshape != (gy, gx):
        raise ValueError("Values is the wrong size")
    elev_gradient = asarray_f32(elev_gradient, "elev_gradient") \
        if np.size(elev_gradient) else np.zeros(0, np.float32)
    laf_gradient = asarray_f32(laf_gradient, "laf_gradient") \
        if laf_gradient is not None and np.size(laf_gradient) else \
        np.zeros(0, np.float32)
    if elev_gradient.size and elev_gradient.shape[-2:] != (gy, gx):
        raise ValueError("Elevation gradient is the wrong size")
    if laf_gradient.size and laf_gradient.shape[-2:] != (gy, gx):
        raise ValueError("Laf gradient is the wrong size")

    vals3 = ivalues if is3d else ivalues[None]
    nt = vals3.shape[0]
    fields = [vals3]
    if elev_gradient.size:
        eg3 = elev_gradient if elev_gradient.ndim == 3 else elev_gradient[None]
        fields.append(np.broadcast_to(eg3, (nt, gy, gx))
                      if is3d and eg3.shape[0] != nt else eg3)
        fields.append(igrid.get_elevs()[None])
    if laf_gradient.size:
        lg3 = laf_gradient if laf_gradient.ndim == 3 else laf_gradient[None]
        fields.append(np.broadcast_to(lg3, (nt, gy, gx))
                      if is3d and lg3.shape[0] != nt else lg3)
        fields.append(igrid.get_lafs()[None])
    stacked = np.concatenate(fields, axis=0)
    down = downscaling(igrid, target, stacked, downscaler)

    out = down[:nt]
    c = nt
    elev_corr = 0.0
    if elev_gradient.size:
        n_eg = down[c:c + nt].shape[0] if elev_gradient.ndim == 3 else 1
        n_eg = nt if elev_gradient.ndim == 3 else 1
        deg = down[c:c + n_eg]
        delevs = down[c + n_eg]
        c += n_eg + 1
        oelevs = np.asarray(target.get_elevs(), np.float32)
        both = np.isfinite(oelevs) & np.isfinite(delevs)
        elev_corr = np.where(both, deg * (oelevs - delevs), 0.0)
    laf_corr = 0.0
    if laf_gradient.size:
        n_lg = nt if laf_gradient.ndim == 3 else 1
        dlg = down[c:c + n_lg]
        dlafs = down[c + n_lg]
        olafs = np.asarray(target.get_lafs(), np.float32)
        both = np.isfinite(olafs) & np.isfinite(dlafs)
        laf_corr = np.where(both, dlg * (olafs - dlafs), 0.0)
    out = out + laf_corr + elev_corr
    return out if is3d else out[0]


def full_gradient_debug(igrid, ogrid, ivalues, elev_gradient,
                        laf_gradient=None, downscaler=None):
    """Return stacked intermediate fields (gradient.cpp full_gradient_debug):
    [output, downscaled elev gradient, downscaled source elevs]."""
    from ..constants import Downscaler
    if downscaler is None:
        downscaler = Downscaler.Nearest
    out = full_gradient(igrid, ogrid, ivalues, elev_gradient, laf_gradient,
                        downscaler)
    deg = downscaling(igrid, ogrid, asarray_f32(elev_gradient), downscaler)
    delevs = downscaling(igrid, ogrid, igrid.get_elevs(), downscaler)
    return np.stack([out, deg, delevs], axis=0)


def calc_gradient(base, values, gradient_type, halfwidth, min_num=2,
                  min_range=MV, default_gradient=0):
    """Per-cell gradient of values vs base in a (2h+1)^2 window
    (calc_gradient.cpp:6-126)."""
    if halfwidth <= 0:
        raise ValueError(
            "Halwidth cannot be <= 0; must be positive integer")
    if np.isfinite(min_range) and min_range < 0:
        raise ValueError("min_range must be >= 0")
    if min_num < 0:
        raise ValueError("num_min must be >= 0")
    base = asarray_f32(base, "base")
    values = asarray_f32(values, "values")
    if base.size == 0:
        raise ValueError("base input has no size")
    if base.shape != values.shape:
        raise ValueError("base is not the same size as values")
    gradient_type = int(gradient_type)
    h = int(halfwidth)
    ny, nx = base.shape
    default_gradient = float(default_gradient)

    both = np.isfinite(base) & np.isfinite(values)
    if gradient_type == GradientType.MinMax:
        out = np.full((ny, nx), default_gradient, np.float32)
        bj = jnp.asarray(np.where(both, base, np.nan))
        vj = jnp.asarray(np.where(both, values, np.nan))
        # chunk rows to bound the (rows, nx, W) window-stack memory
        w2 = (2 * h + 1) ** 2
        chunk = max(1, int(2e7 / max(nx * w2, 1)))
        rows = []
        for s in range(0, ny, chunk):
            e = min(s + chunk, ny)
            lo = max(0, s - h)
            hi = min(ny, e + h)
            bstack = nops._window_stack(bj[lo:hi], h)[s - lo:e - lo]
            vstack = nops._window_stack(vj[lo:hi], h)[s - lo:e - lo]
            valid = jnp.isfinite(bstack)
            count = jnp.sum(valid, axis=-1)
            neg = jnp.where(valid, bstack, -jnp.inf)
            pos = jnp.where(valid, bstack, jnp.inf)
            imax = jnp.argmax(neg, axis=-1)
            imin = jnp.argmin(pos, axis=-1)
            bmax = jnp.take_along_axis(bstack, imax[..., None], axis=-1)[..., 0]
            bmin = jnp.take_along_axis(bstack, imin[..., None], axis=-1)[..., 0]
            vmax = jnp.take_along_axis(vstack, imax[..., None], axis=-1)[..., 0]
            vmin = jnp.take_along_axis(vstack, imin[..., None], axis=-1)[..., 0]
            grad = (vmax - vmin) / jnp.where(bmax == bmin, 1, bmax - bmin)
            ok = (count >= min_num) & jnp.isfinite(bmax) & jnp.isfinite(bmin)
            if np.isfinite(min_range):
                ok = ok & (jnp.abs(bmax - bmin) > min_range)
            else:
                ok = ok & (bmax != bmin)
            rows.append(np.asarray(jnp.where(ok, grad, default_gradient)))
        out = np.concatenate(rows, axis=0).astype(np.float32)
        return out

    if gradient_type == GradientType.LinearRegression:
        from .. import native
        host = native.calc_gradient_lr(
            np.where(both, base, np.nan), np.where(both, values, np.nan),
            h, min_num, min_range, bool(np.isfinite(min_range)),
            default_gradient)
        if host is not None:
            return host
        base0 = np.where(both, base, np.nan).astype(np.float32)
        values0 = np.where(both, values, np.nan).astype(np.float32)
        bb = base0 * base0
        bv = base0 * values0
        isv = both.astype(np.float32)
        jb = jnp.asarray(base0)
        mean_x = nops.neighbourhood(jb, h, int(Statistic.Mean))
        mean_y = nops.neighbourhood(jnp.asarray(values0), h,
                                    int(Statistic.Mean))
        mean_xx = nops.neighbourhood(jnp.asarray(bb), h, int(Statistic.Mean))
        mean_xy = nops.neighbourhood(jnp.asarray(bv), h, int(Statistic.Mean))
        count = nops.neighbourhood(jnp.asarray(isv), h, int(Statistic.Sum))
        var = mean_xx - mean_x * mean_x
        grad = (mean_xy - mean_x * mean_y) / jnp.where(var == 0, 1, var)
        ok = ((count >= min_num) & jnp.isfinite(mean_xx)
              & jnp.isfinite(mean_xy) & jnp.isfinite(mean_x) & (var != 0))
        if np.isfinite(min_range):
            rng = jnp.sqrt(var)
            ok = ok & jnp.isfinite(rng) & (rng >= min_range)
        out = jnp.where(ok, grad, default_gradient)
        return np.asarray(out, np.float32)
    raise ValueError("Unknown gradient type")
