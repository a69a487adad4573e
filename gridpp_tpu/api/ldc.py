"""local_distribution_correction API."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..ops.ldc import ldc_block
from ._common import asarray_f32
from .oi import _BLOCK, _candidates, _device_fields, _origin

__all__ = ["local_distribution_correction"]


def _ldc_native(bpoints, points, structure, flat_bg, cand, mask, pobs,
                pbackground, min_quantile, max_quantile, min_points):
    """Threaded C++ curve-build path (csrc ldc_host), or None.

    rho comes from the same host evaluators the canonical shortlist uses
    (native pair kernel for product-kernel structures, numpy otherwise),
    so the native and jitted paths see identical correlations.
    """
    from .. import native
    if native.get_lib() is None:
        return None
    from ..ops.canonical import _host_fields, _native_eval, _np_rho
    n = bpoints.size()
    origin = _origin(bpoints)
    gfx = _host_fields(bpoints, structure, origin, n)
    ofx = _host_fields(points, structure, origin, points.size())
    rho = None
    kt = _native_eval(structure)
    if kt is not None:
        rho = native.pair_rho_host(gfx, ofx, cand, mask, kt)
    if rho is None:
        rho = _np_rho(structure, gfx, ofx, np.arange(n), cand, mask)
    return native.ldc_host(flat_bg, cand, mask, rho, pobs, pbackground,
                           min_quantile, max_quantile, min_points)


def local_distribution_correction(bgrid: Grid, background, points, pobs,
                                  pbackground, structure, min_quantile,
                                  max_quantile, min_points=0):
    """Radar/crowd-sourced local quantile mapping
    (local_distribution_correction.cpp:18-203)."""
    background = asarray_f32(background)
    gy, gx = bgrid.size()
    if background.shape != (gy, gx):
        raise ValueError("Grid size is not the same as values")
    pobs = asarray_f32(pobs, "pobs")
    pbackground = asarray_f32(pbackground, "pbackground")
    if pobs.ndim == 1:
        pobs = pobs[None]
    if pbackground.ndim == 1:
        pbackground = pbackground[None]
    if pobs.shape != pbackground.shape:
        raise ValueError(
            f"pobs ({pobs.shape}) is not the same size as pbackground "
            f"({pbackground.shape})")
    if pobs.shape[1] != points.size():
        raise ValueError("Observations and points size mismatch")

    bpoints = bgrid.to_points()
    loc = structure.localization_np(bpoints.lats, bpoints.lons)
    res = _candidates(bpoints, points, loc, 0)
    flat_bg = background.reshape(-1)
    if res is None:
        return background.copy()
    cand, mask = res
    out = _ldc_native(bpoints, points, structure, flat_bg, cand, mask,
                      pobs, pbackground, min_quantile, max_quantile,
                      min_points)
    if out is not None:
        return out.reshape(gy, gx)
    origin = _origin(bpoints)
    p1_all = _device_fields(bpoints, structure, origin)
    o_fields = _device_fields(points, structure, origin)
    nt = pobs.shape[0]
    j_obs = jnp.asarray(pobs.T)          # (S, T)
    j_fcst = jnp.asarray(pbackground.T)  # (S, T)

    n = flat_bg.shape[0]
    outs = []
    for start in range(0, n, _BLOCK):
        end = min(start + _BLOCK, n)
        cand_j = jnp.asarray(cand[start:end])
        b = end - start
        k = cand_j.shape[1]
        p1 = {key: v[start:end][:, None] for key, v in p1_all.items()}
        cand_fields = {key: jnp.take(v, cand_j, axis=0)
                       for key, v in o_fields.items()}
        rho = structure.corr_background_jnp(p1, cand_fields)  # (B, K)
        mk = jnp.asarray(mask[start:end])
        obs_b = jnp.take(j_obs, cand_j, axis=0).reshape(b, k * nt)
        fcst_b = jnp.take(j_fcst, cand_j, axis=0).reshape(b, k * nt)
        rho_b = jnp.repeat(rho, nt, axis=-1)
        valid_b = jnp.repeat(mk, nt, axis=-1)
        out_b = ldc_block(jnp.asarray(flat_bg[start:end]), rho_b, valid_b,
                          obs_b, fcst_b, float(min_quantile),
                          float(max_quantile), int(min_points))
        outs.append(out_b)
    out = np.asarray(jnp.concatenate(outs) if len(outs) > 1 else outs[0])
    return out.reshape(gy, gx)
