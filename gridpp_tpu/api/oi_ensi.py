"""Ensemble OI API (reference src/api/oi_ensi.cpp)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core.points import Points
from ..ops.oi_ensi import (make_ensi_dense_sweep, make_ensi_kernel,
                           make_ensi_shortlist_sweep)
from ._common import asarray_f32, on_host
from .oi import (_BALL_QUERY_MAX, _BLOCK, _candidates, _candidates_block,
                 _device_fields, _origin, _shortlist_dev,
                 _shortlist_starved)


def _warn_condition(count: int):
    """Report ill-conditioned gridpoints (oi_ensi.cpp:557-561)."""
    if count > 0:
        from .. import warning
        warning(f"Condition number error in {count} points. "
                "Using raw values in those points.")

__all__ = ["optimal_interpolation_ensi"]


def optimal_interpolation_ensi(bgrid, background, points, pobs, psigmas,
                               pbackground, structure, max_points,
                               allow_extrapolation=True):
    """Ensemble OI / local ensemble transform (oi_ensi.cpp:33-568).

    Grid form: background (Y, X, E), returns (Y, X, E).
    Points form: background (P, E), returns (P, E).
    """
    if max_points < 0:
        raise ValueError("max_points must be >= 0")
    if bgrid.get_coordinate_type() != points.get_coordinate_type():
        raise ValueError(
            "Both background and observations points must be of same "
            "coorindate type (lat/lon or x/y)")
    background = asarray_f32(background, "background")
    pobs = asarray_f32(pobs, "pobs").ravel()
    psigmas = asarray_f32(psigmas, "psigmas").ravel()
    pbackground = asarray_f32(pbackground, "pbackground")
    is_grid = isinstance(bgrid, Grid)
    if is_grid:
        gy, gx = bgrid.size()
        if background.ndim != 3 or background.shape[:2] != (gy, gx):
            raise ValueError("Input field is not the same size as the grid")
        bpoints = bgrid.to_points()
        flat_bg = background.reshape(gy * gx, -1)
    else:
        bpoints = bgrid
        if background.ndim != 2 or background.shape[0] != bgrid.size():
            raise ValueError("Input field is not the same size as the grid")
        flat_bg = background
    if pobs.shape[0] != points.size():
        raise ValueError("Observations and points exception mismatch")
    if psigmas.shape[0] != points.size():
        raise ValueError("Sigmas and points size mismatch")
    if pbackground.ndim != 2 or pbackground.shape[0] != points.size():
        raise ValueError("Background and points size mismatch")

    n, n_ens = flat_bg.shape
    output = flat_bg.copy()
    ns = points.size()
    if ns == 0 or n_ens == 0:
        return output.reshape(background.shape)

    # Anomaly decomposition at obs points (oi_ensi.cpp:166-178)
    with np.errstate(invalid="ignore"):
        y_hat = np.nanmean(np.where(np.isfinite(pbackground), pbackground,
                                    np.nan), axis=1)
    y_anom = np.where(np.isfinite(pbackground) & np.isfinite(y_hat[:, None]),
                      pbackground - y_hat[:, None], pbackground)

    # Valid-member screening: member valid at every gridpoint
    # (oi_ensi.cpp:188-201)
    valid_ens = np.nonzero(np.isfinite(flat_bg).all(axis=0))[0]
    if valid_ens.size == 0:
        return output.reshape(background.shape)

    # Pre-filter observations with invalid values (oi_ensi.cpp:229-236
    # checks pobs only)
    keep = np.isfinite(pobs)
    if not keep.any():
        return output.reshape(background.shape)
    kidx = np.nonzero(keep)[0]
    opts = points.subset(kidx)

    # Canonical-shortlist device path: selection order/rho shared with
    # the serving pipelines and the native host solver (ops/canonical.py)
    # so the per-call top-k decision is bit-identical across paths.
    # Host fallback when any truncated row is starved this cycle.
    if not on_host() and max_points > 0:
        res_sl = _ensi_shortlist(
            bpoints, flat_bg, valid_ens, points, pobs, psigmas, y_hat,
            y_anom, structure, max_points, allow_extrapolation)
        if res_sl is not None:
            out_valid, n_cond = res_sl
            _warn_condition(n_cond)
            output[:, valid_ens] = out_valid
            return output.reshape(background.shape)

    # Dense device path: selection on device, one dispatch for the grid
    # Dense all-obs sweep is accelerator-only; on the host the cached
    # cKDTree shortlist is far cheaper (see api/oi.py)
    if (not on_host() and 0 < opts.size() <= 32768
            and n * opts.size() > 4_000_000):
        origin = _origin(bpoints)
        p1_all = _device_fields(bpoints, structure, origin)
        o_fields = _device_fields(opts, structure, origin)
        p = opts.size()
        e_val = max(len(valid_ens), 1)
        block = max(8192, min(_BLOCK, (1 << 28) // max(p, 1),
                              (1 << 27) // max(32 * e_val, 1)))
        kernel = make_ensi_dense_sweep(structure, int(max_points),
                                       bool(allow_extrapolation), block)
        out_j, cond_bad = kernel(p1_all, o_fields,
                                 jnp.asarray(flat_bg[:, valid_ens]),
                                 jnp.asarray(pobs[kidx]),
                                 jnp.asarray(psigmas[kidx]),
                                 jnp.asarray(y_anom[kidx][:, valid_ens]),
                                 jnp.asarray(y_hat[kidx].astype(np.float32)))
        output[:, valid_ens] = np.asarray(out_j)
        _warn_condition(int(np.asarray(jnp.sum(cond_bad))))
        return output.reshape(background.shape)

    loc = structure.localization_np(bpoints.lats, bpoints.lons)
    # Large host grids: per-block exact ball queries with bounded memory
    # (see api/oi.py _candidates_block); otherwise one global query.
    chunked = on_host() and n > _BALL_QUERY_MAX
    cand = mask = None
    if not chunked:
        res = _candidates(bpoints, opts, loc, max_points)
        if res is None:
            return output.reshape(background.shape)
        cand, mask = res
    obs_key = (opts.size(), hash(opts.lats.tobytes()),
               hash(opts.lons.tobytes()),
               float(loc.min()) if loc.size else 0.0,
               float(loc.max()) if loc.size else 0.0)

    origin = _origin(bpoints)
    p1_all = _device_fields(bpoints, structure, origin)
    o_fields = _device_fields(opts, structure, origin)

    # Threaded native solver (double-precision local algebra like the
    # reference's Armadillo path) for the product-kernel structures;
    # see api/oi.py. The reference's EnSI is single-threaded by
    # necessity (OMP disabled, oi_ensi.cpp:203-206).
    from .oi import _native_kernel_type
    kt = _native_kernel_type(structure)
    if on_host() and kt is not None:
        res_nat = _ensi_native(
            bpoints, opts, loc, structure, kt,
            {k: np.asarray(v) for k, v in p1_all.items()},
            {k: np.asarray(v) for k, v in o_fields.items()},
            pobs[kidx], psigmas[kidx],
            y_hat[kidx].astype(np.float32),
            np.ascontiguousarray(y_anom[kidx][:, valid_ens], np.float32),
            flat_bg[:, valid_ens], max_points, allow_extrapolation,
            chunked, cand, mask, obs_key)
        if res_nat is not None:
            out_valid, n_cond = res_nat
            _warn_condition(n_cond)
            output[:, valid_ens] = out_valid
            return output.reshape(background.shape)

    j_obs = jnp.asarray(pobs[kidx])
    j_sig = jnp.asarray(psigmas[kidx])
    j_yanom = jnp.asarray(y_anom[kidx][:, valid_ens])
    j_yhat = jnp.asarray(y_hat[kidx].astype(np.float32))

    kernel = make_ensi_kernel(structure, int(max_points),
                              bool(allow_extrapolation))
    bg_valid = flat_bg[:, valid_ens]
    outs = []
    conds = []
    # Adaptive block: the (B, K, E) gathers and batched EXE eigh must fit
    # HBM alongside the field arrays
    k_pad = cand.shape[1] if cand is not None else 128
    e_val = max(len(valid_ens), 1)
    block = max(16384, min(_BLOCK, (1 << 27) // max(k_pad * e_val, 1)))
    for start in range(0, n, block):
        end = min(start + block, n)
        if chunked:
            res_b = _candidates_block(bpoints, opts, loc, start, end,
                                      obs_key)
            if res_b is None:
                outs.append(jnp.asarray(bg_valid[start:end]))
                conds.append(jnp.zeros(end - start, bool))
                continue
            cand_j = jnp.asarray(res_b[0])
            mask_b = jnp.asarray(res_b[1])
        else:
            cand_j = jnp.asarray(cand[start:end])
            mask_b = jnp.asarray(mask[start:end])
        p1 = {k: v[start:end][:, None] for k, v in p1_all.items()}
        cand_fields = {k: jnp.take(v, cand_j, axis=0)
                       for k, v in o_fields.items()}
        out_b, cond_b = kernel(p1, cand_fields, mask_b,
                               jnp.asarray(bg_valid[start:end]),
                               jnp.take(j_obs, cand_j, axis=0),
                               jnp.take(j_sig, cand_j, axis=0),
                               jnp.take(j_yanom, cand_j, axis=0),
                               jnp.take(j_yhat, cand_j, axis=0))
        outs.append(out_b)
        conds.append(cond_b)
    out_valid = np.asarray(jnp.concatenate(outs) if len(outs) > 1
                           else outs[0])
    _warn_condition(int(sum(int(np.asarray(jnp.sum(c))) for c in conds)))
    output[:, valid_ens] = out_valid
    return output.reshape(background.shape)


def _ensi_shortlist(bpoints, flat_bg, valid_ens, points, pobs, psigmas,
                    y_hat, y_anom, structure, max_points,
                    allow_extrapolation):
    """Accelerator EnSI from the canonical shortlist; (analysis_valid,
    n_cond) or None when a starved row demands the full-depth path."""
    n_obs = points.size()
    if n_obs == 0:
        return None
    k_cap = min(n_obs, max(2 * int(max_points), 16))
    s_cap = min(int(max_points), k_cap)
    sel_d, rho_d, val_d, tr_d, sl = _shortlist_dev(bpoints, points,
                                                   structure, k_cap)
    if _shortlist_starved(sl, np.isfinite(pobs), s_cap):
        return None
    e = max(len(valid_ens), 1)
    block = max(8192, min(_BLOCK, (1 << 27) // max(32 * e, 1),
                          (1 << 27) // max(sl.k_cap, 1)))
    kernel = make_ensi_shortlist_sweep(structure, int(max_points),
                                       bool(allow_extrapolation), block)
    out_j, cond_bad = kernel(
        sel_d, rho_d, val_d, jnp.asarray(flat_bg[:, valid_ens]),
        jnp.asarray(pobs), jnp.asarray(psigmas),
        jnp.asarray(np.ascontiguousarray(y_anom[:, valid_ens],
                                         np.float32)),
        jnp.asarray(y_hat.astype(np.float32)))
    return np.asarray(out_j), int(np.asarray(jnp.sum(cond_bad)))


def _ensi_native(bpoints, opts, loc, structure, kt, p1_np, o_np, obs_k,
                 sig_k, yhat_k, yanom_k, bg_valid, max_points,
                 allow_extrapolation, chunked, cand, mask, obs_key):
    """Run the threaded native EnSI solve; (analysis, n_cond) or None."""
    from .. import native
    if native.get_lib() is None:
        return None
    n = bpoints.size()

    from .oi import _with_scales
    gfx = _with_scales(p1_np, structure, n)
    gfx["loc"] = np.asarray(loc, np.float32)
    ofx = _with_scales(o_np, structure, opts.size())
    ofx["loc"] = np.asarray(
        structure.localization_np(opts.lats, opts.lons), np.float32)
    bg_valid = np.ascontiguousarray(bg_valid, np.float32)

    if not chunked:
        res = native.oi_ensi_host_solve(
            gfx, ofx, obs_k, sig_k, yhat_k, yanom_k, cand, mask, kt,
            int(max_points), bool(allow_extrapolation), bg_valid)
        if res is None:
            return None
        return res[0], int(res[1].sum())

    # canonical-shortlist feed when cheaper than per-block ball queries
    # (same exactness argument and gate as the deterministic path:
    # api/oi.py _chunked_shortlist)
    from .oi import _chunked_shortlist
    sl = _chunked_shortlist(bpoints, opts, structure, loc, max_points, n)

    out = bg_valid.copy()
    n_cond = 0
    for start in range(0, n, _BLOCK):
        end = min(start + _BLOCK, n)
        if sl is not None:
            res_b = (sl.sel[start:end], sl.valid[start:end])
        else:
            res_b = _candidates_block(bpoints, opts, loc, start, end,
                                      obs_key)
            if res_b is None:
                continue
        gfb = {k: v[start:end] for k, v in gfx.items()}
        res = native.oi_ensi_host_solve(
            gfb, ofx, obs_k, sig_k, yhat_k, yanom_k, res_b[0], res_b[1],
            kt, int(max_points), bool(allow_extrapolation),
            bg_valid[start:end])
        if res is None:
            return None
        out[start:end] = res[0]
        n_cond += int(res[1].sum())
    return out, n_cond
