"""Multi-variant ensemble OI API (reference src/api/oi_ensi_multi.cpp).

Grid and points forms for the ebe / ebesc / utem schemes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..ops.oi_ensi_multi import (DEFAULT_MIN_STD, make_ebe_kernel,
                                 make_ebesc_kernel, make_member_serve_sweep,
                                 make_utem_kernel, make_utem_serve_sweep)
from ._common import asarray_f32, on_host
from .oi import (_BLOCK, _candidates, _device_fields, _origin,
                 _shortlist_dev_padded, _shortlist_starved)

__all__ = [
    "optimal_interpolation_ensi_multi_ebe",
    "optimal_interpolation_ensi_multi_ebesc",
    "optimal_interpolation_ensi_multi_utem",
]


def _flatten_grid(bgrid, background, name):
    if isinstance(bgrid, Grid):
        gy, gx = bgrid.size()
        if background.ndim != 3 or background.shape[:2] != (gy, gx):
            raise ValueError(f"Input {name} field is not the same size as "
                             "the grid")
        return bgrid.to_points(), background.reshape(gy * gx, -1), True
    if background.ndim != 2 or background.shape[0] != bgrid.size():
        raise ValueError(f"Input {name} field is not the same size as the "
                         "grid")
    return bgrid, background, False


def _norm_anom(arr, valid_ens):
    """Normalized anomalies 1/sqrt(E-1)*(v-mean)/std, zeroed for tiny or
    invalid std (oi_ensi_multi.cpp:421-445)."""
    v = arr[:, valid_ens].astype(np.float64)
    e = v.shape[1]
    mean = v.mean(axis=1)
    std = v.std(axis=1)
    bad = ~np.isfinite(mean) | ~np.isfinite(std) | (std <= DEFAULT_MIN_STD)
    denom = np.where(std == 0, 1, std)
    out = (v - mean[:, None]) / denom[:, None] / np.sqrt(max(e - 1, 1))
    out[bad] = 0.0
    return out.astype(np.float32)


def _common_prep(bpoints, points, structure, max_points, obs_select_valid):
    keep = np.nonzero(obs_select_valid)[0]
    if keep.size == 0:
        return None
    opts = points.subset(keep)
    loc = structure.localization_np(bpoints.lats, bpoints.lons)
    res = _candidates(bpoints, opts, loc, max_points)
    if res is None:
        return None
    cand, mask = res
    origin = _origin(bpoints)
    p1_all = _device_fields(bpoints, structure, origin)
    o_fields = _device_fields(opts, structure, origin)
    return keep, cand, mask, p1_all, o_fields, loc


def _run_blocks(kernel, n, cand, mask, p1_all, o_fields, per_block_args,
                n_ens=8):
    outs = []
    cond_count = 0
    k_pad = cand.shape[1]
    block = max(16384, min(_BLOCK, (1 << 27) // max(k_pad * n_ens, 1)))
    for start in range(0, n, block):
        end = min(start + block, n)
        cand_j = jnp.asarray(cand[start:end])
        p1 = {k: v[start:end][:, None] for k, v in p1_all.items()}
        cand_fields = {k: jnp.take(v, cand_j, axis=0)
                       for k, v in o_fields.items()}
        args = per_block_args(start, end, cand_j)
        out = kernel(p1, cand_fields, jnp.asarray(mask[start:end]), *args)
        if isinstance(out, tuple):  # (analysis, cond_bad) kernels
            out, cond_bad = out
            cond_count += int(np.asarray(jnp.sum(cond_bad)))
        outs.append(out)
    if cond_count:
        from .oi_ensi import _warn_condition
        _warn_condition(cond_count)
    return np.asarray(jnp.concatenate(outs) if len(outs) > 1 else outs[0])


def _validate_multi(bpoints_obj, points, n_ens, pobs, pratios,
                    pbackground, extra=(), pobs_1d=False):
    """Up-front shape validation (oi_ensi_multi.cpp:34-133, 329-420).

    All malformed inputs raise ValueError (the reference throws
    std::invalid_argument before touching any data), including wrong
    ndim: ebe/ebesc take perturbed obs as (S, E), utem as (S,).
    """
    if bpoints_obj.get_coordinate_type() != points.get_coordinate_type():
        raise ValueError(
            "Both background and observations points must be of same "
            "coorindate type (lat/lon or x/y)")
    ns = points.size()
    if pobs_1d:
        if pobs.ndim != 1 or pobs.shape[0] != ns:
            raise ValueError(
                f"Observations {pobs.shape} and points ({ns},) size "
                "mismatch")
    else:
        if pobs.ndim != 2 or pobs.shape != (ns, n_ens):
            raise ValueError(
                f"Observations {pobs.shape} and points ({ns},{n_ens}) "
                "size mismatch")
    if pratios.ndim != 1 or pratios.shape[0] != ns:
        raise ValueError(f"Ratios ({pratios.shape}) and points ({ns}) "
                         "size mismatch")
    if pbackground.ndim != 2 or pbackground.shape != (ns, n_ens):
        raise ValueError(
            f"Input pbackground field at observation location "
            f"{pbackground.shape} and points ({ns},{n_ens}) size mismatch")
    for arr, name in extra:
        if arr.ndim != 2 or arr.shape != (ns, n_ens):
            raise ValueError(f"Input {name} field at observation location "
                             f"{arr.shape} and points ({ns},{n_ens}) size "
                             "mismatch")


def _native_member_geom(bpoints, points, keep, structure, p1_all,
                        o_fields, loc):
    """gfx/ofx field dicts (+ per-point scales and localization) for the
    native ensi_multi solvers. `loc` is the grid localization already
    computed by _common_prep (recomputing it costs an uncached
    full-grid nearest query for spatial structures)."""
    from .oi import _with_scales
    n = bpoints.size()
    gfx = _with_scales({k: np.asarray(v) for k, v in p1_all.items()},
                       structure, n)
    gfx["loc"] = np.asarray(loc, np.float32)
    opts = points.subset(keep)
    ofx = _with_scales({k: np.asarray(v) for k, v in o_fields.items()},
                       structure, opts.size())
    ofx["loc"] = np.asarray(
        structure.localization_np(opts.lats, opts.lons), np.float32)
    return gfx, ofx


def _native_ready(structure):
    """Native kernel id when the threaded host solver applies, else
    None (see api/oi.py _native_kernel_type)."""
    from ._common import on_host
    from .oi import _native_kernel_type
    if not on_host():
        return None
    kt = _native_kernel_type(structure)
    if kt is None:
        return None
    from .. import native
    if native.get_lib() is None:
        return None
    return kt


_SERVE_BLOCK = 16384


def _multi_shortlist_prep(bpoints, points, structure, max_points, obs_ok):
    """Padded canonical-shortlist device tables + starved precheck.

    Returns (cand_padded, s_cap) or None when the shortlist path does
    not apply this cycle (host backend, no obs, or a starved row)."""
    n_obs = points.size()
    if n_obs == 0 or max_points <= 0:
        return None
    k_cap = min(n_obs, max(2 * int(max_points), 16))
    s_cap = min(int(max_points), k_cap)
    cand, sl = _shortlist_dev_padded(bpoints, points, structure, k_cap,
                                     _SERVE_BLOCK)
    if _shortlist_starved(sl, obs_ok, s_cap):
        return None
    return cand, s_cap


def _member_shortlist(bpoints, points, structure, max_points, allow,
                      bg_v, flat_ratios, pobs, pratios, pbackground,
                      valid_ens, flat_bgc=None, pbackground_corr=None):
    """Canonical-shortlist device path for ebe/ebesc (the
    make_member_serve_sweep cycle the MultiEnsiPipeline runs, fed with
    the API's own per-obs vectors). Returns analysis columns or None."""
    use_z = flat_bgc is not None
    obs_ok = np.isfinite(pobs[:, 0])
    prep = _multi_shortlist_prep(bpoints, points, structure, max_points,
                                 obs_ok)
    if prep is None:
        return None
    cand, s_cap = prep
    origin = _origin(bpoints)
    o_fields = _device_fields(points, structure, origin)
    field_keys = tuple(o_fields)
    f = len(field_keys)
    e = len(valid_ens)
    n_obs = points.size()
    tabf = jnp.stack([o_fields[k] for k in field_keys], axis=1)
    innov = (pobs[:, valid_ens] - pbackground[:, valid_ens]).astype(
        np.float32)
    cols = [tabf, jnp.asarray(pratios)[:, None], jnp.asarray(innov)]
    if use_z:
        cols.append(jnp.asarray(_norm_anom(pbackground_corr, valid_ens)))
        x_l = jnp.asarray(_norm_anom(flat_bgc, valid_ens))
    else:
        x_l = jnp.zeros((1, 1), jnp.float32)
    w = f + 1 + (2 if use_z else 1) * e
    padw = -(-w // 8) * 8
    cols.append(jnp.zeros((n_obs, padw - w), jnp.float32))
    tab = jnp.concatenate(cols, axis=1)
    sweep = make_member_serve_sweep(structure, field_keys, s_cap,
                                    _SERVE_BLOCK, bool(allow), use_z)
    out = sweep(jnp.asarray(np.ascontiguousarray(bg_v, np.float32)),
                jnp.asarray(flat_ratios), x_l, tab, jnp.asarray(obs_ok),
                *cand)
    return np.asarray(out)


def _utem_shortlist(bpoints, points, structure, max_points, allow, bg_v,
                    bgc_v, flat_ratios, pobs, pratios, y_hat, y_anom,
                    y_corr, valid_ens):
    """Canonical-shortlist device path for utem. Returns (analysis
    columns, n_cond) or None."""
    obs_ok = np.isfinite(pobs)
    prep = _multi_shortlist_prep(bpoints, points, structure, max_points,
                                 obs_ok)
    if prep is None:
        return None
    cand, s_cap = prep
    e = len(valid_ens)
    n_obs = points.size()
    w = 3 + 2 * e
    padw = -(-w // 8) * 8
    tab = jnp.concatenate(
        [jnp.asarray(pobs)[:, None], jnp.asarray(pratios)[:, None],
         jnp.asarray(y_hat.astype(np.float32))[:, None],
         jnp.asarray(y_anom.astype(np.float32)),
         jnp.asarray(y_corr),
         jnp.zeros((n_obs, padw - w), jnp.float32)], axis=1)
    sweep = make_utem_serve_sweep(structure, s_cap, _SERVE_BLOCK,
                                  bool(allow))
    out, cond_bad = sweep(
        jnp.asarray(np.ascontiguousarray(bg_v, np.float32)),
        jnp.asarray(np.ascontiguousarray(bgc_v, np.float32)),
        jnp.asarray(flat_ratios), tab, jnp.asarray(obs_ok), *cand)
    return np.asarray(out), int(np.asarray(cond_bad))


def optimal_interpolation_ensi_multi_ebe(bgrid, bratios, background,
                                         background_corr, points, pobs,
                                         pratios, pbackground,
                                         pbackground_corr, structure,
                                         max_points,
                                         allow_extrapolation=True):
    """Member-by-member update with ensemble-derived correlations
    (oi_ensi_multi.cpp:329-627)."""
    if max_points < 0:
        raise ValueError("max_points must be >= 0")
    background = asarray_f32(background)
    background_corr = asarray_f32(background_corr, "background_corr")
    bratios = asarray_f32(bratios, "bratios")
    pobs = asarray_f32(pobs, "pobs")
    pratios = asarray_f32(pratios, "pratios")
    pbackground = asarray_f32(pbackground, "pbackground")
    pbackground_corr = asarray_f32(pbackground_corr, "pbackground_corr")
    bpoints, flat_bg, is_grid = _flatten_grid(bgrid, background,
                                              "background")
    _, flat_bgc, _ = _flatten_grid(bgrid, background_corr,
                                   "background_corr")
    n, n_ens = flat_bg.shape
    if flat_bgc.shape != flat_bg.shape:
        raise ValueError("Input background_corr field is not the same "
                         "size as the grid")
    flat_ratios = bratios.ravel()
    if flat_ratios.shape[0] != bpoints.size():
        raise ValueError("Bratios and grid size mismatch")
    _validate_multi(bpoints, points, n_ens, pobs, pratios, pbackground,
                    [(pbackground_corr, "pbackground_corr")])
    output = flat_bg.copy()
    if points.size() == 0 or n_ens == 0:
        return output.reshape(background.shape)

    valid_ens = np.nonzero(
        np.isfinite(flat_bg).all(axis=0) & np.isfinite(flat_bgc).all(axis=0)
        & np.isfinite(pbackground).all(axis=0)
        & np.isfinite(pbackground_corr).all(axis=0))[0]
    if valid_ens.size == 0:
        return output.reshape(background.shape)

    # Canonical-shortlist device path (selection bits shared with the
    # pipelines and native solvers, ops/canonical.py); falls through to
    # the full-depth paths on the host backend or starved rows.
    if not on_host():
        out_sl = _member_shortlist(
            bpoints, points, structure, max_points, allow_extrapolation,
            flat_bg[:, valid_ens], flat_ratios, pobs, pratios,
            pbackground, valid_ens, flat_bgc, pbackground_corr)
        if out_sl is not None:
            output[:, valid_ens] = out_sl
            return output.reshape(background.shape)

    prep = _common_prep(bpoints, points, structure, max_points,
                        np.isfinite(pobs[:, 0]))
    if prep is None:
        return output.reshape(background.shape)
    keep, cand, mask, p1_all, o_fields, loc = prep

    z_r = _norm_anom(pbackground_corr, valid_ens)[keep]
    x_l = _norm_anom(flat_bgc, valid_ens)
    innov = (pobs[:, valid_ens] - pbackground[:, valid_ens])[keep]

    kt = _native_ready(structure)
    if kt is not None:
        from .. import native
        gfx, ofx = _native_member_geom(bpoints, points, keep, structure,
                                       p1_all, o_fields, loc)
        out_nat = native.oi_member_host_solve(
            gfx, ofx, pratios[keep], innov.astype(np.float32), z_r, x_l,
            flat_ratios, cand, mask, kt, int(max_points),
            bool(allow_extrapolation), True, flat_bg[:, valid_ens])
        if out_nat is not None:
            output[:, valid_ens] = out_nat
            return output.reshape(background.shape)

    j_obs = jnp.asarray(pobs[keep][:, valid_ens])
    j_ratios = jnp.asarray(pratios[keep])
    j_innov = jnp.asarray(innov.astype(np.float32))
    j_zr = jnp.asarray(z_r)

    kernel = make_ebe_kernel(structure, int(max_points),
                             bool(allow_extrapolation))
    bg_valid = flat_bg[:, valid_ens]

    def per_block(start, end, cand_j):
        return (jnp.asarray(bg_valid[start:end]),
                jnp.asarray(flat_ratios[start:end]),
                jnp.asarray(x_l[start:end]),
                jnp.take(j_obs, cand_j, axis=0)[..., 0],
                jnp.take(j_ratios, cand_j, axis=0),
                jnp.take(j_innov, cand_j, axis=0),
                jnp.take(j_zr, cand_j, axis=0))

    out_valid = _run_blocks(kernel, n, cand, mask, p1_all, o_fields,
                            per_block, n_ens=len(valid_ens))
    output[:, valid_ens] = out_valid
    return output.reshape(background.shape)


def optimal_interpolation_ensi_multi_ebesc(bgrid, bratios, background,
                                           points, pobs, pratios,
                                           pbackground, structure,
                                           max_points,
                                           allow_extrapolation=True):
    """Member-by-member update with static correlations
    (oi_ensi_multi.cpp:629-860)."""
    if max_points < 0:
        raise ValueError("max_points must be >= 0")
    background = asarray_f32(background)
    bratios = asarray_f32(bratios, "bratios")
    pobs = asarray_f32(pobs, "pobs")
    pratios = asarray_f32(pratios, "pratios")
    pbackground = asarray_f32(pbackground, "pbackground")
    bpoints, flat_bg, is_grid = _flatten_grid(bgrid, background,
                                              "background")
    n, n_ens = flat_bg.shape
    flat_ratios = bratios.ravel()
    if flat_ratios.shape[0] != bpoints.size():
        raise ValueError("Bratios and grid size mismatch")
    _validate_multi(bpoints, points, n_ens, pobs, pratios, pbackground)
    output = flat_bg.copy()
    if points.size() == 0 or n_ens == 0:
        return output.reshape(background.shape)
    valid_ens = np.nonzero(np.isfinite(flat_bg).all(axis=0)
                           & np.isfinite(pbackground).all(axis=0))[0]
    if valid_ens.size == 0:
        return output.reshape(background.shape)
    # Canonical-shortlist device path (see ebe above).
    if not on_host():
        out_sl = _member_shortlist(
            bpoints, points, structure, max_points, allow_extrapolation,
            flat_bg[:, valid_ens], flat_ratios, pobs, pratios,
            pbackground, valid_ens)
        if out_sl is not None:
            output[:, valid_ens] = out_sl
            return output.reshape(background.shape)

    prep = _common_prep(bpoints, points, structure, max_points,
                        np.isfinite(pobs[:, 0]))
    if prep is None:
        return output.reshape(background.shape)
    keep, cand, mask, p1_all, o_fields, loc = prep
    innov = (pobs[:, valid_ens] - pbackground[:, valid_ens])[keep]

    kt = _native_ready(structure)
    if kt is not None:
        from .. import native
        gfx, ofx = _native_member_geom(bpoints, points, keep, structure,
                                       p1_all, o_fields, loc)
        out_nat = native.oi_member_host_solve(
            gfx, ofx, pratios[keep], innov.astype(np.float32), None, None,
            flat_ratios, cand, mask, kt, int(max_points),
            bool(allow_extrapolation), False, flat_bg[:, valid_ens])
        if out_nat is not None:
            output[:, valid_ens] = out_nat
            return output.reshape(background.shape)

    j_obs = jnp.asarray(pobs[keep][:, valid_ens])
    j_ratios = jnp.asarray(pratios[keep])
    j_innov = jnp.asarray(innov.astype(np.float32))
    kernel = make_ebesc_kernel(structure, int(max_points),
                               bool(allow_extrapolation))
    bg_valid = flat_bg[:, valid_ens]

    def per_block(start, end, cand_j):
        return (jnp.asarray(bg_valid[start:end]),
                jnp.asarray(flat_ratios[start:end]),
                jnp.take(j_obs, cand_j, axis=0)[..., 0],
                jnp.take(j_ratios, cand_j, axis=0),
                jnp.take(j_innov, cand_j, axis=0))

    out_valid = _run_blocks(kernel, n, cand, mask, p1_all, o_fields,
                            per_block, n_ens=len(valid_ens))
    output[:, valid_ens] = out_valid
    return output.reshape(background.shape)


def optimal_interpolation_ensi_multi_utem(bgrid, bratios, background,
                                          background_corr, points, pobs,
                                          pratios, pbackground,
                                          pbackground_corr, structure,
                                          max_points,
                                          allow_extrapolation=True):
    """ETKF update with correlations from a second ensemble
    (oi_ensi_multi.cpp:862-1311)."""
    if max_points < 0:
        raise ValueError("max_points must be >= 0")
    background = asarray_f32(background)
    background_corr = asarray_f32(background_corr, "background_corr")
    bratios = asarray_f32(bratios, "bratios")
    pobs = asarray_f32(pobs, "pobs")
    pratios = asarray_f32(pratios, "pratios")
    pbackground = asarray_f32(pbackground, "pbackground")
    pbackground_corr = asarray_f32(pbackground_corr, "pbackground_corr")
    bpoints, flat_bg, is_grid = _flatten_grid(bgrid, background,
                                              "background")
    _, flat_bgc, _ = _flatten_grid(bgrid, background_corr,
                                   "background_corr")
    n, n_ens = flat_bg.shape
    if flat_bgc.shape != flat_bg.shape:
        raise ValueError("Input background_corr field is not the same "
                         "size as the grid")
    flat_ratios = bratios.ravel()
    if flat_ratios.shape[0] != bpoints.size():
        raise ValueError("Bratios and grid size mismatch")
    _validate_multi(bpoints, points, n_ens, pobs, pratios, pbackground,
                    [(pbackground_corr, "pbackground_corr")],
                    pobs_1d=True)
    output = flat_bg.copy()
    if points.size() == 0 or n_ens == 0:
        return output.reshape(background.shape)
    valid_ens = np.nonzero(
        np.isfinite(flat_bg).all(axis=0) & np.isfinite(flat_bgc).all(axis=0)
        & np.isfinite(pbackground).all(axis=0)
        & np.isfinite(pbackground_corr).all(axis=0))[0]
    if valid_ens.size == 0:
        return output.reshape(background.shape)
    pv = pbackground[:, valid_ens].astype(np.float64)
    y_hat = pv.mean(axis=1)
    y_anom = np.where(np.isfinite(y_hat)[:, None], pv - y_hat[:, None], 0)
    y_corr = _norm_anom(pbackground_corr, valid_ens)

    # Canonical-shortlist device path (see ebe above).
    if not on_host():
        res_sl = _utem_shortlist(
            bpoints, points, structure, max_points, allow_extrapolation,
            flat_bg[:, valid_ens], flat_bgc[:, valid_ens], flat_ratios,
            pobs, pratios, y_hat, y_anom, y_corr, valid_ens)
        if res_sl is not None:
            out_v, n_cond = res_sl
            if n_cond:
                from .oi_ensi import _warn_condition
                _warn_condition(n_cond)
            output[:, valid_ens] = out_v
            return output.reshape(background.shape)

    prep = _common_prep(bpoints, points, structure, max_points,
                        np.isfinite(pobs))
    if prep is None:
        return output.reshape(background.shape)
    keep, cand, mask, p1_all, o_fields, loc = prep

    kt = _native_ready(structure)
    if kt is not None:
        from .. import native
        gfx, ofx = _native_member_geom(bpoints, points, keep, structure,
                                       p1_all, o_fields, loc)
        res_nat = native.oi_utem_host_solve(
            gfx, ofx, pobs[keep], pratios[keep],
            y_hat[keep].astype(np.float32),
            y_anom[keep].astype(np.float32), y_corr[keep], flat_ratios,
            cand, mask, kt, int(max_points), bool(allow_extrapolation),
            DEFAULT_MIN_STD, flat_bg[:, valid_ens],
            flat_bgc[:, valid_ens])
        if res_nat is not None:
            out_v, cond_bad = res_nat
            if int(cond_bad.sum()):
                from .oi_ensi import _warn_condition
                _warn_condition(int(cond_bad.sum()))
            output[:, valid_ens] = out_v
            return output.reshape(background.shape)

    j_obs = jnp.asarray(pobs[keep])
    j_ratios = jnp.asarray(pratios[keep])
    j_yanom = jnp.asarray(y_anom[keep].astype(np.float32))
    j_ycorr = jnp.asarray(y_corr[keep])
    j_yhat = jnp.asarray(y_hat[keep].astype(np.float32))
    kernel = make_utem_kernel(structure, int(max_points),
                              bool(allow_extrapolation))
    bg_valid = flat_bg[:, valid_ens]
    bgc_valid = flat_bgc[:, valid_ens]

    def per_block(start, end, cand_j):
        return (jnp.asarray(bg_valid[start:end]),
                jnp.asarray(bgc_valid[start:end]),
                jnp.asarray(flat_ratios[start:end]),
                jnp.take(j_obs, cand_j, axis=0),
                jnp.take(j_ratios, cand_j, axis=0),
                jnp.take(j_yanom, cand_j, axis=0),
                jnp.take(j_ycorr, cand_j, axis=0),
                jnp.take(j_yhat, cand_j, axis=0))

    out_valid = _run_blocks(kernel, n, cand, mask, p1_all, o_fields,
                            per_block, n_ens=len(valid_ens))
    output[:, valid_ens] = out_valid
    return output.reshape(background.shape)
