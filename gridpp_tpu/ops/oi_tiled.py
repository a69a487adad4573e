"""Tile-union OI: MXU one-hot candidate paging for the serving path.

The cached-shortlist OI (ops/oi.py `oi_block_from_candidates`) still pays
one random HBM gather per gridpoint-candidate to fetch obs values — the
dominant cost once the solve is fast (random gather sustains ~50 GB/s on
v5e vs ~800 GB/s streaming).

This module exploits spatial coherence: neighbouring gridpoints select
nearly the same observations, so the UNION of all shortlisted obs across
a (th x tw) tile of gridpoints is small (C ~ 64-256). At init we build,
per tile, a table of those union indices; per call we gather obs values
once per TABLE ENTRY (T*C rows, ~300x fewer than per-candidate) and then
route values to each gridpoint's candidates with one-hot matmuls on the
MXU — a gather expressed as dense compute, which is exactly what the
systolic array is for.

Geometry/tables are computed once per (grid, obs network, structure) and
reused every forecast cycle. Reference semantics: identical to
oi.cpp:221-341 through the same `_solve_selected` tail.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .oi import _gj_solve_batch_last, _select_top, _solve_selected

__all__ = ["build_tile_tables", "oi_tiled_sweep", "TileGeometry",
           "build_static_weights", "oi_tiled_apply_weights"]


class TileGeometry:
    """Static per-(grid, points, structure) tiling state (host-built)."""

    def __init__(self, yx, th, tw, k_cap, c_cap, tile_table, table_mask,
                 local_idx, rho, valid, tile_static):
        self.yx = yx                  # (Y, X) original grid shape
        self.th, self.tw = th, tw     # tile shape in gridpoints
        self.k_cap = k_cap
        self.c_cap = c_cap            # union-table width C
        self.tile_table = tile_table  # (T, C) int32 obs indices
        self.table_mask = table_mask  # (T, C) bool
        self.local_idx = local_idx    # (T, TB, K) int32 in [0, C)
        self.rho = rho                # (T, TB, K) f32
        self.valid = valid            # (T, TB, K) bool
        self.tile_static = tile_static  # (T, C, Fs) f32 static obs fields
        self.static_keys = None       # list of field names for Fs axis


def _tile_order(y, x, th, tw):
    """Row-major flat index -> (tile, within-tile) permutation arrays."""
    yp = -(-y // th) * th
    xp = -(-x // tw) * tw
    ty, tx = yp // th, xp // tw
    # flat padded index in tile-major order
    ii, jj = np.meshgrid(np.arange(yp), np.arange(xp), indexing="ij")
    tile = (ii // th) * tx + (jj // tw)
    within = (ii % th) * tw + (jj % tw)
    return yp, xp, ty, tx, tile, within


def build_tile_tables(sel, rho, valid, obs_fields_np, yx, th=32, tw=64,
                      c_round=128):
    """Build per-tile union tables from the global shortlist (host).

    sel/rho/valid: (N, K) from the geometric selection sweep, N = Y*X in
    row-major order. obs_fields_np: dict of (P,) numpy static obs fields.
    Returns a TileGeometry with everything device-ready (numpy).
    """
    y, x = yx
    n, k_cap = sel.shape
    sel = np.asarray(sel)
    rho = np.asarray(rho)
    valid = np.asarray(valid)
    yp, xp, ty, tx, tile, within = _tile_order(y, x, th, tw)
    t_count, tb = ty * tx, th * tw

    # scatter row-major (N, K) into (T, TB, K), padding with invalid
    sel_t = np.zeros((t_count, tb, k_cap), np.int64)
    rho_t = np.zeros((t_count, tb, k_cap), np.float32)
    val_t = np.zeros((t_count, tb, k_cap), bool)
    core = (slice(None, y), slice(None, x))
    tile_c, within_c = tile[core].ravel(), within[core].ravel()
    sel_t[tile_c, within_c] = sel.reshape(n, k_cap)
    rho_t[tile_c, within_c] = rho.reshape(n, k_cap)
    val_t[tile_c, within_c] = valid.reshape(n, k_cap)

    # per-tile unions
    uniques = []
    c_max = 1
    for t in range(t_count):
        u = np.unique(sel_t[t][val_t[t]])
        uniques.append(u)
        c_max = max(c_max, len(u))
    c_cap = -(-c_max // c_round) * c_round

    tile_table = np.zeros((t_count, c_cap), np.int32)
    table_mask = np.zeros((t_count, c_cap), bool)
    local_idx = np.zeros((t_count, tb, k_cap), np.int32)
    for t, u in enumerate(uniques):
        c = len(u)
        tile_table[t, :c] = u
        table_mask[t, :c] = True
        if c:
            li = np.searchsorted(u, sel_t[t].ravel())
            li = np.clip(li, 0, c - 1)
            ok = val_t[t].ravel() & (u[li] == sel_t[t].ravel())
            local_idx[t] = np.where(ok, li, 0).reshape(tb, k_cap)
            val_t[t] &= ok.reshape(tb, k_cap)
        else:
            val_t[t] = False

    keys = sorted(obs_fields_np)
    tile_static = np.stack(
        [np.asarray(obs_fields_np[key], np.float32)[tile_table]
         for key in keys], axis=-1)  # (T, C, Fs)
    tile_static[~table_mask] = 0.0

    geom = TileGeometry(yx, th, tw, k_cap, c_cap, tile_table, table_mask,
                        local_idx, rho_t, val_t, tile_static)
    geom.static_keys = keys
    geom.grid_pad = (yp, xp, ty, tx)
    return geom


def tile_fields(field, geom):
    """(Y, X) -> (T, TB) in tile-major order (device, pure reshape)."""
    y, x = geom.yx
    yp, xp, ty, tx = geom.grid_pad
    f = jnp.pad(field, ((0, yp - y), (0, xp - x)),
                constant_values=jnp.nan)
    f = f.reshape(ty, geom.th, tx, geom.tw).transpose(0, 2, 1, 3)
    return f.reshape(ty * tx, geom.th * geom.tw)


def untile_fields(tiled, geom):
    """(T, TB) -> (Y, X) inverse of tile_fields."""
    y, x = geom.yx
    yp, xp, ty, tx = geom.grid_pad
    f = tiled.reshape(ty, tx, geom.th, geom.tw).transpose(0, 2, 1, 3)
    return f.reshape(yp, xp)[:y, :x]


def build_static_weights(structure, geom_dev, static_keys, ratios,
                         max_points: int, tiles_per_step: int = 8):
    """Precompute per-gridpoint OI gain rows for a static obs network.

    When the observation network, error ratios AND validity are static
    across forecast cycles, the whole per-gridpoint solve
    x = (P + R)^-1 G (oi.cpp:289-315) is geometry: only the innovations
    change per cycle. This computes, on device, for every gridpoint the
    top-max_points selection (first S shortlist entries), the solved
    weight row x (T, TB, S), the analysis scalar x.G, and the local
    obs positions — so a cycle costs one weighted sum.

    Returns dict {local_s, valid_s, weights, a_scalar}.
    """
    local_idx = geom_dev["local_idx"]
    rho = geom_dev["rho"]
    valid = geom_dev["valid"]
    tile_table = geom_dev["tile_table"]
    tile_static = geom_dev["tile_static"]
    t_count, tb, k_cap = local_idx.shape
    c_cap = tile_table.shape[1]
    s_cap = min(max_points, k_cap) if max_points > 0 else k_cap
    fs = tile_static.shape[-1]

    # all obs valid by assumption: selection = first S shortlist entries
    local_s = local_idx[:, :, :s_cap]
    rho_s = rho[:, :, :s_cap]
    valid_s = valid[:, :, :s_cap]
    rat = jnp.asarray(ratios, jnp.float32)
    table_r = jnp.take(rat, tile_table, axis=0)  # (T, C)

    nt = tiles_per_step
    nsteps = -(-t_count // nt)
    pad_t = nsteps * nt - t_count

    def pad0(v):
        if not pad_t:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((pad_t,) + v.shape[1:], v.dtype)])

    args = (pad0(local_s).reshape(nsteps, nt, tb, s_cap),
            pad0(rho_s).reshape(nsteps, nt, tb, s_cap),
            pad0(valid_s).reshape(nsteps, nt, tb, s_cap),
            pad0(jnp.concatenate([tile_static, table_r[:, :, None]],
                                 axis=-1)).reshape(nsteps, nt, c_cap,
                                                   fs + 1))

    arange_c = jnp.arange(c_cap, dtype=jnp.int32)

    def body(chunk):
        ls, rh, va, tall = chunk
        b = nt * tb
        oh_s = (ls[..., None] == arange_c).astype(jnp.float32)
        fields = jnp.einsum("ntsc,ncf->ntsf", oh_s, tall,
                            precision=jax.lax.Precision.HIGHEST)
        fields = fields.reshape(b, s_cap, fs + 1)
        sel_fields = {key: fields[:, :, i]
                      for i, key in enumerate(static_keys)}
        l_r = fields[:, :, fs]
        sv = va.reshape(b, s_cap)
        lg = jnp.where(sv, rh.reshape(b, s_cap), 0.0)

        ft = {key: v.T for key, v in sel_fields.items()}
        pi = {key: v[:, None, :] for key, v in ft.items()}
        pj = {key: v[None, :, :] for key, v in ft.items()}
        lp = structure.corr_jnp(pi, pj).astype(jnp.float32)
        svt = sv.T
        pair_valid = svt[:, None, :] & svt[None, :, :]
        eye = jnp.eye(s_cap, dtype=jnp.float32)[:, :, None]
        a_mat = jnp.where(pair_valid, lp, 0.0) + \
            jnp.where(svt, l_r.T, 1.0)[:, None, :] * eye
        a_mat = jnp.where(pair_valid | (eye > 0), a_mat, 0.0)
        x = _gj_solve_batch_last(a_mat, lg.T.astype(jnp.float32)).T
        x = jnp.where(sv, x, 0.0)
        a_scalar = jnp.sum(x * lg, axis=1)
        return x.reshape(nt, tb, s_cap), a_scalar.reshape(nt, tb)

    weights, a_scalar = jax.lax.map(body, args)
    return {
        "local_s": local_s,
        "valid_s": valid_s,
        "weights": weights.reshape(-1, tb, s_cap)[:t_count],
        "a_scalar": a_scalar.reshape(-1, tb)[:t_count],
    }


def build_weights_dynamic(structure, geom_dev, static_keys, ratios,
                          obs_valid, max_points: int,
                          tiles_per_step: int = 8):
    """Solve per-gridpoint OI gain rows for THIS cycle's obs validity
    and ratios (device, jit-composable).

    The general serving cycle's expensive half — masked top-k
    re-selection on the stored canonical rho, S x S assembly, batched
    solve — depends only on (obs validity, ratios), not on the obs
    VALUES. Computing it as an explicit weights table lets the serving
    path cache it across cycles and refresh only when a device-side
    guard sees the validity/ratios change (api/pipeline.py run_guarded);
    selection and solve are identical to oi_tiled_sweep's, so applying
    these weights reproduces the full re-solve bit for bit.

    ratios: (P,) f32; obs_valid: (P,) f32 0/1 validity this cycle.
    Returns {local_s, valid_s, weights} shaped (T, TB, S).
    """
    tile_table = geom_dev["tile_table"]
    local_idx = geom_dev["local_idx"]
    rho = geom_dev["rho"]
    valid = geom_dev["valid"]
    tile_static = geom_dev["tile_static"]
    t_count, tb, k_cap = local_idx.shape
    c_cap = tile_table.shape[1]
    s_cap = min(max_points, k_cap) if max_points > 0 else k_cap
    fs = tile_static.shape[-1]

    table_rv = jnp.stack(
        [jnp.take(ratios, tile_table, axis=0),
         jnp.take(obs_valid, tile_table, axis=0)], axis=-1)  # (T, C, 2)
    tall_all = jnp.concatenate([tile_static, table_rv], axis=-1)

    nt = tiles_per_step
    nsteps = -(-t_count // nt)
    pad_t = nsteps * nt - t_count

    def pad0(v):
        if not pad_t:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((pad_t,) + v.shape[1:], v.dtype)])

    args = (pad0(local_idx).reshape(nsteps, nt, tb, k_cap),
            pad0(rho).reshape(nsteps, nt, tb, k_cap),
            pad0(valid).reshape(nsteps, nt, tb, k_cap),
            pad0(tall_all).reshape(nsteps, nt, c_cap, fs + 2))

    arange_c = jnp.arange(c_cap, dtype=jnp.int32)
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)

    def body(chunk):
        li, rh, va, tall = chunk
        b = nt * tb
        oh_k = (li[..., None] == arange_c).astype(jnp.float32)
        fk = jnp.einsum("ntkc,ncf->ntkf", oh_k, tall, precision=prec)
        fk = fk.reshape(b, k_cap, fs + 2)
        va2 = va.reshape(b, k_cap) & (fk[:, :, fs + 1] > 0.5)
        vals, sub, sel_valid = _select_top(rh.reshape(b, k_cap), va2,
                                           s_cap)
        lg = jnp.where(sel_valid, vals, 0.0).astype(jnp.float32)
        fields = jnp.take_along_axis(fk, sub[:, :, None], axis=1)
        sel_fields = {key: fields[:, :, i]
                      for i, key in enumerate(static_keys)}
        l_r = fields[:, :, fs]
        ls = jnp.take_along_axis(li.reshape(b, k_cap), sub, axis=1)

        # identical assembly/solve to _solve_selected (ops/oi.py)
        ft = {key: v.T for key, v in sel_fields.items()}
        pi = {key: v[:, None, :] for key, v in ft.items()}
        pj = {key: v[None, :, :] for key, v in ft.items()}
        lp = structure.corr_jnp(pi, pj).astype(jnp.float32)
        sv = sel_valid.T
        pair_valid = sv[:, None, :] & sv[None, :, :]
        eye = jnp.eye(s_cap, dtype=jnp.float32)[:, :, None]
        a_mat = jnp.where(pair_valid, lp, 0.0) + \
            jnp.where(sv, l_r.T, 1.0)[:, None, :] * eye
        a_mat = jnp.where(pair_valid | (eye > 0), a_mat, 0.0)
        x = _gj_solve_batch_last(a_mat, lg.T.astype(jnp.float32)).T
        x = jnp.where(sel_valid, x, 0.0)
        return (ls.reshape(nt, tb, s_cap),
                sel_valid.reshape(nt, tb, s_cap),
                x.reshape(nt, tb, s_cap))

    local_s, valid_s, weights = jax.lax.map(body, args)
    return {"local_s": local_s.reshape(-1, tb, s_cap)[:t_count],
            "valid_s": valid_s.reshape(-1, tb, s_cap)[:t_count],
            "weights": weights.reshape(-1, tb, s_cap)[:t_count]}


def oi_tiled_apply_weights(static_w, tile_table, background_t, innov,
                           allow_extrapolation: bool,
                           tiles_per_step: int = 32):
    """Apply precomputed OI gain rows: one cycle = one weighted sum.

    static_w: from build_static_weights. innov: (P,) obs - background at
    obs points, this cycle. background_t: (T, TB).
    """
    local_s = static_w["local_s"]
    valid_s = static_w["valid_s"]
    weights = static_w["weights"]
    t_count, tb, s_cap = local_s.shape
    c_cap = tile_table.shape[1]

    table_i = jnp.take(innov, tile_table, axis=0)  # (T, C)

    nt = tiles_per_step
    nsteps = -(-t_count // nt)
    pad_t = nsteps * nt - t_count

    def pad0(v):
        if not pad_t:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((pad_t,) + v.shape[1:], v.dtype)])

    args = (pad0(local_s).reshape(nsteps, nt, tb, s_cap),
            pad0(valid_s).reshape(nsteps, nt, tb, s_cap),
            pad0(weights).reshape(nsteps, nt, tb, s_cap),
            pad0(table_i).reshape(nsteps, nt, c_cap),
            pad0(background_t).reshape(nsteps, nt, tb))

    arange_c = jnp.arange(c_cap, dtype=jnp.int32)
    big = jnp.float32(np.inf)

    def body(chunk):
        ls, va, w, ti, bg = chunk
        oh_s = (ls[..., None] == arange_c).astype(jnp.float32)
        inn = jnp.einsum("ntsc,nc->nts", oh_s, ti,
                         precision=jax.lax.Precision.HIGHEST)
        inn = jnp.where(va, inn, 0.0)
        increment = jnp.sum(w * inn, axis=-1)  # (nt, tb)
        if not allow_extrapolation:
            max_inc = jnp.max(jnp.where(va, inn, -big), axis=-1)
            min_inc = jnp.min(jnp.where(va, inn, big), axis=-1)
            c1 = (max_inc > 0) & (increment > max_inc)
            c2 = ~c1 & (max_inc < 0) & (increment > 0)
            c3 = ~c1 & ~c2 & (min_inc < 0) & (increment < min_inc)
            c4 = ~c1 & ~c2 & ~c3 & (min_inc > 0) & (increment < 0)
            increment = jnp.where(c1 | c2, max_inc,
                                  jnp.where(c3 | c4, min_inc, increment))
        any_valid = jnp.any(va, axis=-1)
        ok = any_valid & jnp.isfinite(bg)
        return jnp.where(ok, bg + increment, bg)

    out = jax.lax.map(body, args)
    return out.reshape(-1, tb)[:t_count]


def oi_tiled_sweep(structure, geom_dev, static_keys, background_t,
                   bvariance_t, packed_dyn, max_points: int,
                   allow_extrapolation: bool, tiles_per_step: int = 8):
    """Whole-grid tiled OI in one XLA program.

    geom_dev: dict of device arrays {tile_table, local_idx, rho, valid,
    tile_static}. background_t/bvariance_t: (T, TB). packed_dyn: (P, 4)
    columns [obs, obs_y, ratios, valid01]. Returns (T, TB) analysis +
    variance.
    """
    tile_table = geom_dev["tile_table"]
    local_idx = geom_dev["local_idx"]
    rho = geom_dev["rho"]
    valid = geom_dev["valid"]
    tile_static = geom_dev["tile_static"]
    t_count, tb, k_cap = local_idx.shape
    c_cap = tile_table.shape[1]
    s_cap = min(max_points, k_cap) if max_points > 0 else k_cap

    # one gather per table entry (the only random HBM access per call)
    table_dyn = jnp.take(packed_dyn, tile_table, axis=0)  # (T, C, 4)
    table_all = jnp.concatenate([tile_static, table_dyn], axis=-1)
    fs = tile_static.shape[-1]

    nt = tiles_per_step
    nsteps = -(-t_count // nt)
    pad_t = nsteps * nt - t_count

    def pad0(v):
        if not pad_t:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((pad_t,) + v.shape[1:], v.dtype)])

    args = (pad0(local_idx).reshape(nsteps, nt, tb, k_cap),
            pad0(rho).reshape(nsteps, nt, tb, k_cap),
            pad0(valid).reshape(nsteps, nt, tb, k_cap),
            pad0(table_all).reshape(nsteps, nt, c_cap, fs + 4),
            pad0(background_t).reshape(nsteps, nt, tb),
            pad0(bvariance_t).reshape(nsteps, nt, tb))

    arange_c = jnp.arange(c_cap, dtype=jnp.int32)
    # the one-hot operand is exact 0/1 (DEFAULT = single bf16 pass);
    # the value side keeps the full-f32 split so paging stays exact
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)

    def body(chunk):
        li, rh, va, tall, bg, bv = chunk
        b = nt * tb
        # Page ALL K candidates' fields (static + this cycle's dynamic
        # columns, including validity) with ONE one-hot matmul, then
        # select. Round-3 paged per-selection (oh_s) AFTER top_k: XLA
        # cannot fuse one-hot generation into dot operands, so the
        # (B, S, C) one-hot materialized in HBM *in addition to* the
        # (B, K, C) validity one-hot - paging in K-space first replaces
        # both with one materialization and a cheap minor-axis
        # take_along_axis (measured 1.38x on the 2000^2/10k cycle).
        oh_k = (li[..., None] == arange_c).astype(jnp.float32)
        fk = jnp.einsum("ntkc,ncf->ntkf", oh_k, tall, precision=prec)
        fk = fk.reshape(b, k_cap, fs + 4)
        va2 = va.reshape(b, k_cap) & (fk[:, :, fs + 3] > 0.5)

        vals, sub, sel_valid = _select_top(rh.reshape(b, k_cap), va2,
                                           s_cap)
        lg = jnp.where(sel_valid, vals, 0.0).astype(jnp.float32)
        fields = jnp.take_along_axis(fk, sub[:, :, None], axis=1)
        sel_fields = {key: fields[:, :, i]
                      for i, key in enumerate(static_keys)}
        l_obs = fields[:, :, fs + 0]
        l_y = fields[:, :, fs + 1]
        l_r = fields[:, :, fs + 2]
        out, avar = _solve_selected(
            structure, sel_fields, lg, sel_valid, l_obs, l_y, l_r,
            bg.reshape(b), bv.reshape(b), allow_extrapolation)
        return out.reshape(nt, tb), avar.reshape(nt, tb)

    out, avar = jax.lax.map(body, args)
    out = out.reshape(-1, tb)[:t_count]
    avar = avar.reshape(-1, tb)[:t_count]
    return out, avar
