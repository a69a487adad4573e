"""Optimal interpolation device kernels.

TPU-native redesign of reference src/api/oi.cpp: the reference loops over
gridpoints, querying an R-tree and solving a small dense system per point
(oi.cpp:221-341). Here the spatial search is a host precompute (padded
candidate lists) and the per-gridpoint work — structure-function rho
evaluation, top-max_points selection, S x S covariance assembly, solve,
increment clamping — is one fused batched XLA program over blocks of
gridpoints: rho on the VPU, the batched solve on the MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["oi_block", "make_oi_kernel"]


def _select_top(rho, valid, s_cap: int):
    """Top-s_cap candidates by rho among valid ones (oi.cpp:262-281)."""
    neg = jnp.where(valid, rho, -jnp.inf)
    vals, sel = jax.lax.top_k(neg, s_cap)  # (B, S)
    sel_valid = jnp.isfinite(vals)
    return vals, sel, sel_valid


def _gather(field, cand_idx, sel):
    """field: (P,), cand_idx: (B,K), sel: (B,S) -> (B,S)."""
    g = jnp.take(field, cand_idx, axis=0)  # (B, K)
    return jnp.take_along_axis(g, sel, axis=1)


def oi_block(structure, p1_fields, cand_fields, cand_rho_valid,
             background, bvariance, obs, obs_y, ratios,
             max_points: int, allow_extrapolation: bool):
    """Solve OI for a block of gridpoints.

    p1_fields: dict of (B, 1) arrays (x,y,z,elev,laf[,h,v,w]).
    cand_fields: dict of (B, K) arrays for candidate observations, plus
    obs/obs_y/ratios (B, K). cand_rho_valid: (B, K) mask of candidates in
    range with valid obs values.
    Returns (increment, a) with a = lGSR * lG^T (for analysis variance).
    """
    k = obs.shape[1]
    s_cap = min(max_points, k) if max_points > 0 else k

    rho = structure.corr_background_jnp(p1_fields, cand_fields)  # (B, K)
    valid = cand_rho_valid & (rho > 0)

    vals, sel, sel_valid = _select_top(rho, valid, s_cap)
    lg = jnp.where(sel_valid, vals, 0.0).astype(jnp.float32)  # (B, S)

    sel_f = {key: jnp.take_along_axis(cand_fields[key], sel, axis=1)
             for key in cand_fields}
    l_obs = jnp.take_along_axis(obs, sel, axis=1)
    l_y = jnp.take_along_axis(obs_y, sel, axis=1)
    l_r = jnp.take_along_axis(ratios, sel, axis=1)

    # Pairwise obs-obs correlations (B, S, S); p1 = obs i needs its own
    # resolved length scales, which the API layer includes in cand_fields.
    pi = {key: v[:, :, None] for key, v in sel_f.items()}
    pj = {key: v[:, None, :] for key, v in sel_f.items()}
    lp = structure.corr_jnp(pi, pj).astype(jnp.float32)  # (B, S, S)

    pair_valid = sel_valid[:, :, None] & sel_valid[:, None, :]
    eye = jnp.eye(s_cap, dtype=jnp.float32)
    a_mat = jnp.where(pair_valid, lp, 0.0) + \
        jnp.where(sel_valid, l_r, 1.0)[:, :, None] * eye
    a_mat = jnp.where(pair_valid | (eye > 0), a_mat, 0.0)

    rhs = lg[:, :, None]  # (B, S, 1)
    x = jnp.linalg.solve(a_mat, rhs)[:, :, 0]  # (B, S)

    innov = jnp.where(sel_valid, l_obs - l_y, 0.0)
    increment = jnp.sum(x * innov, axis=1)
    a_scalar = jnp.sum(x * lg, axis=1)

    if not allow_extrapolation:
        big = jnp.float32(np.inf)
        max_inc = jnp.max(jnp.where(sel_valid, l_obs - l_y, -big), axis=1)
        min_inc = jnp.min(jnp.where(sel_valid, l_obs - l_y, big), axis=1)
        c1 = (max_inc > 0) & (increment > max_inc)
        c2 = ~c1 & (max_inc < 0) & (increment > 0)
        c3 = ~c1 & ~c2 & (min_inc < 0) & (increment < min_inc)
        c4 = ~c1 & ~c2 & ~c3 & (min_inc > 0) & (increment < 0)
        increment = jnp.where(c1 | c2, max_inc,
                              jnp.where(c3 | c4, min_inc, increment))

    any_valid = jnp.any(sel_valid, axis=1)
    ok = any_valid & jnp.isfinite(background)
    out = jnp.where(ok, background + increment, background)
    avar = jnp.where(ok, bvariance * (1 - a_scalar), bvariance)
    return out, avar


def make_oi_kernel(structure, max_points: int, allow_extrapolation: bool):
    """jit-compiled OI block solver bound to a structure instance."""
    @jax.jit
    def kernel(p1_fields, cand_fields, cand_rho_valid, background,
               bvariance, obs, obs_y, ratios):
        return oi_block(structure, p1_fields, cand_fields, cand_rho_valid,
                        background, bvariance, obs, obs_y, ratios,
                        max_points, allow_extrapolation)
    return kernel
