"""Multi-variant ensemble OI kernels (reference src/api/oi_ensi_multi.cpp).

Three schemes, each batched over blocks of gridpoints:
- ebe  ("ensemble member by ensemble member", oi_ensi_multi.cpp:329-627):
  per-member innovations; correlations from a second `background_corr`
  ensemble via Schur products of localization with normalized-anomaly
  outer products; gain lK = lr_lr inv(lR_rr + R_dd).
- ebesc (static correlations, 629-860): same innovation structure, but
  correlations purely from the structure function.
- utem ("use the ensemble mean", 862-1311): ETKF-style transform like
  oi_ensi but with correlation anomalies from `background_corr` and the
  W/w combination scaled by the ensemble std and bratios.

Padded slots use the Rinv=0 / innov=0 trick throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .oi_ensi import _inv_sqrt_ns_m, _mm, _mv

__all__ = ["make_ebe_kernel", "make_ebesc_kernel", "make_utem_kernel"]

DEFAULT_MIN_STD = 0.0013


def _select(structure, p1_fields, cand_fields, cand_valid, max_points, k):
    rho = structure.corr_background_jnp(p1_fields, cand_fields)
    valid = cand_valid & (rho > 0)
    s_cap = min(max_points, k) if max_points > 0 else k
    vals, sel = jax.lax.top_k(jnp.where(valid, rho, -jnp.inf), s_cap)
    sel_valid = jnp.isfinite(vals)
    l_rho = jnp.where(sel_valid, vals, 0.0).astype(jnp.float32)
    return sel, sel_valid, l_rho


def _pair_corr(structure, sel_fields):
    pi = {key: v[:, :, None] for key, v in sel_fields.items()}
    pj = {key: v[:, None, :] for key, v in sel_fields.items()}
    return structure.corr_jnp(pi, pj).astype(jnp.float32)


def _anti_extrap_member(dx, innov, sel_valid):
    """Member-wise clamp (oi_ensi_multi.cpp:583-607): dx (B,E),
    innov (B,S,E)."""
    big = jnp.float32(np.inf)
    masked = jnp.where(sel_valid[:, :, None], innov, jnp.nan)
    max_inc = jnp.max(jnp.where(jnp.isnan(masked), -big, masked), axis=1)
    min_inc = jnp.min(jnp.where(jnp.isnan(masked), big, masked), axis=1)
    c1 = (max_inc > 0) & (dx > max_inc)
    c2 = ~c1 & (max_inc < 0) & (dx > 0)
    c3 = ~c1 & ~c2 & (min_inc < 0) & (dx < min_inc)
    c4 = ~c1 & ~c2 & ~c3 & (min_inc > 0) & (dx < 0)
    return jnp.where(c1, max_inc,
                     jnp.where(c2, 0.0,
                               jnp.where(c3, min_inc,
                                         jnp.where(c4, 0.0, dx))))


def make_ebe_kernel(structure, max_points: int, allow_extrapolation: bool):
    cache = structure.__dict__.setdefault("_ebe_kernel_cache", {})
    key = (int(max_points), bool(allow_extrapolation))
    if key in cache:
        return cache[key]

    @jax.jit
    def kernel(p1_fields, cand_fields, cand_valid, background, bratios,
               x_l, obs, pratios, innov, z_r):
        """background: (B, E); x_l: (B, E) normalized gridpoint anomalies;
        obs/pratios: (B, K); innov: (B, K, E); z_r: (B, K, E)."""
        k = pratios.shape[1]
        sel, sel_valid, l_rho = _select(structure, p1_fields, cand_fields,
                                        cand_valid, max_points, k)
        sel_fields = {key2: jnp.take_along_axis(cand_fields[key2], sel,
                                                axis=1)
                      for key2 in cand_fields}
        l_r = jnp.take_along_axis(pratios, sel, axis=1)
        l_z = jnp.take_along_axis(z_r, sel[:, :, None], axis=1)  # (B,S,E)
        l_innov = jnp.take_along_axis(innov, sel[:, :, None], axis=1)
        l_innov = jnp.where(sel_valid[:, :, None], l_innov, 0.0)

        loc2d = _pair_corr(structure, sel_fields)  # (B, S, S)
        pair_valid = sel_valid[:, :, None] & sel_valid[:, None, :]
        s_cap = loc2d.shape[1]
        eye = jnp.eye(s_cap, dtype=jnp.float32)
        # lr_lr = loc1d o (x_l . z_r^T); lR_rr = loc2d o (z_r z_r^T).
        # Explicit multiply+reduce, not einsum: the MXU's default bf16
        # operand rounding costs ~1e-2 relative error and breaks the
        # symmetry of r_rr feeding the solve (see ops/oi_ensi).
        lr_lr = l_rho * (x_l[:, None, :] * l_z).sum(axis=2)
        r_rr = loc2d * (l_z[:, :, None, :] * l_z[:, None, :, :]).sum(-1)
        a_mat = jnp.where(pair_valid, r_rr, 0.0) + \
            jnp.where(sel_valid, l_r, 1.0)[:, :, None] * eye
        a_mat = jnp.where(pair_valid | (eye > 0), a_mat, 0.0)
        lk = jnp.linalg.solve(a_mat, jnp.where(sel_valid, lr_lr,
                                               0.0)[:, :, None])[:, :, 0]
        dx = bratios[:, None] * (lk[:, :, None] * l_innov).sum(axis=1)
        if not allow_extrapolation:
            dx = _anti_extrap_member(dx, l_innov, sel_valid)
        ok = jnp.any(sel_valid, axis=1) & jnp.all(jnp.isfinite(dx), axis=1)
        return jnp.where(ok[:, None], background + dx, background)

    cache[key] = kernel
    return kernel


def make_ebesc_kernel(structure, max_points: int, allow_extrapolation: bool):
    cache = structure.__dict__.setdefault("_ebesc_kernel_cache", {})
    key = (int(max_points), bool(allow_extrapolation))
    if key in cache:
        return cache[key]

    @jax.jit
    def kernel(p1_fields, cand_fields, cand_valid, background, bratios,
               obs, pratios, innov):
        k = pratios.shape[1]
        sel, sel_valid, l_rho = _select(structure, p1_fields, cand_fields,
                                        cand_valid, max_points, k)
        sel_fields = {key2: jnp.take_along_axis(cand_fields[key2], sel,
                                                axis=1)
                      for key2 in cand_fields}
        l_r = jnp.take_along_axis(pratios, sel, axis=1)
        l_innov = jnp.take_along_axis(innov, sel[:, :, None], axis=1)
        l_innov = jnp.where(sel_valid[:, :, None], l_innov, 0.0)
        corr2d = _pair_corr(structure, sel_fields)
        pair_valid = sel_valid[:, :, None] & sel_valid[:, None, :]
        s_cap = corr2d.shape[1]
        eye = jnp.eye(s_cap, dtype=jnp.float32)
        a_mat = jnp.where(pair_valid, corr2d, 0.0) + \
            jnp.where(sel_valid, l_r, 1.0)[:, :, None] * eye
        a_mat = jnp.where(pair_valid | (eye > 0), a_mat, 0.0)
        lk = jnp.linalg.solve(a_mat, jnp.where(sel_valid, l_rho,
                                               0.0)[:, :, None])[:, :, 0]
        dx = bratios[:, None] * (lk[:, :, None] * l_innov).sum(axis=1)
        if not allow_extrapolation:
            dx = _anti_extrap_member(dx, l_innov, sel_valid)
        ok = jnp.any(sel_valid, axis=1) & jnp.all(jnp.isfinite(dx), axis=1)
        return jnp.where(ok[:, None], background + dx, background)

    cache[key] = kernel
    return kernel


def make_utem_kernel(structure, max_points: int, allow_extrapolation: bool):
    cache = structure.__dict__.setdefault("_utem_kernel_cache", {})
    key = (int(max_points), bool(allow_extrapolation))
    if key in cache:
        return cache[key]

    @jax.jit
    def kernel(p1_fields, cand_fields, cand_valid, background,
               background_corr, bratios, obs, pratios, y_anom, y_corr,
               y_hat):
        """background/background_corr: (B, E); obs/pratios: (B, K);
        y_anom/y_corr: (B, K, E); y_hat: (B, K)."""
        b, e = background.shape
        k = pratios.shape[1]
        sel, sel_valid, l_rho = _select(structure, p1_fields, cand_fields,
                                        cand_valid, max_points, k)
        l_obs = jnp.take_along_axis(obs, sel, axis=1)
        l_r = jnp.take_along_axis(pratios, sel, axis=1)
        l_yhat = jnp.take_along_axis(y_hat, sel, axis=1)
        l_y = jnp.take_along_axis(y_anom, sel[:, :, None], axis=1)
        l_yc = jnp.take_along_axis(y_corr, sel[:, :, None], axis=1)

        rinv = jnp.where(sel_valid, l_rho / l_r, 0.0)
        # batch-minor exact-f32 VPU forms + symmetrize: the MXU's
        # default bf16 rounding makes a dot_general product asymmetric
        # and Newton-Schulz diverges on non-symmetric input
        # (see ops/oi_ensi._ensi_update)
        yc_m = jnp.moveaxis(l_yc, 0, 2)                    # (S, E, B)
        c_m = jnp.swapaxes(yc_m, 0, 1) \
            * jnp.moveaxis(rinv, 0, 1)[None]               # (E, S, B)
        pinv_m = _mm(c_m, yc_m)
        pinv_m = 0.5 * (pinv_m + jnp.swapaxes(pinv_m, 0, 1)) \
            + jnp.eye(e, dtype=jnp.float32)[:, :, None]
        # Coupled Newton-Schulz inverse sqrt (ops/oi_ensi._inv_sqrt_ns)
        # instead of batched eigh: gives W = sqrt((E-1) Pinv^{-1}) and
        # P C innov. Pinv here is SPD with lambda_min >= 1 by
        # construction, so the reference's `rcond <= 0` guard
        # (oi_ensi_multi.cpp:1106-1121: keep raw background + count a
        # warning) can only trigger on non-finite input; mirror it with
        # a finiteness check.
        z, c_norm = _inv_sqrt_ns_m(pinv_m)  # z: (E, E, B) batch-minor
        cond_ok = jnp.all(jnp.isfinite(pinv_m), axis=(0, 1)) \
            & jnp.all(jnp.isfinite(z), axis=(0, 1))
        innov = jnp.where(sel_valid, l_obs - l_yhat, 0.0)
        cv = (c_m * jnp.moveaxis(innov, 0, 1)[None]).sum(axis=1).T
        w_vec = _mv(z, _mv(z, cv)) / c_norm[:, None]

        ens_mean = jnp.mean(background, axis=1)
        x = background - ens_mean[:, None]
        ens_std = jnp.std(background, axis=1)  # population std
        mean_corr = jnp.mean(background_corr, axis=1)
        std_corr = jnp.std(background_corr, axis=1)
        const_fact = 1.0 / np.sqrt(max(e - 1, 1))
        x_corr = jnp.where(std_corr[:, None] <= DEFAULT_MIN_STD, 0.0,
                           const_fact * (background_corr
                                         - mean_corr[:, None])
                           / jnp.where(std_corr[:, None] == 0, 1,
                                       std_corr[:, None]))
        # increment_e = sum_k x_corr_k (ensStd W + bratios w 1^T)(k,e)
        # (oi_ensi_multi.cpp:1199-1204) with W = sqrt((E-1)/c) z
        # symmetric - computed as matvecs, W never materialized.
        increment = ens_std[:, None] \
            * jnp.sqrt((e - 1) / c_norm)[:, None] * _mv(z, x_corr) \
            + bratios[:, None] * jnp.sum(x_corr * w_vec, axis=1,
                                         keepdims=True)

        if not allow_extrapolation:
            s = l_y.shape[1]
            flat = jnp.reshape(jnp.swapaxes(l_y, 1, 2), (b, s * e))
            e_idx = jnp.arange(e)
            y_elem = flat[:, e_idx % (s * e)]
            diff = jnp.where(sel_valid[:, :, None],
                             (l_obs - l_yhat)[:, :, None]
                             - y_elem[:, None, :], jnp.nan)
            max_inc = jnp.max(jnp.where(jnp.isnan(diff), -jnp.inf, diff),
                              axis=1)
            min_inc = jnp.min(jnp.where(jnp.isnan(diff), jnp.inf, diff),
                              axis=1)
            member_inc = increment - x
            c1 = (max_inc > 0) & (member_inc > max_inc)
            c2 = ~c1 & (max_inc < 0) & (member_inc > 0)
            c3 = ~c1 & ~c2 & (min_inc < 0) & (member_inc < min_inc)
            c4 = ~c1 & ~c2 & ~c3 & (min_inc > 0) & (member_inc < 0)
            increment = jnp.where(
                c1, max_inc + x,
                jnp.where(c2, x, jnp.where(c3, min_inc + x,
                                           jnp.where(c4, x, increment))))

        analysis = ens_mean[:, None] + increment
        any_valid = jnp.any(sel_valid, axis=1)
        cond_bad = any_valid & ~cond_ok
        ok = any_valid & cond_ok & jnp.all(jnp.isfinite(analysis), axis=1)
        return jnp.where(ok[:, None], analysis, background), cond_bad

    cache[key] = kernel
    return kernel
