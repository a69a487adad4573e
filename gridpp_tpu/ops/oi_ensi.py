"""Ensemble OI (EnSI / local ensemble transform) device kernel.

Reference src/api/oi_ensi.cpp:114-568 runs a SERIAL loop over gridpoints
(OMP disabled due to a packaging segfault, oi_ensi.cpp:203-206), each doing
an E x E eigendecomposition. Here blocks of gridpoints run as one batched
XLA program: the E x E products hit the MXU and the batched `eigh`
vectorizes, turning the reference's single-threaded bottleneck into the
TPU's natural shape.

Two modes:
- host-candidate kernel (make_ensi_kernel) for very large obs sets;
- dense whole-grid sweep (make_ensi_dense_sweep): rho against every
  observation on device, one dispatch for the full grid via lax.map.

Padding trick: invalid/padded observation slots get Rinv = 0 and zero
innovation, which leaves C = Y^T Rinv, Pinv, and w exactly as if the slot
were absent - no masking needed downstream.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_ensi_kernel", "make_ensi_dense_sweep"]


def _ensi_update(structure, sel_valid, l_rho, l_obs, l_sig, l_y, l_yhat,
                 background, allow_extrapolation: bool):
    """Shared EnSI tail after selection (oi_ensi.cpp:296-553).

    l_y: (B, S, E) anomalies; background: (B, E) valid members.
    """
    b, e = background.shape

    # Rinv diagonal: rho / sigma^2 (oi_ensi.cpp:296-302); zero for padded
    rinv = jnp.where(sel_valid, l_rho / (l_sig * l_sig), 0.0)

    c = jnp.swapaxes(l_y, 1, 2) * rinv[:, None, :]  # (B, E, S)
    pinv = jnp.einsum("bes,bsf->bef", c, l_y,
                      preferred_element_type=jnp.float32) \
        + (e - 1) * jnp.eye(e, dtype=jnp.float32)

    # One eigendecomposition of the SPD Pinv yields P, W = sqrt((E-1)P)
    # AND the conditioning guard (reference computes rcond + inv + eig_sym
    # separately, oi_ensi.cpp:386-421): eigenvectors of P equal those of
    # Pinv with reciprocal eigenvalues. Ill-conditioned points
    # (lambda_min <= 0 or non-finite) fall back to the raw background and
    # are counted, matching oi_ensi.cpp:386-390,557-566.
    eigval, eigvec = jnp.linalg.eigh(pinv)
    lam_min = eigval[:, 0]
    lam_max = eigval[:, -1]
    cond_ok = jnp.isfinite(lam_min) & jnp.isfinite(lam_max) & (lam_min > 0)
    lam_safe = jnp.where(eigval > 0, eigval, 1.0)
    p = jnp.einsum("bij,bj,bkj->bik", eigvec, 1.0 / lam_safe, eigvec,
                   preferred_element_type=jnp.float32)
    sq = jnp.sqrt((e - 1) / lam_safe)
    w_mat = jnp.einsum("bij,bj,bkj->bik", eigvec, sq, eigvec,
                       preferred_element_type=jnp.float32)

    innov = jnp.where(sel_valid, l_obs - l_yhat, 0.0)
    w_vec = jnp.einsum("bef,bfs,bs->be", p, c, innov,
                       preferred_element_type=jnp.float32)
    w_full = w_mat + w_vec[:, :, None]  # W(e,e2) += w(e)

    ens_mean = jnp.mean(background, axis=1)
    x = background - ens_mean[:, None]
    increment = jnp.einsum("bk,bke->be", x, w_full,
                           preferred_element_type=jnp.float32)

    if not allow_extrapolation:
        # Reference quirk (oi_ensi.cpp:520-537): lY[e] is the e-th element
        # of the column-major flattened Y matrix.
        s = l_y.shape[1]
        flat = jnp.reshape(jnp.swapaxes(l_y, 1, 2), (b, s * e))
        e_idx = jnp.arange(e)
        y_elem = flat[:, e_idx % (s * e)]
        diff = jnp.where(sel_valid[:, :, None],
                         (l_obs - l_yhat)[:, :, None]
                         - y_elem[:, None, :], jnp.nan)
        max_inc = jnp.max(jnp.where(jnp.isnan(diff), -jnp.inf, diff), axis=1)
        min_inc = jnp.min(jnp.where(jnp.isnan(diff), jnp.inf, diff), axis=1)
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


def make_ensi_kernel(structure, max_points: int, allow_extrapolation: bool):
    cache = structure.__dict__.setdefault("_ensi_kernel_cache", {})
    key = (int(max_points), bool(allow_extrapolation))
    if key in cache:
        return cache[key]

    @jax.jit
    def kernel(p1_fields, cand_fields, cand_valid, background,
               obs, sigmas, y_anom, y_hat):
        """background: (B, E) valid members; obs/sigmas: (B, K) gathered;
        y_anom: (B, K, E) anomalies at obs points; y_hat: (B, K)."""
        k = obs.shape[1]
        s_cap = min(max_points, k) if max_points > 0 else k
        rho = structure.corr_background_jnp(p1_fields, cand_fields)
        valid = cand_valid & (rho > 0)
        vals, sel = jax.lax.top_k(jnp.where(valid, rho, -jnp.inf), s_cap)
        sel_valid = jnp.isfinite(vals)
        l_rho = jnp.where(sel_valid, vals, 0.0).astype(jnp.float32)
        l_obs = jnp.take_along_axis(obs, sel, axis=1)
        l_sig = jnp.take_along_axis(sigmas, sel, axis=1)
        l_yhat = jnp.take_along_axis(y_hat, sel, axis=1)
        l_y = jnp.take_along_axis(y_anom, sel[:, :, None], axis=1)
        return _ensi_update(structure, sel_valid, l_rho, l_obs, l_sig, l_y,
                            l_yhat, background, allow_extrapolation)

    cache[key] = kernel
    return kernel


def make_ensi_dense_sweep(structure, max_points: int,
                          allow_extrapolation: bool, block: int):
    """Whole-grid EnSI in one dispatch: rho against every observation,
    top-k selection on device, lax.map over gridpoint chunks."""
    cache = structure.__dict__.setdefault("_ensi_dense_sweep_cache", {})
    key = (int(max_points), bool(allow_extrapolation), int(block))
    if key in cache:
        return cache[key]

    @jax.jit
    def kernel(p1_fields, obs_fields, background, obs, sigmas, y_anom,
               y_hat):
        """p1_fields: dict of (N,); obs_fields: dict of (P,);
        background: (N, E); obs/sigmas/y_hat: (P,); y_anom: (P, E)."""
        n, e = background.shape
        p = obs.shape[0]
        s_cap = min(max_points, p) if max_points > 0 else p
        nb = -(-n // block)
        pad = nb * block - n

        def pad_to(v, fill=jnp.nan):
            if not pad:
                return v
            shape = (pad,) + v.shape[1:]
            return jnp.concatenate([v, jnp.full(shape, fill, v.dtype)])

        p1s = {k2: pad_to(v).reshape(nb, block, 1)
               for k2, v in p1_fields.items()}
        bg = pad_to(background).reshape(nb, block, e)
        o2 = {k2: v[None, :] for k2, v in obs_fields.items()}

        def body(args):
            p1c, bgc = args
            rho = structure.corr_background_jnp(p1c, o2)  # (B, P)
            valid = rho > 0
            vals, sel = jax.lax.top_k(jnp.where(valid, rho, -jnp.inf),
                                      s_cap)
            sel_valid = jnp.isfinite(vals)
            l_rho = jnp.where(sel_valid, vals, 0.0).astype(jnp.float32)
            l_obs = jnp.take(obs, sel, axis=0)
            l_sig = jnp.take(sigmas, sel, axis=0)
            l_yhat = jnp.take(y_hat, sel, axis=0)
            l_y = jnp.take(y_anom, sel, axis=0)  # (B, S, E)
            return _ensi_update(structure, sel_valid, l_rho, l_obs, l_sig,
                                l_y, l_yhat, bgc, allow_extrapolation)

        out, cond_bad = jax.lax.map(body, (p1s, bg))
        return out.reshape(-1, e)[:n], cond_bad.reshape(-1)[:n]

    cache[key] = kernel
    return kernel
