"""local_distribution_correction device kernel.

Reference src/api/local_distribution_correction.cpp: per gridpoint, gather
(obs, background) pairs within the localization radius, build rho-weighted
empirical quantile curves trimmed to [min_quantile, max_quantile], then
apply piecewise precipitation rules. Here the per-gridpoint sorts and curve
interpolations run batched over blocks of gridpoints; padded slots sort to
the tail and the curve tail is clamped by repetition, which reproduces the
reference's edge handling under gridpp's flat-interval interpolation rules.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .curves import piecewise_interp

__all__ = ["ldc_block"]


def _weighted_curve(vals, rho, valid, d0, d1, minq, maxq):
    """Sorted trimmed curve (B, M+1) with leading (0,0) point and
    rho-cumsum quantiles normalized to [minq, maxq]."""
    b, m = vals.shape
    key = jnp.where(valid, vals, jnp.inf)
    order = jnp.argsort(key, axis=-1)
    svals = jnp.take_along_axis(vals, order, axis=-1)
    srho = jnp.take_along_axis(rho, order, axis=-1)
    pos = jnp.arange(m)[None, :]
    keep = (pos >= d0[:, None]) & (pos < d1[:, None])
    # compact kept entries to the front (stable): sort by (not keep)
    ckey = jnp.where(keep, pos, m + pos)
    corder = jnp.argsort(ckey, axis=-1)
    cvals = jnp.take_along_axis(svals, corder, axis=-1)
    crho = jnp.take_along_axis(srho, corder, axis=-1)
    kcount = jnp.sum(keep, axis=-1)  # d1 - d0
    idx = jnp.arange(m)[None, :]
    in_curve = idx < kcount[:, None]
    # clamp the tail by repeating the last kept element
    last = jnp.maximum(kcount - 1, 0)
    lastv = jnp.take_along_axis(cvals, last[:, None], axis=-1)
    cvals = jnp.where(in_curve, cvals, lastv)
    crho = jnp.where(in_curve, crho, 0.0)
    csum = jnp.cumsum(crho, axis=-1)
    total = jnp.take_along_axis(csum, last[:, None], axis=-1)
    total = jnp.where(total == 0, 1, total)
    quant = minq + csum / total * (maxq - minq)
    quant = jnp.minimum(quant, maxq)
    # prepend the (0, 0) curve point
    zeros = jnp.zeros((b, 1), cvals.dtype)
    curve_vals = jnp.concatenate([zeros, cvals], axis=-1)
    curve_q = jnp.concatenate([zeros, quant], axis=-1)
    last_val = lastv[:, 0]
    return curve_vals, curve_q, last_val, kcount


@partial(jax.jit, static_argnames=("min_points",))
def ldc_block(background, rho, valid, obs_vals, fcst_vals,
              min_quantile, max_quantile, min_points: int):
    """background: (B,); rho/valid: (B, M); obs_vals/fcst_vals: (B, M)
    (candidate x time flattened). Returns corrected (B,)."""
    pair_valid = (valid & jnp.isfinite(obs_vals) & jnp.isfinite(fcst_vals)
                  & (obs_vals >= 0) & (fcst_vals >= 0))
    rho_m = jnp.where(pair_valid, rho, 0.0)
    count = jnp.sum(pair_valid, axis=-1)
    sum_rho = jnp.sum(rho_m, axis=-1)
    d0 = (count * min_quantile).astype(jnp.int32)
    d1 = (count * max_quantile).astype(jnp.int32)

    ref_c, ref_q, ref_last, kcount = _weighted_curve(
        obs_vals, rho_m, pair_valid, d0, d1, min_quantile, max_quantile)
    fcst_c, fcst_q, fcst_last, _ = _weighted_curve(
        fcst_vals, rho_m, pair_valid, d0, d1, min_quantile, max_quantile)
    # Empty trimmed curve -> the lone (0,0) point
    ref_last = jnp.where(kcount > 0, ref_last, 0.0)
    fcst_last = jnp.where(kcount > 0, fcst_last, 0.0)

    bg = background
    # Rule 4: quantile map within the curve, blended by obs density
    q = piecewise_interp(bg, fcst_c, fcst_q)
    new_ref = piecewise_interp(q, ref_q, ref_c)
    w0 = 1 - jnp.exp(-0.01 * sum_rho)
    rule4 = w0 * new_ref + (1 - w0) * bg
    # Rule 3: above the curve, preserve the end-of-curve bias
    rule3 = bg + (ref_last - fcst_last)
    # Rule 2: no observed rain
    rule2 = jnp.where((bg < 3 * fcst_last) | (bg < 0.1), 0.0, bg)

    out = jnp.where(bg < 0.01, 0.0,
                    jnp.where(ref_last <= 0, rule2,
                              jnp.where(bg >= fcst_last, rule3, rule4)))
    ok = (count >= min_points) & jnp.isfinite(bg)
    return jnp.where(ok, out, bg)
