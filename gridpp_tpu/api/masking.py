"""Ensemble mask/threshold downscalers (reference
src/api/{downscale_probability,mask_threshold_downscale_consensus}.cpp).

vec3 layout is (Y, X, E) with the ensemble axis last.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import MV, ComparisonOperator, Statistic
from ..core.grid import Grid
from ..ops import stats as stats_ops
from ..ops.downscaling import compare
from ._common import asarray_f32

__all__ = ["downscale_probability", "mask_threshold_downscale_consensus",
           "mask_threshold_downscale_quantile"]


def _nn_gather3(igrid: Grid, ogrid: Grid, values):
    """Gather (Y, X, E) input at each output cell's nearest input cell."""
    flat = igrid.nearest_map(ogrid.lats, ogrid.lons, cache_obj=ogrid)
    gy, gx = igrid.size()
    v = values.reshape(gy * gx, -1)
    return v[flat]  # (Yo*Xo, E)


def downscale_probability(igrid, ogrid, ivalues, threshold,
                          comparison_operator):
    """NN-downscaled ensemble exceedance probability
    (downscale_probability.cpp:7-64)."""
    ivalues = asarray_f32(ivalues)
    if ivalues.ndim != 3:
        raise ValueError("values must be 3D (Y, X, E)")
    threshold = asarray_f32(threshold, "threshold")
    oy, ox = ogrid.size()
    if threshold.shape != (oy, ox):
        raise ValueError("Threshold must be the same size as the output grid")
    g = _nn_gather3(igrid, ogrid, ivalues)  # (Yo*Xo, E)
    thr = threshold.reshape(-1, 1)
    valid = np.isfinite(g)
    hit = np.asarray(compare(jnp.asarray(g), jnp.asarray(thr),
                             int(comparison_operator)))
    count = valid.sum(axis=1)
    total = (hit & valid).sum(axis=1)
    with np.errstate(invalid="ignore"):
        prob = np.where(count > 0, total / np.maximum(count, 1), MV)
    return prob.astype(np.float32).reshape(oy, ox)


def _mask_threshold(igrid, ogrid, ivalues_true, ivalues_false,
                    threshold_values, threshold, comparison_operator,
                    statistic, quantile):
    ivalues_true = asarray_f32(ivalues_true, "ivalues_true")
    ivalues_false = asarray_f32(ivalues_false, "ivalues_false")
    threshold_values = asarray_f32(threshold_values, "threshold_values")
    threshold = asarray_f32(threshold, "threshold")
    for v in (ivalues_true, ivalues_false, threshold_values):
        if v.ndim != 3:
            raise ValueError("values must be 3D (Y, X, E)")
    oy, ox = ogrid.size()
    gt = _nn_gather3(igrid, ogrid, ivalues_true)
    gf = _nn_gather3(igrid, ogrid, ivalues_false)
    gthr = _nn_gather3(igrid, ogrid, threshold_values)
    thr = threshold.reshape(-1, 1)
    hit = np.asarray(compare(jnp.asarray(gthr), jnp.asarray(thr),
                             int(comparison_operator)))
    masked = np.where(np.isfinite(gthr), np.where(hit, gt, gf), np.nan)
    statistic = int(statistic)
    if statistic == Statistic.Quantile:
        out = stats_ops.nan_quantile(jnp.asarray(masked), float(quantile),
                                     axis=-1)
    else:
        out = stats_ops.nan_statistic(jnp.asarray(masked), statistic,
                                      axis=-1)
    return np.asarray(out).astype(np.float32).reshape(oy, ox)


def mask_threshold_downscale_consensus(igrid, ogrid, ivalues_true,
                                       ivalues_false, threshold_values,
                                       threshold, comparison_operator,
                                       statistic):
    """Per-member true/false selection + statistic reduce
    (mask_threshold_downscale_consensus.cpp:19-83)."""
    return _mask_threshold(igrid, ogrid, ivalues_true, ivalues_false,
                           threshold_values, threshold, comparison_operator,
                           statistic, 0.0)


def mask_threshold_downscale_quantile(igrid, ogrid, ivalues_true,
                                      ivalues_false, threshold_values,
                                      threshold, comparison_operator,
                                      quantile_level):
    return _mask_threshold(igrid, ogrid, ivalues_true, ivalues_false,
                           threshold_values, threshold, comparison_operator,
                           Statistic.Quantile, float(quantile_level))
