"""Neighbourhood statistics API (reference src/api/neighbourhood.cpp)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import MV, Statistic
from ..ops import neighbourhood as ops
from ..ops import stats as stats_ops
from .. import native
from ._common import asarray_f32

__all__ = [
    "neighbourhood", "neighbourhood_brute_force", "neighbourhood_quantile",
    "neighbourhood_quantile_fast", "get_neighbourhood_thresholds",
    "neighbourhood_ens", "neighbourhood_quantile_ens",
    "neighbourhood_quantile_ens_fast",
]


def _check_halfwidth(halfwidth):
    if halfwidth < 0:
        raise ValueError("Half width must be > 0")


def _window_stack_np(x: np.ndarray, h: int) -> np.ndarray:
    """Host window stack (Y, X, W) with NaN padding outside the domain."""
    w = 2 * h + 1
    xp = np.pad(x, ((h, h), (h, h)), constant_values=np.nan)
    ny, nx = x.shape
    parts = [xp[dy:dy + ny, dx:dx + nx]
             for dy in range(w) for dx in range(w)]
    return np.stack(parts, axis=-1)


def _random_choice_window(x: np.ndarray, h: int) -> np.ndarray:
    """Windowed RandomChoice: uniform pick among valid window values.

    The reference routes RandomChoice through the brute-force path's
    calc_statistic (util.cpp:75-96, rand()-based); here a host RNG picks
    uniformly over the valid values of each window.
    """
    stack = np.sort(_window_stack_np(x, h), axis=-1)  # NaNs last
    n = np.sum(np.isfinite(stack), axis=-1)
    r = np.floor(np.random.random_sample(n.shape) * n).astype(np.int64)
    r = np.minimum(r, np.maximum(n - 1, 0))
    out = np.take_along_axis(stack, r[..., None], axis=-1)[..., 0]
    return np.where(n > 0, out, np.nan).astype(np.float32)


def neighbourhood(input, halfwidth, statistic):
    """Moving-window statistic; 2D (Y,X) or 3D (Y,X,E) input
    (neighbourhood.cpp:12-241)."""
    _check_halfwidth(halfwidth)
    statistic = int(statistic)
    if statistic == Statistic.Quantile:
        raise ValueError(
            "Use neighbourhood_quantile for computing neighbourhood quantiles")
    input = asarray_f32(input)
    if input.size == 0:
        return np.zeros((0, 0), np.float32)
    if input.ndim == 3:
        # Collapse the ensemble axis with the same statistic first
        # (neighbourhood.cpp:12-27)
        from .utils import calc_statistic as _host_stat
        if statistic == Statistic.RandomChoice:
            flat2 = np.apply_along_axis(
                lambda r: _host_stat(r, statistic), -1, input)
            return _random_choice_window(flat2.astype(np.float32),
                                         int(halfwidth))
        flat = stats_ops.nan_statistic(jnp.asarray(input), statistic, axis=-1)
        if statistic in (Statistic.Mean, Statistic.Sum, Statistic.Count,
                         Statistic.Std, Statistic.Variance):
            host = native.nb_meansum(np.asarray(flat), int(halfwidth),
                                     statistic)
            if host is not None:
                return host
        if statistic == Statistic.Median:
            host = native.nb_brute(np.asarray(flat), int(halfwidth),
                                   statistic)
            if host is not None:
                return host
        out = ops.neighbourhood(flat, int(halfwidth), statistic)
        return np.asarray(out)
    if input.ndim != 2:
        raise ValueError("input must be 2D or 3D")
    if statistic == Statistic.RandomChoice:
        return _random_choice_window(input, int(halfwidth))
    if statistic in (Statistic.Mean, Statistic.Sum, Statistic.Count,
                     Statistic.Std, Statistic.Variance):
        host = native.nb_meansum(input, int(halfwidth), statistic)
        if host is not None:
            return host
    if statistic == Statistic.Median:
        # The fast dispatch has no O(1) path for Median; use the native
        # brute kernel (neighbourhood.cpp:236-238 falls back the same way)
        host = native.nb_brute(input, int(halfwidth), statistic)
        if host is not None:
            return host
    out = ops.neighbourhood(jnp.asarray(input), int(halfwidth), statistic)
    return np.asarray(out)


def neighbourhood_brute_force(input, halfwidth, statistic):
    """Exact windowed statistic (neighbourhood.cpp:528-539)."""
    _check_halfwidth(halfwidth)
    statistic = int(statistic)
    input = asarray_f32(input)
    if input.size == 0:
        return np.zeros((0, 0), np.float32)
    if statistic == Statistic.RandomChoice:
        if input.ndim == 3:
            stacks = [_window_stack_np(input[:, :, e], int(halfwidth))
                      for e in range(input.shape[2])]
            stack = np.sort(np.concatenate(stacks, axis=-1), axis=-1)
            n = np.sum(np.isfinite(stack), axis=-1)
            r = np.minimum(
                np.floor(np.random.random_sample(n.shape) * n).astype(np.int64),
                np.maximum(n - 1, 0))
            out = np.take_along_axis(stack, r[..., None], axis=-1)[..., 0]
            return np.where(n > 0, out, np.nan).astype(np.float32)
        return _random_choice_window(input, int(halfwidth))
    if input.ndim not in (2, 3):
        raise ValueError("input must be 2D or 3D")
    host = native.nb_brute(input, int(halfwidth), statistic)
    if host is not None:
        return host
    if input.ndim == 2:
        out = ops.neighbourhood_brute_force(jnp.asarray(input),
                                            int(halfwidth), statistic)
    elif input.ndim == 3:
        out = ops.neighbourhood_brute_force_ens(jnp.asarray(input),
                                                int(halfwidth), statistic)
    else:
        raise ValueError("input must be 2D or 3D")
    return np.asarray(out)


def neighbourhood_quantile(input, quantile, halfwidth):
    """Exact windowed quantile (neighbourhood.cpp:534-539)."""
    _check_halfwidth(halfwidth)
    quantile = float(quantile)
    if np.isfinite(quantile) and (quantile < 0 or quantile > 1):
        raise ValueError(
            "calc_quantile: Quantile must be between 0 and 1 inclusive")
    input = asarray_f32(input)
    if input.size == 0:
        return np.zeros((0, 0), np.float32)
    if input.ndim not in (2, 3):
        raise ValueError("input must be 2D or 3D")
    host = native.nb_brute(input, int(halfwidth), int(Statistic.Quantile),
                           quantile)
    if host is not None:
        return host
    if input.ndim == 2:
        out = ops.neighbourhood_quantile(jnp.asarray(input), quantile,
                                         int(halfwidth))
    else:
        out = ops.neighbourhood_quantile_ens(jnp.asarray(input), quantile,
                                             int(halfwidth))
    return np.asarray(out)


def neighbourhood_quantile_fast(input, quantile, halfwidth, thresholds):
    """Threshold-CDF approximate windowed quantile
    (neighbourhood.cpp:296-527)."""
    _check_halfwidth(halfwidth)
    input = asarray_f32(input)
    thresholds = asarray_f32(thresholds, "thresholds").ravel()
    if input.size == 0:
        return np.zeros((0, 0), np.float32)
    if input.ndim not in (2, 3):
        raise ValueError("input must be 2D or 3D")
    ny, nx = input.shape[:2]
    qarr = np.asarray(quantile, dtype=np.float32)
    if qarr.ndim == 0:
        q = qarr[()]
    elif qarr.shape in ((1, 1),):
        q = qarr[0, 0]
    elif qarr.shape == (ny, nx):
        q = qarr
    else:
        raise ValueError(
            "Quantile must be the same size as input, or size (1, 1)")
    finite_q = np.asarray(q)[np.isfinite(q)] if np.ndim(q) else (
        [q] if np.isfinite(q) else [])
    if np.ndim(q):
        bad = (np.asarray(q) < 0) | (np.asarray(q) > 1)
        bad &= np.isfinite(q)
        if bad.any():
            raise ValueError("All quantiles must be >= 0 and <= 1")
    elif len(finite_q) and (finite_q[0] < 0 or finite_q[0] > 1):
        raise ValueError("All quantiles must be >= 0 and <= 1")
    if thresholds.size == 0:
        return np.full((ny, nx), MV, np.float32)
    if input.ndim == 2:
        host = native.nb_quantile_fast(
            input, int(halfwidth), thresholds,
            q if np.ndim(q) else None,
            float(q) if not np.ndim(q) else 0.0)
        if host is not None:
            return host
    out = ops.neighbourhood_quantile_fast(
        jnp.asarray(input), jnp.asarray(q), int(halfwidth),
        jnp.asarray(thresholds))
    return np.asarray(out)


def get_neighbourhood_thresholds(input, num_thresholds):
    """Sample even data quantiles for use as thresholds
    (neighbourhood.cpp:243-295)."""
    if num_thresholds <= 0:
        raise ValueError("num_thresholds must be > 0")
    input = asarray_f32(input)
    if input.size == 0:
        return np.zeros(0, np.float32)
    from .utils import calc_even_quantiles
    values = input.ravel()
    values = values[np.isfinite(values)]
    return calc_even_quantiles(np.sort(values), int(num_thresholds))


# Deprecated aliases (neighbourhood.cpp:541-552)
def neighbourhood_ens(input, halfwidth, statistic):
    return neighbourhood(input, halfwidth, statistic)


def neighbourhood_quantile_ens(input, quantile, halfwidth):
    return neighbourhood_quantile(input, quantile, halfwidth)


def neighbourhood_quantile_ens_fast(input, quantile, halfwidth, thresholds):
    return neighbourhood_quantile_fast(input, quantile, halfwidth, thresholds)
