"""1-D running-window statistics along the last axis (timeseries).

Reference src/api/window.cpp: running-sum trick for Mean/Sum/Count, brute
force otherwise, with `before`/`keep_missing`/`missing_edges` flags. Here
the running sums are cumsum-based (one pass, all rows batched) and the
brute path is a single-gather window stack.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import Statistic
from .stats import nan_statistic

__all__ = ["window"]


def _start_end(x_idx, length: int, before: bool, nx: int):
    if before:
        start = jnp.maximum(0, x_idx - length + 1)
        end = x_idx
    else:
        start = jnp.maximum(0, x_idx - length // 2)
        end = jnp.minimum(nx - 1, x_idx + length // 2)
    return start, end


@partial(jax.jit, static_argnames=("length", "statistic", "before",
                                   "keep_missing", "missing_edges"))
def window(array: jax.Array, length: int, statistic: int, before: bool,
           keep_missing: bool, missing_edges: bool) -> jax.Array:
    """array: (..., X). Returns same shape (window.cpp:6-156)."""
    statistic = int(statistic)
    nx = array.shape[-1]
    x_idx = jnp.arange(nx)
    start, end = _start_end(x_idx, length, before, nx)

    valid = jnp.isfinite(array)
    if statistic in (Statistic.Mean, Statistic.Sum, Statistic.Count):
        csum = jnp.cumsum(jnp.where(valid, array, 0), axis=-1)
        ccnt = jnp.cumsum(valid.astype(jnp.float32), axis=-1)
        sum_e = jnp.take(csum, end, axis=-1)
        cnt_e = jnp.take(ccnt, end, axis=-1)
        sum_s = jnp.where(start > 0,
                          jnp.take(csum, jnp.maximum(start - 1, 0), axis=-1),
                          0)
        cnt_s = jnp.where(start > 0,
                          jnp.take(ccnt, jnp.maximum(start - 1, 0), axis=-1),
                          0)
        wsum = sum_e - sum_s
        wcnt = cnt_e - cnt_s
        if statistic == Statistic.Count:
            return wcnt
        out = jnp.where(wcnt != 0,
                        wsum / wcnt if statistic == Statistic.Mean else wsum,
                        jnp.nan)
        if keep_missing:
            full = (end - (start - 1)).astype(jnp.float32)
            out = jnp.where(wcnt < full, jnp.nan, out)
        if missing_edges:
            if before:
                edge = x_idx < length - 1
            else:
                edge = (x_idx < length // 2) | (x_idx + length // 2 + 1 > nx)
            out = jnp.where(edge, jnp.nan, out)
        return out

    # Brute force: stack the window along a new axis via one gather
    w = min(length if before else 2 * (length // 2) + 1, 2 * nx)
    if before:
        offsets = jnp.arange(-length + 1, 1)
    else:
        offsets = jnp.arange(-(length // 2), length // 2 + 1)
    idx = x_idx[:, None] + offsets[None, :]
    in_range = (idx >= 0) & (idx < nx)
    idx_c = jnp.clip(idx, 0, nx - 1)
    stack = jnp.take(array, idx_c, axis=-1)  # (..., X, W)
    stack = jnp.where(in_range, stack, jnp.nan)
    # count_missing counts invalid among in-range elements only
    missing = jnp.sum(in_range & ~jnp.take(valid, idx_c, axis=-1), axis=-1)
    out = nan_statistic(stack, statistic, axis=-1)
    if keep_missing:
        out = jnp.where(missing > 0, jnp.nan, out)
    if missing_edges:
        if before:
            outside = x_idx - length + 1 < 0
        else:
            outside = (x_idx - length // 2 < 0) | (x_idx + length // 2 > nx - 1)
        out = jnp.where(outside, jnp.nan, out)
    return out
