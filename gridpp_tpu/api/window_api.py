"""window API wrapper (reference src/api/window.cpp)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import Statistic
from ..ops.window import window as window_op
from .. import native
from ._common import asarray_f32

__all__ = ["window"]


def window(array, length, statistic, before=False, keep_missing=False,
           missing_edges=True):
    """Running statistic along time for each case row (window.cpp:6-156).

    array: (Case, Time). Centered windows require odd length unless
    `before` (trailing window) is set.
    """
    if length <= 0:
        raise ValueError("Length variable must be > 0")
    array = asarray_f32(array)
    if array.ndim != 2:
        raise ValueError("array must be 2D")
    if array.size == 0:
        # Reference: zero case rows collapse to (0, 0); zero time columns
        # keep their shape (window.cpp via tests test_no_cases/no_times)
        if array.shape[0] == 0:
            return np.zeros((0, 0), np.float32)
        return np.zeros(array.shape, np.float32)
    if length % 2 == 0 and not before:
        raise ValueError("Length variable must be an odd number")
    statistic = int(statistic)
    if statistic in (Statistic.Mean, Statistic.Sum, Statistic.Count):
        host = native.window_run(array, int(length), statistic,
                                 bool(before), bool(keep_missing),
                                 bool(missing_edges))
        if host is not None:
            return host
    out = window_op(jnp.asarray(array), int(length), statistic,
                    bool(before), bool(keep_missing), bool(missing_edges))
    return np.asarray(out)
