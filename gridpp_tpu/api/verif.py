"""neighbourhood_score — fuzzy verification (reference
src/api/neighbourhood_score.cpp) — plus binding-parity test functions
(reference src/api/swig.cpp, used by the reference's typemap tests).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import swig_default_value
from ..ops import curves as curve_ops
from ..ops import neighbourhood as nops
from ._common import asarray_f32, check_grid_compatible

__all__ = ["neighbourhood_score"]


def neighbourhood_score(grid, points, fcst, ref, half_width, metric,
                        threshold):
    """Fuzzy neighbourhood verification score per cell
    (neighbourhood_score.cpp:6-60)."""
    fcst = asarray_f32(fcst)
    check_grid_compatible(grid, fcst)
    if half_width <= 0:
        raise ValueError("half_width must be greater than 0")
    from .gridding import gridding_nearest
    from ..constants import Statistic
    ref_grid = gridding_nearest(grid, points, ref, 1, Statistic.Mean)
    both = np.isfinite(ref_grid) & np.isfinite(fcst)
    fpos = fcst > threshold
    rpos = ref_grid > threshold
    a = (both & fpos & rpos).astype(np.float32)
    b = (both & fpos & ~rpos).astype(np.float32)
    c = (both & ~fpos & rpos).astype(np.float32)
    d = (both & ~fpos & ~rpos).astype(np.float32)
    h = int(half_width)
    stat = int(Statistic.Mean)
    a_h = nops.neighbourhood(jnp.asarray(a), h, stat)
    b_h = nops.neighbourhood(jnp.asarray(b), h, stat)
    c_h = nops.neighbourhood(jnp.asarray(c), h, stat)
    d_h = nops.neighbourhood(jnp.asarray(d), h, stat)
    out = curve_ops.calc_score(a_h, b_h, c_h, d_h, int(metric))
    return np.asarray(out, np.float32)


# --- binding-parity test functions (swig.cpp) --------------------------
def test_vec_input(input):
    return float(np.sum(np.asarray(input, np.float32)))


def test_ivec_input(input):
    return int(np.sum(np.asarray(input, np.int64)))


def test_vec2_input(input):
    return float(np.sum(np.asarray(input, np.float32)))


def test_vec3_input(input):
    return float(np.sum(np.asarray(input, np.float32)))


def test_vec_output():
    return np.full(3, swig_default_value, np.float32)


def test_vec2_output():
    return np.full((3, 3), swig_default_value, np.float32)


def test_vec3_output():
    return np.full((3, 3, 3), swig_default_value, np.float32)


def test_ivec_output():
    return np.full(3, int(swig_default_value), np.int32)


def test_ivec2_output():
    return np.full((3, 3), int(swig_default_value), np.int32)


def test_ivec3_output():
    return np.full((3, 3, 3), int(swig_default_value), np.int32)


def test_vec_argout():
    return 0.0, np.full(10, swig_default_value, np.float32)


def test_vec2_argout():
    return 0.0, np.full((10, 10), swig_default_value, np.float32)


def test_array(v, n=None):
    """Identity over a raw array (swig.cpp:6-11, coverage-only)."""
    return np.asarray(v, np.float32)


def test_not_implemented_exception():
    raise NotImplementedError("Not implemented")
