"""Pallas stencil kernel vs the XLA reduce_window path.

Runs in Pallas interpreter mode so the kernel's semantics (NaN skipping,
clipped edges, block/lane padding) are exercised on the CPU test mesh;
the real-TPU timing lives in BENCH_OPS.md.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gridpp_tpu.constants import Statistic
from gridpp_tpu.ops import neighbourhood as nops
from gridpp_tpu.ops import pallas_stencil as ps


def _field(shape, seed=0, nan_frac=0.1):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 10, shape).astype(np.float32)
    x[rng.random(shape) < nan_frac] = np.nan
    return x


@pytest.mark.parametrize("stat", [Statistic.Mean, Statistic.Sum,
                                  Statistic.Count])
@pytest.mark.parametrize("shape,h", [((40, 60), 3), ((17, 250), 7),
                                     ((300, 129), 1), ((31, 31), 0),
                                     # pad-free edge path (ny % 8 == 0,
                                     # ny >= rows) incl. unaligned nx
                                     ((256, 129), 7), ((160, 128), 3),
                                     ((256, 300), 7)])
def test_matches_xla_stencil(stat, shape, h):
    x = _field(shape, seed=int(stat) + h)
    out = np.asarray(ps.neighbourhood_mean(jnp.asarray(x), h, int(stat),
                                           interpret=True))
    ref = np.asarray(nops.neighbourhood(jnp.asarray(x), h, int(stat)))
    # atol: the kernel's dilated-tree summation order differs from
    # reduce_window's; both are exact local sums, rounding differs
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("stat", [Statistic.Min, Statistic.Max])
@pytest.mark.parametrize("shape,h", [((40, 60), 3), ((17, 250), 7),
                                     ((300, 129), 1), ((31, 31), 0),
                                     ((64, 64), 5), ((256, 129), 7),
                                     ((160, 128), 3)])
def test_minmax_matches_xla_stencil(stat, shape, h):
    x = _field(shape, seed=int(stat) + h)
    out = np.asarray(ps.neighbourhood_minmax(jnp.asarray(x), h, int(stat),
                                             interpret=True))
    ref = np.asarray(nops.neighbourhood(jnp.asarray(x), h, int(stat)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
@pytest.mark.parametrize("shape,h,t", [((40, 60), 3, 11), ((17, 140), 7, 5),
                                       ((33, 33), 2, 20), ((24, 24), 0, 7),
                                       ((64, 130), 7, 11),
                                       ((56, 128), 3, 5)])
def test_quantile_fast_matches_xla(q, shape, h, t):
    x = _field(shape, seed=h + t)
    thresholds = np.quantile(x[np.isfinite(x)],
                             np.linspace(0, 1, t)).astype(np.float32)
    out = np.asarray(ps.neighbourhood_quantile_fast(
        jnp.asarray(x), q, h, jnp.asarray(thresholds), interpret=True))
    ref = np.asarray(nops.neighbourhood_quantile_fast(
        jnp.asarray(x), q, h, jnp.asarray(thresholds)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_quantile_fast_all_nan_region():
    x = _field((40, 50), seed=3)
    x[10:20, 10:30] = np.nan
    thresholds = np.linspace(-30, 30, 9).astype(np.float32)
    out = np.asarray(ps.neighbourhood_quantile_fast(
        jnp.asarray(x), 0.5, 2, jnp.asarray(thresholds), interpret=True))
    ref = np.asarray(nops.neighbourhood_quantile_fast(
        jnp.asarray(x), 0.5, 2, jnp.asarray(thresholds)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_all_nan():
    x = np.full((20, 30), np.nan, np.float32)
    out = np.asarray(ps.neighbourhood_mean(jnp.asarray(x), 2,
                                           int(Statistic.Mean),
                                           interpret=True))
    assert np.isnan(out).all()
    cnt = np.asarray(ps.neighbourhood_mean(jnp.asarray(x), 2,
                                           int(Statistic.Count),
                                           interpret=True))
    np.testing.assert_array_equal(cnt, np.zeros_like(cnt))
