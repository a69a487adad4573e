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
                                     ((300, 129), 1), ((31, 31), 0)])
def test_matches_xla_stencil(stat, shape, h):
    x = _field(shape, seed=int(stat) + h)
    out = np.asarray(ps.neighbourhood_mean(jnp.asarray(x), h, int(stat),
                                           interpret=True))
    ref = np.asarray(nops.neighbourhood(jnp.asarray(x), h, int(stat)))
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
