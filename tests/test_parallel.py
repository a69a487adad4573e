"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded stencil (halo exchange over ppermute) matches
the single-chip path exactly, and that the sharded OI kernel matches the
single-device solve.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gridpp_tpu as gridpp
from gridpp_tpu.parallel import make_mesh, sharded_neighbourhood
from gridpp_tpu.ops import neighbourhood as nops


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


class TestShardedNeighbourhood:
    @pytest.mark.parametrize("h", [0, 1, 3, 7])
    @pytest.mark.parametrize("stat", [gridpp.Mean, gridpp.Min, gridpp.Max,
                                      gridpp.Count])
    def test_matches_single_chip(self, mesh, h, stat):
        rng = np.random.default_rng(42)
        ny = mesh.shape["y"] * 16
        nx = mesh.shape["x"] * 16
        x = rng.random((ny, nx)).astype(np.float32)
        x[rng.random((ny, nx)) < 0.15] = np.nan
        fn = sharded_neighbourhood(mesh, h, int(stat))
        sharded = np.asarray(fn(jnp.asarray(x)))
        single = np.asarray(nops.neighbourhood(jnp.asarray(x), h, int(stat)))
        np.testing.assert_allclose(sharded, single, atol=1e-5, equal_nan=True)

    def test_large_halo(self, mesh):
        # halo larger than a single shard row-block still works via clamp?
        rng = np.random.default_rng(0)
        ny = mesh.shape["y"] * 8
        nx = mesh.shape["x"] * 8
        x = rng.random((ny, nx)).astype(np.float32)
        h = 4  # half the tile height: halo = 4 <= tile 8
        fn = sharded_neighbourhood(mesh, h, int(gridpp.Mean))
        sharded = np.asarray(fn(jnp.asarray(x)))
        single = np.asarray(nops.neighbourhood(jnp.asarray(x), h,
                                               int(gridpp.Mean)))
        np.testing.assert_allclose(sharded, single, atol=1e-5)


class TestShardedOI:
    def test_matches_host_api(self, mesh):
        from gridpp_tpu.parallel import sharded_oi_kernel
        rng = np.random.default_rng(1)
        n = 64
        y = np.arange(n) * 500.0
        bpoints = gridpp.Points(y, np.zeros(n), np.zeros(n), np.zeros(n),
                                gridpp.Cartesian)
        p = 10
        py = rng.uniform(0, n * 500.0, p)
        points = gridpp.Points(py, np.zeros(p), np.zeros(p), np.zeros(p),
                               gridpp.Cartesian)
        structure = gridpp.BarnesStructure(2000)
        background = rng.normal(0, 1, n).astype(np.float32)
        pback = rng.normal(0, 1, p).astype(np.float32)
        pobs = pback + rng.normal(0, 0.5, p).astype(np.float32)
        ratios = np.full(p, 0.1, np.float32)
        expected = gridpp.optimal_interpolation(
            bpoints, background, points, pobs, ratios, pback, structure, 5)

        # Rebuild inputs for the sharded kernel via the API internals
        from gridpp_tpu.api.oi import _candidates, _resolved_fields
        loc = structure.localization_np(bpoints.lats, bpoints.lons)
        cand, mask = _candidates(bpoints, points, loc, 5)
        p1_all = _resolved_fields(bpoints, structure)
        o_fields = _resolved_fields(points, structure)
        cand_j = jnp.asarray(cand)
        p1 = {k: jnp.asarray(v)[:, None] for k, v in p1_all.items()}
        cand_fields = {k: jnp.take(jnp.asarray(v), cand_j, axis=0)
                       for k, v in o_fields.items()}
        kern = sharded_oi_kernel(mesh, structure, 5, True)
        out, avar = kern(
            p1, cand_fields, jnp.asarray(mask), jnp.asarray(background),
            jnp.ones(n, jnp.float32),
            jnp.take(jnp.asarray(pobs), cand_j, axis=0),
            jnp.take(jnp.asarray(pback), cand_j, axis=0),
            jnp.take(jnp.asarray(ratios), cand_j, axis=0))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
