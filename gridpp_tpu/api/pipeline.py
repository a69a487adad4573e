"""Fused post-processing pipeline: the production serving path.

The numpy-in/numpy-out functions round-trip every intermediate field
through host memory. Production pipelines (and the BASELINE north star)
chain downscale -> calibrate -> neighbourhood -> OI on the same grid every
forecast cycle; `Pipeline` compiles that chain into ONE device program
with all geometry device-resident, so a cycle costs a single
background-field upload and a single analysis download.

The expensive part of OI — evaluating the structure function against
every observation and keeping the top max_points (oi.cpp:221-281) — is
pure geometry: it depends on the grid, the obs network and the structure
function, none of which change between forecast cycles. `Pipeline`
therefore runs that selection ONCE at construction (on device) and caches
a per-gridpoint shortlist of the `candidates` highest-rho observations.
Each call then only masks candidates whose obs values are invalid this
cycle, re-selects the top max_points among survivors, assembles the
S x S local covariances and batch-solves. This matches the reference
exactly whenever at least max_points of the shortlisted candidates carry
valid observations (candidates > max_points provides the slack; a fully
static network with valid obs is bit-identical to the dense path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Statistic
from ..core.grid import Grid
from ..core.points import Points
from ..ops import neighbourhood as nops
from ..ops.oi import make_oi_select_sweep, oi_block_from_candidates
from .oi import _device_fields, _origin

__all__ = ["Pipeline"]


class Pipeline:
    """Neighbourhood-smooth + deterministic OI, fused on device.

    Parameters mirror the individual API calls:
      grid: background Grid
      points: observation Points (static network)
      structure: StructureFunction for the OI
      halfwidth/statistic: neighbourhood filter settings (halfwidth=0
        disables smoothing)
      max_points: OI localization cap
      candidates: size of the cached geometric shortlist per gridpoint
        (>= max_points; the extra slots absorb observations that go
        missing in a given cycle). Default 2x max_points.
    """

    def __init__(self, grid: Grid, points: Points, structure,
                 halfwidth: int = 0, statistic: int = Statistic.Mean,
                 max_points: int = 10, allow_extrapolation: bool = True,
                 block: int = 16384, candidates: int | None = None):
        self.grid = grid
        self.points = points
        self.structure = structure
        self.shape = tuple(grid.size())
        bpoints = grid.to_points()
        origin = _origin(bpoints)
        p1 = _device_fields(bpoints, structure, origin)
        obs_fields = self._obs_fields = _device_fields(points, structure,
                                                       origin)
        # device gather map: grid cell containing each obs point
        obs_nn = self._obs_nn = jnp.asarray(
            grid.nearest_map(points.lats, points.lons, cache_obj=points))
        n = self.shape[0] * self.shape[1]
        n_obs = points.size()
        halfwidth = int(halfwidth)
        statistic = int(statistic)
        max_points = int(max_points)
        allow = bool(allow_extrapolation)
        if candidates is None:
            candidates = 2 * max_points if max_points > 0 else n_obs
        k_cap = max(1, min(int(candidates), n_obs))

        # One-time geometric selection sweep (the OI hot loop's radius
        # query + top-k, oi.cpp:221-281, amortized across cycles).
        select = make_oi_select_sweep(structure, k_cap, block)
        sel, rho, valid = select(p1, obs_fields)

        nb = -(-n // block)
        pad = nb * block - n

        def pad_to(v, fill):
            if not pad:
                return v
            return jnp.concatenate(
                [v, jnp.full((pad,) + v.shape[1:], fill, v.dtype)])

        # Padded + pre-blocked shortlist, kept device-resident across calls.
        self._cand = jax.block_until_ready((
            pad_to(sel, 0).reshape(nb, block, k_cap),
            pad_to(rho, 0).reshape(nb, block, k_cap),
            pad_to(valid, False).reshape(nb, block, k_cap)))
        shape = self.shape
        struct = structure

        @jax.jit
        def run(background, pobs, pratios, sel_c, rho_c, val_c,
                obs_fields, obs_nn):
            smoothed = background
            if halfwidth > 0:
                smoothed = nops.neighbourhood(background, halfwidth,
                                              statistic)
            flat = smoothed.reshape(-1)
            pback = jnp.take(flat, obs_nn)
            bg = pad_to(flat, jnp.nan).reshape(nb, block)

            def body(args):
                selc, rhoc, valc, bgc = args
                out, _ = oi_block_from_candidates(
                    struct, selc, rhoc, valc, obs_fields, bgc,
                    jnp.ones_like(bgc), pobs, pback, pratios,
                    max_points, allow)
                return out

            out = jax.lax.map(body, (sel_c, rho_c, val_c, bg))
            return out.reshape(-1)[:n].reshape(shape)

        self._run = lambda b, o, r: run(b, o, r, *self._cand,
                                        self._obs_fields, self._obs_nn)

    def __call__(self, background, pobs, pratios):
        """background: (Y, X); pobs/pratios: (P,). Returns (Y, X)."""
        background = jnp.asarray(np.asarray(background, np.float32))
        pobs = jnp.asarray(np.asarray(pobs, np.float32))
        pratios = jnp.asarray(np.asarray(pratios, np.float32))
        return np.asarray(self._run(background, pobs, pratios))

    def run_device(self, background, pobs, pratios):
        """Device-to-device variant (no host transfers)."""
        return self._run(background, pobs, pratios)
