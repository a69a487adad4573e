"""Fused post-processing pipeline: the production serving path.

The numpy-in/numpy-out functions round-trip every intermediate field
through host memory. Production pipelines (and the BASELINE north star)
chain downscale -> calibrate -> neighbourhood -> OI on the same grid every
forecast cycle; `Pipeline` compiles that chain into ONE device program
with all geometry device-resident, so a cycle costs a single
background-field upload and a single analysis download.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Statistic
from ..core.grid import Grid
from ..core.points import Points
from ..ops import neighbourhood as nops
from ..ops.oi import oi_block_dense
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
    """

    def __init__(self, grid: Grid, points: Points, structure,
                 halfwidth: int = 0, statistic: int = Statistic.Mean,
                 max_points: int = 10, allow_extrapolation: bool = True,
                 block: int = 16384):
        self.grid = grid
        self.points = points
        self.structure = structure
        self.shape = tuple(grid.size())
        bpoints = grid.to_points()
        origin = _origin(bpoints)
        self._p1 = _device_fields(bpoints, structure, origin)
        self._obs_fields = _device_fields(points, structure, origin)
        # device gather map: grid cell containing each obs point
        self._obs_nn = jnp.asarray(
            grid.nearest_map(points.lats, points.lons, cache_obj=points))
        n = self.shape[0] * self.shape[1]
        halfwidth = int(halfwidth)
        statistic = int(statistic)
        max_points = int(max_points)
        allow = bool(allow_extrapolation)
        p1 = self._p1
        obs_fields = self._obs_fields
        obs_nn = self._obs_nn
        nb = -(-n // block)
        pad = nb * block - n
        shape = self.shape
        struct = structure

        @jax.jit
        def run(background, pobs, pratios):
            smoothed = background
            if halfwidth > 0:
                smoothed = nops.neighbourhood(background, halfwidth,
                                              statistic)
            flat = smoothed.reshape(-1)
            pback = jnp.take(flat, obs_nn)

            def pad_to(v):
                return jnp.concatenate(
                    [v, jnp.full((pad,), jnp.nan, v.dtype)]) if pad else v

            p1s = {k: pad_to(v).reshape(nb, block, 1)
                   for k, v in p1.items()}
            bg = pad_to(flat).reshape(nb, block)

            def body(args):
                p1c, bgc = args
                out, _ = oi_block_dense(
                    struct, p1c, obs_fields, bgc, jnp.ones_like(bgc),
                    pobs, pback, pratios, max_points, allow)
                return out

            out = jax.lax.map(body, (p1s, bg))
            return out.reshape(-1)[:n].reshape(shape)

        self._run = run

    def __call__(self, background, pobs, pratios):
        """background: (Y, X); pobs/pratios: (P,). Returns (Y, X)."""
        background = jnp.asarray(np.asarray(background, np.float32))
        pobs = jnp.asarray(np.asarray(pobs, np.float32))
        pratios = jnp.asarray(np.asarray(pratios, np.float32))
        return np.asarray(self._run(background, pobs, pratios))

    def run_device(self, background, pobs, pratios):
        """Device-to-device variant (no host transfers)."""
        return self._run(background, pobs, pratios)
