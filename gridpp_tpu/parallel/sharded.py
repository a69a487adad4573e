"""Sharded pipeline ops: multi-chip neighbourhood stencils and OI.

- `sharded_neighbourhood`: (Y, X) field split over a ('y','x') mesh;
  halo exchange (ppermute over ICI) + the local reduce_window stencil.
  NaN halos at the domain boundary reproduce the reference's clipped
  windows, so results match the single-chip path.
- `sharded_oi_kernel`: the per-gridpoint OI solves are independent, so the
  block axis shards across all devices as pure data parallelism;
  observation arrays are replicated (they are small).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import neighbourhood as nops
from ..ops.oi import oi_block
from .halo import halo_exchange_2d

__all__ = ["sharded_neighbourhood", "sharded_oi_kernel"]


def sharded_neighbourhood(mesh: Mesh, halfwidth: int, statistic: int):
    """Build a jitted (Y, X)->(Y, X) sharded stencil for the given mesh."""
    h = int(halfwidth)
    statistic = int(statistic)

    @partial(shard_map, mesh=mesh, in_specs=P("y", "x"),
             out_specs=P("y", "x"), check_vma=False)
    def tile_fn(tile):
        padded = halo_exchange_2d(tile, h)
        out = nops.neighbourhood(padded, h, statistic)
        if h == 0:
            return out
        return out[..., h:-h, h:-h]

    return jax.jit(tile_fn)


def sharded_oi_kernel(mesh: Mesh, structure, max_points: int,
                      allow_extrapolation: bool):
    """OI block solver sharded over the gridpoint axis of the mesh.

    Inputs shaped (B, ...) are sharded on B across every mesh axis;
    observation-side fields inside cand_fields are already gathered per
    gridpoint so everything shards cleanly with no collectives.
    """
    all_axes = P(mesh.axis_names)

    def kernel(p1_fields, cand_fields, cand_valid, background, bvariance,
               obs, obs_y, ratios):
        return oi_block(structure, p1_fields, cand_fields, cand_valid,
                        background, bvariance, obs, obs_y, ratios,
                        int(max_points), bool(allow_extrapolation))

    shardings = NamedSharding(mesh, all_axes)
    jitted = jax.jit(kernel)  # jit once; re-wrapping per call would
    # discard the compilation cache (round-1 review finding)

    def wrapper(p1_fields, cand_fields, cand_valid, background, bvariance,
                obs, obs_y, ratios):
        place = lambda t: jax.device_put(t, shardings)
        args = (jax.tree.map(place, p1_fields),
                jax.tree.map(place, cand_fields), place(cand_valid),
                place(background), place(bvariance), place(obs),
                place(obs_y), place(ratios))
        return jitted(*args)

    return wrapper
