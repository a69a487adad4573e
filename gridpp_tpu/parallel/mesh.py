"""Device-mesh helpers.

The natural decomposition for gridded post-processing is spatial: the
(Y, X) grid splits over a 2-D ('y', 'x') mesh; neighbourhood stencils and
OI localization need halo exchange between neighbouring shards (the
framework's sequence-parallel analogue, SURVEY.md section 2d/5), while
per-gridpoint OI solves are embarrassingly parallel (the data-parallel
axis).
"""
from __future__ import annotations

import math

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_names=("y", "x")) -> Mesh:
    """2-D mesh over the first n devices, as square as the count allows."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    ny = int(math.sqrt(n_devices))
    while n_devices % ny != 0:
        ny -= 1
    nx = n_devices // ny
    import numpy as np
    arr = np.array(devices).reshape(ny, nx)
    return Mesh(arr, axis_names)
