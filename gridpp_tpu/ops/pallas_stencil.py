"""Pallas TPU kernel for the neighbourhood mean/sum/count stencil.

XLA's separable `reduce_window` materializes the intermediate pass and
runs the window adds as HBM-level passes (~1.7 ms for 2048^2 h=7, ~19
GB/s effective). This kernel streams row blocks HBM->VMEM once, does
both separable passes (values AND valid-count, so NaN-skip semantics
match ops/neighbourhood.py exactly) entirely in VMEM, and writes the
result once: HBM traffic is the theoretical minimum read+write.

The input is NaN-padded by `h` on all sides before the call, so edge
blocks need no clamping: out-of-domain cells carry zero weight in the
count, reproducing the reference's clipped-window semantics
(neighbourhood.cpp:45-144).

TPU-only (used by Pipeline when it runs on an accelerator); every other
path keeps the XLA stencil. Falls back cleanly: `available()` gates use.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Statistic

__all__ = ["available", "neighbourhood_mean"]

_BY = 256  # output rows per program


def available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return jax.default_backend() == "tpu"


def _kernel(x_hbm, out_ref, scratch, sem, *, h, by, xpad, outw, stat):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * by, by + 2 * h), :], scratch, sem)
    dma.start()
    dma.wait()

    vals = scratch[:]
    m = jnp.isfinite(vals)
    v0 = jnp.where(m, vals, 0.0)
    c0 = m.astype(jnp.float32)

    # y pass: (by + 2h, xpad) -> (by, xpad), unrolled static slices
    sv = v0[0:by, :]
    sc = c0[0:by, :]
    for k in range(1, 2 * h + 1):
        sv = sv + v0[k:k + by, :]
        sc = sc + c0[k:k + by, :]

    # x pass: (by, xpad) -> (by, outw)
    ov = sv[:, 0:outw]
    oc = sc[:, 0:outw]
    for k in range(1, 2 * h + 1):
        ov = ov + sv[:, k:k + outw]
        oc = oc + sc[:, k:k + outw]

    if stat == int(Statistic.Count):
        out_ref[:] = oc
    elif stat == int(Statistic.Sum):
        out_ref[:] = jnp.where(oc > 0, ov, jnp.nan)
    else:  # Mean
        out_ref[:] = jnp.where(oc > 0, ov / jnp.maximum(oc, 1.0), jnp.nan)


@functools.partial(jax.jit,
                   static_argnames=("halfwidth", "statistic", "interpret"))
def neighbourhood_mean(x: jax.Array, halfwidth: int,
                       statistic: int = int(Statistic.Mean),
                       interpret: bool = False) -> jax.Array:
    """(Y, X) NaN-skipping windowed Mean/Sum/Count via one fused kernel.

    interpret=True runs the Pallas interpreter (any backend; used by the
    CPU test suite for parity coverage)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = int(halfwidth)
    if h == 0:
        m = jnp.isfinite(x)
        if int(statistic) == int(Statistic.Count):
            return m.astype(jnp.float32)
        return jnp.where(m, x, jnp.nan)
    ny, nx = x.shape
    by = min(_BY, max(8, ny))
    nyb = -(-ny // by)
    outw = -(-nx // 128) * 128
    xpad = outw + 2 * h
    # NaN border: h rows/cols of halo + block/lane alignment padding
    xp = jnp.full((nyb * by + 2 * h, xpad), jnp.nan, jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (h, h))

    kernel = functools.partial(_kernel, h=h, by=by, xpad=xpad, outw=outw,
                               stat=int(statistic))
    out = pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((by, outw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nyb * by, outw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((by + 2 * h, xpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:ny, :nx]
