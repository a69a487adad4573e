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

_BY = 128  # output rows per program (bounds the VMEM working set)


def available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return jax.default_backend() == "tpu"


def _kernel(x_hbm, outv_ref, outc_ref, scratch, accv, accc, sem, *, h, by,
            rows, xpad, outw, stat):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    # `rows` = by + 2h rounded up to the 8-sublane tiling (Mosaic
    # requires 8-aligned DMA slice shapes); the extra rows are NaN
    # padding in the source and are never read by the window slices.
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * by, rows), :], scratch, sem)
    dma.start()
    dma.wait()

    vals = scratch[:]
    m = jnp.isfinite(vals)
    v0 = jnp.where(m, vals, 0.0)
    c0 = m.astype(jnp.float32)

    # y pass: (rows, xpad) -> (by, xpad). Accumulate through VMEM refs:
    # value-level tree sums would keep every slice temp live on the
    # Mosaic stack (>16 MB VMEM at h=7).
    accv[:] = v0[0:by, :]
    accc[:] = c0[0:by, :]
    for k in range(1, 2 * h + 1):
        accv[:] = accv[:] + v0[k:k + by, :]
        accc[:] = accc[:] + c0[k:k + by, :]

    # x pass: (by, xpad) -> (by, outw), accumulated straight into the
    # two output refs (sum, count); the Mean/Sum/Count finalization is a
    # trivially-fused XLA elementwise outside the kernel
    sv = accv[:]
    sc = accc[:]
    outv_ref[:] = sv[:, 0:outw]
    outc_ref[:] = sc[:, 0:outw]
    for k in range(1, 2 * h + 1):
        outv_ref[:] = outv_ref[:] + sv[:, k:k + outw]
        outc_ref[:] = outc_ref[:] + sc[:, k:k + outw]


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
    xpad = -(-(outw + 2 * h) // 128) * 128
    rows = -(-(by + 2 * h) // 8) * 8  # 8-sublane-aligned DMA slice
    # NaN border: h rows/cols of halo + block/lane/sublane padding
    xp = jnp.full((nyb * by + (rows - by), xpad), jnp.nan, jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (h, h))

    kernel = functools.partial(_kernel, h=h, by=by, rows=rows, xpad=xpad,
                               outw=outw, stat=int(statistic))
    ospec = pl.BlockSpec((by, outw), lambda i: (i, 0))
    oshape = jax.ShapeDtypeStruct((nyb * by, outw), jnp.float32)
    s, c = pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(ospec, ospec),
        out_shape=(oshape, oshape),
        scratch_shapes=[
            pltpu.VMEM((rows, xpad), jnp.float32),
            pltpu.VMEM((by, xpad), jnp.float32),
            pltpu.VMEM((by, xpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    s = s[:ny, :nx]
    c = c[:ny, :nx]
    if int(statistic) == int(Statistic.Count):
        return c
    if int(statistic) == int(Statistic.Sum):
        return jnp.where(c > 0, s, jnp.nan)
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), jnp.nan)
