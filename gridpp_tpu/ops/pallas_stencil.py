"""Pallas TPU kernels for neighbourhood (moving-window) statistics.

XLA's separable `reduce_window` materializes intermediates and runs the
window combines as HBM-level passes; these kernels stream row blocks
HBM->VMEM once, do both separable passes (values AND valid-count, so
NaN-skip semantics match ops/neighbourhood.py exactly) entirely in VMEM,
finalize the statistic in-register and write the result once: HBM
traffic is read(x) + write(out), the theoretical minimum.

Window reductions use dilated doubling (log-depth shift-combine) so
only ~log2(2h+1) value temps are live at once: Mosaic keeps every live
value temp on the kernel's VMEM stack, and a linear (2h+1)-slice chain
at h=7 overflows the 16 MB scoped limit. T-long accumulation chains
route through VMEM scratch refs for the same reason.

Kernels:
- neighbourhood_mean: Mean / Sum / Count (separable window sums).
- neighbourhood_minmax: Min / Max via dilated doubling (log2(2h+1)
  shift-combine steps per axis instead of the reference's row-sliver
  decomposition, neighbourhood.cpp:146-210).
- neighbourhood_quantile_fast: the full threshold-CDF windowed quantile
  (neighbourhood.cpp:296-527) in ONE kernel: per-threshold indicator
  window-means share a single count pass, the T CDF planes stay in VMEM,
  and the per-cell piecewise-linear inverse CDF (interpolate's
  flat-interval rules, util.cpp:377-432) happens in-register. One read
  of x, one write of the quantile field.

Edge handling is pad-free (`_load_block`): each block DMAs its halo
window straight from the original field with a clamped start, rotates
it into alignment, and NaN-masks out-of-domain rows/cols with iota
comparisons - out-of-domain cells then carry zero weight in the count,
reproducing the reference's clipped-window semantics
(neighbourhood.cpp:45-144) with no extra HBM copy. Grids smaller than
one block row window fall back to a NaN-halo pre-pad.

TPU-only (used by Pipeline and the neighbourhood ops when running on an
accelerator); every other path keeps the XLA stencil. Falls back
cleanly: `available()` gates use; interpret=True runs anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Statistic

__all__ = ["available", "use_pallas", "neighbourhood_mean",
           "neighbourhood_minmax", "neighbourhood_quantile_fast",
           "neighbourhood_var", "neighbourhood_members",
           "members_supported"]

_BY = 128  # output rows per program (bounds the VMEM working set)
_DOUBLE_BUFFER = True  # overlap next block's halo DMA with compute


def available() -> bool:
    """Pallas importable and this PROCESS has a TPU backend.

    Capability only — says nothing about where the op being traced right
    now will run. Dispatch gates must use use_pallas() instead.
    """
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return jax.default_backend() == "tpu"


def use_pallas() -> bool:
    """True when an op traced NOW will execute on the TPU backend.

    The host-pinned parity API (api/_common.pin_host) traces under
    `jax.default_device(cpu)` even on TPU machines; there pallas_call
    fails with "Only interpret mode is supported on CPU backend", so the
    gate must consult the actual execution target, not the process
    default backend. jax.default_device is part of the jit trace-context
    cache key, so host-pinned and device traces cache separately.
    """
    if not available():
        return False
    from ..api._common import on_host
    return not on_host()


def _pad_halo(x, h, by, rows, xpad, hx=None):
    """NaN-halo + block/lane/sublane padding of a (Y, X) field.

    hx: lane-axis halo width (defaults to h; the member-batched kernel
    uses h*E since its x-axis strides E lanes per grid column)."""
    hx = h if hx is None else hx
    ny = x.shape[0]
    nyb = -(-ny // by)
    xp = jnp.full((nyb * by + (rows - by), xpad), jnp.nan, jnp.float32)
    return jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32),
                                        (h, hx)), nyb


def _prep_input(x, h, by, rows, xpad, ny, nx, hx=None):
    """Choose pad-free vs pre-padded input form for the kernels.

    Pad-free needs a full (rows,) DMA window (ny >= rows) and an
    8-aligned bottom clamp (ny % 8 == 0); otherwise NaN-halo pre-pad.
    Returns (xin, xtail, n_blocks, padded). xtail is the 128-wide
    trailing-column strip for lane-unaligned nx (dummy when unused:
    Pallas input arity is static)."""
    padded = ny < rows or ny % 8 != 0
    if padded:
        xin, nyb = _pad_halo(x, h, by, rows, xpad, hx=hx)
    else:
        xin = x.astype(jnp.float32)
        nyb = -(-ny // by)
    nxd = (nx // 128) * 128
    if not padded and nxd < nx:
        xtail = jnp.full((ny, 128), jnp.nan, jnp.float32)
        xtail = jax.lax.dynamic_update_slice(
            xtail, xin[:, nxd:nx], (0, 0))
    else:
        xtail = jnp.zeros((8, 128), jnp.float32)
    return xin, xtail, nyb, padded


def _shapes(ny, nx, h, by=_BY, hx=None):
    # block height must be 8-sublane aligned: Mosaic requires output
    # block indices provably divisible by the tiling
    hx = h if hx is None else hx
    by = max(8, (min(by, max(8, ny)) // 8) * 8)
    outw = -(-nx // 128) * 128
    xpad = -(-(outw + 2 * hx) // 128) * 128
    # 8-sublane-aligned DMA slice, +8 slack rows so the pad-free path
    # can round its DMA start down to an 8-aligned row (Mosaic requires
    # provably 8-divisible HBM slice starts) and still cover the window
    rows = -(-(by + 2 * h) // 8) * 8 + 8
    return by, outw, xpad, rows


def _crop(a, n, axis):
    return a[0:n, :] if axis == 0 else a[:, 0:n]


def _shift(a, d, n, axis):
    return a[d:d + n, :] if axis == 0 else a[:, d:d + n]


def _slide_sum(v, length, axis, out_len, step=1):
    """Sliding `length`-window sum along `axis` via dilated doubling.

    out[i] = sum_{k<length} v[i+k*step], computed in ~2*log2(length)
    adds (span-doubling partial sums combined along the binary
    decomposition of `length`) instead of length-1 — log depth keeps
    only ~log2 value temps live, which is what the Mosaic VMEM stack
    can hold (a linear (2h+1)-term chain at h=7 overflows the 16 MB
    scoped limit). step>1 strides the window: the member-batched kernel
    puts E members in the minor lanes, so an x-axis window hops E lanes.
    """
    arrs = {1: v}
    span = 1
    cur = v
    while span * 2 <= length:
        n = cur.shape[axis] - span * step
        cur = _crop(cur, n, axis) + _shift(cur, span * step, n, axis)
        span *= 2
        arrs[span] = cur
    out = None
    off = 0
    for s in sorted((k for k in arrs if length & k), reverse=True):
        a = _shift(arrs[s], off * step, out_len, axis)
        out = a if out is None else out + a
        off += s
    return out


def _slide_ext(v, length, axis, out_len, op, step=1):
    """Sliding `length`-window min/max via dilated doubling + overlap.

    window(L) = combine of two power-of-two spans overlapping to cover
    L (idempotent ops tolerate the overlap, unlike sums).
    """
    span = 1
    cur = v
    while span * 2 <= length:
        n = cur.shape[axis] - span * step
        cur = op(_crop(cur, n, axis), _shift(cur, span * step, n, axis))
        span *= 2
    if span < length:
        d = (length - span) * step
        n = cur.shape[axis] - d
        cur = op(_crop(cur, n, axis), _shift(cur, d, n, axis))
    return _crop(cur, out_len, axis)


def _block_dmas(x_hbm, xtail_hbm, scratch, sem, j, slot, *, h, by, rows,
                ny, nx, padded):  # (columns need no h: halo via roll/mask)
    """DMA descriptors fetching block j's (rows, xpad) window into
    scratch[slot] (same descriptors are used to start and to wait).

    padded=True: x_hbm is the NaN-halo pre-padded buffer; plain DMA.
    padded=False: x_hbm is the ORIGINAL (ny, nx) field - no halo copy
    ever materializes in HBM. The DMA start is clamped into range and
    rounded down to the 8-sublane alignment Mosaic requires (the +8
    slack rows in `rows` keep the window covered; requires ny % 8 == 0
    so the bottom clamp stays aligned). When nx is not 128-lane-aligned,
    the last partial lane tile arrives via `xtail_hbm`, a (ny, 128)
    strip copy of the trailing columns (~1 MB, vs re-padding the whole
    field).
    """
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    if padded:
        return [pltpu.make_async_copy(
            x_hbm.at[pl.ds(j * by, rows), :], scratch.at[slot],
            sem.at[slot])]
    nxd = (nx // 128) * 128
    d0 = j * by - h               # absolute row of scratch row 0
    s0 = (jnp.clip(d0, 0, ny - rows) // 8) * 8
    dmas = []
    if nxd:
        dmas.append(pltpu.make_async_copy(
            x_hbm.at[pl.ds(s0, rows), 0:nxd],
            scratch.at[slot, :, 0:nxd], sem.at[slot]))
    if nxd < nx:
        dmas.append(pltpu.make_async_copy(
            xtail_hbm.at[pl.ds(s0, rows), :],
            scratch.at[slot, :, nxd:nxd + 128], sem.at[slot]))
    return dmas


def _load_block(x_hbm, xtail_hbm, scratch, sem, i, *, h, by, rows, ny,
                nx, padded, nblk, db=True, hx=None):
    """Double-buffered fetch of block i's window; returns (vals, ok).

    Block i+1's DMA is started before waiting on block i's (issued by
    the previous grid step), overlapping the halo load with compute.
    vals: the (rows, xpad) window rotated into halo alignment with
    out-of-domain cells NaN; ok: the in-domain mask (iota comparisons),
    also used by the callers' NaN fast-path test.
    """
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    kw = dict(h=h, by=by, rows=rows, ny=ny, nx=nx, padded=padded)

    if db and _DOUBLE_BUFFER:
        @pl.when(i == 0)
        def _():
            for dma in _block_dmas(x_hbm, xtail_hbm, scratch, sem, 0, 0,
                                   **kw):
                dma.start()

        @pl.when(i + 1 < nblk)
        def _():
            for dma in _block_dmas(x_hbm, xtail_hbm, scratch, sem, i + 1,
                                   jnp.remainder(i + 1, 2), **kw):
                dma.start()

        slot = jnp.remainder(i, 2)
        for dma in _block_dmas(x_hbm, xtail_hbm, scratch, sem, i, slot,
                               **kw):
            dma.wait()
        v = scratch[slot]
    else:
        for dma in _block_dmas(x_hbm, xtail_hbm, scratch, sem, i, 0,
                               **kw):
            dma.start()
            dma.wait()
        v = scratch[0]
    hx = h if hx is None else hx  # lane-axis halo (h*E member-batched)
    d0 = i * by - h
    if not padded:
        s0 = (jnp.clip(d0, 0, ny - rows) // 8) * 8
        v = pltpu.roll(v, shift=jnp.remainder(s0 - d0, rows), axis=0)
        if hx:
            v = pltpu.roll(v, shift=hx, axis=1)
    row_abs = d0 + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    col_abs = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) - hx
    ok = (row_abs >= 0) & (row_abs < ny) & (col_abs >= 0) & (col_abs < nx)
    if not padded:
        v = jnp.where(ok, v, jnp.nan)
    return v, ok


def _analytic_counts(i, h, by, outw, ny, nx, e=1):
    """Clipped-window valid-cell counts for a NaN-free block: the
    separable product cy*cx with cy = min(y+h, ny-1) - max(y-h, 0) + 1
    (and likewise cx) - no slide passes needed. e>1: members ride the
    minor lanes, so the grid column is lane // e and nx is the true X
    extent."""
    y = i * by + jax.lax.broadcasted_iota(jnp.int32, (by, outw), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (by, outw), 1)
    if e > 1:
        x = x // e
    cy = jnp.minimum(y + h, ny - 1) - jnp.maximum(y - h, 0) + 1
    cx = jnp.minimum(x + h, nx - 1) - jnp.maximum(x - h, 0) + 1
    return (cy * cx).astype(jnp.float32)


def _mean_kernel(x_hbm, xtail_hbm, out_ref, scratch, sem, *, h, by,
                 rows, xpad, outw, stat, ny, nx, padded, nblk):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    vals, ok = _load_block(x_hbm, xtail_hbm, scratch, sem, i, h=h, by=by,
                           rows=rows, ny=ny, nx=nx, padded=padded,
                           nblk=nblk)
    length = 2 * h + 1
    m = jnp.isfinite(vals)
    s = _slide_sum(_slide_sum(jnp.where(m, vals, 0.0), length, 0, by),
                   length, 1, outw)
    # NaN fast path: with no missing cell in the block's window, the
    # count field is the analytic clipped-window product - the second
    # slide pair (half the kernel's VPU work) is skipped.
    has_bad = jnp.any(~m & ok)
    c = jax.lax.cond(
        has_bad,
        lambda: _slide_sum(_slide_sum(m.astype(jnp.float32), length, 0,
                                      by), length, 1, outw),
        lambda: _analytic_counts(i, h, by, outw, ny, nx))
    if stat == int(Statistic.Count):
        out_ref[:] = c
    elif stat == int(Statistic.Sum):
        out_ref[:] = jnp.where(c > 0, s, jnp.nan)
    else:
        out_ref[:] = jnp.where(c > 0, s / jnp.maximum(c, 1.0), jnp.nan)


def _var_kernel(x_hbm, xtail_hbm, out_ref, scratch, sem, *, h, by,
                rows, xpad, outw, stat, ny, nx, padded, nblk):
    """Fused Std/Variance: slides of x and x^2 share one block load.

    The XLA/dispatch fallback computes two full Mean stencils (one on x,
    one on x*x: two HBM reads plus a materialized x^2 field); here the
    block is read once and var = E[x^2] - E[x]^2 finalizes in-register
    with the exact same arithmetic as the two-pass form
    (neighbourhood.cpp:211-235's unclamped expression).
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    vals, ok = _load_block(x_hbm, xtail_hbm, scratch, sem, i, h=h, by=by,
                           rows=rows, ny=ny, nx=nx, padded=padded,
                           nblk=nblk)
    length = 2 * h + 1
    m = jnp.isfinite(vals)
    v0 = jnp.where(m, vals, 0.0)
    s = _slide_sum(_slide_sum(v0, length, 0, by), length, 1, outw)
    s2 = _slide_sum(_slide_sum(v0 * v0, length, 0, by), length, 1, outw)
    has_bad = jnp.any(~m & ok)
    c = jax.lax.cond(
        has_bad,
        lambda: _slide_sum(_slide_sum(m.astype(jnp.float32), length, 0,
                                      by), length, 1, outw),
        lambda: _analytic_counts(i, h, by, outw, ny, nx))
    cden = jnp.maximum(c, 1.0)
    mean = jnp.where(c > 0, s / cden, jnp.nan)
    mean2 = jnp.where(c > 0, s2 / cden, jnp.nan)
    var = mean2 - mean * mean  # unclamped, like neighbourhood.cpp:211-235
    out_ref[:] = jnp.sqrt(var) if stat == int(Statistic.Std) else var


def _minmax_kernel(x_hbm, xtail_hbm, out_ref, scratch, sem, *, h, by,
                   rows, xpad, outw, stat, ny, nx, padded, nblk):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    vals, ok = _load_block(x_hbm, xtail_hbm, scratch, sem, i, h=h, by=by,
                           rows=rows, ny=ny, nx=nx, padded=padded,
                           nblk=nblk)
    m = jnp.isfinite(vals)
    if stat == int(Statistic.Min):
        ident, op = jnp.inf, jnp.minimum
    else:
        ident, op = -jnp.inf, jnp.maximum
    length = 2 * h + 1
    ext = _slide_ext(_slide_ext(jnp.where(m, vals, ident), length, 0, by,
                                op), length, 1, outw, op)
    out_ref[:] = jnp.where(jnp.isfinite(ext), ext, jnp.nan)

def _run_2pass(x, h, stat, kernel_fn, interpret, by=_BY):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = x.shape
    by, outw, xpad, rows = _shapes(ny, nx, h, by=by)
    xin, xtail, nyb, padded = _prep_input(x, h, by, rows, xpad, ny, nx)
    kernel = functools.partial(kernel_fn, h=h, by=by, rows=rows,
                               xpad=xpad, outw=outw, stat=stat, ny=ny,
                               nx=nx, padded=padded, nblk=nyb)
    out = pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((by, outw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, xpad), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xin, xtail)
    return out


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
    stat = int(statistic)
    if h == 0:
        m = jnp.isfinite(x)
        if stat == int(Statistic.Count):
            return m.astype(jnp.float32)
        return jnp.where(m, x, jnp.nan)
    return _run_2pass(x, h, stat, _mean_kernel, interpret)


@functools.partial(jax.jit,
                   static_argnames=("halfwidth", "statistic", "interpret"))
def neighbourhood_var(x: jax.Array, halfwidth: int, statistic: int,
                      interpret: bool = False) -> jax.Array:
    """(Y, X) NaN-skipping windowed Std/Variance via one fused kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = int(halfwidth)
    stat = int(statistic)
    if h == 0:
        m = jnp.isfinite(x)
        var = jnp.where(m, 0.0, jnp.nan)
        return var
    # three slide pairs live at once: smaller block keeps the Mosaic
    # scoped-VMEM stack under the 16 MB limit
    return _run_2pass(x, h, stat, _var_kernel, interpret, by=64)


@functools.partial(jax.jit,
                   static_argnames=("halfwidth", "statistic", "interpret"))
def neighbourhood_minmax(x: jax.Array, halfwidth: int, statistic: int,
                         interpret: bool = False) -> jax.Array:
    """(Y, X) NaN-skipping windowed Min/Max via dilated-doubling kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = int(halfwidth)
    stat = int(statistic)
    if h == 0:
        m = jnp.isfinite(x)
        return jnp.where(m, x, jnp.nan)
    return _run_2pass(x, h, stat, _minmax_kernel, interpret)


def _qf_kernel(thr_smem, q_smem, x_hbm, xtail_hbm, out_ref, scratch,
               ps_ref, sem, *, h, by, rows, xpad, outw, t, ny, nx,
               padded, nblk):
    import jax.experimental.pallas as pl

    q = q_smem[0]
    i = pl.program_id(0)
    vals, ok = _load_block(x_hbm, xtail_hbm, scratch, sem, i, h=h, by=by,
                           rows=rows, ny=ny, nx=nx, padded=padded,
                           nblk=nblk, db=True)
    length = 2 * h + 1
    m = jnp.isfinite(vals)
    has_bad = jnp.any(~m & ok)
    c = jax.lax.cond(
        has_bad,
        lambda: _slide_sum(_slide_sum(m.astype(jnp.float32), length, 0,
                                      by), length, 1, outw),
        lambda: _analytic_counts(i, h, by, outw, ny, nx))
    cden = jnp.maximum(c, 1.0)

    # Integer-domain inverse CDF. cdf_k = f32(s_k / c) where s_k (the
    # <=threshold window count) and c are exact small integers, and
    # s -> f32(s / c) is strictly increasing over the attainable range,
    # so every cdf-vs-q comparison (neighbourhood.cpp:367-404) reduces
    # to an INTEGER compare of s_k against the per-cell boundary
    #   sb = min{ s : f32(s / c) >= q },
    # computed once per cell from ceil(q * c) with a +/-1 correction
    # for the f32 rounding of the product and the division (a single
    # step each way provably suffices: consecutive ratios are >= 1/c
    # apart, far beyond f32 ulp at q <= 1). This removes the
    # per-threshold division and the T CDF planes of the previous
    # version while staying bit-identical to the XLA reference path.
    sb = jnp.ceil(q * cden)
    sb = jnp.where((sb - 1.0) / cden >= q, sb - 1.0, sb)
    sb = jnp.where(sb / cden < q, sb + 1.0, sb)
    exact_cell = sb / cden == q
    sb_i = sb.astype(jnp.int32)

    # Per-threshold window counts: the <=threshold indicators are
    # BIT-PACKED into int32 fields before the slide passes: counts fit
    # 8 bits when (2h+1)^2 <= 255 (16 bits up to h=127), so 4 (or 2)
    # threshold planes ride one register and the slide work drops by
    # the same factor. The packed slide results park in ps_ref for the
    # bracket-selection pass below. NaN cells compare False against
    # every threshold, so no explicit valid mask is needed.
    win = length * length
    density = 4 if win <= 255 else (2 if win <= 65535 else 1)
    bits = 32 // density
    fmask = (1 << bits) - 1
    groups = [list(range(k0, min(k0 + density, t)))
              for k0 in range(0, t, density)]

    def extract(ps, idx):
        if density == 1:
            return ps
        return (ps >> (bits * idx)) & fmask if idx else ps & fmask

    zi = jnp.zeros((by, outw), jnp.int32)
    left = zi
    n_eq = zi
    for g, ks in enumerate(groups):
        p = None
        for idx, k in enumerate(ks):
            ind = (vals <= thr_smem[k]).astype(jnp.int32)
            ind = ind << (bits * idx) if idx else ind
            p = ind if p is None else p + ind
        ps = _slide_sum(_slide_sum(p, length, 0, by), length, 1, outw)
        ps_ref[g] = ps
        for idx, k in enumerate(ks):
            s = extract(ps, idx)
            left = left + (s < sb_i).astype(jnp.int32)
            n_eq = n_eq + (s == sb_i).astype(jnp.int32)

    # Bracket indices (util.cpp:377-432 flat-interval rules). cdf_k == q
    # can only happen at s_k == sb when f32(sb / c) == q exactly.
    right = left + jnp.where(exact_cell, n_eq, zi)
    has_exact = right > left
    i0 = jnp.where(has_exact, left, left - 1)
    i1 = jnp.where(has_exact, right - 1, right)
    i0c = jnp.clip(i0, 0, t - 1)
    i1c = jnp.clip(i1, 0, t - 1)

    # Selection pass: re-extract the parked counts, pick the bracket
    # planes' (s, threshold) pairs; only those two get divided.
    zero = jnp.zeros((by, outw), jnp.float32)
    s0 = zi
    s1 = zi
    y0 = zero
    y1 = zero
    s_first = zi
    s_last = zi
    for g, ks in enumerate(groups):
        ps = ps_ref[g]
        for idx, k in enumerate(ks):
            s = extract(ps, idx)
            sel0 = i0c == k
            sel1 = i1c == k
            s0 = jnp.where(sel0, s, s0)
            s1 = jnp.where(sel1, s, s1)
            y0 = jnp.where(sel0, thr_smem[k], y0)
            y1 = jnp.where(sel1, thr_smem[k], y1)
            if k == 0:
                s_first = s
            if k == t - 1:
                s_last = s
    x0 = s0.astype(jnp.float32) / cden
    x1 = s1.astype(jnp.float32) / cden
    cdf0 = s_first.astype(jnp.float32) / cden
    cdf_t = s_last.astype(jnp.float32) / cden

    flat = x0 == x1
    both_edge = (i0 == 0) & (i1 == t - 1)
    y_flat = jnp.where(both_edge, (y0 + y1) * 0.5,
                       jnp.where(i0 == 0, y1,
                                 jnp.where(i1 == t - 1, y0,
                                           (y0 + y1) * 0.5)))
    dx = jnp.where(flat, 1.0, x1 - x0)
    y_lin = y0 + (y1 - y0) * (q - x0) / dx
    y = jnp.where(flat, y_flat, y_lin)
    y = jnp.where(q > cdf_t, thr_smem[t - 1], y)
    y = jnp.where(q < cdf0, thr_smem[0], y)
    # Exact-edge special cases (neighbourhood.cpp:396-401)
    y = jnp.where((q == 1.0) & (cdf0 == 1.0), thr_smem[0], y)
    y = jnp.where((q == 0.0) & (cdf_t == 0.0), thr_smem[t - 1], y)
    out_ref[:] = jnp.where(c > 0, y, jnp.nan)


@functools.partial(jax.jit,
                   static_argnames=("halfwidth", "interpret"))
def neighbourhood_quantile_fast(x: jax.Array, quantile,
                                halfwidth: int, thresholds: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """Fused threshold-CDF windowed quantile: one read, one write.

    x: (Y, X); quantile: scalar; thresholds: (T,). The host/XLA path
    (ops/neighbourhood.neighbourhood_quantile_fast) materializes T
    smoothed CDF fields; here they never leave VMEM. The T-threshold
    loop and the inverse-CDF interpolation are unrolled in-kernel
    (T is small: get_neighbourhood_thresholds defaults to ~11-20).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = int(halfwidth)
    t = int(thresholds.shape[0])
    ny, nx = x.shape
    # only ceil(t / density) packed planes park in VMEM (the T CDF
    # planes of the old two-pass form are gone), so the block height no
    # longer shrinks with T
    by = 32
    by, outw, xpad, rows = _shapes(ny, nx, h, by=by)
    xin, xtail, nyb, padded = _prep_input(x, h, by, rows, xpad, ny, nx)
    win = (2 * h + 1) ** 2
    density = 4 if win <= 255 else (2 if win <= 65535 else 1)
    ngroups = -(-t // density)
    kernel = functools.partial(_qf_kernel, h=h, by=by, rows=rows,
                               xpad=xpad, outw=outw, t=t, ny=ny, nx=nx,
                               padded=padded, nblk=nyb)
    out = pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((by, outw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, xpad), jnp.float32),  # double buffer
            pltpu.VMEM((ngroups, by, outw), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(thresholds, jnp.float32),
      jnp.asarray(quantile, jnp.float32).reshape(1), xin, xtail)
    return out


def _member_mean_kernel(x_hbm, xtail_hbm, out_ref, scratch, sem, *, h,
                        by, rows, xpad, outw, stat, ny, nx, e, padded,
                        nblk):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    vals, ok = _load_block(x_hbm, xtail_hbm, scratch, sem, i, h=h, by=by,
                           rows=rows, ny=ny, nx=nx * e, padded=padded,
                           nblk=nblk, db=False, hx=h * e)
    length = 2 * h + 1
    m = jnp.isfinite(vals)
    s = _slide_sum(_slide_sum(jnp.where(m, vals, 0.0), length, 0, by),
                   length, 1, outw, step=e)
    has_bad = jnp.any(~m & ok)
    c = jax.lax.cond(
        has_bad,
        lambda: _slide_sum(_slide_sum(m.astype(jnp.float32), length, 0,
                                      by), length, 1, outw, step=e),
        lambda: _analytic_counts(i, h, by, outw, ny, nx, e=e))
    if stat == int(Statistic.Count):
        out_ref[:] = c
    elif stat == int(Statistic.Sum):
        out_ref[:] = jnp.where(c > 0, s, jnp.nan)
    else:
        out_ref[:] = jnp.where(c > 0, s / jnp.maximum(c, 1.0), jnp.nan)


def _member_minmax_kernel(x_hbm, xtail_hbm, out_ref, scratch, sem, *, h,
                          by, rows, xpad, outw, stat, ny, nx, e, padded,
                          nblk):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    vals, ok = _load_block(x_hbm, xtail_hbm, scratch, sem, i, h=h, by=by,
                           rows=rows, ny=ny, nx=nx * e, padded=padded,
                           nblk=nblk, db=False, hx=h * e)
    m = jnp.isfinite(vals)
    if stat == int(Statistic.Min):
        ident, op = jnp.inf, jnp.minimum
    else:
        ident, op = -jnp.inf, jnp.maximum
    length = 2 * h + 1
    ext = _slide_ext(_slide_ext(jnp.where(m, vals, ident), length, 0, by,
                                op), length, 1, outw, op, step=e)
    out_ref[:] = jnp.where(jnp.isfinite(ext), ext, jnp.nan)


def _member_geom(nx, e, h):
    """(by, outw, xpad) for the batched member kernel, or None when no
    block height keeps the VMEM working set under Mosaic's scoped
    limit.

    Live VMEM ~ scratch window + ~5 rows-height dilated-span temps in
    the y pass + ~7 by-height temps in the x pass; solve for the
    largest 8-aligned by under a 13 MB budget.
    """
    nxe = nx * e
    outw = -(-nxe // 128) * 128
    xpad = -(-(outw + 2 * h * e) // 128) * 128
    budget = 13 * 2 ** 20 // 4
    fixed = (2 * h + 16) * xpad * 6
    denom = 6 * xpad + 7 * outw
    by = (budget - fixed) // max(denom, 1)
    by = min(_BY, (by // 8) * 8)
    if by < 8:
        return None
    return by, outw, xpad


def members_supported(ny, nx, e, h) -> bool:
    """True when the batched member kernel's VMEM working set fits."""
    return _member_geom(nx, e, h) is not None


@functools.partial(jax.jit,
                   static_argnames=("halfwidth", "statistic", "interpret"))
def neighbourhood_members(x: jax.Array, halfwidth: int, statistic: int,
                          interpret: bool = False) -> jax.Array:
    """(Y, X, E) windowed statistic over (Y, X) for EVERY member in ONE
    fused kernel (Mean/Sum/Count/Min/Max).

    The member axis stays in the minor lanes, so each member's x-axis
    window hops E lanes (_slide_sum step=E) and the whole member stack
    costs a single HBM read + write. The per-member unrolled form
    re-reads the interleaved (Y, X, E) buffer's cache lines for every
    member: E separate HBM sweeps (EnsiPipeline's smoothing stage,
    VERDICT r3 stretch task).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx, e = x.shape
    h = int(halfwidth)
    stat = int(statistic)
    if h == 0:
        m = jnp.isfinite(x)
        if stat == int(Statistic.Count):
            return m.astype(jnp.float32)
        return jnp.where(m, x, jnp.nan)
    nxe = nx * e
    x2 = x.reshape(ny, nxe)
    geom = _member_geom(nx, e, h)
    if geom is None:
        raise ValueError(
            "neighbourhood_members: VMEM working set too large for "
            f"(ny={ny}, nx={nx}, e={e}, h={h}); gate with "
            "members_supported()")
    by, outw, xpad, rows = _shapes(ny, nxe, h, by=geom[0], hx=h * e)
    xin, xtail, nyb, padded = _prep_input(x2, h, by, rows, xpad, ny, nxe,
                                          hx=h * e)
    if stat in (int(Statistic.Min), int(Statistic.Max)):
        kernel_fn = _member_minmax_kernel
    else:
        kernel_fn = _member_mean_kernel
    kernel = functools.partial(kernel_fn, h=h, by=by, rows=rows,
                               xpad=xpad, outw=outw, stat=stat, ny=ny,
                               nx=nx, e=e, padded=padded, nblk=nyb)
    out = pl.pallas_call(
        kernel,
        grid=(nyb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((by, outw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ny, nxe), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, rows, xpad), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(xin, xtail)
    return out.reshape(ny, nx, e)
