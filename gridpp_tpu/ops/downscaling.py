"""Device-side downscaling kernels: pure gathers and blends.

The reference's nearest/bilinear downscalers do an R-tree lookup per output
cell inside an OMP loop (reference nearest.cpp:20-69, bilinear.cpp:43-52).
Here all spatial search happens at precompute time (core/index.py,
core/bilinear_weights.py); these functions are the jittable apply step:
XLA gathers over flattened input fields, batched over arbitrary leading
axes (time, ensemble) at no extra cost.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def gather_flat(values: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Gather along the flattened trailing (Y,X) axes.

    values: (..., Y, X); flat_idx: int array of any shape N*.
    Returns (..., *N) with the trailing spatial axes replaced by N*'s shape.
    """
    lead = values.shape[:-2]
    flatv = values.reshape(lead + (-1,))
    return jnp.take(flatv, flat_idx, axis=-1)


@jax.jit
def nearest_apply(values: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Nearest-neighbour downscale (nearest.cpp) as a pure gather."""
    return gather_flat(values, flat_idx)


@jax.jit
def bilinear_apply(values, p1, p2, p3, p4, nn, s, t, inside):
    """Bilinear blend with NaN-corner and outside-domain NN fallback.

    Implements bilinear.cpp:262-330: value = P1(1-s)(1-t) + P2 s(1-t)
    + P3 (1-s)t + P4 s t, falling back to the nearest neighbour when any
    corner value is invalid or the point is outside the domain.
    values: (..., Y, X); index/weight arrays share shape N*.
    """
    v1 = gather_flat(values, p1)
    v2 = gather_flat(values, p2)
    v3 = gather_flat(values, p3)
    v4 = gather_flat(values, p4)
    vnn = gather_flat(values, nn)
    blend = (v1 * (1 - s) * (1 - t) + v2 * s * (1 - t)
             + v3 * (1 - s) * t + v4 * s * t)
    corners_valid = (jnp.isfinite(v1) & jnp.isfinite(v2)
                     & jnp.isfinite(v3) & jnp.isfinite(v4))
    return jnp.where(inside & corners_valid, blend, vnn)


@partial(jax.jit, static_argnames=("comparison",))
def downscale_probability_apply(values, flat_idx, threshold, comparison: int):
    """NN-downscaled ensemble exceedance probability.

    Reference downscale_probability.cpp:7-64: gather the ensemble at the
    nearest input cell, compare each member to the output-cell threshold,
    return the fraction of valid members satisfying the comparison
    (NaN where no valid members).
    values: (E, Y, X); flat_idx/threshold: output-shaped.
    """
    from ..constants import ComparisonOperator
    g = gather_flat(values, flat_idx)  # (E, *out)
    valid = jnp.isfinite(g)
    comparison = int(comparison)
    if comparison == ComparisonOperator.Lt:
        hit = g < threshold
    elif comparison == ComparisonOperator.Leq:
        hit = g <= threshold
    elif comparison == ComparisonOperator.Gt:
        hit = g > threshold
    elif comparison == ComparisonOperator.Geq:
        hit = g >= threshold
    else:
        raise ValueError("Unknown comparison operator")
    num = jnp.sum(hit & valid, axis=0).astype(values.dtype)
    den = jnp.sum(valid, axis=0)
    return jnp.where(den > 0, num / jnp.maximum(den, 1), jnp.nan)


def compare(values, threshold, comparison: int):
    """Elementwise ComparisonOperator evaluation."""
    from ..constants import ComparisonOperator
    comparison = int(comparison)
    if comparison == ComparisonOperator.Lt:
        return values < threshold
    if comparison == ComparisonOperator.Leq:
        return values <= threshold
    if comparison == ComparisonOperator.Gt:
        return values > threshold
    if comparison == ComparisonOperator.Geq:
        return values >= threshold
    raise ValueError("Unknown comparison operator")
