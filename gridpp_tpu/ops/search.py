"""neighbourhood_search device op (reference neighbourhood_search.cpp).

Conditional neighbourhood mean with a scan-order-dependent fallback:
cells inside [target_min, target_max] are averaged; if none exist, the
value at the in-window cell whose search value is closest to the target
range is used - but only cells appearing BEFORE the first in-target cell
in row-major scan order are eligible (reproducing the reference's
`else if (counter > 0) continue` short-circuit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .neighbourhood import _window_stack

__all__ = ["neighbourhood_search"]


@partial(jax.jit, static_argnames=("halfwidth", "use_apply"))
def neighbourhood_search(array, search_array, halfwidth: int,
                         target_min, target_max, delta,
                         apply_array, use_apply: bool):
    h = int(halfwidth)
    a_stack = _window_stack(array, h)          # (Y, X, W)
    s_stack = _window_stack(search_array, h)   # (Y, X, W)
    w = a_stack.shape[-1]

    valid = jnp.isfinite(s_stack) & jnp.isfinite(a_stack)
    in_target = valid & (s_stack >= target_min) & (s_stack <= target_max)
    count = jnp.sum(in_target, axis=-1)
    mean = jnp.sum(jnp.where(in_target, a_stack, 0), axis=-1) / \
        jnp.maximum(count, 1)

    # Fallback: nearest-to-target among cells before the first in-target
    # cell (scan order) with |s - s_center| >= delta
    any_target = count > 0
    first_pos = jnp.argmax(in_target, axis=-1)
    pos = jnp.arange(w)
    before_first = jnp.where(any_target[..., None],
                             pos < first_pos[..., None], True)
    center = search_array[..., None]
    eligible = valid & ~in_target & before_first & \
        (jnp.abs(s_stack - center) >= delta)
    dist = jnp.minimum(jnp.abs(s_stack - target_min),
                       jnp.abs(s_stack - target_max))
    dist = jnp.where(eligible, dist, jnp.inf)
    best = jnp.argmin(dist, axis=-1)
    has_fallback = jnp.any(eligible, axis=-1)
    fallback_val = jnp.take_along_axis(a_stack, best[..., None],
                                       axis=-1)[..., 0]

    out = jnp.where(any_target, mean,
                    jnp.where(has_fallback, fallback_val, array))
    # invalid center search value -> passthrough
    out = jnp.where(jnp.isfinite(search_array), out, array)
    if use_apply:
        gate = (apply_array == 1)
        out = jnp.where(gate, out, array)
    return out
