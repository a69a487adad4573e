"""Transform hierarchy (reference src/api/transform.cpp, gridpp.h:2345-2452).

Identity, Log, BoxCox, StartedBoxCox, Gamma. forward/backward accept
scalars or arrays of any rank and preserve shape. NaN propagates (the
reference's is_valid guards). Elementwise math is numpy (these are thin
pre/post-processing steps); `forward_jnp`/`backward_jnp` give jittable
device versions for use inside fused pipelines.
"""
from __future__ import annotations

import numpy as np

from ..constants import MV

__all__ = ["Transform", "Identity", "Log", "BoxCox", "StartedBoxCox", "Gamma"]


class Transform:
    def forward(self, value):
        scalar = np.ndim(value) == 0
        arr = np.asarray(value, dtype=np.float32)
        out = self._forward(arr)
        return float(out) if scalar else out.astype(np.float32)

    def backward(self, value):
        scalar = np.ndim(value) == 0
        arr = np.asarray(value, dtype=np.float32)
        out = self._backward(arr)
        return float(out) if scalar else out.astype(np.float32)

    def _forward(self, arr):
        raise NotImplementedError

    def _backward(self, arr):
        raise NotImplementedError

    def forward_jnp(self, x):
        import jax.numpy as jnp
        return jnp.asarray(self._forward(np.asarray(x)))

    def backward_jnp(self, x):
        import jax.numpy as jnp
        return jnp.asarray(self._backward(np.asarray(x)))


class Identity(Transform):
    def _forward(self, arr):
        return arr

    def _backward(self, arr):
        return arr

    def forward_jnp(self, x):
        return x

    def backward_jnp(self, x):
        return x


class Log(Transform):
    """log/exp (transform.cpp:85-96)."""

    def _forward(self, arr):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(arr)

    def _backward(self, arr):
        return np.exp(arr)

    def forward_jnp(self, x):
        import jax.numpy as jnp
        return jnp.log(x)

    def backward_jnp(self, x):
        import jax.numpy as jnp
        return jnp.exp(x)


class BoxCox(Transform):
    """Box-Cox with parameter lambda (transform.cpp:97-125).

    forward clamps values <= 0 to 0; backward floors the argument at
    -1/lambda and clamps negative results to 0.
    """

    def __init__(self, threshold):
        self.threshold = float(threshold)

    def _forward(self, arr):
        lam = self.threshold
        v = np.maximum(arr, 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            if lam == 0:
                return np.log(v)
            return (np.power(v, lam) - 1) / lam

    def _backward(self, arr):
        lam = self.threshold
        if lam == 0:
            return np.exp(arr)
        v = np.maximum(arr, -1.0 / lam)
        with np.errstate(invalid="ignore"):
            out = np.power(1 + lam * v, 1 / lam)
        return np.where(out <= 0, 0, out) * np.where(np.isfinite(arr), 1, np.nan)

    def forward_jnp(self, x):
        import jax.numpy as jnp
        lam = self.threshold
        v = jnp.maximum(x, 0)
        if lam == 0:
            return jnp.log(v)
        return (jnp.power(v, lam) - 1) / lam

    def backward_jnp(self, x):
        import jax.numpy as jnp
        lam = self.threshold
        if lam == 0:
            return jnp.exp(x)
        v = jnp.maximum(x, -1.0 / lam)
        out = jnp.power(1 + lam * v, 1 / lam)
        return jnp.where(out <= 0, 0, out) * jnp.where(jnp.isfinite(x), 1,
                                                       jnp.nan)


class StartedBoxCox(Transform):
    """Identity below `scaling_factor`, scaled Box-Cox above
    (transform.cpp:126-154)."""

    def __init__(self, threshold, scaling_factor):
        threshold = float(threshold)
        scaling_factor = float(scaling_factor)
        if not np.isfinite(threshold) or threshold <= 0:
            raise ValueError("threshold parameter must be > 0 in the started "
                             "Box-Cox distribution")
        if not np.isfinite(scaling_factor) or scaling_factor <= 0:
            raise ValueError("Scaling factor parameter must be > 0 in the "
                             "started Box-Cox distribution")
        self.threshold = threshold
        self.scaling = scaling_factor

    def _forward(self, arr):
        lam = self.threshold
        s = self.scaling
        v = np.maximum(arr, 0)
        with np.errstate(invalid="ignore"):
            trans = s * (1 + (np.power(v / s, lam) - 1) / lam)
        out = np.where(v <= s, v, trans)
        return np.where(np.isfinite(arr), out, np.nan)

    def _backward(self, arr):
        lam = self.threshold
        s = self.scaling
        with np.errstate(invalid="ignore"):
            trans = s * np.power(1 + lam / s * (arr - s), 1 / lam)
        out = np.where(arr <= s, arr, trans)
        out = np.where(out < 0, 0, out)
        return np.where(np.isfinite(arr), out, np.nan)


class Gamma(Transform):
    """Gamma CDF -> standard normal quantile (transform.cpp:155-179)."""

    def __init__(self, shape, scale, tolerance=0.01):
        shape = float(shape)
        scale = float(scale)
        tolerance = float(tolerance)
        if not np.isfinite(shape) or shape <= 0:
            raise ValueError(
                "Shape parameter must be > 0 in the gamma distribution")
        if not np.isfinite(scale) or scale <= 0:
            raise ValueError(
                "Scale parameter must be > 0 in the gamma distribution")
        if not np.isfinite(tolerance) or tolerance < 0:
            raise ValueError(
                "Tolerance must be >= 0 in the gamma distribution")
        self.shape = shape
        self.scale = scale
        self.tolerance = tolerance

    def _forward(self, arr):
        from scipy import special
        with np.errstate(invalid="ignore"):
            cdf = special.gammainc(self.shape,
                                   np.maximum(arr + self.tolerance, 0)
                                   / self.scale)
            out = special.ndtri(cdf.astype(np.float64))
        return np.where(np.isfinite(arr), out, np.nan)

    def _backward(self, arr):
        from scipy import special
        with np.errstate(invalid="ignore"):
            cdf = special.ndtr(arr.astype(np.float64))
            out = special.gammaincinv(self.shape, cdf) * self.scale \
                - self.tolerance
        return np.where(np.isfinite(arr), out, np.nan)

    def forward_jnp(self, x):
        import jax.numpy as jnp
        from jax.scipy import special as jspecial
        cdf = jspecial.gammainc(self.shape,
                                jnp.maximum(x + self.tolerance, 0) / self.scale)
        return jnp.where(jnp.isfinite(x), jspecial.ndtri(cdf), jnp.nan)
