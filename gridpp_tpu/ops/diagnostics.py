"""Meteorological diagnostics as vectorized device ops.

Reference src/api/{humidity,pressure,wind,qnh}.cpp - scalar formulas in OMP
loops there; pure elementwise jnp here (fusable into any pipeline).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Saturation vapour pressure lookup table, 5K steps from 173.16K
# (humidity.cpp:35-42, from metno/wdb2ts). Kept as a numpy constant:
# creating a device array at import time would initialize the XLA backend
# before jax.distributed.initialize can run in multi-host jobs.
EWT = np.array([
    .000034, .000089, .000220, .000517, .001155, .002472,
    .005080, .01005, .01921, .03553, .06356, .1111,
    .1891, .3139, .5088, .8070, 1.2540, 1.9118,
    2.8627, 4.2148, 6.1078, 8.7192, 12.272, 17.044,
    23.373, 31.671, 42.430, 56.236, 73.777, 95.855,
    123.40, 157.46, 199.26, 250.16, 311.69, 385.56,
    473.67, 578.09, 701.13, 845.28, 1013.25], np.float32)


@jax.jit
def dewpoint(temperature, relative_humidity):
    """Dewpoint from T and RH (humidity.cpp:5-21, wdb2ts Magnus form)."""
    temp_c = temperature - 273.15
    e = relative_humidity * 0.611 * jnp.exp(
        (17.63 * temp_c) / (temp_c + 243.04))
    log_e = jnp.log(e)
    td_c = (116.9 + 243.04 * log_e) / (16.78 - log_e)
    td = td_c + 273.15
    out = jnp.minimum(td, temperature)
    valid = jnp.isfinite(temperature) & jnp.isfinite(relative_humidity)
    return jnp.where(valid, out, jnp.nan)


def _ewt_lookup(temp):
    ewt = jnp.asarray(EWT)
    x = jnp.clip((temp - 173.16) * 0.2, 0.0, 39.0)
    idx = jnp.clip(x.astype(jnp.int32), 0, 39)
    frac = x - idx.astype(x.dtype)
    return ewt[idx] + (ewt[idx + 1] - ewt[idx]) * frac


@jax.jit
def relative_humidity(temperature, dewpoint):
    """RH from T and dewpoint via the wdb2ts saturation table
    (humidity.cpp:33-80)."""
    et = _ewt_lookup(temperature)
    etd = _ewt_lookup(dewpoint)
    rh = jnp.clip(etd / et, 0.0, 1.0)
    rh = jnp.where(temperature <= dewpoint, 1.0, rh)
    valid = jnp.isfinite(temperature) & jnp.isfinite(dewpoint)
    return jnp.where(valid, rh, jnp.nan)


@jax.jit
def wetbulb(temperature, pressure, relative_humidity):
    """Wet-bulb temperature (humidity.cpp:82-103)."""
    temp_c = temperature - 273.15
    e = relative_humidity * 0.611 * jnp.exp(
        (17.63 * temp_c) / (temp_c + 243.04))
    log_e = jnp.log(e)
    td = (116.9 + 243.04 * log_e) / (16.78 - log_e)
    gamma = 0.00066 * pressure / 1000
    delta = (4098 * e) / jnp.square(td + 243.04)
    denom = gamma + delta
    wb = (gamma * temp_c + delta * td) / jnp.where(denom == 0, 1, denom)
    out = wb + 273.15
    valid = (jnp.isfinite(temp_c) & jnp.isfinite(pressure)
             & jnp.isfinite(relative_humidity) & (denom != 0)
             & (temp_c > -243.04) & (relative_humidity > 0))
    return jnp.where(valid, out, jnp.nan)


@jax.jit
def pressure(ielev, oelev, ipressure, itemperature):
    """Hydrostatic pressure adjustment (pressure.cpp:5-14)."""
    g0 = 9.80665
    m = 0.0289644
    r = 8.3144598
    out = ipressure * jnp.exp(-g0 * m * (oelev - ielev) / (r * itemperature))
    valid = (jnp.isfinite(ielev) & jnp.isfinite(oelev)
             & jnp.isfinite(ipressure) & jnp.isfinite(itemperature))
    return jnp.where(valid, out, jnp.nan)


@jax.jit
def sea_level_pressure(ps, altitude, temperature, rh, dewpoint):
    """WMO sea-level pressure reduction (pressure.cpp:28-76).

    Validity checks are done at the API layer (the reference throws).
    """
    t = temperature - 273.15
    ts = 273.15 + t
    g = 9.80665
    r = 287.05
    a = 0.0065
    ch = 0.12
    ps_hpa = ps * 0.01

    has_rh = jnp.isfinite(rh)
    has_td = jnp.isfinite(dewpoint)
    es = 6.11 * jnp.power(10.0, (7.5 * t) / (237.3 + t))
    e_rh = rh * es
    aa, bb, cc = 17.625, 243.04, 6.1094
    td_from_rh = (bb * jnp.log(e_rh / cc)) / (aa - jnp.log(e_rh / cc))
    td_c = dewpoint - 273.15
    e_td = 6.11 * jnp.power(10.0, (7.5 * td_c) / (237.3 + td_c))
    td = jnp.where(has_rh, td_from_rh,
                   jnp.where(has_td, td_c, t - 3.0))
    e = jnp.where(has_rh, e_rh, jnp.where(has_td, e_td, 0.0))

    slp_high = ps_hpa * jnp.exp(
        (g * altitude / r) / (ts + 0.5 * a * altitude + e * ch))
    tv = (273.15 + t) / (
        1 - 0.379 * (6.11 * jnp.power(10.0, (7.5 * td) / (237.7 + td))
                     / ps_hpa))
    slp_low = ps_hpa + ps_hpa * altitude / (29.27 * tv)
    slp = jnp.where(altitude >= 50.0, slp_high, slp_low)
    return slp * 100.0


@jax.jit
def qnh(pressure, altitude):
    """ICAO standard-atmosphere QNH (qnh.cpp:6-30)."""
    g = 9.80665
    t0 = 288.15
    lr = 0.0065
    crgas = 287.053
    p0 = 101325.0
    out = p0 * jnp.power(
        jnp.power(pressure / p0, (crgas * lr) / g) + (altitude * lr) / t0,
        g / (crgas * lr))
    out = jnp.where(pressure == 0, 0.0, out)
    valid = jnp.isfinite(altitude) & jnp.isfinite(pressure)
    return jnp.where(valid | (pressure == 0), out, jnp.nan)


@jax.jit
def wind_speed(xwind, ywind):
    return jnp.sqrt(xwind * xwind + ywind * ywind)


@jax.jit
def wind_direction(xwind, ywind):
    """Meteorological wind direction (wind.cpp:21-27)."""
    pi = 3.14159265
    d = jnp.arctan2(-xwind, -ywind) * 180 / pi
    return jnp.where(d < 0, d + 360, d)
