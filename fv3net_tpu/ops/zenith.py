"""Solar zenith angle, jit-friendly.

Equivalent of the reference's ``vcm.cos_zenith_angle`` (reference:
external/vcm/vcm/calc/_zenith_angle.py:76-241, itself from the public
climt astronomy formulas / Meeus).  Re-design for TPU: the astronomical
part takes *float days since 2000-01-01T12:00 UTC* so the whole
computation is pure jnp and can live inside a jitted step; a small host
helper converts datetimes.
"""
from __future__ import annotations

import datetime

import jax.numpy as jnp
import numpy as np

_EPOCH = datetime.datetime(2000, 1, 1, 12, 0)


def days_from_2000(time) -> np.ndarray:
    """Host-side: convert datetime(-like, or array of them) to float days
    since 2000-01-01T12:00 UTC (the jnp entry point's time coordinate)."""
    arr = np.asarray(time)
    flat = arr.ravel()
    out = np.empty(flat.shape, dtype=np.float64)
    for i, t in enumerate(flat):
        t = t.item() if hasattr(t, "item") else t
        delta = t - _EPOCH if isinstance(t, datetime.datetime) else t - type(t)(
            2000, 1, 1, 12, 0
        )
        out[i] = delta.total_seconds() / 86400.0
    return out.reshape(arr.shape) if arr.shape else out[0]


def _greenwich_mean_sidereal_time(days):
    jc = days / 36525.0
    theta = 67310.54841 + jc * (
        876600 * 3600 + 8640184.812866 + jc * (0.093104 - jc * 6.2e-5)
    )
    return jnp.deg2rad(theta / 240.0) % (2 * jnp.pi)


def _sun_ecliptic_longitude(days):
    jc = days / 36525.0
    mean_anomaly = jnp.deg2rad(
        357.52910 + 35999.05030 * jc - 0.0001559 * jc * jc - 0.00000048 * jc ** 3
    )
    mean_longitude = jnp.deg2rad(
        280.46645 + 36000.76983 * jc + 0.0003032 * jc ** 2
    )
    d_l = jnp.deg2rad(
        (1.914600 - 0.004817 * jc - 0.000014 * jc ** 2) * jnp.sin(mean_anomaly)
        + (0.019993 - 0.000101 * jc) * jnp.sin(2 * mean_anomaly)
        + 0.000290 * jnp.sin(3 * mean_anomaly)
    )
    return mean_longitude + d_l


def _obliquity(jc):
    return jnp.deg2rad(
        23.0
        + 26.0 / 60
        + 21.406 / 3600.0
        - (
            46.836769 * jc
            - 0.0001831 * jc ** 2
            + 0.00200340 * jc ** 3
            - 0.576e-6 * jc ** 4
            - 4.34e-8 * jc ** 5
        )
        / 3600.0
    )


def _right_ascension_declination(days):
    jc = days / 36525.0
    eps = _obliquity(jc)
    eclon = _sun_ecliptic_longitude(days)
    x = jnp.cos(eclon)
    y = jnp.cos(eps) * jnp.sin(eclon)
    z = jnp.sin(eps) * jnp.sin(eclon)
    r = jnp.sqrt(1.0 - z * z)
    declination = jnp.arctan2(z, r)
    right_ascension = 2 * jnp.arctan2(y, x + r)
    return right_ascension, declination


def cos_zenith_angle(days, lon_deg, lat_deg):
    """Cosine of solar zenith angle.

    Args:
        days: float days since 2000-01-01T12:00 UTC (see ``days_from_2000``);
            scalar or broadcastable against lon/lat.
        lon_deg, lat_deg: longitude/latitude in degrees.
    """
    lon = jnp.deg2rad(lon_deg)
    lat = jnp.deg2rad(lat_deg)
    ra, dec = _right_ascension_declination(days)
    h_angle = _greenwich_mean_sidereal_time(days) + lon - ra
    return jnp.sin(lat) * jnp.sin(dec) + jnp.cos(lat) * jnp.cos(dec) * jnp.cos(
        h_angle
    )


def solar_distance_factor(days):
    """(a/r)^2 Earth-Sun distance factor for the solar "constant"
    (reference: radiation_astronomy.py ``sol_update``'s orbit-based
    solcon scaling).  Spencer (1971) Fourier series in the day angle —
    accurate to ~1e-4, well under the solar-cycle variability the
    reference's isol data files encode."""
    # day angle from perihelion-adjacent epoch (Jan 1), radians
    g = 2.0 * jnp.pi * jnp.mod(days - 0.5, 365.25) / 365.25
    return (
        1.000110
        + 0.034221 * jnp.cos(g)
        + 0.001280 * jnp.sin(g)
        + 0.000719 * jnp.cos(2.0 * g)
        + 0.000077 * jnp.sin(2.0 * g)
    )
