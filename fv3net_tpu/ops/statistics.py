"""Statistical ops: verification metrics, histograms, region averages.

reference: external/vcm/vcm/calc/metrics.py:18-126 (r2/accuracy/
precision/recall/f1/MSE), vcm/calc/histogram.py, vcm/select.py:18-160
(approximate zonal/meridional averages by latitude binning, surface-type
masking) — pure jnp over raw arrays.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def mean_squared_error(truth, pred, axis=None, weights=None):
    err = (truth - pred) ** 2
    if weights is not None:
        return jnp.sum(err * weights, axis=axis) / jnp.sum(
            jnp.broadcast_to(weights, err.shape), axis=axis
        )
    return jnp.mean(err, axis=axis)


def root_mean_squared_error(truth, pred, axis=None, weights=None):
    return jnp.sqrt(mean_squared_error(truth, pred, axis, weights))


def bias(truth, pred, axis=None, weights=None):
    diff = pred - truth
    if weights is not None:
        return jnp.sum(diff * weights, axis=axis) / jnp.sum(
            jnp.broadcast_to(weights, diff.shape), axis=axis
        )
    return jnp.mean(diff, axis=axis)


def r2_score(truth, pred, axis=None):
    """1 - MSE/Var (reference metrics.py:18)."""
    mse = jnp.mean((truth - pred) ** 2, axis=axis)
    var = jnp.var(truth, axis=axis)
    return 1.0 - mse / var


def accuracy(truth, pred, axis=None):
    return jnp.mean(truth == pred, axis=axis)


def precision(truth, pred, axis=None):
    tp = jnp.sum(truth & pred, axis=axis)
    fp = jnp.sum(~truth & pred, axis=axis)
    return tp / (tp + fp)


def recall(truth, pred, axis=None):
    tp = jnp.sum(truth & pred, axis=axis)
    fn = jnp.sum(truth & ~pred, axis=axis)
    return tp / (tp + fn)


true_positive_rate = recall


def false_positive_rate(truth, pred, axis=None):
    fp = jnp.sum(~truth & pred, axis=axis)
    tn = jnp.sum(~truth & ~pred, axis=axis)
    return fp / (fp + tn)


def f1_score(truth, pred, axis=None):
    p = precision(truth, pred, axis)
    r = recall(truth, pred, axis)
    return 2 * p * r / (p + r)


def weighted_mean(field, weights, axis=None):
    w = jnp.broadcast_to(weights, field.shape)
    return jnp.sum(field * w, axis=axis) / jnp.sum(w, axis=axis)


def weighted_average(field, weights, axis=None):
    """Weighted mean with NaN weights treated as zero (reference
    vcm/calc/calc.py:33-49 ``weighted_average``)."""
    w = jnp.nan_to_num(jnp.asarray(weights), nan=0.0)
    return weighted_mean(field, w, axis=axis)


def local_time(hours_utc, lon_deg):
    """Fractional local solar hour-of-day from UTC hours + longitude
    (reference vcm/calc/calc.py:25-30: hour + lon/15 mod 24)."""
    return jnp.mod(jnp.asarray(hours_utc) + jnp.asarray(lon_deg) / 15.0, 24.0)


def histogram(field, bins) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Counts + bin edges (reference vcm/calc/histogram.py)."""
    bins = jnp.asarray(bins)
    idx = jnp.clip(
        jnp.searchsorted(bins, field.ravel(), side="right") - 1,
        0,
        len(bins) - 2,
    )
    inside = (field.ravel() >= bins[0]) & (field.ravel() <= bins[-1])
    counts = jnp.zeros(len(bins) - 1, jnp.int32).at[idx].add(
        inside.astype(jnp.int32)
    )
    return counts, bins


def histogram2d(x, y, bins_x, bins_y) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Joint counts over two fields (reference vcm/calc/histogram.py:33-62).

    Returns ``(counts[nx, ny], bins_x, bins_y)``.  Implemented as two
    bucketizations + one one-hot contraction so the reduction is a
    matmul rather than a scatter (TPU-friendly; gathers/scatters are the
    slow path here).
    """
    bins_x = jnp.asarray(bins_x)
    bins_y = jnp.asarray(bins_y)
    nx, ny = len(bins_x) - 1, len(bins_y) - 1
    xf = jnp.ravel(jnp.asarray(x))
    yf = jnp.ravel(jnp.asarray(y))
    ix = jnp.clip(jnp.searchsorted(bins_x, xf, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(bins_y, yf, side="right") - 1, 0, ny - 1)
    inside = (
        (xf >= bins_x[0]) & (xf <= bins_x[-1]) & (yf >= bins_y[0]) & (yf <= bins_y[-1])
    )
    one_x = (ix[:, None] == jnp.arange(nx)[None, :]) & inside[:, None]
    one_y = iy[:, None] == jnp.arange(ny)[None, :]
    counts = one_x.astype(jnp.float32).T @ one_y.astype(jnp.float32)
    return counts.astype(jnp.int32), bins_x, bins_y


class RegionOfInterest:
    """Area-weighted average over a lat/lon box (reference
    vcm/select.py:110-146).  Longitudes are normalized to [0, 360)."""

    def __init__(self, lat_bounds, lon_bounds):
        self.lat_bounds = tuple(lat_bounds)
        self.lon_bounds = tuple(lon_bounds)

    def mask(self, lat_deg, lon_deg):
        lat = jnp.asarray(lat_deg)
        lon = jnp.mod(jnp.asarray(lon_deg), 360.0)
        lo0, lo1 = (b % 360.0 for b in self.lon_bounds)
        in_lat = (lat > self.lat_bounds[0]) & (lat < self.lat_bounds[1])
        if lo0 <= lo1:
            in_lon = (lon > lo0) & (lon < lo1)
        else:  # box crossing the 0-meridian
            in_lon = (lon > lo0) | (lon < lo1)
        return in_lat & in_lon

    def average(self, field, lat_deg, lon_deg, area, axis=None):
        w = jnp.asarray(area) * self.mask(lat_deg, lon_deg)
        return weighted_mean(jnp.asarray(field), w, axis=axis)


# ---------------------------------------------------------------------------
# approximate zonal/meridional averages (reference vcm/select.py:18-79)
# ---------------------------------------------------------------------------


def _bin_average(field, coord_deg, bins_deg, weights):
    """Average ``field`` within coordinate bins over all non-leading axes.

    field: (..., *spatial); coord/weights broadcastable to the spatial
    axes.  Returns (..., n_bins).
    """
    bins = jnp.asarray(bins_deg)
    nb = len(bins) - 1
    coord = jnp.asarray(coord_deg)
    idx = jnp.clip(jnp.searchsorted(bins, coord, side="right") - 1, 0, nb - 1)
    inside = (coord >= bins[0]) & (coord < bins[-1])
    w = jnp.broadcast_to(jnp.asarray(weights), coord.shape) * inside
    spatial = coord.shape
    lead = field.shape[: field.ndim - coord.ndim]
    f = field.reshape(lead + (-1,))
    wi = (w).reshape(-1)
    ii = idx.reshape(-1)
    num = jnp.zeros(lead + (nb,), f.dtype).at[..., ii].add(f * wi)
    den = jnp.zeros((nb,), f.dtype).at[ii].add(wi)
    return num / den


def zonal_average_approximate(
    field, lat_deg, area, bins_deg: Optional[np.ndarray] = None
):
    """Area-weighted average in latitude bins (reference select.py:30-54).

    field: (..., tile, y, x); lat/area: (tile, y, x).
    Returns (..., n_bins) plus the bin centers.
    """
    if bins_deg is None:
        bins_deg = np.arange(-90, 91, 2.0)
    out = _bin_average(field, lat_deg, bins_deg, area)
    centers = 0.5 * (np.asarray(bins_deg)[:-1] + np.asarray(bins_deg)[1:])
    return out, centers


def meridional_average_approximate(
    field, lon_deg, area, bins_deg: Optional[np.ndarray] = None
):
    """Area-weighted average in longitude bins (reference select.py:55-79)."""
    if bins_deg is None:
        bins_deg = np.arange(0, 361, 2.0)
    lon = jnp.mod(jnp.asarray(lon_deg), 360.0)
    out = _bin_average(field, lon, bins_deg, area)
    centers = 0.5 * (np.asarray(bins_deg)[:-1] + np.asarray(bins_deg)[1:])
    return out, centers


def mask_to_surface_type(field, land_sea_mask, surface_type: str):
    """NaN outside the requested surface type (reference select.py:149):
    'land' (mask==1), 'sea' (mask==0), 'seaice' (mask==2), 'global'."""
    if surface_type == "global":
        return field
    value = {"land": 1, "sea": 0, "seaice": 2}[surface_type]
    keep = jnp.abs(land_sea_mask - value) < 0.5
    return jnp.where(keep, field, jnp.nan)
