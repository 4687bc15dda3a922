"""Cubed-sphere -> lat-lon regridding with precomputed weights.

TPU-native replacement for the reference's ``fregrid`` C binary
(GFDL FRE-NCTools), which it shells out to with precomputed remap
coefficients (reference: workflows/post_process_run/fv3post/
fregrid.py:16-56).  Design: first-order conservative remap — each cube
cell's area is distributed to the lat-lon boxes containing its
``subsample`` x ``subsample`` sub-cell centers; the (flat box index,
weight) tables are precomputed host-side once, and application is a
single scatter-add on device (the sparse-matmul form of the remap),
batched over any leading dims.
"""
from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from fv3net_tpu.grid.geometry import Grid, _face_xyz


def _containing_cell(lat: np.ndarray, lon: np.ndarray, n: int):
    """Invert the equiangular gnomonic projection: (lat, lon) -> (tile,
    j, i) of the containing C{n} cell.  Follows the face layout of
    fv3net_tpu.grid.geometry._face_xyz."""
    lat, lon = np.broadcast_arrays(lat, lon)
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    # face-local (X, Y) gnomonic coordinates per face, as in _face_xyz
    faces = [
        (x, y, z),  # tile 0: v = (1, X, Y)/|..| -> X=y/x, Y=z/x, need x>0
        (y, -x, z),  # tile 1: (-X, 1, Y) -> X=-x/y, Y=z/y, need y>0
        (-x, -y, z),  # tile 2: (-1, -X, Y) -> X=-y/(-x)? see below
        (-y, x, z),  # tile 3
        (z, y, -x),  # tile 4: (-Y, X, 1) -> X=y/z, Y=-x/z, need z>0
        (-z, y, x),  # tile 5: (Y, X, -1) -> X=y/(-z), Y=x/(-z), need z<0
    ]
    denom = np.stack([f[0] for f in faces])
    tile = np.argmax(denom, axis=0)
    Xs = np.stack([f[1] / np.maximum(f[0], 1e-12) for f in faces])
    Ys = np.stack([f[2] / np.maximum(f[0], 1e-12) for f in faces])
    ii = np.arange(tile.size)
    X = Xs.reshape(6, -1)[tile.ravel(), ii].reshape(tile.shape)
    Y = Ys.reshape(6, -1)[tile.ravel(), ii].reshape(tile.shape)
    ang = np.linspace(-np.pi / 4, np.pi / 4, n + 1)
    i_idx = np.clip(np.searchsorted(ang, np.arctan(X)) - 1, 0, n - 1)
    j_idx = np.clip(np.searchsorted(ang, np.arctan(Y)) - 1, 0, n - 1)
    return tile, j_idx, i_idx


class CubeToLatLon:
    """Precomputed conservative cube->latlon regridder."""

    def __init__(self, grid: Grid, nlat: int = 180, nlon: int = 360,
                 subsample: int = 2):
        self.nlat = nlat
        self.nlon = nlon
        n = grid.n
        s = subsample
        # sub-cell centers in the gnomonic parameter plane
        ang = np.linspace(-np.pi / 4, np.pi / 4, n + 1)
        sub = (np.arange(s) + 0.5) / s
        # parameter values of sub-centers within each cell
        a_sub = ang[:-1, None] + np.diff(ang)[:, None] * sub[None, :]
        a_flat = a_sub.reshape(-1)  # [n*s]
        X = np.tan(a_flat)
        lat_idx_all = []
        lon_idx_all = []
        for t in range(6):
            XX, YY = np.meshgrid(X, X, indexing="xy")
            xyz = _face_xyz(t, XX, YY)
            lon = np.mod(np.arctan2(xyz[..., 1], xyz[..., 0]), 2 * np.pi)
            lat = np.arcsin(np.clip(xyz[..., 2], -1, 1))
            lat_idx = np.clip(
                ((lat + np.pi / 2) / np.pi * nlat).astype(np.int64), 0, nlat - 1
            )
            lon_idx = np.clip(
                (lon / (2 * np.pi) * nlon).astype(np.int64), 0, nlon - 1
            )
            lat_idx_all.append(lat_idx)
            lon_idx_all.append(lon_idx)
        lat_idx = np.stack(lat_idx_all)  # [6, n*s, n*s]
        lon_idx = np.stack(lon_idx_all)
        flat_box = lat_idx * nlon + lon_idx
        # weight of each sub-cell = its parent cell's area / s^2
        w = np.repeat(np.repeat(grid.area, s, axis=1), s, axis=2) / (s * s)
        self._box = jnp.asarray(flat_box.reshape(-1))
        self._w = jnp.asarray(w.reshape(-1))
        self._den = (
            jnp.zeros(nlat * nlon).at[self._box].add(self._w)
        )
        self._s = s
        self._n = n
        self.lat = (np.arange(nlat) + 0.5) / nlat * 180.0 - 90.0
        self.lon = (np.arange(nlon) + 0.5) / nlon * 360.0
        # nearest-cell fallback for boxes no sub-cell lands in (small polar
        # boxes): analytic inverse gnomonic projection of each box center
        t_idx, j_idx, i_idx = _containing_cell(
            np.deg2rad(self.lat)[:, None], np.deg2rad(self.lon)[None, :], n
        )
        self._fb_flat = jnp.asarray(
            (t_idx * n * n + j_idx * n + i_idx).reshape(-1)
        )

    def __call__(self, field: jnp.ndarray) -> jnp.ndarray:
        """Regrid (..., 6, n, n) -> (..., nlat, nlon).  Boxes covered by
        sub-cells get the conservative area-weighted mean; the remaining
        (small polar) boxes fall back to the value of the cube cell
        containing their center."""
        s, n = self._s, self._n
        f = jnp.repeat(jnp.repeat(field, s, axis=-2), s, axis=-1)
        lead = field.shape[:-3]
        ff = f.reshape(lead + (-1,))
        num = jnp.zeros(lead + (self.nlat * self.nlon,), ff.dtype).at[
            ..., self._box
        ].add(ff * self._w)
        mean = num / jnp.where(self._den > 0, self._den, 1.0)
        fallback = field.reshape(lead + (-1,))[..., self._fb_flat]
        out = jnp.where(self._den > 0, mean, fallback)
        return out.reshape(lead + (self.nlat, self.nlon))

    def sample_points(self, field: jnp.ndarray, lat_deg, lon_deg):
        """Nearest-cell sampling of (..., 6, n, n) at arbitrary points
        (the ``vcm.interpolate_unstructured`` nearest-neighbor path,
        reference external/vcm/vcm/interpolate.py:251) using the analytic
        inverse projection."""
        t, j, i = _containing_cell(
            np.deg2rad(np.asarray(lat_deg)), np.deg2rad(np.asarray(lon_deg)),
            self._n,
        )
        flat = jnp.asarray((t * self._n * self._n + j * self._n + i).ravel())
        out = field.reshape(field.shape[:-3] + (-1,))[..., flat]
        return out.reshape(field.shape[:-3] + np.shape(lat_deg))

    def conservative_sum(self, field: jnp.ndarray) -> jnp.ndarray:
        """Area-weighted integral on the target grid (exact global
        conservation: sums to sum(field * area))."""
        s = self._s
        f = jnp.repeat(jnp.repeat(field, s, axis=-2), s, axis=-1)
        lead = field.shape[:-3]
        ff = f.reshape(lead + (-1,))
        num = jnp.zeros(lead + (self.nlat * self.nlon,), ff.dtype).at[
            ..., self._box
        ].add(ff * self._w)
        return num.reshape(lead + (self.nlat, self.nlon))


def interpolate_unstructured(field, source_coords, target_coords):
    """Nearest-neighbor interpolation between arbitrary unstructured
    coordinate sets (reference external/vcm/vcm/interpolate.py:251-298,
    which uses a KDTree; here the neighbor search is a single pairwise-
    distance matmul + argmin — the MXU-native formulation, exact for
    nearest-neighbor).

    Args:
        field: ``[..., *spatial]`` data.
        source_coords: sequence of arrays, each shaped like the spatial
            axes of ``field`` (e.g. ``(lat, lon)`` — any dimensionality).
        target_coords: sequence (same length) of arrays with a common
            shape giving the query points.

    Returns:
        ``[..., *target_shape]`` nearest-source values.
    """
    src = jnp.stack([jnp.ravel(jnp.asarray(c)) for c in source_coords], axis=-1)
    tgt = jnp.stack([jnp.ravel(jnp.asarray(c)) for c in target_coords], axis=-1)
    # ||s - t||^2 = |s|^2 - 2 s.t + |t|^2 ; |t|^2 is constant over the argmin
    d2 = (src * src).sum(-1)[:, None] - 2.0 * (src @ tgt.T)
    idx = jnp.argmin(d2, axis=0)
    src_ndim = np.ndim(np.asarray(source_coords[0]))
    field = jnp.asarray(field)
    lead = field.shape[: field.ndim - src_ndim]
    out = jnp.take(field.reshape(lead + (-1,)), idx, axis=-1)
    return out.reshape(lead + np.shape(np.asarray(target_coords[0])))
