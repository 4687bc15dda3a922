"""Spherical-harmonic roundtrip filtering of lat-lon fields.

reference: external/xtorch_harmonics/xtorch_harmonics/
xtorch_harmonics.py:12-30 — roundtrip through a truncated spherical
harmonic transform (there via torch_harmonics on GPU) used to filter
coarse-grained fields.

TPU-native design: longitude directions use an FFT; the latitude
(Legendre) transform is a dense matmul against precomputed normalized
associated Legendre functions — exactly the MXU-friendly shape.  The
grid is equiangular with Clenshaw-Curtis-style latitude weights.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _legendre_table(lmax: int, x: np.ndarray) -> np.ndarray:
    """Normalized associated Legendre P̄_l^m(x) for 0<=m<=l<=lmax.

    Returns [nlat, lmax+1, lmax+1] (l, m), fully-normalized so that the
    spherical harmonics are orthonormal over the sphere.
    Standard stable recursion (Press et al.).
    """
    nlat = x.shape[0]
    P = np.zeros((nlat, lmax + 1, lmax + 1))
    sx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    # P̄_m^m by recursion
    pmm = np.full(nlat, 1.0 / np.sqrt(4.0 * np.pi))
    P[:, 0, 0] = pmm
    for m in range(1, lmax + 1):
        pmm = -pmm * np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * sx
        P[:, m, m] = pmm
    for m in range(lmax + 1):
        if m + 1 <= lmax:
            P[:, m + 1, m] = (
                x * np.sqrt(2.0 * m + 3.0) * P[:, m, m]
            )
        for l in range(m + 2, lmax + 1):
            a = np.sqrt(
                (4.0 * l * l - 1.0) / (l * l - m * m)
            )
            b = np.sqrt(
                ((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0)
            )
            P[:, l, m] = a * (x * P[:, l - 1, m] - b * P[:, l - 2, m])
    return P


def _lobatto_nodes(n: int):
    """Gauss-Lobatto-Legendre nodes (incl. the poles x=±1) and weights:
    interior nodes are the roots of P'_{n-1}; w_i = 2/(n(n-1) P_{n-1}²)."""
    if n < 2:
        raise ValueError("lobatto grid needs nlat >= 2")
    Pm1 = np.polynomial.legendre.Legendre.basis(n - 1)
    interior = Pm1.deriv().roots()
    x = np.concatenate([[-1.0], np.sort(interior), [1.0]])
    w = 2.0 / (n * (n - 1) * Pm1(x) ** 2)
    return x, w


class RoundTripFilter:
    """Truncate a lat-lon field at total wavenumber ``lmax`` by forward +
    inverse spherical-harmonic transform.

    Grid convention: lat has ``nlat`` midpoint rows from -90..90 deg
    (equiangular), lon ``nlon`` uniform columns.
    """

    def __init__(self, nlat: int, nlon: int, lmax: Optional[int] = None,
                 grid: str = "equiangular",
                 fraction_modes_kept: Optional[float] = None):
        """``grid`` selects the latitude nodes/quadrature (the reference's
        forward_grid/inverse_grid options, xtorch_harmonics.py:209-240):
        'equiangular' (midpoint rows), 'legendre-gauss', or 'lobatto'.
        ``fraction_modes_kept`` sets lmax as a fraction of the grid's
        maximum resolvable wavenumber (reference :216)."""
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        max_l = min(nlat - 1, nlon // 2 - 1)
        if fraction_modes_kept is not None:
            if lmax is not None:
                raise ValueError("pass lmax OR fraction_modes_kept, not both")
            lmax = max(0, int(round(fraction_modes_kept * max_l)))
        self.lmax = lmax if lmax is not None else max_l
        if grid == "equiangular":
            lat = (np.arange(nlat) + 0.5) / nlat * np.pi - np.pi / 2
            x = np.sin(lat)
            # cos(lat) integral weights over latitude cells
            edges = np.arange(nlat + 1) / nlat * np.pi - np.pi / 2
            w = np.sin(edges[1:]) - np.sin(edges[:-1])
        elif grid == "legendre-gauss":
            x, w = np.polynomial.legendre.leggauss(nlat)
        elif grid == "lobatto":
            x, w = _lobatto_nodes(nlat)
        else:
            raise ValueError(
                f"unknown grid {grid!r}: use 'equiangular', "
                "'legendre-gauss' or 'lobatto'"
            )
        self.x = x  # sin(latitude) of the rows, ascending
        P = _legendre_table(self.lmax, x)  # [nlat, L, M]
        L = self.lmax + 1
        # analysis = weighted least-squares projection onto the synthesis
        # basis (exact on the sampled grid; plain midpoint quadrature is
        # only first-order for m=0 modes): G_m = (A^T W A)^-1 A^T W per m
        G = np.zeros((L, L, nlat))  # [m, l, y]
        for m in range(L):
            A = P[:, m:, m]  # [nlat, L-m]
            AtW = (A * w[:, None]).T
            Gm = np.linalg.solve(AtW @ A, AtW)
            G[m, m:, :] = Gm
        self._P = jnp.asarray(P, jnp.float32)
        self._G = jnp.asarray(G, jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, field: jnp.ndarray) -> jnp.ndarray:
        """field (..., nlat, nlon) -> filtered field, same shape."""
        nlon = self.nlon
        L = self.lmax + 1
        # longitude FFT: [..., nlat, M_full]
        F = jnp.fft.rfft(field, axis=-1) / nlon
        F = F[..., :L]  # truncate zonal wavenumbers m <= lmax
        # forward Legendre: least-squares projection per zonal wavenumber
        alm = jnp.einsum("...ym,mly->...lm", F, self._G)
        # inverse: F(lat, m) = sum_l a_lm P̄_lm(lat)
        F_back = jnp.einsum("...lm,ylm->...ym", alm, self._P)
        # pad back to full rfft length and inverse FFT
        pad = nlon // 2 + 1 - L
        F_full = jnp.concatenate(
            [F_back, jnp.zeros(F_back.shape[:-1] + (pad,), F_back.dtype)],
            axis=-1,
        )
        return jnp.fft.irfft(F_full * nlon, n=nlon, axis=-1)


def roundtrip_filter(field, lmax: Optional[int] = None,
                     grid: str = "equiangular",
                     fraction_modes_kept: Optional[float] = None):
    """One-shot filtering of (..., nlat, nlon)
    (reference xtorch_harmonics.roundtrip_filter:209-240; the forward
    and inverse share ``grid`` here — the mixed forward/inverse-grid
    combination the reference allows is the same filter composed with a
    latitudinal regrid)."""
    nlat, nlon = field.shape[-2:]
    return RoundTripFilter(
        nlat, nlon, lmax, grid=grid, fraction_modes_kept=fraction_modes_kept
    )(field)
