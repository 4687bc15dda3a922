"""Spherical-harmonic roundtrip filter tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.ops.spherical import RoundTripFilter, roundtrip_filter


def grid(nlat, nlon):
    lat = (np.arange(nlat) + 0.5) / nlat * np.pi - np.pi / 2
    lon = np.arange(nlon) / nlon * 2 * np.pi
    return np.meshgrid(lat, lon, indexing="ij")


def test_low_degree_fields_pass_through():
    nlat, nlon = 48, 96
    LAT, LON = grid(nlat, nlon)
    # Y_1^0 ~ sin(lat), Y_2^2-like ~ cos^2(lat) cos(2 lon)
    field = (
        1.5
        + np.sin(LAT)
        + 0.5 * np.cos(LAT) ** 2 * np.cos(2 * LON)
    )
    out = np.asarray(roundtrip_filter(jnp.asarray(field, jnp.float32),
                                      lmax=10))
    np.testing.assert_allclose(out, field, atol=2e-3)


def test_high_wavenumber_removed():
    nlat, nlon = 48, 96
    LAT, LON = grid(nlat, nlon)
    smooth = np.sin(LAT)
    noise = 0.5 * np.cos(LAT) * np.cos(30 * LON)  # zonal wavenumber 30
    out = np.asarray(
        roundtrip_filter(jnp.asarray(smooth + noise, jnp.float32), lmax=10)
    )
    np.testing.assert_allclose(out, smooth, atol=5e-3)


def test_filter_is_projection():
    """Applying the filter twice equals applying it once."""
    nlat, nlon = 32, 64
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(nlat, nlon), jnp.float32)
    filt = RoundTripFilter(nlat, nlon, lmax=8)
    once = np.asarray(filt(f))
    twice = np.asarray(filt(jnp.asarray(once)))
    np.testing.assert_allclose(twice, once, atol=2e-4)


def test_batched():
    nlat, nlon = 16, 32
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.rand(3, nlat, nlon), jnp.float32)
    filt = RoundTripFilter(nlat, nlon, lmax=5)
    out = np.asarray(filt(f))
    assert out.shape == (3, nlat, nlon)
    single = np.asarray(filt(f[1]))
    np.testing.assert_allclose(out[1], single, atol=1e-5)


def test_global_mean_preserved():
    nlat, nlon = 32, 64
    rng = np.random.RandomState(2)
    f = rng.rand(nlat, nlon)
    lat = (np.arange(nlat) + 0.5) / nlat * np.pi - np.pi / 2
    w = np.cos(lat)[:, None] * np.ones((nlat, nlon))
    out = np.asarray(roundtrip_filter(jnp.asarray(f, jnp.float32), lmax=6))
    mean_in = (f * w).sum() / w.sum()
    mean_out = (out * w).sum() / w.sum()
    np.testing.assert_allclose(mean_out, mean_in, rtol=1e-3)


def test_quadrature_grids_roundtrip_band_limited():
    """All three latitude grids (reference xtorch_harmonics grid options)
    reconstruct a band-limited field to round-off."""
    nlat, nlon = 24, 48
    for grid in ("equiangular", "legendre-gauss", "lobatto"):
        f = RoundTripFilter(nlat, nlon, lmax=10, grid=grid)
        lat = np.arcsin(f.x)
        lon = np.arange(nlon) / nlon * 2 * np.pi
        LA, LO = np.meshgrid(lat, lon, indexing="ij")
        field = (np.cos(LA) ** 2 * np.sin(LA) * np.cos(2 * LO)).astype(
            np.float32
        )
        out = np.asarray(f(jnp.asarray(field)))
        assert np.abs(out - field).max() < 2e-4, grid


def test_fraction_modes_kept_smooths():
    nlat, nlon = 24, 48
    rng = np.random.RandomState(0)
    noise = rng.randn(nlat, nlon).astype(np.float32)
    v_all = np.var(np.asarray(roundtrip_filter(jnp.asarray(noise),
                                               fraction_modes_kept=1.0)))
    v_few = np.var(np.asarray(roundtrip_filter(jnp.asarray(noise),
                                               fraction_modes_kept=0.2)))
    assert v_few < 0.5 * v_all


def test_lobatto_weights_integrate_polynomials():
    from fv3net_tpu.ops.spherical import _lobatto_nodes

    x, w = _lobatto_nodes(9)
    assert abs(float(w.sum()) - 2.0) < 1e-12
    assert abs(float((w * x * x).sum()) - 2.0 / 3.0) < 1e-12
