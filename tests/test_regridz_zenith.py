"""Tests for pressure-level regridding and solar zenith angle."""
import datetime

import numpy as np
import pytest
import jax

from fv3net_tpu.ops import regridz, zenith, thermo

jax.config.update("jax_enable_x64", True)


def test_regrid_to_area_weighted_pressure_conserves_constant():
    rng = np.random.RandomState(0)
    ny = nx = 8
    nz = 10
    factor = 4
    delp = rng.uniform(500, 1500, (ny, nx, nz))
    area = rng.uniform(0.5, 2.0, (ny, nx))
    fields = {"T": np.full((ny, nx, nz), 273.0)}
    out, w = regridz.regrid_to_area_weighted_pressure(fields, delp, area, factor)
    # a constant field stays constant wherever weights are unmasked
    T = np.asarray(out["T"])
    wm = np.asarray(w)
    np.testing.assert_allclose(T[wm > 0], 273.0, rtol=1e-9)
    assert wm.shape == (ny, nx, nz)


def test_regrid_mask_below_surface():
    """Columns with lower surface pressure than the coarse interface are
    masked (reference regridz.py:200-222)."""
    ny = nx = 4
    nz = 6
    factor = 4
    # one column has much less total mass -> coarse bottom interface below
    # its surface pressure
    delp = np.full((ny, nx, nz), 1000.0)
    delp[0, 0, :] = 500.0
    area = np.ones((ny, nx))
    fields = {"T": np.full((ny, nx, nz), 1.0)}
    _, w = regridz.regrid_to_area_weighted_pressure(fields, delp, area, factor)
    w = np.asarray(w)
    # bottom layers of the light column are masked
    assert w[0, 0, -1] == 0.0
    # heavy columns keep their weights
    assert (w[1, 1, :] > 0).all()


def test_stagger_center_to_edge_shapes():
    x = np.arange(24.0).reshape(2, 3, 4)  # (y, x, z)
    edges_x = np.asarray(regridz.stagger_center_to_edge(x, axis=-2))
    assert edges_x.shape == (2, 4, 4)
    np.testing.assert_allclose(edges_x[:, 1, :], 0.5 * (x[:, 0, :] + x[:, 1, :]))
    np.testing.assert_allclose(edges_x[:, 0, :], x[:, 0, :])
    edges_y = np.asarray(regridz.stagger_center_to_edge(x, axis=-3))
    assert edges_y.shape == (3, 3, 4)


def test_interpolate_to_pressure_levels():
    rng = np.random.RandomState(1)
    nz = 30
    delp = np.full((5, nz), 100000.0 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    # field linear in pressure -> interpolation must be near-exact
    field = 2.0 * pmid + 5.0
    out = np.asarray(regridz.interpolate_to_pressure_levels(field, delp))
    grid = regridz.PRESSURE_GRID
    inside = (grid >= pmid[:, :1]) & (grid <= pmid[:, -1:])
    want = 2.0 * grid + 5.0
    np.testing.assert_allclose(
        out[inside], np.broadcast_to(want, out.shape)[inside], rtol=1e-9
    )
    assert np.isnan(out[~inside]).all()


def test_cos_zenith_angle_against_reference_values():
    """Spot checks: subsolar point near equator at equinox noon; polar night."""
    # 2000-03-20 ~ equinox; at lon where local solar noon, lat 0 -> cos ~ 1
    t = datetime.datetime(2000, 3, 20, 12, 0)
    days = zenith.days_from_2000(t)
    # solar declination ~ 0 at equinox: cos_zenith at (lat=0) peaks near 1
    lons = np.linspace(-180, 180, 721)
    cz = np.asarray(zenith.cos_zenith_angle(days, lons, np.zeros_like(lons)))
    assert cz.max() > 0.999
    # antipode is night
    assert cz.min() < -0.999
    # poles at equinox: sun on horizon -> |cos| small
    cz_pole = float(zenith.cos_zenith_angle(days, 0.0, 89.9))
    assert abs(cz_pole) < 0.05


def test_cos_zenith_angle_day_cycle():
    """24h later the pattern returns (approximately)."""
    t0 = zenith.days_from_2000(datetime.datetime(2000, 6, 1, 0, 0))
    t1 = zenith.days_from_2000(datetime.datetime(2000, 6, 2, 0, 0))
    lon = np.linspace(0, 350, 36)
    lat = np.full_like(lon, 45.0)
    a = np.asarray(zenith.cos_zenith_angle(t0, lon, lat))
    b = np.asarray(zenith.cos_zenith_angle(t1, lon, lat))
    np.testing.assert_allclose(a, b, atol=0.03)


def test_days_from_2000():
    assert zenith.days_from_2000(datetime.datetime(2000, 1, 1, 12, 0)) == 0.0
    assert zenith.days_from_2000(datetime.datetime(2000, 1, 2, 12, 0)) == 1.0
    arr = zenith.days_from_2000(
        np.array([datetime.datetime(2000, 1, 2, 0, 0)], dtype=object)
    )
    np.testing.assert_allclose(arr, [0.5])


def test_solar_distance_factor():
    """Spencer (a/r)^2: perihelion (early Jan) ~ +3.4%, aphelion (early
    Jul) ~ -3.3%, annual mean ~ 1 (reference radiation_astronomy.py
    sol_update's orbit scaling role)."""
    import numpy as np

    from fv3net_tpu.ops.zenith import solar_distance_factor

    jan = float(solar_distance_factor(3.0))
    jul = float(solar_distance_factor(185.0))
    assert 1.02 < jan < 1.04
    assert 0.96 < jul < 0.98
    days = np.arange(0, 365.25, 0.25)
    mean = float(np.mean(np.asarray(solar_distance_factor(days))))
    assert abs(mean - 1.0) < 2e-3
