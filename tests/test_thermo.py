"""Thermodynamics parity tests (float64) against independent numpy formulas.

Mirrors the reference test strategy for vcm.calc.thermo (reference:
external/vcm/tests/test_calc.py) with hand-computed numpy expectations.
"""
import numpy as np
import pytest
import jax

from fv3net_tpu.ops import thermo
from fv3net_tpu.core import constants as c

jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_potential_temperature_roundtrip(rng):
    p = rng.uniform(2e4, 1e5, (4, 5))
    t = rng.uniform(200, 310, (4, 5))
    theta = thermo.potential_temperature(p, t)
    back = thermo.temperature_from_potential_temperature(p, theta)
    np.testing.assert_allclose(np.asarray(back), t, rtol=1e-12)
    # at reference pressure theta == T
    np.testing.assert_allclose(
        np.asarray(thermo.potential_temperature(1e5, 280.0)), 280.0
    )


def test_saturation_pressure_magnus():
    # 0 C -> 610.94 Pa exactly by construction
    np.testing.assert_allclose(
        np.asarray(thermo.saturation_pressure(273.15)), 610.94, rtol=1e-12
    )
    # 20 C ~ 2.33 kPa (Magnus)
    es20 = float(thermo.saturation_pressure(293.15))
    assert 2300 < es20 < 2400


def test_relative_humidity_inverts_specific_humidity(rng):
    t = rng.uniform(250, 300, (10,))
    rho = rng.uniform(0.5, 1.2, (10,))
    rh = rng.uniform(0.1, 0.9, (10,))
    q = thermo.specific_humidity_from_rh(t, rh, rho)
    rh2 = thermo.relative_humidity(t, np.asarray(q), rho)
    np.testing.assert_allclose(np.asarray(rh2), rh, rtol=1e-12)


def test_density_pressure_thickness_roundtrip(rng):
    delp = rng.uniform(100, 2000, (6,))
    delz = -rng.uniform(50, 500, (6,))  # negative as in FV3
    rho = thermo.density(delp, delz)
    delp2 = thermo.pressure_thickness(np.asarray(rho), delz)
    np.testing.assert_allclose(np.asarray(delp2), delp, rtol=1e-12)


def test_pressure_at_interface_and_surface(rng):
    delp = rng.uniform(100, 2000, (3, 7))
    pi = np.asarray(thermo.pressure_at_interface(delp))
    assert pi.shape == (3, 8)
    np.testing.assert_allclose(pi[:, 0], c.TOA_PRESSURE)
    np.testing.assert_allclose(pi[:, -1], delp.sum(-1) + c.TOA_PRESSURE)
    np.testing.assert_allclose(np.diff(pi, axis=-1), delp, rtol=1e-12)
    ps = np.asarray(thermo.surface_pressure_from_delp(delp))
    np.testing.assert_allclose(ps, pi[:, -1], rtol=1e-12)


def test_pressure_at_midpoint_log_between_interfaces(rng):
    delp = rng.uniform(100, 2000, (7,))
    pi = np.asarray(thermo.pressure_at_interface(delp))
    pm = np.asarray(thermo.pressure_at_midpoint_log(delp))
    assert ((pm > pi[:-1]) & (pm < pi[1:])).all()
    # Simmons-Burridge formula
    np.testing.assert_allclose(pm, delp / np.diff(np.log(pi)), rtol=1e-12)


def test_height_at_interface_hydrostatic_consistency(rng):
    nz = 9
    t = rng.uniform(220, 300, (nz,))
    q = rng.uniform(0, 0.02, (nz,))
    delp = rng.uniform(500, 1500, (nz,))
    dz = np.asarray(thermo.hydrostatic_dz(t, q, delp))
    assert (dz < 0).all()
    phis = np.array(100.0 * c.GRAVITY)
    zi = np.asarray(thermo.height_at_interface(dz, phis))
    assert zi.shape == (nz + 1,)
    np.testing.assert_allclose(zi[-1], 100.0, rtol=1e-12)
    # interfaces increase upward (towards index 0)
    assert (np.diff(zi) < 0).all()
    np.testing.assert_allclose(np.diff(zi), dz, rtol=1e-10)
    # midpoints lie between interfaces
    zm = np.asarray(thermo.height_at_midpoint(dz, phis))
    assert ((zm < zi[:-1]) & (zm > zi[1:])).all()


def test_mass_integrate(rng):
    f = rng.randn(4, 6)
    delp = rng.uniform(100, 1000, (4, 6))
    out = np.asarray(thermo.mass_integrate(f, delp))
    np.testing.assert_allclose(out, (f * delp / c.GRAVITY).sum(-1), rtol=1e-12)


def test_liquid_ice_temperature_no_condensate_is_identity(rng):
    t = rng.uniform(200, 300, (5,))
    z = np.zeros(5)
    np.testing.assert_allclose(
        np.asarray(thermo.liquid_ice_temperature(t, z, z, z, z, z)), t
    )


def test_net_precipitation_balance():
    # if precip exactly balances evaporation, net is zero
    lhf = np.array([100.0])
    prate = np.asarray(thermo.latent_heat_flux_to_evaporation(lhf))
    out = np.asarray(thermo.net_precipitation(lhf, prate))
    np.testing.assert_allclose(out, 0.0, atol=1e-12)


def test_non_negative_sphum_limits_only_when_needed():
    sphum = np.array([1e-3, 1e-3])
    dQ2 = np.array([-1e-6, -1e-2])  # second would drive q negative over dt=1
    dQ1 = np.array([1.0, 1.0])
    q1n, q2n = thermo.non_negative_sphum(sphum, dQ1, dQ2, dt=1.0)
    np.testing.assert_allclose(np.asarray(q2n)[0], -1e-6)
    np.testing.assert_allclose(np.asarray(q2n)[1], -1e-3)  # limited to -sphum/dt
    np.testing.assert_allclose(np.asarray(q1n)[1], 0.1)  # scaled by same ratio


def test_non_negative_sphum_mse_conserving_conserves_mse():
    sphum = np.array([1e-3])
    q2 = np.array([-1e-2])
    q1 = np.array([5e-3])
    q2n, q1n = thermo.non_negative_sphum_mse_conserving(sphum, q2, dt=1.0, q1=q1)
    np.testing.assert_allclose(np.asarray(q2n), -1e-3)
    mse_before = np.asarray(thermo.moist_static_energy_tendency(q1, q2))
    mse_after = np.asarray(thermo.moist_static_energy_tendency(q1n, np.asarray(q2n)))
    np.testing.assert_allclose(mse_before, mse_after, rtol=1e-12)


def test_axis_argument_consistency(rng):
    """Every axis-aware function must agree after moving the z axis."""
    delp = rng.uniform(100, 1000, (3, 4, 6))
    f = rng.randn(3, 4, 6)
    for fn in [thermo.mass_integrate, thermo.mass_cumsum]:
        a = np.asarray(fn(f, delp, axis=-1))
        b = np.asarray(fn(np.moveaxis(f, -1, 0), np.moveaxis(delp, -1, 0), axis=0))
        np.testing.assert_allclose(a, np.moveaxis(b, 0, -1) if b.ndim == 3 else b)
    a = np.asarray(thermo.pressure_at_interface(delp, axis=-1))
    b = np.asarray(thermo.pressure_at_interface(np.moveaxis(delp, -1, 0), axis=0))
    np.testing.assert_allclose(a, np.moveaxis(b, 0, -1))
