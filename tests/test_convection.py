"""Betts-Miller convection tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core import constants as c
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics.convection import ConvectionParams, betts_miller
from fv3net_tpu.physics.microphysics import saturation_specific_humidity

jax.config.update("jax_enable_x64", True)


def column(nz=16, t_sfc=302.0, lapse=6.5e-3, rh=0.8):
    delp = np.full((1, nz), 1.0e5 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    # height from hydrostatic approx for the T profile; stratospheric floor
    z = -c.RDGAS * 260.0 / c.GRAVITY * np.log(pmid / pmid[..., -1:])
    T = np.maximum(t_sfc - lapse * z, 200.0)
    q = rh * np.asarray(saturation_specific_humidity(T, pmid))
    return T, q, pmid, delp


def test_stable_column_untouched():
    """A strongly stable (isothermal) dry column has no instability."""
    nz = 12
    delp = np.full((1, nz), 1.0e5 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    T = np.full((1, nz), 300.0)  # isothermal = very stable
    q = np.full((1, nz), 1e-6)  # nearly dry parcel: no latent kick
    T2, q2, precip = map(np.asarray, betts_miller(T, q, pmid, delp, 900.0))
    np.testing.assert_allclose(precip, 0.0, atol=1e-12)
    np.testing.assert_allclose(T2, T)
    np.testing.assert_allclose(q2, q)


def test_unstable_column_precipitates_and_conserves_enthalpy():
    T, q, pmid, delp = column(t_sfc=305.0, lapse=9.0e-3, rh=0.95)
    dt = 900.0
    # rh_ref below the column's RH so adjustment dries (precipitates)
    params = ConvectionParams(rh_ref=0.4)
    T2, q2, precip = map(
        np.asarray, betts_miller(T, q, pmid, delp, dt, params)
    )
    assert precip[0] > 0
    dm = delp / c.GRAVITY
    # column moist enthalpy conserved: cp dT + Lv dq integrates to ~0
    lv = np.asarray(thermo.latent_heat_vaporization(T))
    dh = (c.CP_AIR * (T2 - T) * dm + lv * (q2 - q) * dm).sum()
    scale = float((c.CP_AIR * np.abs(T2 - T) * dm).sum()) + 1.0
    assert abs(dh) < 0.05 * scale
    # precip equals column drying
    np.testing.assert_allclose(
        precip[0], -((q2 - q) * dm).sum() / dt, rtol=1e-9
    )
    assert (q2 >= 0).all()


def test_adjustment_reduces_instability():
    T, q, pmid, delp = column(t_sfc=305.0, lapse=9.5e-3, rh=0.95)
    params = ConvectionParams(tau=1800.0)
    Tn, qn = T, q
    for _ in range(8):
        Tn, qn, _ = betts_miller(Tn, qn, pmid, delp, 900.0, params)
    Tn = np.asarray(Tn)
    # lower-tropospheric lapse rate decreased (more stable)
    dT_before = T[0, -1] - T[0, nz_mid := 8]
    dT_after = Tn[0, -1] - Tn[0, nz_mid]
    assert dT_after < dT_before + 1e-9


def test_dry_midlevels_conserve_water_and_enthalpy():
    """A bone-dry mid-troposphere over a moist boundary layer: the
    reference-shift clamp must not create column water (regression: the
    final q>=0 clip injected ~kg/m^2 of water with zero precip)."""
    T, q, pmid, delp = column(t_sfc=305.0, lapse=9.5e-3, rh=0.9)
    q = np.asarray(q)
    q[0, 4:10] = 1e-8  # dry slot
    qj = jnp.asarray(q)
    params = ConvectionParams(tau=900.0)  # tau=dt: strongest adjustment
    T2, q2, precip = map(
        np.asarray, betts_miller(T, qj, pmid, delp, 900.0, params)
    )
    dm = np.asarray(delp) / c.GRAVITY
    water = ((q2 - q) * dm).sum() + float(precip[0]) * 900.0
    assert abs(water) < 1e-10
    lv = np.asarray(thermo.latent_heat_vaporization(T))
    dh = (c.CP_AIR * (T2 - np.asarray(T)) * dm + lv * (q2 - q) * dm).sum()
    scale = float((c.CP_AIR * np.abs(T2 - np.asarray(T)) * dm).sum()) + 1.0
    assert abs(dh) < 1e-6 * scale + 1e-6
    assert (q2 >= 0).all()
