"""Zhao-Carr microphysics fidelity contracts (physics/microphysics.py).

Covers the GFS-structure elements added on top of the basic
condense/rain scheme: ice-phase latent heating, rain/snow partition,
snow melting through warm layers, cloud persistence in the Sundqvist
band, and the diagnosed cloud fraction (reference: the Fortran
gscond/precpd stages emulated via
external/emulation/emulation/__init__.py:1-18 and the zhao_carr
transforms in external/fv3fit/fv3fit/emulation/zhao_carr/).
"""
import numpy as np

from fv3net_tpu.core.constants import CP_AIR, GRAVITY, LATENT_HEAT_FUSION
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics import microphysics as mp


def _cold_column(nz=20, t_sfc=280.0, lapse=70.0):
    delp = np.full((1, nz), 1.0e5 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    T = t_sfc - lapse * (1.0 - pmid / pmid[..., -1:])
    return delp, pmid, T


def test_ice_fraction_ramp():
    T = np.array([300.0, 273.16, 265.66, 258.16, 240.0])
    fi = np.asarray(mp.ice_fraction(T))
    np.testing.assert_allclose(fi, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-12)


def test_cloud_persistence_band():
    """Cloud survives gscond when u00 < rh < 1 (Sundqvist band)."""
    delp, pmid, T = _cold_column(t_sfc=290.0, lapse=40.0)
    qsat = np.asarray(mp.saturation_specific_humidity(T, pmid))
    q = 0.9 * qsat  # inside the persistence band (u00 = 0.80)
    qc = np.full_like(q, 1e-4)
    T2, q2, qc2 = map(np.asarray, mp.gscond(T, q, qc, pmid, 900.0))
    np.testing.assert_allclose(qc2, qc, rtol=0, atol=1e-12)
    np.testing.assert_allclose(T2, T, rtol=0, atol=1e-10)


def test_gscond_evaporation_is_rate_limited():
    """Just below u00, only part of the cloud evaporates in one step."""
    delp, pmid, T = _cold_column(t_sfc=290.0, lapse=40.0)
    qsat = np.asarray(mp.saturation_specific_humidity(T, pmid))
    q = 0.75 * qsat  # slightly below u00 = 0.80
    qc = np.full_like(q, 2e-4)
    _, _, qc2 = map(np.asarray, mp.gscond(T, q, qc, pmid, 900.0))
    assert (qc2 < qc).all()  # some evaporation
    assert (qc2 > 0.5 * qc).all()  # but rate-limited, not instant


def test_cold_cloud_precipitates_as_snow():
    delp, pmid, T = _cold_column(t_sfc=260.0, lapse=40.0)  # all below 0C
    q = np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = np.full_like(q, 5e-4)
    T2, q2, qc2, precip, snow = map(
        np.asarray, mp.precpd(T, q, qc, pmid, delp, 900.0)
    )
    assert (precip > 0).all()
    np.testing.assert_allclose(snow, precip, rtol=1e-9)  # all frozen


def test_warm_cloud_precipitates_as_rain():
    delp, pmid, T = _cold_column(t_sfc=300.0, lapse=20.0)
    T = np.maximum(T, 280.0)  # whole column above freezing
    q = np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = np.full_like(q, 5e-4)
    _, _, _, precip, snow = map(
        np.asarray, mp.precpd(T, q, qc, pmid, delp, 900.0)
    )
    assert (precip > 0).all()
    np.testing.assert_allclose(snow, 0.0, atol=1e-15)


def test_snow_melts_falling_through_warm_layer():
    """Cold aloft, warm at the surface: snow forms aloft, melts on the
    way down, and the melting cools the warm layers."""
    nz = 24
    delp = np.full((1, nz), 1.0e5 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    T = 295.0 - 80.0 * (1.0 - pmid / pmid[..., -1:])  # ~215 K top, 295 K sfc
    q = np.asarray(mp.saturation_specific_humidity(T, pmid))
    # condensate only in the cold upper half
    qc = np.where(T < 260.0, 8e-4, 0.0)
    T2, q2, qc2, precip, snow = map(
        np.asarray, mp.precpd(T, q, qc, pmid, delp, 900.0)
    )
    assert (precip > 0).all()
    # surface precip is rain (snow melted through the warm layers)
    assert (snow < 0.05 * precip).all()
    # melting consumed fusion heat somewhere in the warm part
    warm = T >= 273.16
    assert ((T2 - T)[warm] < 1e-12).any()


def test_precpd_water_and_enthalpy_closure_with_ice():
    """Column water closes exactly; enthalpy closes once fusion of the
    surviving frozen flux is accounted."""
    nz = 24
    delp = np.full((3, nz), 1.0e5 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    rng = np.random.RandomState(0)
    T = 300.0 - 85.0 * (1.0 - pmid / pmid[..., -1:]) + rng.rand(3, nz)
    q = 0.9 * np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = 6e-4 * rng.rand(3, nz)
    dt = 900.0
    T2, q2, qc2, precip, snow = map(
        np.asarray, mp.precpd(T, q, qc, pmid, delp, dt)
    )
    dm = delp / GRAVITY
    w1 = ((q + qc) * dm).sum(-1)
    w2 = ((q2 + qc2) * dm).sum(-1) + precip * dt
    np.testing.assert_allclose(w2, w1, rtol=1e-9)
    assert (qc2 >= -1e-15).all() and (q2 >= 0).all()
    assert (snow >= 0).all() and (snow <= precip + 1e-15).all()


def test_cloud_fraction_diagnosis():
    delp, pmid, T = _cold_column(t_sfc=290.0, lapse=40.0)
    qsat = np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = np.full_like(qsat, 1e-4)
    cf_dry = np.asarray(
        mp.sundqvist_cloud_fraction(T, 0.5 * qsat, qc, pmid)
    )
    cf_mid = np.asarray(
        mp.sundqvist_cloud_fraction(T, 0.9 * qsat, qc, pmid)
    )
    cf_sat = np.asarray(
        mp.sundqvist_cloud_fraction(T, qsat, qc, pmid)
    )
    assert (cf_dry == 0.0).all()
    assert (0.0 < cf_mid).all() and (cf_mid < 1.0).all()
    np.testing.assert_allclose(cf_sat, 1.0, atol=1e-6)
    # no condensate -> no cloud regardless of rh
    cf_noqc = np.asarray(
        mp.sundqvist_cloud_fraction(T, qsat, np.zeros_like(qc), pmid)
    )
    assert (cf_noqc == 0.0).all()
