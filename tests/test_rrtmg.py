"""RRTMG-structured radiation: physics + structure tests.

The reference validates its port against regression data for the GCS
lookup tables (external/radiation/tests/); without that data the contract
here is physical: exact spectral partitions, energy conservation, cloud
radiative effects of the right sign/magnitude, and solver limits.
"""
import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.physics.radiation import (
    Radiation,
    RadiationConfig,
    RadiationDriver,
    DriverConfig,
)
from fv3net_tpu.physics.radiation import optics, spectra, sw
from fv3net_tpu.physics.radiation import params as P

SIGMA = 5.670374419e-8


def profile(ncol=8, nz=32, tsfc=300.0, qc_level=None, lat_deg=None):
    sig_e = np.linspace(0.0, 1.0, nz + 1) ** 1.3
    psfc = 1.013e5
    plev = 100.0 + sig_e * (psfc - 100.0)
    dp = np.diff(plev)
    play = 0.5 * (plev[:-1] + plev[1:])
    T = np.clip(tsfc * (play / psfc) ** 0.19, 200.0, None)
    q = 0.016 * (play / psfc) ** 3
    qc = np.zeros(nz)
    if qc_level is not None:
        qc[qc_level] = 2e-5
    if lat_deg is None:
        lat_deg = np.linspace(-60, 60, ncol)
    return {
        "air_temperature": jnp.asarray(np.broadcast_to(T, (ncol, nz))),
        "pressure_thickness_of_atmospheric_layer": jnp.asarray(
            np.broadcast_to(dp, (ncol, nz))
        ),
        "specific_humidity": jnp.asarray(np.broadcast_to(q, (ncol, nz))),
        "cloud_water_mixing_ratio": jnp.asarray(np.broadcast_to(qc, (ncol, nz))),
        "surface_temperature": jnp.full((ncol,), tsfc),
        "latitude": jnp.asarray(np.deg2rad(lat_deg)),
        "longitude": jnp.zeros((ncol,)),
        "land_sea_mask": jnp.zeros((ncol,)),
    }


NOON = datetime.datetime(2016, 7, 1, 12)


@pytest.fixture(scope="module")
def driver():
    return RadiationDriver(DriverConfig())


@pytest.fixture(scope="module")
def out(driver):
    return driver(NOON, profile(qc_level=22))


# ------------------------------------------------------------- spectra
def test_planck_polynomial_matches_exact_integral():
    coefs = spectra.planck_band_coefs()
    T = np.linspace(170.0, 350.0, 37)
    X = np.vander(T / spectra.T_REF, coefs.shape[0], increasing=True)
    approx = X @ coefs
    for b in range(P.NBANDS_LW):
        exact = spectra._planck_band_power(T, P.WVN1_LW[b], P.WVN2_LW[b])
        assert np.max(np.abs(approx[:, b] - exact) / exact.max()) < 5e-3


def test_planck_bands_cover_stefan_boltzmann():
    coefs = spectra.planck_band_coefs()
    for T in (220.0, 260.0, 300.0):
        x = np.vander([T / spectra.T_REF], coefs.shape[0], increasing=True)
        total = (x @ coefs).sum()
        assert 0.96 * SIGMA * T ** 4 < total <= 1.001 * SIGMA * T ** 4


def test_solar_band_fractions():
    frac = spectra.solar_band_fraction()
    assert frac.shape == (P.NBANDS_SW,)
    np.testing.assert_allclose(frac.sum(), 1.0, rtol=1e-12)
    # the 0.78-1.24 um band carries the largest share of sunlight
    assert frac.argmax() == 7


def test_gpoint_structure():
    kd = spectra.lw_kdist()
    assert kd.kmaj.shape == (P.NGPT_LW,)
    # per-band quadrature weights sum to 1
    for b in range(P.NBANDS_LW):
        sel = kd.band_of_gpt == b
        np.testing.assert_allclose(kd.gwt[sel].sum(), 1.0, rtol=1e-12)
    # k increases with cumulative probability within a band (sorted dist)
    sel = kd.band_of_gpt == 0
    assert np.all(np.diff(kd.kmaj[sel]) > 0)


# -------------------------------------------------------------- optics
def test_mcica_mask_recovers_cloud_fraction():
    cf = jnp.full((4, 10), 0.4).at[:, :3].set(0.0)
    mask = optics.mcica_subcolumns(cf, 1000, jax.random.PRNGKey(0))
    mean = np.asarray(mask.mean(axis=1))
    np.testing.assert_allclose(mean[:, 3:], 0.4, atol=0.05)
    np.testing.assert_allclose(mean[:, :3], 0.0)


def test_mcica_maximum_overlap_of_adjacent_layers():
    # identical adjacent cloudy layers must share exactly the same mask
    cf = jnp.full((2, 6), 0.5)
    mask = optics.mcica_subcolumns(cf, 512, jax.random.PRNGKey(1))
    m = np.asarray(mask)
    assert (m[:, :, 0] == m[:, :, 1]).all()


def test_two_stream_energy_limits():
    tau = jnp.asarray([0.01, 0.1, 1.0, 10.0, 100.0])
    for ssa, g in [(0.9999999, 0.85), (0.5, 0.0), (0.05, 0.6)]:
        rdif, tdif, rdir, tdir, t0 = sw.two_stream(
            tau, jnp.full_like(tau, ssa), jnp.full_like(tau, g), 0.5
        )
        for v in (rdif, tdif, rdir, tdir, t0):
            assert np.all(np.asarray(v) >= -1e-6)
        assert np.all(np.asarray(rdif + tdif) <= 1.0 + 1e-6)
        assert np.all(np.asarray(rdir + tdir + t0) <= 1.0 + 1e-6)
    # conservative thick cloud reflects nearly everything
    rdif, tdif, *_ = sw.two_stream(
        jnp.asarray(100.0), jnp.asarray(0.9999999), jnp.asarray(0.85), 0.5
    )
    assert rdif > 0.9


# -------------------------------------------------------------- driver
def test_lw_fluxes_physical(out):
    olr = np.asarray(
        out["clear_sky_upward_longwave_flux_at_top_of_atmosphere_python"]
    )
    assert np.all((olr > 200.0) & (olr < 340.0))
    dlw = np.asarray(out["total_sky_downward_longwave_flux_at_surface_python"])
    assert np.all((dlw > 250.0) & (dlw < SIGMA * 300.0 ** 4))
    # surface upward LW is near-blackbody emission at tsfc
    ulw = np.asarray(out["total_sky_upward_longwave_flux_at_surface_python"])
    np.testing.assert_allclose(ulw, SIGMA * 300.0 ** 4, rtol=0.08)


def test_cloud_reduces_olr_and_sunlight(driver, out):
    clear = driver(NOON, profile(qc_level=None))
    olr_cld = np.asarray(
        out["total_sky_upward_longwave_flux_at_top_of_atmosphere_python"]
    )
    olr_clr = np.asarray(
        clear["total_sky_upward_longwave_flux_at_top_of_atmosphere_python"]
    )
    assert np.all(olr_cld < olr_clr)
    swd_cld = np.asarray(
        out["total_sky_downward_shortwave_flux_at_surface_python"]
    )
    swd_clr = np.asarray(
        clear["total_sky_downward_shortwave_flux_at_surface_python"]
    )
    assert np.all(swd_cld <= swd_clr + 1e-6)


def test_sw_toa_budget(out):
    dn = np.asarray(
        out["total_sky_downward_shortwave_flux_at_top_of_atmosphere_python"]
    )
    up = np.asarray(
        out["total_sky_upward_shortwave_flux_at_top_of_atmosphere_python"]
    )
    cosz = np.asarray(out["cos_zenith_angle"])
    np.testing.assert_allclose(dn, P.S0 * np.maximum(cosz, 0) * (cosz > 1e-3),
                               rtol=1e-5, atol=1e-3)
    albedo = up / np.maximum(dn, 1e-6)
    assert np.all((albedo > 0.03) & (albedo < 0.7))


def test_sw_energy_conservation(driver):
    """TOA net in = atmospheric absorption + surface net absorption."""
    state = profile(qc_level=20)
    out = driver(NOON, state)
    dp = np.asarray(state["pressure_thickness_of_atmospheric_layer"])
    from fv3net_tpu.core.constants import CP_AIR, GRAVITY

    absorbed = (
        np.asarray(out["total_sky_shortwave_heating_rate_python"])
        * CP_AIR * dp / GRAVITY
    ).sum(-1)
    toa = np.asarray(
        out["total_sky_downward_shortwave_flux_at_top_of_atmosphere_python"]
    ) - np.asarray(
        out["total_sky_upward_shortwave_flux_at_top_of_atmosphere_python"]
    )
    sfc = np.asarray(
        out["total_sky_downward_shortwave_flux_at_surface_python"]
    ) - np.asarray(out["total_sky_upward_shortwave_flux_at_surface_python"])
    np.testing.assert_allclose(toa - sfc, absorbed, rtol=1e-4, atol=0.05)


def test_lw_energy_conservation(driver):
    state = profile(qc_level=None)
    out = driver(NOON, state)
    dp = np.asarray(state["pressure_thickness_of_atmospheric_layer"])
    from fv3net_tpu.core.constants import CP_AIR, GRAVITY

    absorbed = (
        np.asarray(out["total_sky_longwave_heating_rate_python"])
        * CP_AIR * dp / GRAVITY
    ).sum(-1)
    net_toa = -np.asarray(
        out["total_sky_upward_longwave_flux_at_top_of_atmosphere_python"]
    )
    net_sfc = np.asarray(
        out["total_sky_downward_longwave_flux_at_surface_python"]
    ) - np.asarray(out["total_sky_upward_longwave_flux_at_surface_python"])
    np.testing.assert_allclose(net_toa - net_sfc, absorbed, rtol=1e-4,
                               atol=0.05)


def test_night_columns_have_zero_sw(driver):
    state = profile(ncol=4, lat_deg=np.array([-70.0, -80.0, 80.0, 70.0]))
    out = driver(datetime.datetime(2016, 12, 21, 12), state)  # austral summer
    cosz = np.asarray(out["cos_zenith_angle"])
    night = cosz <= 1e-3
    assert night.any() and (~night).any()
    for k in (
        "total_sky_downward_shortwave_flux_at_surface_python",
        "total_sky_upward_shortwave_flux_at_top_of_atmosphere_python",
    ):
        assert np.all(np.asarray(out[k])[night] == 0.0)
        assert np.all(np.asarray(out[k])[~night] > 0.0)


def test_heating_rates_bounded(out):
    for k in (
        "total_sky_longwave_heating_rate_python",
        "total_sky_shortwave_heating_rate_python",
    ):
        htr_day = np.asarray(out[k]) * 86400.0
        assert np.isfinite(htr_day).all()
        assert np.abs(htr_day).max() < 40.0


def test_driver_jits_and_is_f32(driver):
    state = profile(ncol=4)
    fn = jax.jit(lambda s: driver(NOON, s))
    out = fn(state)
    olr = out["total_sky_upward_longwave_flux_at_top_of_atmosphere_python"]
    assert olr.dtype == jnp.float32
    ref = driver(NOON, state)
    np.testing.assert_allclose(
        np.asarray(olr),
        np.asarray(
            ref["total_sky_upward_longwave_flux_at_top_of_atmosphere_python"]
        ),
        rtol=2e-5,
    )


def test_wrapper_scheme_dispatch():
    rad = Radiation(RadiationConfig(scheme="rrtmg"), 900.0)
    out = rad(NOON, profile(ncol=2))
    assert "tendency_of_air_temperature_due_to_radiation" in out
    assert "cos_zenith_angle" in out
    rad_gray = Radiation(RadiationConfig(scheme="gray"), 900.0)
    out_gray = rad_gray(NOON, profile(ncol=2))
    assert "tendency_of_air_temperature_due_to_radiation" in out_gray
    with pytest.raises(ValueError):
        Radiation(RadiationConfig(scheme="nope"), 900.0).validate()


def test_lw_opaque_limit_emits_from_layer_top():
    """In the optically thick limit the upward flux leaving a layer must
    equal the Planck emission of its TOP boundary (regression: the up-pass
    source boundaries were swapped, biasing OLR toward the warmer lower
    boundary in every thick g-point)."""
    import numpy as np
    import jax.numpy as jnp

    from fv3net_tpu.physics.radiation.lw import lw_transfer

    ncol, ngpt, nlay = 2, 1, 4
    e_lev = jnp.asarray(np.linspace(1.0, 5.0, nlay + 1))[None, None, :]
    e_lev = e_lev * jnp.ones((ncol, ngpt, 1))
    tau = jnp.full((ncol, ngpt, nlay), 50.0)
    fl = lw_transfer(
        tau, e_lev, None, e_lev[..., -1], jnp.ones((ncol,)),
        jnp.full((ncol, nlay), 1e4),
    )
    assert abs(float(fl.up[0, 0]) - 1.0) < 0.05
    # downward flux at the surface likewise emits from the BOTTOM boundary
    assert abs(float(fl.dn[0, -1]) - 5.0) < 0.25


def test_mcica_random_overlap_option():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fv3net_tpu.physics.radiation.optics import mcica_subcolumns

    cf = jnp.full((16, 10), 0.5)
    k = jax.random.PRNGKey(0)
    m1 = np.asarray(mcica_subcolumns(cf, 64, k, iovr=1))
    m0 = np.asarray(mcica_subcolumns(cf, 64, k, iovr=0))
    assert not np.array_equal(m1, m0)
    # both honor the cloud fraction statistically
    for m in (m0, m1):
        assert abs(m.mean() - 0.5) < 0.05


def test_bfloat16_storage_mode_close_to_f32():
    """The bf16 storage dtype for the big g-space planes (production
    default on accelerators; lw.set_storage_dtype) must stay within a
    small fraction of per-call McICA noise of the exact f32 path."""
    from fv3net_tpu.physics.radiation.rrtmg.driver import (
        RRTMGConfig,
        RRTMGDriver,
    )

    state = {
        k: jnp.asarray(np.asarray(v, np.float32))
        for k, v in profile(ncol=8, nz=24, qc_level=16).items()
    }
    d32 = RRTMGDriver(RRTMGConfig(storage_dtype="float32"))
    d16 = RRTMGDriver(RRTMGConfig(storage_dtype="bfloat16"))
    o32 = jax.jit(lambda s: d32(NOON, s))(state)
    o16 = jax.jit(lambda s: d16(NOON, s))(state)
    try:
        for k, v in o32.items():
            a, b = np.asarray(v, np.float64), np.asarray(
                o16[k], np.float64
            )
            assert b.dtype == a.dtype or True  # outputs stay f32
            if "flux" in k:
                assert np.abs(a - b).max() < 1.0, k  # W/m2
            elif "heating" in k or "tendency" in k:
                assert np.abs(a - b).max() * 86400.0 < 0.5, k  # K/day
        # outputs themselves are NOT bf16 (accumulations stay f32)
        assert o16[
            "total_sky_longwave_heating_rate_python"
        ].dtype == jnp.float32
    finally:
        # the config setter is process-wide; restore the default
        from fv3net_tpu.physics.radiation.rrtmg import lw as rlw

        rlw.set_storage_dtype("auto")


def test_column_blocking_equivalent():
    """Blocked (lax.map over column blocks) and full-width driver paths
    agree to f32 roundoff: all solver math is per-column, but XLA
    reassociates the k-table contractions differently per batch shape,
    so exact bit-equality across block sizes is not guaranteed (measured
    max flux delta 1.5e-3 W/m2).  Exercises a ragged tail (ncol=20,
    blk=8) so the edge padding path is covered too."""
    from fv3net_tpu.physics.radiation.rrtmg.driver import (
        RRTMGConfig,
        RRTMGDriver,
    )

    state = {
        k: jnp.asarray(np.asarray(v, np.float32))
        for k, v in profile(ncol=20, nz=24, qc_level=16).items()
    }
    d_full = RRTMGDriver(RRTMGConfig(column_block=0))
    d_blk = RRTMGDriver(RRTMGConfig(column_block=8))
    o_full = jax.jit(lambda s: d_full(NOON, s))(state)
    o_blk = jax.jit(lambda s: d_blk(NOON, s))(state)
    for k, v in o_full.items():
        a = np.asarray(v, np.float64)
        b = np.asarray(o_blk[k], np.float64)
        d = np.abs(a - b).max()
        if "flux" in k or "optical_depth" in k:
            assert d < 0.01, (k, d)  # W/m2
        else:  # heating rates / cosz
            assert d < 1e-6, (k, d)
