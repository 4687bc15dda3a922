"""Climatological aerosol optics (physics/radiation/aerosols.py;
reference: external/radiation/radiation/radiation_aerosols.py
radclimaer/setaer semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.physics.radiation import aerosols as am


@pytest.fixture(scope="module")
def tables():
    sw_lam = 1e4 / np.array([2925.0, 14425.0, 44000.0, 1710.0])
    lw_lam = 1e4 / np.array([180.0, 900.0, 2925.0])
    return am.make_aerosol_tables(sw_lam, lw_lam), sw_lam, lw_lam


def _profile(ncol=8, nlay=20):
    """Surface-first columns: 1000 -> 1 hPa."""
    plvl = np.geomspace(1013.0, 1.0, nlay + 1)
    plyr = jnp.asarray(
        np.broadcast_to(0.5 * (plvl[1:] + plvl[:-1]), (ncol, nlay))
    )
    delz = jnp.asarray(
        np.broadcast_to(
            np.diff(-7.0 * np.log(plvl / 1013.0)), (ncol, nlay)
        )
    )  # ~scale-height thicknesses, km
    rh = jnp.asarray(
        np.linspace(0.2, 0.95, ncol)[:, None] * np.ones((1, nlay))
    )
    land = jnp.asarray(np.array([0.0, 0.0, 1.0, 1.0] * (ncol // 4)))
    lat = jnp.deg2rad(jnp.asarray(np.linspace(-60, 60, ncol)))
    return plyr, delz, rh, land, lat


def test_tables_shapes_and_physics(tables):
    tab, sw_lam, lw_lam = tables
    nb = sw_lam.size + lw_lam.size
    assert tab["extrhi"].shape == (am.N_RHI, nb)
    assert tab["extrhd"].shape == (am.NRH, am.N_RHD, nb)
    # ssa in [0, 1]; sca = ssa * ext everywhere
    for pre in ("rhi", "rhd"):
        assert (tab[f"ssa{pre}"] >= 0).all() and (tab[f"ssa{pre}"] <= 1).all()
        np.testing.assert_allclose(
            tab[f"sca{pre}"], tab[f"ssa{pre}"] * tab[f"ext{pre}"]
        )
    # hygroscopic growth: extinction strictly increases with RH class
    grow = np.diff(tab["extrhd"], axis=0)
    assert (grow >= -1e-12).all()
    assert tab["extrhd"][-1].max() > 3.0 * tab["extrhd"][0].max()
    # fine-mode (waso, j=0) extinction decreases with wavelength
    waso_dry = tab["extrhd"][0, 0, : sw_lam.size]
    order = np.argsort(sw_lam)
    assert (np.diff(waso_dry[order]) < 0).all()


def test_setaer_contracts(tables):
    tab, sw_lam, lw_lam = tables
    args = _profile()
    aer_sw, aer_lw, aerodp = am.setaer(*args, tab, sw_lam.size)
    assert aer_sw.shape == args[0].shape + (sw_lam.size, 3)
    assert aer_lw.shape == args[0].shape + (lw_lam.size, 3)
    for aer in (aer_sw, aer_lw):
        a = np.asarray(aer)
        assert (a[..., 0] >= 0).all()  # tau
        assert (a[..., 1] >= 0).all() and (a[..., 1] <= 1).all()  # ssa
        assert (a[..., 2] >= 0).all() and (a[..., 2] <= 1).all()  # asy
        assert np.isfinite(a).all()
    # column AOD in the climatological range, land > clean ocean at
    # matched latitude, total = max of species sums
    dp = np.asarray(aerodp)
    assert (dp >= -1e-12).all()
    total = dp[:, -1]
    assert 0.01 < total.min() and total.max() < 1.0


def test_rh_brightening(tables):
    """Higher RH -> hygroscopic growth -> larger AOD and higher ssa
    over ocean (sea salt swells)."""
    tab, sw_lam, lw_lam = tables
    plyr, delz, _, land, lat = _profile()
    ocean = jnp.zeros_like(land)
    dry = am.setaer(plyr, delz, jnp.full_like(plyr, 0.3), ocean, lat,
                    tab, sw_lam.size)
    wet = am.setaer(plyr, delz, jnp.full_like(plyr, 0.95), ocean, lat,
                    tab, sw_lam.size)
    tau_dry = np.asarray(dry[2])[:, -1]
    tau_wet = np.asarray(wet[2])[:, -1]
    assert (tau_wet > 1.5 * tau_dry).all()
    # mixing-layer ssa rises toward water's
    ssa_dry = np.asarray(dry[0])[:, 0, 0, 1]
    ssa_wet = np.asarray(wet[0])[:, 0, 0, 1]
    assert (ssa_wet >= ssa_dry - 1e-6).all()


def test_dust_belt_and_domains(tables):
    tab, sw_lam, lw_lam = tables
    plyr, delz, rh, _, _ = _profile(ncol=8)
    land = jnp.ones((8,))
    belt = jnp.deg2rad(jnp.asarray([20.0] * 4 + [60.0] * 4))
    aer_sw, _, aerodp = am.setaer(plyr, delz, rh, land, belt, tab,
                                  sw_lam.size)
    dp = np.asarray(aerodp)
    assert dp[:4, 0].mean() > 3.0 * dp[4:, 0].mean()  # dust AOD in belt
    # stratospheric layers carry only the weak background
    a = np.asarray(aer_sw)
    pm = np.asarray(plyr)
    strat = (pm < 100.0) & (pm > 5.0)
    assert a[..., 0][strat[..., None] & jnp.ones_like(a[..., 0], bool)].max() < 5e-3


def test_jit_and_f32(tables):
    tab, sw_lam, lw_lam = tables
    args = _profile()
    args32 = tuple(jnp.asarray(a, jnp.float32) for a in args)
    f = jax.jit(lambda *a: am.setaer(*a, tab, sw_lam.size))
    aer_sw, aer_lw, aerodp = f(*args32)
    assert aer_sw.dtype == jnp.float32
    assert np.isfinite(np.asarray(aerodp)).all()


def test_rrtmg_driver_aerosol_integration():
    """iaer=1 (species climatology) changes the surface SW flux relative
    to iaer=0 and reports per-species AODs."""
    import datetime

    from fv3net_tpu.physics.radiation.rrtmg.driver import (
        RRTMGConfig, RRTMGDriver,
    )

    nz, n = 16, 4
    plvl = np.geomspace(30.0, 1013.0, nz + 1) * 100.0
    dp = np.diff(plvl)
    shape = (n, nz)
    state = {
        "air_temperature": jnp.asarray(
            np.broadcast_to(
                220 + 70 * (plvl[1:] / 1.013e5) ** 0.4, shape
            )[..., ::-1],
            jnp.float32,
        ),
        "pressure_thickness_of_atmospheric_layer": jnp.asarray(
            np.broadcast_to(dp, shape)[..., ::-1], jnp.float32
        ),
        "specific_humidity": jnp.full(shape, 2e-3, jnp.float32),
        "surface_temperature": jnp.full((n,), 295.0, jnp.float32),
        "latitude": jnp.deg2rad(jnp.asarray([0.0, 20.0, 45.0, -30.0])),
        "longitude": jnp.zeros((n,)),
        "land_sea_mask": jnp.asarray([0.0, 1.0, 1.0, 0.0]),
    }
    t = datetime.datetime(2016, 7, 1, 12)
    cosz = jnp.full((n,), 0.6)
    out1 = RRTMGDriver(RRTMGConfig(iaer=1), dtype=jnp.float32)(
        t, state, cosz
    )
    out0 = RRTMGDriver(RRTMGConfig(iaer=0), dtype=jnp.float32)(
        t, state, cosz
    )
    out2 = RRTMGDriver(RRTMGConfig(iaer=2), dtype=jnp.float32)(
        t, state, cosz
    )  # compact Angstrom stand-in still works
    key = "total_sky_downward_shortwave_flux_at_surface_python"
    assert np.isfinite(np.asarray(out2[key])).all()
    assert (np.asarray(out0[key]) - np.asarray(out2[key]) > 0).all()
    d = np.asarray(out0[key]) - np.asarray(out1[key])
    assert (d > 0.5).all()  # aerosols dim the surface by W/m2-scale
    assert (d < 100.0).all()  # but not absurdly
    assert "aerosol_optical_depth_total" in out1
    tot = np.asarray(out1["aerosol_optical_depth_total"])
    parts = sum(
        np.asarray(out1[f"aerosol_optical_depth_{nm}"])
        for nm in ("dust", "black_carbon", "water_soluble", "sulfate",
                   "sea_salt")
    )
    # every domain's tau is attributed to a species, so the parts sum
    # reproduces the total exactly (f32 roundoff)
    assert (np.abs(tot - parts) <= 1e-4 * tot + 1e-7).all()


def test_seasonal_cycle(tables):
    """Dust peaks in the local summer hemisphere; sea salt in the local
    winter storm tracks (the reference aer_update monthly-map role)."""
    tab, sw_lam, lw_lam = tables
    plyr, delz, rh, _, _ = _profile(ncol=8)
    land = jnp.ones((8,))
    nh_belt = jnp.deg2rad(jnp.full((8,), 20.0))
    _, _, dp_jul = am.setaer(plyr, delz, rh, land, nh_belt, tab,
                             sw_lam.size, month=7.0)
    _, _, dp_jan = am.setaer(plyr, delz, rh, land, nh_belt, tab,
                             sw_lam.size, month=1.0)
    assert (np.asarray(dp_jul)[:, 0] > 1.5 * np.asarray(dp_jan)[:, 0]).all()
    ocean = jnp.zeros((8,))
    nh_ocean = jnp.deg2rad(jnp.full((8,), 45.0))
    _, _, ss_jul = am.setaer(plyr, delz, rh, ocean, nh_ocean, tab,
                             sw_lam.size, month=7.0)
    _, _, ss_jan = am.setaer(plyr, delz, rh, ocean, nh_ocean, tab,
                             sw_lam.size, month=1.0)
    assert (np.asarray(ss_jan)[:, 4] > np.asarray(ss_jul)[:, 4]).all()
