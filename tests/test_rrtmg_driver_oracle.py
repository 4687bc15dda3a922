"""END-TO-END radiation-driver oracle (r2 verdict missing-item #2).

Runs the reference port's FULL ``RadiationDriver._GFS_radiation_driver``
(/root/reference/external/radiation/radiation/radiation_driver.py:380) —
profile prep, fpvs humidity chain, astronomy radupdate+coszmn, getgases,
progcld4 cloud prep, setalb/setemis surfaces, then its LW/SW solvers —
on synthetic GFS column states with this repo's synthetic k-tables, and
asserts this repo's ``GFSRadiationDriver``
(fv3net_tpu/physics/radiation/gfs_driver.py) reproduces every flux and
heating-rate output end-to-end in f64.

Configuration: ivflip=1, isolar=0 (fixed solar constant + ephemeris
distance factor), ico2=0 (prescribed gases), iaer=0 (aerosols zero on
both sides: the port's own setaer returns None for iaer=0 and its
climatology needs unavailable data), ialb=0 (climatological albedo),
iems=1 with a synthetic 1-degree emissivity index map, GFDL-MP cloud
inputs (imp_physics=11, five condensate species + cloud-amount tracer),
iovr=1/isubc=2 McICA with shared random draws.
"""
import sys
import types

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

REF_RAD = "/root/reference/external/radiation"


@pytest.fixture(scope="module")
def ref_driver_mod():
    """Import the reference radiation_driver with lightweight stubs."""
    saved = {k: sys.modules.get(k) for k in ("numba", "xarray", "cftime")}
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = numba
    for name in ("xarray", "cftime"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if REF_RAD not in sys.path:
        sys.path.insert(0, REF_RAD)
    pkg = types.ModuleType("radiation")
    pkg.__path__ = [f"{REF_RAD}/radiation"]
    sys.modules.setdefault("radiation", pkg)
    import importlib

    mod = importlib.import_module("radiation.radiation_driver")
    yield mod
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


class _Arr:
    """Minimal .values wrapper (the port reads semis_data['idxems'].values)."""

    def __init__(self, a):
        self.values = a


def _columns(C=8, L=32, seed=11):
    """Synthetic GFS state: surface-first profiles with clouds, snow,
    land/sea/ice mix, and realistic tracers (ntrac=8: sphum, o3, GFDL
    five species, cloud amount)."""
    rng = np.random.default_rng(seed)
    prsi1 = np.linspace(101325.0, 30.0, L + 1)  # Pa, sfc -> toa
    prsi = np.broadcast_to(prsi1, (C, L + 1)).copy()
    prsl = 0.5 * (prsi[:, :-1] + prsi[:, 1:])
    tsfc = np.array([288.0, 300.0, 271.2, 294.0, 268.0, 285.0, 278.0,
                     297.0])[:C]
    lapse = np.log(prsl / prsl[:, :1])
    tgrs = tsfc[:, None] + 16.0 * lapse
    tgrs += 12.0 * np.exp(-((np.log(prsl * 0.01) - np.log(2.0)) ** 2))
    tgrs = np.clip(tgrs + rng.normal(0, 0.3, tgrs.shape), 175.0, 315.0)

    q = 0.012 * (prsl / 101325.0) ** 2.5 * np.array(
        [1.0, 1.6, 0.4, 1.1, 0.3, 0.8, 1.3, 0.9]
    )[:C, None]
    o3 = 1.0e-6 * np.exp(
        -((np.log(prsl * 0.01) - np.log(20.0)) ** 2) / 1.3
    ) + 3.0e-8
    # GFDL condensate species + cloud amount
    liq = np.where(
        (prsl > 4.0e4) & (prsl < 9.0e4), 2.0e-5 * rng.random((C, L)), 0.0
    )
    icec = np.where(
        (prsl > 1.5e4) & (prsl < 4.5e4), 1.2e-5 * rng.random((C, L)), 0.0
    )
    rain = 0.2 * liq
    snow = 0.3 * icec
    graupel = 0.1 * icec
    cldamt = np.clip(
        np.where(liq + icec > 1e-7, 0.3 + 0.7 * rng.random((C, L)), 0.0),
        0.0, 1.0,
    )
    qgrs = np.stack([q, o3, liq, icec, rain, snow, graupel, cldamt], -1)

    statein = {
        "prsi": prsi,
        "prsl": prsl,
        "prslk": (prsl * 1.0e-5) ** (2.8705e2 / 1.0046e3),
        "tgrs": tgrs,
        "qgrs": qgrs,
    }
    slmsk = np.array([0.0, 1.0, 2.0, 0.0, 2.0, 1.0, 0.0, 1.0])[:C]
    sfcprop = {
        "tsfc": tsfc,
        "slmsk": slmsk,
        "snowd": np.where(slmsk > 0.5, 20.0 * rng.random(C), 0.0),
        "sncovr": np.zeros(C),
        "snoalb": 0.7 * np.ones(C),
        "zorl": 10.0 + 90.0 * rng.random(C),
        "hprime": 200.0 * rng.random(C),
        "alvsf": 0.2 + 0.1 * rng.random(C),
        "alnsf": 0.3 + 0.1 * rng.random(C),
        "alvwf": 0.18 + 0.1 * rng.random(C),
        "alnwf": 0.28 + 0.1 * rng.random(C),
        "facsf": 0.5 * np.ones(C),
        "facwf": 0.5 * np.ones(C),
        "fice": np.where(slmsk > 1.5, 0.6 + 0.4 * rng.random(C), 0.0),
        "tisfc": np.where(slmsk > 1.5, 260.0 + 10.0 * rng.random(C),
                          tsfc),
    }
    xlat = np.deg2rad(np.array([5.0, 35.0, -65.0, 15.0, 75.0, -25.0,
                                 45.0, -5.0]))[:C]
    xlon = np.deg2rad(np.array([0.0, 40.0, 120.0, 200.0, 280.0, 330.0,
                                 80.0, 160.0]))[:C]
    grid = {
        "xlon": xlon,
        "xlat": xlat,
        "sinlat": np.sin(xlat),
        "coslat": np.cos(xlat),
    }
    from fv3net_tpu.physics.radiation.rrtmg import params as P

    rand_lw = rng.random((C, P.NGPT_LW * L))
    rand_sw = rng.random((C, P.NGPT_SW * L))
    idxems = rng.integers(1, 9, size=(360, 180))
    return statein, sfcprop, grid, rand_lw, rand_sw, idxems


def _control(L):
    cfgns = types.SimpleNamespace(
        levr=L, levs=L, ncnd=5, imp_physics=11, lgfdlmprad=False,
        num_p3d=1, npdf3d=0, ncnvcld3d=0, swhtr=True, lwhtr=True,
        fhswr=3600.0, fhlwr=3600.0, lprnt=False, do_sfcperts=False,
        do_only_clearsky_rad=False, pertalb=np.zeros(1),
        lssav=False,
    )
    return types.SimpleNamespace(
        config=cfgns, ntrac=8, ntcw=3, ntiw=4, ntrw=5, ntsw=6, ntgl=7,
        ntoz=2, ntclamt=8, lsswr=True, lslwr=True,
    )


@pytest.fixture(scope="module")
def both_drivers(ref_driver_mod):
    from fv3net_tpu.physics.radiation.rrtmg import params as P
    from fv3net_tpu.physics.radiation.rrtmg import tables as rtables

    C, L = 8, 32
    statein, sfcprop, grid, rand_lw, rand_sw, idxems = _columns(C, L)
    lwdict = rtables.make_lw_tables(seed=0)
    swdict = rtables.make_sw_tables(seed=1)
    control = _control(L)
    si = np.linspace(1.0, 0.0, L + 1)  # sigma interfaces, sfc -> toa

    drv = ref_driver_mod.RadiationDriver(
        si, L, 0,
        iemsflg=1, ioznflg=1, ictmflg=1, isolar=0, ico2flg=0,
        iaerflg=0, ialbflg=0, ivflip=1, iovrsw=1, iovrlw=1,
        isubcsw=2, isubclw=2, lcnorm=False,
        aerosol_dict={}, semis_data={"idxems": _Arr(idxems)},
    )
    # the port's setaer returns None for iaer=0 (unexercised path there);
    # zero aerosols stand in on BOTH sides
    NBDSW, NBDLW = 14, 16

    def zero_setaer(prsi, prsl, prslk, tvly, rhlay, slmsk, tracer,
                    xlon, xlat, IMAX, NLAY, NLP1, lsswr, lslwr):
        return (
            np.zeros((IMAX, NLAY, NBDSW, 3)),
            np.zeros((IMAX, NLAY, NBDLW, 3)),
            np.zeros((IMAX, 7)),
        )

    drv.aer.setaer = zero_setaer

    idate = (2016, 7, 1, 0, 0, 0, 0, 0)
    jdate = (2016, 7, 3, 0, 12, 30, 0, 0)
    drv.radupdate(
        idate, jdate, control.config.fhswr, 900.0, True,
        0, 0, 0, 0, 0, None, None, 0,
    )
    solhr = 12.5
    randomdict = {"lw_rand": rand_lw, "sw_rand": rand_sw}
    Radtend, Diag, Coupling = drv._GFS_radiation_driver(
        control, drv.sol.solcon, solhr, dict(statein), dict(sfcprop),
        dict(grid), randomdict, lwdict, swdict,
    )

    # ---- this repo's parity chain --------------------------------------
    from fv3net_tpu.physics.radiation.gfs_driver import (
        GFSDriverConfig,
        GFSRadiationDriver,
    )

    ours_drv = GFSRadiationDriver(
        GFSDriverConfig(levs=L), lwdict, swdict, idxems,
        ntoz=2 - 1, ntcw=3 - 1, ntiw=4 - 1, ntrw=5 - 1, ntsw=6 - 1,
        ntgl=7 - 1, ntclamt=8 - 1,
    )
    ours_drv.radupdate((2016, 7, 3, 12, 30, 0), 900.0)
    ours = ours_drv(statein, sfcprop, grid, solhr, rand_lw, rand_sw)
    ours = {
        k: (np.asarray(v) if hasattr(v, "shape") else v)
        for k, v in ours.items()
    }
    return Radtend, Diag, drv, ours


def test_radupdate_astronomy_matches(both_drivers):
    """slag/sdec/cdec/solcon parity (r2 verdict #8: radupdate
    equivalence)."""
    _, _, drv, ours_none = both_drivers
    from fv3net_tpu.physics.radiation.gfs_driver import Astronomy

    sol = Astronomy.update((2016, 7, 3, 12, 30, 0), 3600.0, 900.0)
    assert abs(sol.slag - drv.sol.sollag) < 1e-12
    assert abs(sol.sdec - drv.sol.sdec) < 1e-12
    assert abs(sol.cdec - drv.sol.cdec) < 1e-12
    assert abs(sol.solcon - drv.sol.solcon) < 1e-9
    assert sol.nstp == drv.sol.nstp
    assert abs(sol.anginc - drv.sol.anginc) < 1e-15


def test_coszen_matches(both_drivers):
    Radtend, _, _, ours = both_drivers
    np.testing.assert_allclose(
        ours["coszen"], Radtend["coszen"], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        ours["coszdg"], Radtend["coszdg"], rtol=1e-12, atol=1e-12
    )


def test_surface_albedo_and_emissivity_match(both_drivers):
    Radtend, _, _, ours = both_drivers
    np.testing.assert_allclose(
        ours["sfalb"], Radtend["sfalb"], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        ours["semis"], Radtend["semis"], rtol=1e-12, atol=1e-12
    )


def test_lw_fluxes_and_heating_match_end_to_end(both_drivers):
    Radtend, Diag, _, ours = both_drivers
    pairs = [
        ("topflw_upfxc", Diag["topflw"]["upfxc"]),
        ("topflw_upfx0", Diag["topflw"]["upfx0"]),
        ("sfcflw_upfxc", Radtend["sfcflw"]["upfxc"]),
        ("sfcflw_upfx0", Radtend["sfcflw"]["upfx0"]),
        ("sfcflw_dnfxc", Radtend["sfcflw"]["dnfxc"]),
        ("sfcflw_dnfx0", Radtend["sfcflw"]["dnfx0"]),
    ]
    for key, want in pairs:
        np.testing.assert_allclose(
            ours[key], want, rtol=1e-9, atol=1e-9, err_msg=key
        )
    np.testing.assert_allclose(
        ours["htrlw"], Radtend["htrlw"], rtol=1e-9, atol=1e-11,
        err_msg="htrlw",
    )
    np.testing.assert_allclose(
        ours["lwhc"], Radtend["lwhc"], rtol=1e-9, atol=1e-11,
        err_msg="lwhc",
    )


def test_sw_fluxes_and_heating_match_end_to_end(both_drivers):
    Radtend, Diag, _, ours = both_drivers
    pairs = [
        ("topfsw_upfxc", Diag["topfsw"]["upfxc"]),
        ("topfsw_dnfxc", Diag["topfsw"]["dnfxc"]),
        ("topfsw_upfx0", Diag["topfsw"]["upfx0"]),
        ("sfcfsw_upfxc", Radtend["sfcfsw"]["upfxc"]),
        ("sfcfsw_dnfxc", Radtend["sfcfsw"]["dnfxc"]),
        ("sfcfsw_upfx0", Radtend["sfcfsw"]["upfx0"]),
        ("sfcfsw_dnfx0", Radtend["sfcfsw"]["dnfx0"]),
    ]
    for key, want in pairs:
        np.testing.assert_allclose(
            ours[key], want, rtol=1e-9, atol=1e-7, err_msg=key
        )
    np.testing.assert_allclose(
        ours["htrsw"], Radtend["htrsw"], rtol=1e-9, atol=1e-11,
        err_msg="htrsw",
    )
    np.testing.assert_allclose(
        ours["swhc"], Radtend["swhc"], rtol=1e-9, atol=1e-11,
        err_msg="swhc",
    )
