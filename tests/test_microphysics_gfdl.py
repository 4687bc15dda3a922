"""GFDL-style six-category microphysics: conservation + process contracts.

Reference role: fv3gfs-fortran's gfdl_cloud_microphys.F90 (SURVEY.md
§2.1 — submodule, not vendored); scheme family Lin et al. 1983 /
Chen & Lin 2013.  These tests assert the conservation discipline and
the qualitative process behavior, not a line-port parity.
"""
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fv3net_tpu.core.constants import CP_AIR  # noqa: E402
from fv3net_tpu.ops import thermo  # noqa: E402
from fv3net_tpu.physics.microphysics_gfdl import (  # noqa: E402
    GFDLMPParams,
    LF0,
    LV0,
    _terminal_velocity,
    gfdl_microphysics_step,
)

NZ = 24
DT = 900.0


def _column(seed=0, ncol=16, warm=False):
    rng = np.random.RandomState(seed)
    # pressure levels top->bottom (z-last convention, k=0 = top)
    pe = np.linspace(3000.0, 101325.0, NZ + 1)
    pmid = 0.5 * (pe[:-1] + pe[1:])
    delp = np.diff(pe)
    p = np.broadcast_to(pmid, (ncol, NZ)).copy()
    dp = np.broadcast_to(delp, (ncol, NZ)).copy()
    # a plausible temperature profile with jitter
    T = 210.0 + 85.0 * (pmid / pmid[-1]) ** 0.4
    if warm:
        T = np.maximum(T, 280.0)
    T = np.broadcast_to(T, (ncol, NZ)) + rng.uniform(-3, 3, (ncol, NZ))
    qv = 0.8 * 0.622 * 611.2 * np.exp(
        17.67 * (T - 273.15) / (T - 29.65)
    ) / p
    qv = np.clip(qv, 1e-7, 0.02)
    ql = rng.uniform(0, 8e-4, (ncol, NZ)) * (T > 250.0)
    qi = rng.uniform(0, 4e-4, (ncol, NZ)) * (T < 270.0)
    qr = rng.uniform(0, 5e-4, (ncol, NZ)) * (T > 255.0)
    qs = rng.uniform(0, 5e-4, (ncol, NZ)) * (T < 275.0)
    qg = rng.uniform(0, 2e-4, (ncol, NZ)) * (T < 275.0)
    return tuple(
        jnp.asarray(x, jnp.float64)
        for x in (T, qv, ql, qi, qr, qs, qg, p, dp)
    )


def _col_water(qv, ql, qi, qr, qs, qg, dm):
    return float(((qv + ql + qi + qr + qs + qg) * dm).sum())


def test_water_closure_exact():
    T, qv, ql, qi, qr, qs, qg, p, dp = _column(seed=1)
    dm = thermo.layer_mass(dp)
    before = _col_water(qv, ql, qi, qr, qs, qg, dm)
    out = gfdl_microphysics_step(T, qv, ql, qi, qr, qs, qg, p, dp, DT)
    T2, qv2, ql2, qi2, qr2, qs2, qg2, rain, frozen = out
    after = _col_water(qv2, ql2, qi2, qr2, qs2, qg2, dm)
    precip = float((rain + frozen).sum()) * DT
    assert after + precip == pytest.approx(before, rel=1e-12)
    for q in (qv2, ql2, qi2, qr2, qs2, qg2):
        assert float(q.min()) >= 0.0


def test_moist_enthalpy_closure():
    """cp*T + Lv0*qv - Lf0*(qi+qs+qg) closes to roundoff: the constant-
    latent-heat bookkeeping makes every transfer enthalpy-neutral; the
    only column change is the -Lf0 carried out by frozen precip."""
    T, qv, ql, qi, qr, qs, qg, p, dp = _column(seed=2)
    dm = thermo.layer_mass(dp)

    def enthalpy(T, qv, qi, qs, qg):
        return float(
            (dm * (CP_AIR * T + LV0 * qv - LF0 * (qi + qs + qg))).sum()
        )

    e0 = enthalpy(T, qv, qi, qs, qg)
    out = gfdl_microphysics_step(T, qv, ql, qi, qr, qs, qg, p, dp, DT)
    T2, qv2, ql2, qi2, qr2, qs2, qg2, rain, frozen = out
    e1 = enthalpy(T2, qv2, qi2, qs2, qg2)
    # frozen precip leaving removes its -Lf0 term from the column
    expected = e0 + LF0 * float(frozen.sum()) * DT
    assert e1 == pytest.approx(expected, rel=1e-12)


def test_supersaturation_removed():
    T, qv, ql, qi, qr, qs, qg, p, dp = _column(seed=3)
    qv = qv * 2.0  # strongly supersaturated
    out = gfdl_microphysics_step(T, qv, ql, qi, qr, qs, qg, p, dp, DT)
    T2, qv2 = out[0], out[1]
    from fv3net_tpu.physics.microphysics_gfdl import _qsat_water

    rh = np.asarray(qv2 / _qsat_water(T2, p))
    # the last subcycle's adjustment leaves at most the ice-deposition
    # band slightly supersaturated over water
    assert rh.max() < 1.05


def test_homogeneous_freezing_and_melting():
    ncol = 4
    p = jnp.full((ncol, NZ), 5e4)
    dp = jnp.full((ncol, NZ), 2e3)
    ql = jnp.full((ncol, NZ), 5e-4)
    zeros = jnp.zeros((ncol, NZ))
    # very cold: all liquid freezes
    T = jnp.full((ncol, NZ), 220.0)
    out = gfdl_microphysics_step(
        T, zeros + 1e-6, ql, zeros, zeros, zeros, zeros, p, dp, DT
    )
    assert float(out[2].max()) < 1e-10  # ql gone
    assert float(out[3].min() + out[5].min()) >= 0.0
    # ice sources got the mass (some may fall/convert)
    assert float((out[3] + out[5] + out[8].sum()).sum()) > 0.0
    # warm column: snow melts toward rain, cooling the layer
    T = jnp.full((ncol, NZ), 285.0)
    qs = jnp.full((ncol, NZ), 4e-4)
    out = gfdl_microphysics_step(
        T, zeros + 1e-6, zeros, zeros, zeros, qs, zeros, p, dp, DT
    )
    assert float(out[0].mean()) < 285.0  # melting consumed heat
    assert float(out[4].sum() + out[7].sum()) > 0.0  # rain formed/fell


def test_autoconversion_forms_rain_and_precip():
    T, qv, ql, qi, qr, qs, qg, p, dp = _column(seed=4, warm=True)
    ql = jnp.full_like(ql, 2.5e-3)  # well past the threshold
    out = gfdl_microphysics_step(
        T, qv, ql, qi, jnp.zeros_like(qr), jnp.zeros_like(qs),
        jnp.zeros_like(qg), p, dp, DT,
    )
    rain = out[7]
    assert float(rain.min()) > 0.0  # every column rains


def test_sedimentation_transports_down():
    """Rain placed aloft with all sources off reaches the surface over
    a few steps, conserving mass exactly."""
    ncol = 2
    p = jnp.broadcast_to(
        jnp.linspace(2e4, 9.9e4, NZ), (ncol, NZ)
    )
    dp = jnp.full((ncol, NZ), 3.5e3)
    T = jnp.full((ncol, NZ), 300.0)  # warm: no freezing of rain
    qv = jnp.full((ncol, NZ), 1e-2)  # near-saturated: no evap
    zeros = jnp.zeros((ncol, NZ))
    qr = zeros.at[:, 2].set(1e-3)  # a rain layer near the top
    params = GFDLMPParams(c_prevp=0.0)  # isolate the fall
    dm = thermo.layer_mass(dp)
    total0 = float((qr * dm).sum())
    got = 0.0
    for _ in range(12):
        out = gfdl_microphysics_step(
            T, qv, zeros, zeros, qr, zeros, zeros, p, dp, DT, params
        )
        qr = out[4]
        got += float(out[7].sum()) * DT
    assert got > 0.5 * total0  # most of it reached the surface
    assert got + float((qr * dm).sum()) == pytest.approx(
        total0, rel=1e-9
    )


def test_terminal_velocity_monotone_capped():
    rho = jnp.full((8,), 1.0)
    q = jnp.logspace(-6, -2, 8)
    vt = _terminal_velocity(rho, q, 8.0, 0.1364, 12.0)
    v = np.asarray(vt)
    assert (np.diff(v) >= -1e-12).all()
    assert v.max() <= 12.0
    assert float(_terminal_velocity(rho, jnp.zeros(8), 8.0, 0.1364, 12.0).max()) == 0.0


def test_driver_integration_gfdl():
    """physics_step with microphysics_scheme='gfdl' runs on a tiny cube,
    updates the six species and closes the driver-level water budget."""
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.physics import PhysicsConfig, physics_step

    n, nz = 8, 12
    grid = make_grid(n)
    g = GridArrays.from_grid(grid)
    state, ak, bk = init_state(grid, nz)
    tracers = dict(state.tracers)
    shape = state.delp.shape
    rng = np.random.RandomState(0)
    tracers["sphum"] = jnp.asarray(
        np.clip(np.asarray(tracers["sphum"]), 1e-6, None)
    )
    tracers["cloud_water"] = jnp.asarray(rng.uniform(0, 5e-4, shape))
    for k, hi in (
        ("ice_wat", 2e-4), ("rainwat", 3e-4),
        ("snowwat", 3e-4), ("graupel", 1e-4),
    ):
        tracers[k] = jnp.asarray(rng.uniform(0, hi, shape))
    import dataclasses

    state = dataclasses.replace(state, tracers=tracers)
    cfg = PhysicsConfig(microphysics_scheme="gfdl", use_convection=False)
    tsfc = jnp.full(shape[0:1] + shape[2:], 295.0)
    cosz = jnp.full_like(tsfc, 0.4)
    lat = jnp.asarray(g.lat)
    new_state, diags = physics_step(state, tsfc, cosz, lat, 900.0, cfg)
    for k in ("ice_wat", "rainwat", "snowwat", "graupel"):
        assert k in new_state.tracers
        assert bool(jnp.isfinite(new_state.tracers[k]).all())
        assert float(new_state.tracers[k].min()) >= 0.0
    assert "PRATEsfc" in diags and "SNOWsfc" in diags
    assert bool(jnp.isfinite(new_state.pt).all())
    # water budget: column water change = evaporation - precipitation
    dm0 = np.asarray(state.delp) / 9.80665
    dm1 = np.asarray(new_state.delp) / 9.80665

    def colw(st, dm):
        tot = sum(
            np.asarray(st.tracers[k])
            for k in (
                "sphum", "cloud_water", "ice_wat",
                "rainwat", "snowwat", "graupel",
            )
        )
        return (tot * dm).sum(axis=1)

    dw = colw(new_state, dm1) - colw(state, dm0)
    src = 900.0 * (
        np.asarray(diags["evaporation"]) - np.asarray(diags["PRATEsfc"])
    )
    # the driver state is f32: closure to f32 roundoff (the scheme
    # itself closes to f64 roundoff, test_water_closure_exact)
    np.testing.assert_allclose(dw, src, rtol=1e-3, atol=1e-5)


def test_missing_tracers_raise():
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.dycore.core import GridArrays

    grid = make_grid(8)
    g = GridArrays.from_grid(grid)
    state, _, _ = init_state(grid, 8)
    cfg = PhysicsConfig(microphysics_scheme="gfdl")
    tsfc = jnp.full(state.delp.shape[0:1] + state.delp.shape[2:], 290.0)
    with pytest.raises(ValueError, match="gfdl"):
        physics_step(
            state, tsfc, jnp.zeros_like(tsfc), jnp.asarray(g.lat),
            900.0, cfg,
        )


def test_namelist_plumbing():
    from fv3net_tpu.runtime.config import NamelistConfig, lower_fortran_config

    nml = NamelistConfig(microphysics="gfdl")
    assert nml.microphysics == "gfdl"
    with pytest.raises(ValueError):
        NamelistConfig(microphysics="wsm6")
    lowered = lower_fortran_config(
        {"namelist": {"gfs_physics_nml": {"imp_physics": 11}}}
    )
    assert lowered["namelist"]["microphysics"] == "gfdl"
