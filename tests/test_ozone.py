"""Prognostic ozone: photochemical relaxation + runtime/radiation wiring."""
import numpy as np
import jax.numpy as jnp

from fv3net_tpu.physics.ozone import OzoneParams, ozone_tendency
from fv3net_tpu.physics.radiation import gases


def test_ozone_relaxes_toward_climatology():
    lat = jnp.zeros((8,))
    pmid = jnp.broadcast_to(
        jnp.logspace(np.log10(300.0), np.log10(1e5), 16), (8, 16)
    )
    clim = gases.ozone_profile(pmid, lat)
    # perturbed field relaxes toward clim, fastest in the stratosphere
    o3 = clim * 2.0
    do3 = np.asarray(ozone_tendency(o3, pmid, lat))
    assert (do3 <= 0).all()  # excess ozone decays everywhere
    # stratospheric (low p) relaxation rate >> tropospheric
    rate = -do3 / np.asarray(clim)
    assert rate[0, 0] > 10 * rate[0, -1]
    # exact at the endpoints: tau_strat at low p
    p = OzoneParams()
    np.testing.assert_allclose(
        rate[0, 0], 1.0 / (p.tau_strat_days * 86400.0), rtol=0.05
    )
    # climatology itself is a fixed point
    np.testing.assert_allclose(
        np.asarray(ozone_tendency(clim, pmid, lat)), 0.0, atol=1e-20
    )


def test_prognostic_ozone_in_time_loop():
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.config import get_config

    cfg = get_config(
        {
            "namelist": {"npx": 6, "npz": 8, "prognostic_ozone": True},
            "duration_seconds": 1800.0,
        }
    )
    loop = TimeLoop(cfg, dtype=jnp.float32)
    assert "o3mr" in loop.state.dycore.tracers
    o3_0 = np.asarray(loop.state.dycore.tracers["o3mr"])
    assert o3_0.max() > 1e-6  # stratospheric peak present
    for _t, _d in loop:
        pass
    o3_1 = np.asarray(loop.state.dycore.tracers["o3mr"])
    assert np.isfinite(o3_1).all()
    assert (o3_1 >= 0).all()
    # near the climatology, the field barely moves in 2 steps
    np.testing.assert_allclose(o3_1, o3_0, rtol=0.1, atol=1e-9)


def test_radiation_driver_uses_prognostic_ozone():
    """The band radiation consumes the o3mr tracer when provided, and the
    heating responds to it."""
    import datetime

    from fv3net_tpu.physics.radiation.driver import (
        DriverConfig,
        RadiationDriver,
    )

    rng = np.random.RandomState(0)
    n, nz = 8, 16
    T = jnp.asarray(250 + 40 * rng.rand(n, nz), jnp.float32)
    dp = jnp.full((n, nz), 1e5 / nz, jnp.float32)
    state = {
        "air_temperature": T,
        "pressure_thickness_of_atmospheric_layer": dp,
        "surface_temperature": jnp.full((n,), 300.0),
        "latitude": jnp.zeros((n,)),
        "longitude": jnp.zeros((n,)),
    }
    driver = RadiationDriver(DriverConfig())
    t = datetime.datetime(2016, 7, 1)
    cosz = jnp.full((n,), 0.5)
    base = driver(t, dict(state), cosz=cosz)
    state["ozone_mixing_ratio"] = jnp.zeros((n, nz))  # remove all ozone
    no_o3 = driver(t, dict(state), cosz=cosz)
    h1 = np.asarray(base["tendency_of_air_temperature_due_to_radiation"])
    h2 = np.asarray(no_o3["tendency_of_air_temperature_due_to_radiation"])
    assert not np.allclose(h1, h2)  # ozone absorption matters


def test_fused_rrtmg_path_consumes_prognostic_ozone():
    """The fused physics path hands the o3mr tracer to the band solvers
    (regression: the tracer used to reach only the standalone
    RadiationStepper)."""
    import dataclasses as dc

    import jax

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.runtime.fused import _build_radiation_fn
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(6)
    state, *_ = init_state(grid, nz=10)
    rad_fn = _build_radiation_fn(PhysicsConfig(radiation_scheme="rrtmg"))
    lat = jnp.asarray(grid.lat)
    sst = aquaplanet_sst(lat)
    cosz = jnp.full_like(lat, 0.5)

    def heat(s):
        _, diags = physics_step(
            s, sst, cosz, lat, 900.0,
            PhysicsConfig(radiation_scheme="rrtmg"), radiation_fn=rad_fn,
        )
        return np.asarray(
            diags["tendency_of_air_temperature_due_to_fv3_physics"]
        )

    base = heat(state)
    tr = dict(state.tracers)
    tr["o3mr"] = jnp.zeros_like(state.delp)  # remove all ozone
    no_o3 = heat(dc.replace(state, tracers=tr))
    assert not np.allclose(base, no_o3)


def test_h2ophys_relaxes_stratosphere_only():
    """Stratospheric methane-oxidation water (GFS h2o_phys role):
    dry stratospheric air moistens toward the ppmv-scale equilibrium;
    the troposphere is untouched."""
    import numpy as np
    from fv3net_tpu.physics.h2ophys import H2OPhysParams, h2o_tendency, _PPMV

    pmid = np.array([50.0, 1000.0, 5000.0, 50000.0, 90000.0])
    q = np.full(5, 1.0 * _PPMV)  # very dry everywhere
    dq = np.asarray(h2o_tendency(q, pmid))
    assert (dq[:3] > 0).all()  # stratosphere moistens
    assert dq[3] == 0.0 and dq[4] == 0.0  # troposphere untouched
    # equilibrium at the top is the stratopause value
    p = H2OPhysParams()
    q_eq_top = p.q_stratopause_ppmv * _PPMV
    tau = p.tau_days * 86400.0
    np.testing.assert_allclose(dq[0], (q_eq_top - q[0]) / tau, rtol=1e-6)
    # already-wet air dries toward equilibrium
    wet = np.full(5, 20.0 * _PPMV)
    assert np.asarray(h2o_tendency(wet, pmid))[0] < 0


def test_h2ophys_in_physics_step():
    import numpy as np
    import jax.numpy as jnp
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(6)
    state, *_ = init_state(grid, nz=8, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    args = (state, aquaplanet_sst(lat), jnp.full_like(lat, 0.3), lat, 900.0)
    new_off, _ = physics_step(*args, PhysicsConfig())
    new_on, _ = physics_step(*args, PhysicsConfig(stratospheric_h2o=True))
    dq = np.asarray(new_on.tracers["sphum"]) - np.asarray(
        new_off.tracers["sphum"]
    )
    # top levels (stratosphere) relax toward equilibrium (nonzero
    # change); lowest levels identical
    assert np.abs(dq[:, 0]).max() > 0
    np.testing.assert_array_equal(dq[:, -1], 0.0)
    assert np.isfinite(np.asarray(new_on.pt)).all()
