"""Bucket land-surface hydrology (physics/land.py) + runtime wiring."""
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.physics.land import (
    RHO_WATER,
    BucketLandParams,
    bucket_hydrology_update,
    evaporation_efficiency,
)


def test_evaporation_efficiency_ramp():
    p = BucketLandParams(field_capacity_m=0.15, beta_threshold_frac=0.75)
    w = jnp.asarray([0.0, 0.05625, 0.1125, 0.15])  # 0, half, at, above crit
    beta = np.asarray(evaporation_efficiency(w, p))
    np.testing.assert_allclose(beta, [0.0, 0.5, 1.0, 1.0], atol=1e-6)


def test_bucket_budget_exact():
    """dW * rho_w = (P - E - R) * dt, including overflow runoff and the
    dry-soil clamp."""
    p = BucketLandParams(field_capacity_m=0.15)
    dt = 900.0
    w0 = jnp.asarray([0.10, 0.149, 1e-6])
    precip = jnp.asarray([1e-4, 5e-3, 0.0])  # kg/m^2/s
    evap = jnp.asarray([2e-5, 0.0, 5e-6])
    w1, runoff = bucket_hydrology_update(w0, precip, evap, dt, p)
    w1, runoff = np.asarray(w1), np.asarray(runoff)
    assert (w1 >= 0).all() and (w1 <= p.field_capacity_m + 1e-12).all()
    # exact budget closure per point
    np.testing.assert_allclose(
        (w1 - np.asarray(w0)) * RHO_WATER,
        (np.asarray(precip) - np.asarray(evap) - runoff) * dt,
        rtol=1e-4, atol=1e-6,  # f32: differencing W ~ 0.1 m loses bits
    )
    assert runoff[1] > 0  # the nearly full bucket overflowed
    assert w1[2] == 0.0  # over-evaporated point clamped dry


def test_evap_factor_suppresses_latent_heat():
    """Dry-soil beta=0 must zero the latent heat flux and evaporation
    while leaving the sensible flux untouched."""
    from fv3net_tpu.physics.surface import bulk_surface_fluxes

    shape = (6, 4, 4)
    t_air = jnp.full(shape, 290.0)
    q_air = jnp.full(shape, 0.008)
    p_sfc = jnp.full(shape, 1.0e5)
    delp = jnp.full(shape, 3000.0)
    speed = jnp.full(shape, 5.0)
    tsfc = jnp.full(shape, 295.0)
    wet = bulk_surface_fluxes(t_air, q_air, p_sfc, delp, speed, tsfc)
    dry = bulk_surface_fluxes(
        t_air, q_air, p_sfc, delp, speed, tsfc,
        evap_factor=jnp.zeros(shape),
    )
    assert float(np.asarray(wet["LHTFLsfc"]).min()) > 0
    np.testing.assert_allclose(np.asarray(dry["LHTFLsfc"]), 0.0)
    np.testing.assert_allclose(np.asarray(dry["evaporation"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(dry["SHTFLsfc"]), np.asarray(wet["SHTFLsfc"])
    )


def test_bucket_land_in_time_loop():
    """bucket_land: true — soil moisture is prognostic, the land water
    budget closes step by step, and runoff/soil diagnostics appear."""
    from fv3net_tpu.runtime import TimeLoop, names
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig

    cfg = UserConfig(
        namelist=NamelistConfig(
            npx=6, npz=10, dt_atmos=900.0, n_split=2,
            bucket_land=True, slab_ocean=True,
        ),
        duration_seconds=1800.0,
    )
    loop = TimeLoop(cfg)
    # make the whole cube land so the bucket governs everywhere
    mask = jnp.ones_like(loop.state.surface[names.TSFC])
    loop.state.surface[names.MASK] = mask
    w_hist = [np.asarray(loop.state.surface["soil_moisture"]).copy()]
    diag_list = []
    for _, diags in loop:
        w_hist.append(np.asarray(loop.state.surface["soil_moisture"]).copy())
        diag_list.append(diags)
    assert len(diag_list) == 2
    d = diag_list[-1]
    assert "soil_moisture" in d and "RUNOFFsfc" in d
    w0, w1 = w_hist[-2], w_hist[-1]
    assert np.isfinite(w1).all()
    assert (w1 >= 0).all() and (w1 <= 0.15 + 1e-12).all()
    # the land water budget closes against the emitted diagnostics
    precip = np.asarray(d[names.PHYSICS_PRECIP_RATE].data)
    evap = np.asarray(d["evaporation"].data)
    runoff = np.asarray(d["RUNOFFsfc"].data)
    np.testing.assert_allclose(
        (w1 - w0) * RHO_WATER, (precip - evap - runoff) * 900.0,
        rtol=1e-3, atol=1e-5,  # f32 differencing of W ~ 0.1 m
    )
