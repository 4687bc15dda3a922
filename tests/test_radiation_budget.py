"""Radiation driver API + fine-res budget tests."""
import datetime

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.physics.radiation import Radiation, RadiationConfig
from fv3net_tpu.pipelines import fine_res_budget as budget

jax.config.update("jax_enable_x64", True)


def test_radiation_driver_api():
    rad = Radiation(RadiationConfig(scheme="gray"), timestep=900.0)
    rad.init_driver()
    nz = 10
    state = {
        "air_temperature": jnp.full((6, 4, 4, nz), 270.0),
        "pressure_thickness_of_atmospheric_layer": jnp.full(
            (6, 4, 4, nz), 1e5 / nz
        ),
        "surface_temperature": jnp.full((6, 4, 4), 290.0),
        "latitude": jnp.zeros((6, 4, 4)),
        "longitude": jnp.zeros((6, 4, 4)),
    }
    out = rad(datetime.datetime(2016, 8, 1, 12), state)
    assert "ULWRFtoa" in out and "cos_zenith_angle" in out
    heat = np.asarray(out["tendency_of_air_temperature_due_to_radiation"])
    assert heat.shape == (6, 4, 4, nz)
    assert np.isfinite(heat).all()


def test_rrtmg_stepper_in_time_loop():
    """RRTMG band solvers driven through the prognostic loop (the
    reference runs the Python radiation alongside Fortran radiation,
    runtime/loop.py:390-397)."""
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig
    from fv3net_tpu.runtime.steppers.radiation import RadiationStepper

    cfg = UserConfig(
        namelist=NamelistConfig(npx=6, npz=8), duration_seconds=900.0
    )
    stepper = RadiationStepper(
        Radiation(RadiationConfig(scheme="rrtmg"), 900.0)
    )
    loop = TimeLoop(cfg, postphysics_stepper=stepper, dtype=jnp.float64)
    for _, diags in loop:
        pass
    olr = np.asarray(
        diags[
            "total_sky_upward_longwave_flux_at_top_of_atmosphere_python"
        ].data
    )
    assert olr.shape == (6, 6, 6) and np.isfinite(olr).all()
    assert (olr > 100.0).all() and (olr < 400.0).all()
    heat = np.asarray(
        diags["tendency_of_air_temperature_due_to_radiation"].data
    )
    assert np.isfinite(heat).all()


def test_radiation_stepper_in_time_loop():
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig
    from fv3net_tpu.runtime.steppers.radiation import RadiationStepper

    cfg = UserConfig(
        namelist=NamelistConfig(npx=6, npz=8), duration_seconds=900.0
    )
    stepper = RadiationStepper(Radiation(RadiationConfig(), 900.0))
    loop = TimeLoop(cfg, postphysics_stepper=stepper, dtype=jnp.float64)
    for _, diags in loop:
        pass
    assert "ULWRFtoa" in diags
    assert "tendency_of_air_temperature_due_to_radiation" in diags


def test_budget_storage_and_consistency():
    rng = np.random.RandomState(0)
    ny = nx = 8
    nz = 6
    factor = 2
    dt = 900.0
    delp = rng.uniform(800, 1500, (ny, nx, nz))
    area = rng.uniform(0.9, 1.1, (ny, nx))
    T0 = rng.uniform(250, 290, (ny, nx, nz))
    heating = rng.uniform(-1e-5, 1e-5, (ny, nx, nz))
    T1 = T0 + dt * heating
    q0 = rng.uniform(0, 0.01, (ny, nx, nz))
    out = budget.compute_budget(
        T0, T1, q0, q0,
        physics_T_tendency=heating,
        physics_q_tendency=np.zeros_like(q0),
        delp_fine=delp, area=area, factor=factor, time_step=dt,
    )
    assert out["Q1"].shape == (ny // factor, nx // factor, nz)
    # when the full storage is explained by physics, dQ1 ~ 0
    np.testing.assert_allclose(np.asarray(out["dQ1"]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["Q2"]), 0.0, atol=1e-15)
    # exposed area bounded by total block area
    block_area = area.reshape(4, 2, 4, 2).sum(axis=(1, 3))
    assert (np.asarray(out["exposed_area"]) <= block_area[..., None] + 1e-9).all()


def test_pressure_level_average_constant_preserved():
    ny = nx = 4
    nz = 5
    delp = np.full((ny, nx, nz), 2e4)
    area = np.ones((ny, nx))
    field = np.full((ny, nx, nz), 7.5)
    out = budget.pressure_level_average(field, delp, delp[::2, ::2] * 0 + 2e4,
                                        area, 2)
    # delp_coarse equal to fine -> identity regrid then average
    np.testing.assert_allclose(np.asarray(out), 7.5, rtol=1e-9)


def test_radiation_scheme_from_user_config():
    """UserConfig.radiation_scheme wires the band solvers into the loop
    (reference UserConfig.radiation_scheme, runtime/config.py:77)."""
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.config import get_config

    cfg = get_config(
        {
            "namelist": {"npx": 6, "npz": 8},
            "duration_seconds": 900.0,
            "radiation_scheme": {"scheme": "rrtmg"},
        }
    )
    loop = TimeLoop(cfg, dtype=jnp.float64)
    for _, diags in loop:
        pass
    key = "total_sky_upward_longwave_flux_at_top_of_atmosphere_python"
    assert key in diags
    assert np.isfinite(np.asarray(diags[key].data)).all()
