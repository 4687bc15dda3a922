"""TimeLoop integration tests (mirrors the reference's MockFV3GFS-based
runtime tests, workflows/prognostic_c48_run/tests/test_derived_state.py
and the loop tests — here the real jitted model replaces the mock)."""
import datetime

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.testing import ConstantOutputPredictor
from fv3net_tpu.runtime import TimeLoop, names
from fv3net_tpu.runtime.config import (
    NamelistConfig,
    UserConfig,
    get_config,
)
from fv3net_tpu.runtime.steppers.machine_learning import PureMLStepper

jax.config.update("jax_enable_x64", True)


def small_config(**kw):
    nml = NamelistConfig(npx=6, npz=10, dt_atmos=900.0, n_split=2)
    defaults = dict(namelist=nml, duration_seconds=1800.0)
    defaults.update(kw)
    return UserConfig(**defaults)


def test_config_parsing_strict():
    cfg = get_config(
        {
            "namelist": {"npx": 12, "npz": 16},
            "duration_seconds": 900,
        }
    )
    assert cfg.namelist.npx == 12
    with pytest.raises(ValueError, match="unknown config keys"):
        get_config({"not_a_key": 1})


def test_time_loop_baseline_runs():
    loop = TimeLoop(small_config(), dtype=jnp.float64)
    times = []
    for time, diags in loop:
        times.append(time)
        assert "tendency_of_air_temperature_due_to_dynamics" in diags
        assert "tendency_of_air_temperature_due_to_fv3_physics" in diags
        assert names.PHYSICS_PRECIP_RATE in diags
        for k in (
            "storage_of_specific_humidity_path_due_to_fv3_physics",
            "storage_of_mass_due_to_dynamics",
        ):
            assert k in diags, k
            assert np.isfinite(np.asarray(diags[k].data)).all()
    assert len(times) == 2
    assert times[-1] - times[0] == datetime.timedelta(seconds=900)
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()


def test_time_loop_with_ml_stepper_applies_tendency():
    cfg = small_config()
    loop_base = TimeLoop(cfg, dtype=jnp.float64)
    nz = cfg.namelist.npz

    model = ConstantOutputPredictor(
        input_variables=[names.TEMP, names.SPHUM],
        output_variables=["dQ1", "dQ2"],
    )
    model.set_outputs(dQ1=np.full(nz, 1e-5), dQ2=np.zeros(nz))
    stepper = PureMLStepper(model, timestep=900.0)
    loop_ml = TimeLoop(cfg, postphysics_stepper=stepper, dtype=jnp.float64)

    for (t1, d1), (t2, d2) in zip(loop_base, loop_ml):
        pass
    # ML adds positive temperature tendency vs baseline
    T_base = np.asarray(loop_base.state.dycore.pt)
    T_ml = np.asarray(loop_ml.state.dycore.pt)
    assert (T_ml - T_base).mean() > 0
    assert "tendency_of_air_temperature_due_to_python" in d2
    tend = np.asarray(d2["tendency_of_air_temperature_due_to_python"].data)
    np.testing.assert_allclose(tend.mean(), 1e-5, rtol=1e-3)
    # baseline python-step tendency is zero
    tend0 = np.asarray(d1["tendency_of_air_temperature_due_to_python"].data)
    np.testing.assert_allclose(tend0, 0.0, atol=1e-14)


def test_ml_limiter_prevents_negative_humidity():
    cfg = small_config(duration_seconds=900.0)
    nz = cfg.namelist.npz
    model = ConstantOutputPredictor(
        input_variables=[names.TEMP],
        output_variables=["dQ1", "dQ2"],
    )
    model.set_outputs(dQ1=np.zeros(nz), dQ2=np.full(nz, -1.0))  # huge drying
    stepper = PureMLStepper(model, timestep=900.0)
    loop = TimeLoop(cfg, postphysics_stepper=stepper, dtype=jnp.float64)
    for _, diags in loop:
        pass
    q = np.asarray(loop.state.dycore.tracers["sphum"])
    assert q.min() >= -1e-12
    assert float(diags["specific_humidity_limiter_active"].data) == 1.0


def test_derived_state_get_set_roundtrip():
    loop = TimeLoop(small_config(), dtype=jnp.float64)
    state = loop._derived()
    T = state[names.TEMP]
    assert T.dims == ("tile", "z", "y", "x")
    state[names.TEMP] = Quantity(T.data + 1.0, T.dims, T.units)
    T2 = state[names.TEMP]
    np.testing.assert_allclose(np.asarray(T2.data), np.asarray(T.data) + 1.0,
                               rtol=1e-9)
    # wind setter: set eastward wind to 10 m/s, northward unchanged
    u = state[names.EASTWARD_WIND]
    state[names.EASTWARD_WIND] = Quantity(
        jnp.full_like(u.data, 10.0), u.dims
    )
    np.testing.assert_allclose(
        np.asarray(state[names.EASTWARD_WIND].data), 10.0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(state[names.NORTHWARD_WIND].data), 0.0, atol=1e-9
    )
