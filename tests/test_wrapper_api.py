"""fv3gfs.wrapper-shaped module API (reference SURVEY §1 L0 surface)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu import wrapper
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime.config import NamelistConfig, UserConfig


@pytest.fixture()
def model():
    wrapper.initialize(
        UserConfig(namelist=NamelistConfig(npx=6, npz=8),
                   duration_seconds=1800.0)
    )
    yield wrapper
    wrapper.cleanup()


def test_requires_initialize():
    wrapper.cleanup()
    with pytest.raises(RuntimeError, match="initialize"):
        wrapper.get_step_count()


def test_staged_step_sequence(model):
    assert wrapper.get_step_count() == 0
    t0 = wrapper.get_state(["air_temperature"])["air_temperature"]
    wrapper.step_dynamics()
    assert wrapper.get_step_count() == 1
    wrapper.step_pre_radiation()
    wrapper.step_radiation()
    # radiation computed but state unchanged until apply_physics
    heating = wrapper.get_diagnostic_by_name("cos_zenith_angle")
    assert heating.data.shape == (6, 6, 6)
    wrapper.step_post_radiation_physics()
    t_before_apply = wrapper.get_state(["air_temperature"])[
        "air_temperature"
    ]
    np.testing.assert_array_equal(
        np.asarray(t_before_apply.data),
        np.asarray(
            wrapper.get_state(["air_temperature"])["air_temperature"].data
        ),
    )
    wrapper.apply_physics()
    t1 = wrapper.get_state(["air_temperature"])["air_temperature"]
    assert np.abs(np.asarray(t1.data) - np.asarray(t0.data)).max() > 0.0
    assert np.isfinite(np.asarray(t1.data)).all()
    # physics diagnostics exposed by name, unknown names raise
    assert wrapper.get_diagnostic_by_name("PRATEsfc") is not None
    with pytest.raises(ValueError, match="no diagnostic"):
        wrapper.get_diagnostic_by_name("nope")


def test_radiation_fn_protocol():
    """Every radiation_fn implementation must bind the canonical call
    made by physics/driver.py:110 — positional (T, delp, q, qc, tsfc,
    cosz, lat) plus keywords o3=, land=, ice=."""
    import inspect

    from fv3net_tpu.physics import PhysicsConfig
    from fv3net_tpu.runtime import fused

    fn = fused._build_radiation_fn(PhysicsConfig(radiation_scheme="rrtmg"))
    inspect.signature(fn).bind(
        *[None] * 7, o3=None, land=None, ice=None
    )
    assert fused._build_radiation_fn(PhysicsConfig()) is None


def test_get_set_state_mass_conserving(model):
    state = wrapper.get_state(["specific_humidity", "air_temperature"])
    q = state["specific_humidity"]
    bumped = Quantity(jnp.asarray(q.data) * 1.01, q.dims, q.units)
    wrapper.set_state_mass_conserving({"specific_humidity": bumped})
    q2 = wrapper.get_state(["specific_humidity"])["specific_humidity"]
    np.testing.assert_allclose(
        np.asarray(q2.data), np.asarray(q.data) * 1.01, rtol=1e-5
    )


def test_tracer_metadata_and_flags(model):
    meta = wrapper.get_tracer_metadata()
    assert meta["sphum"]["units"] == "kg/kg"
    assert {m["i_tracer"] for m in meta.values()} == {1, 2}
    f = wrapper.flags()
    assert f.npx == 6 and f.hydrostatic


def test_intermediate_restart(model, tmp_path):
    f = wrapper.flags()
    f.save_intermediate_restart = True
    f.intermediate_restart_path = str(tmp_path / "RESTART")
    wrapper.step_dynamics()
    wrapper.save_intermediate_restart_if_enabled()
    import os

    assert os.path.exists(str(tmp_path / "RESTART"))
