"""Microphysics emulator swapped into the physics driver."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.dycore import init_state
from fv3net_tpu.physics import PhysicsConfig, physics_step
from fv3net_tpu.runtime.loop import aquaplanet_sst

jax.config.update("jax_enable_x64", True)


def test_physics_step_with_emulator():
    grid = make_grid(6)
    state, *_ = init_state(grid, nz=8, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    sst = aquaplanet_sst(lat)
    cosz = jnp.full_like(lat, 0.3)

    calls = {}

    def emulator(emu_state):
        calls["keys"] = sorted(emu_state)
        out = dict(emu_state)
        # dry the column slightly: creates implied precipitation
        out["specific_humidity"] = emu_state["specific_humidity"] * 0.999
        return out

    new, diags = physics_step(
        state, sst, cosz, lat, 900.0, PhysicsConfig(),
        microphysics_emulator=emulator,
    )
    assert "air_temperature" in calls["keys"]
    precip = np.asarray(diags["PRATEsfc"])
    assert (precip >= 0).all() and precip.max() > 0
    assert np.isfinite(np.asarray(new.pt)).all()


def test_physics_step_with_trained_emulator_hook():
    """End-to-end: MicrophysicsEmulator wrapping a constant model."""
    from fv3net_tpu.emulation import MicrophysicsEmulator, RangeMask

    class DryModel:
        input_variables = ["specific_humidity"]
        output_variables = ["specific_humidity"]

        def predict_arrays(self, data):
            return {"specific_humidity": data["specific_humidity"] * 0.99}

    grid = make_grid(6)
    state, *_ = init_state(grid, nz=8, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    hook = MicrophysicsEmulator(
        DryModel(), mask=RangeMask("specific_humidity", min=0.0)
    )
    new, diags = physics_step(
        state, aquaplanet_sst(lat), jnp.full_like(lat, 0.3), lat, 900.0,
        PhysicsConfig(), microphysics_emulator=hook,
    )
    q = np.asarray(new.tracers["sphum"])
    assert (q >= 0).all()
    assert np.isfinite(np.asarray(diags["PRATEsfc"])).all()
