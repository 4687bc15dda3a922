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


def test_gscond_hook_target(tmp_path):
    """online_emulator target: gscond replaces only the condensation
    stage; precpd runs natively (the reference's separate call_py_fort
    gscond hook)."""
    import numpy as np
    import jax.numpy as jnp

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    calls = []

    def gscond_emulator(state):
        calls.append(sorted(state))
        out = dict(state)
        out["air_temperature"] = state["air_temperature"] + 0.01
        return out

    grid = make_grid(6)
    g = GridArrays.from_grid(grid)
    state, *_ = init_state(grid, nz=8)
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.full_like(sst, 0.4)
    out_state, diags = physics_step(
        state, sst, cosz, g.lat, 900.0, PhysicsConfig(),
        gscond_emulator=gscond_emulator,
    )
    assert calls and "air_temperature" in calls[0]
    assert np.isfinite(np.asarray(out_state.pt)).all()
    # precpd still produced precipitation diagnostics
    assert "PRATEsfc" in diags


def test_get_hooks_surface(tmp_path, monkeypatch):
    """Module-level (gscond, microphysics, store) triple (reference
    emulation/__init__.py:18, config.py:309-324)."""
    import yaml

    from fv3net_tpu.emulation import get_hooks

    # no config file -> identity hooks, no-op store
    monkeypatch.chdir(tmp_path)
    gscond, micro, store = get_hooks()
    state = {"air_temperature": 1.0}
    assert gscond(state) is state
    assert micro(state) is state
    import datetime

    assert store(state, datetime.datetime(2016, 8, 1)) is None

    # with a storage config, store captures snapshots
    cfg = {
        "zhao_carr_emulation": {
            "storage": {
                "path": str(tmp_path / "cap.zarr"),
                "output_freq_sec": 900.0,
            }
        }
    }
    with open(tmp_path / "fv3config.yml", "w") as f:
        yaml.safe_dump(cfg, f)
    import numpy as np

    gscond, micro, store = get_hooks(
        config_path=str(tmp_path / "fv3config.yml")
    )
    t0 = datetime.datetime(2016, 8, 1)
    store({"air_temperature": np.ones((6, 4, 4, 8))}, t0)
    import os

    assert os.path.exists(tmp_path / "cap.zarr")
