"""Noah land model integrated in the TimeLoop (runtime wiring +
restart round-trips for the layered soil fields).

Reference: the GFS Noah LSM prognostic fields in sfc_data
(stc/smc/sheleg/tg3 — external/vcm/vcm/cubedsphere/coarsen_restarts.py:
1020-1336; restart categories tests/test_regression.py:78-88).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu.runtime import TimeLoop, names
from fv3net_tpu.runtime.config import get_config


def _cfg(**nml):
    base = {
        "npx": 12, "npz": 8,
        "surface_data": "topography/c12",
        "slab_ocean": True, "land_model": "noah", "sea_ice": True,
    }
    base.update(nml)
    return get_config({"namelist": base, "duration_seconds": 2700.0})


def test_noah_requires_slab_ocean():
    with pytest.raises(ValueError):
        get_config(
            {"namelist": {"land_model": "noah", "slab_ocean": False}}
        )


def test_noah_in_timeloop():
    loop = TimeLoop(_cfg(), dtype=jnp.float32)
    sfc = loop.state.surface
    assert sfc["soil_temperature"].shape[0] == 4
    assert sfc["soil_moisture_layers"].shape[0] == 4
    land = np.asarray(sfc[names.MASK]) > 0.5
    diags = None
    for _t, diags in loop:
        pass
    for k in ("GHFLXsfc", "RUNOFFsfc", "DRAINsfc", "SNODsfc"):
        assert k in diags, k
        v = np.asarray(diags[k].data)
        assert np.isfinite(v).all(), k
    # noah is land-only: runoff/ground-flux zero over ocean
    assert (np.asarray(diags["RUNOFFsfc"].data)[~land] == 0).all()
    assert (np.asarray(diags["GHFLXsfc"].data)[~land] == 0).all()
    stc = np.asarray(loop.state.surface["soil_temperature"])
    smc = np.asarray(loop.state.surface["soil_moisture_layers"])
    assert np.isfinite(stc).all() and (stc > 200).all() and (stc < 340).all()
    assert (smc >= 0.0).all() and (smc <= 0.45 + 1e-6).all()
    swe = np.asarray(loop.state.surface["snow_water_equivalent"])
    assert (swe >= 0).all()
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()


def test_noah_fields_roundtrip_npz(tmp_path):
    from fv3net_tpu.runtime.checkpoint import load_state, save_state

    loop = TimeLoop(_cfg(), dtype=jnp.float32)
    path = str(tmp_path / "ckpt.npz")
    save_state(loop.state, loop.time, path)
    state2, _t = load_state(path)
    for k in ("soil_temperature", "soil_moisture_layers",
              "snow_water_equivalent", "deep_soil_temperature"):
        np.testing.assert_array_equal(
            np.asarray(state2.surface[k]), np.asarray(loop.state.surface[k])
        )


def test_noah_fields_roundtrip_fortran_layout(tmp_path):
    from fv3net_tpu.runtime.checkpoint import (
        load_fortran_restarts,
        save_fortran_restarts,
    )

    loop = TimeLoop(_cfg(), dtype=jnp.float32)
    # make the layered fields distinctive
    sfc = loop.state.surface
    sfc["soil_temperature"] = sfc["soil_temperature"] + jnp.arange(
        4.0
    ).reshape(4, 1, 1, 1)
    sfc["snow_water_equivalent"] = jnp.full_like(
        sfc["snow_water_equivalent"], 0.02
    )
    path = str(tmp_path)
    save_fortran_restarts(loop.state, loop.time, path, loop.grid)
    state2, _t = load_fortran_restarts(path)
    np.testing.assert_allclose(
        np.asarray(state2.surface["soil_temperature"]),
        np.asarray(sfc["soil_temperature"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state2.surface["soil_moisture_layers"]),
        np.asarray(sfc["soil_moisture_layers"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state2.surface["snow_water_equivalent"]), 0.02,
        rtol=1e-6,
    )
    assert "deep_soil_temperature" in state2.surface
