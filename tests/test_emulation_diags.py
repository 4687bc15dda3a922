"""Piggy-backed emulation diagnostics + reservoir offline diagnostics.

Reference semantics: workflows/diagnostics/fv3net/diagnostics/
prognostic_run/emulation/{single_run.py,tendencies.py} and
diagnostics/reservoir/compute.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.dycore import init_state
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.physics import PhysicsConfig, physics_step
from fv3net_tpu.runtime.loop import aquaplanet_sst
from fv3net_tpu.diagnostics import emulation as ediag


def _drying_emulator(factor=0.999):
    def emulator(emu_state):
        out = dict(emu_state)
        out["specific_humidity"] = emu_state["specific_humidity"] * factor
        return out

    return emulator


def _step(piggy_back, target="microphysics"):
    grid = make_grid(6)
    state, *_ = init_state(grid, nz=8, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    kwargs = dict(
        microphysics_emulator=_drying_emulator() if target == "microphysics" else None,
        gscond_emulator=_drying_emulator() if target == "gscond" else None,
        emulator_piggy_back=piggy_back,
    )
    new, diags = physics_step(
        state, aquaplanet_sst(lat), jnp.full_like(lat, 0.3), lat, 900.0,
        PhysicsConfig(), **kwargs,
    )
    return state, new, diags


def test_piggy_back_applies_native_and_emits_both_sources():
    state0, new_online, diags_online = _step(piggy_back=False)
    state0, new_piggy, diags_piggy = _step(piggy_back=True)
    # piggy-backed: both sources present
    for src in ("emulator", "physics"):
        assert f"tendency_of_air_temperature_due_to_zhao_carr_{src}" in diags_piggy
        assert f"surface_precipitation_due_to_zhao_carr_{src}" in diags_piggy
    # online mode: no piggy diags (no double compute paid)
    assert not any("zhao_carr" in k for k in diags_online)
    # the piggy-backed state equals a plain native run (emulator is
    # diagnostic-only)
    grid = make_grid(6)
    state_n, *_ = init_state(grid, nz=8, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    new_native, _ = physics_step(
        state_n, aquaplanet_sst(lat), jnp.full_like(lat, 0.3), lat, 900.0,
        PhysicsConfig(),
    )
    np.testing.assert_allclose(
        np.asarray(new_piggy.pt), np.asarray(new_native.pt), rtol=1e-12
    )
    # emulator humidity tendency reflects the 0.1% drying
    dq = np.asarray(
        diags_piggy["tendency_of_specific_humidity_due_to_zhao_carr_emulator"]
    )
    assert (dq <= 1e-15).all() and dq.min() < 0


def test_piggy_back_gscond_stage():
    _, new, diags = _step(piggy_back=True, target="gscond")
    for src in ("emulator", "physics"):
        assert f"tendency_of_specific_humidity_due_to_gscond_{src}" in diags
    assert np.isfinite(np.asarray(new.pt)).all()


def test_tendency_accessors_and_skill():
    shape = (4, 6, 3, 3, 8)
    dims = ("time", "tile", "y", "x", "z")
    rng = np.random.RandomState(0)
    phys = rng.randn(*shape) * 1e-5
    emu = phys + rng.randn(*shape) * 1e-6  # close to physics
    data = {}
    for f in ediag.FIELDS:
        data[f"tendency_of_{f}_due_to_zhao_carr_physics"] = Quantity(phys, dims)
        data[f"tendency_of_{f}_due_to_zhao_carr_emulator"] = Quantity(emu, dims)
        data[f"tendency_of_{f}_due_to_gscond_physics"] = Quantity(phys, dims)
    data["tendency_of_specific_humidity_due_to_gscond_emulator"] = Quantity(
        emu, dims
    )
    data["surface_precipitation_due_to_zhao_carr_physics"] = Quantity(
        np.abs(phys[..., 0]), dims[:-1]
    )
    data["surface_precipitation_due_to_zhao_carr_emulator"] = Quantity(
        np.abs(emu[..., 0]), dims[:-1]
    )
    ds = Dataset(data)
    # gscond cloud-water emulator tendency = -humidity tendency
    np.testing.assert_allclose(
        ediag.gscond_tendency(ds, "cloud_water", "emulator"), -emu
    )
    # precpd = total - gscond
    np.testing.assert_allclose(
        ediag.precpd_tendency(ds, "specific_humidity", "physics"),
        phys - phys,
        atol=1e-20,
    )
    skill = ediag.emulation_skill(ds)
    assert skill["skill/zhao_carr/air_temperature"] > 0.9
    assert "skill/surface_precipitation" in skill
    assert abs(skill["bias/zhao_carr/specific_humidity"]) < 1e-6


def test_compute_drift():
    nt = 13  # 3 hours at dt=900 -> 12 steps
    arr = np.zeros((nt, 6, 2, 2))
    for t in range(nt):
        arr[t] = 1.0 + 0.01 * t  # steady warming
    ds = Dataset({"air_temperature": Quantity(arr, ("time", "tile", "y", "x"))})
    drift = ediag.compute_drift(ds, dt_seconds=900.0, horizons_hours=(3.0,))
    # 0.12 K over 3 h = 0.96 K/day
    assert drift["drift/air_temperature/3h"] == pytest.approx(0.96, rel=1e-6)


def test_reservoir_diagnostics_and_cli(tmp_path):
    from fv3net_tpu.core.zarrio import to_zarr
    from fv3net_tpu.diagnostics import reservoir as rdiag
    from fv3net_tpu.fit import get_training_function, io as fit_io
    from fv3net_tpu.fit.reservoir import ReservoirHyperparameters

    # train a small reservoir on a predictable signal
    rng = np.random.RandomState(0)
    t = np.arange(300, dtype=np.float32)
    series = np.stack(
        [np.sin(0.1 * t + p) for p in (0.0, 1.0, 2.0)], axis=-1
    ) + 0.01 * rng.randn(300, 3).astype(np.float32)
    train = Dataset(
        {
            "inputs": Quantity(series[:199], ("time", "feature")),
            # next-step targets: the readout learns u[t+1] from the state
            "outputs": Quantity(series[1:200], ("time", "feature")),
        }
    )
    hp = ReservoirHyperparameters(
        input_variables=["inputs"],
        output_variables=["outputs"],
        state_size=64,
    )
    model = get_training_function("reservoir")(hp, [train], None)

    val = Dataset({"inputs": Quantity(series[200:], ("time", "feature"))})
    diags, metrics = rdiag.compute_reservoir_diagnostics(model, val, n_synchronize=20)
    assert metrics["r2"] > 0.5, metrics
    assert metrics["n_validation_steps"] == 79
    assert "time_mean_error" in diags

    # CLI end to end
    model_dir = str(tmp_path / "model")
    fit_io.dump(model, model_dir)
    val_zarr = str(tmp_path / "val.zarr")
    to_zarr(val, val_zarr)
    out_dir = str(tmp_path / "out")
    rc = rdiag.main([model_dir, out_dir, val_zarr, "20"])
    assert rc == 0
    import json
    import os

    saved = json.load(open(os.path.join(out_dir, "metrics.json")))
    assert saved["r2"] == pytest.approx(metrics["r2"], rel=1e-5)


def test_piggy_back_diags_through_diagnostics_file_and_cli(tmp_path):
    """End to end: a piggy-backed run writes per-source tendencies into a
    diagnostics zarr via the manager; the emulation CLI scores it."""
    import json
    import os
    import subprocess
    import sys

    from fv3net_tpu.fit import DenseHyperparameters, get_training_function
    from fv3net_tpu.fit import io as fit_io
    from fv3net_tpu.runtime.config import get_config
    from fv3net_tpu.runtime.loop import TimeLoop
    from fv3net_tpu.runtime.diagnostics.manager import DiagnosticFile

    # tiny dense emulator: q -> q (near-identity after 20 epochs)
    rng = np.random.RandomState(0)
    q = (rng.rand(256, 8) * 1e-2).astype(np.float32)
    from fv3net_tpu.core.dataset import Dataset as DS

    train_ds = DS(
        {
            "specific_humidity": Quantity(q, ("sample", "z")),
            "specific_humidity_out": Quantity(q, ("sample", "z")),
        }
    )
    hp = DenseHyperparameters(
        input_variables=["specific_humidity"],
        output_variables=["specific_humidity_out"],
        epochs=20,
        width=16,
    )
    model = get_training_function("dense")(hp, [train_ds], None)

    class Renamed:
        input_variables = ["specific_humidity"]
        output_variables = ["specific_humidity"]

        def __init__(self, m):
            self.m = m

        def predict_arrays(self, data):
            out = self.m.predict_arrays(
                {"specific_humidity": data["specific_humidity"]}
            )
            return {"specific_humidity": out["specific_humidity_out"]}

    model_dir = str(tmp_path / "emu")
    fit_io.dump(model, model_dir)
    cfg = get_config(
        {
            "namelist": {"npx": 6, "npz": 8},
            "duration_seconds": 1800.0,
            "online_emulator": {
                "url": model_dir,
                "target": "microphysics",
                "piggy_back": True,
            },
        }
    )
    loop = TimeLoop(cfg)
    loop._microphysics_emulator.model = Renamed(
        loop._microphysics_emulator.model
    )
    names_wanted = [
        f"tendency_of_{f}_due_to_zhao_carr_{src}"
        for f in ("air_temperature", "specific_humidity", "cloud_water")
        for src in ("emulator", "physics")
    ]
    from fv3net_tpu.runtime.config import DiagnosticFileConfig, TimeConfig
    from fv3net_tpu.runtime.diagnostics.manager import (
        time_container_from_config,
    )

    dcfg = DiagnosticFileConfig(
        name="diags.zarr", variables=names_wanted, times=TimeConfig("every")
    )
    times = time_container_from_config(dcfg.times, loop.time)
    sink = DiagnosticFile(str(tmp_path / "diags.zarr"), names_wanted, times)
    for time, diags in loop:
        sink.observe(time, diags)
    sink.close()
    # score with the CLI
    env = dict(os.environ, FV3NET_JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "fv3net_tpu.diagnostics.emulation",
         str(tmp_path / "diags.zarr")],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout)
    assert "skill/zhao_carr/air_temperature" in metrics
    assert np.isfinite(metrics["mse/zhao_carr/specific_humidity"])
