"""Top-level UserConfig key parity: fortran_diagnostics,
tendency_prescriber, bias_correction, online_emulator,
reservoir_corrector, wrapper (reference runtime/config.py:40-80)."""
import datetime

import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu.core import zarrio
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime import TimeLoop
from fv3net_tpu.runtime.config import (
    NamelistConfig,
    UserConfig,
    get_config,
)

NPX, NPZ = 6, 8


def small_loop(tmp_path=None, **kw):
    nml = NamelistConfig(npx=NPX, npz=NPZ, dt_atmos=900.0, n_split=2)
    cfg = UserConfig(namelist=nml, duration_seconds=1800.0, **kw)
    return TimeLoop(cfg, dtype=jnp.float64)


def tendency_zarr(tmp_path, name="dQ1", scale=1e-5):
    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            name: Quantity(
                (scale * rng.rand(3, 6, NPZ, NPX, NPX)).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
            )
        }
    )
    path = str(tmp_path / f"{name}.zarr")
    zarrio.to_zarr(ds, path)
    return path


def test_wrapper_key_validation():
    get_config({"namelist": {"npx": 6}, "wrapper": "shield.wrapper"})
    with pytest.raises(ValueError, match="unsupported wrapper"):
        get_config({"namelist": {"npx": 6}, "wrapper": "other.wrapper"})


def test_nudging_and_ml_conflict():
    with pytest.raises(ValueError, match="nudging cannot"):
        get_config(
            {
                "namelist": {"npx": 6},
                "scikit_learn": {"model": ["/some/model"]},
                "nudging": {
                    "restarts_path": "x",
                    "timescale_hours": {"air_temperature": 3.0},
                },
            }
        )


def test_fortran_diagnostics_lower_to_renamed_outputs(tmp_path):
    """FortranFileConfig entries write zarr outputs under output_name
    (the diag_table translation role, reference fortran.py:82-134)."""
    import os

    from fv3net_tpu.runtime.segmented_run import api

    cfg_dict = {
        "namelist": {"npx": NPX, "npz": NPZ, "dt_atmos": 900.0},
        "duration_seconds": 1800.0,
        "fortran_diagnostics": [
            {
                "name": "atmos_dt_atmos.zarr",
                "times": {"kind": "every"},
                "variables": [
                    {
                        "module_name": "dynamics",
                        "field_name": "PRATEsfc",
                        "output_name": "PRATEsfc_coarse",
                    }
                ],
            }
        ],
    }
    config = get_config(cfg_dict)
    out = str(tmp_path / "seg")
    api.run_segment(config, out)
    ds = zarrio.open_zarr(os.path.join(out, "atmos_dt_atmos.zarr"))
    assert "PRATEsfc_coarse" in ds
    assert np.isfinite(ds["PRATEsfc_coarse"].values).all()
    # diag_table rendering for config familiarity
    lines = config.fortran_diagnostics[0].to_diag_table_lines(900.0)
    assert any("PRATEsfc_coarse" in line for line in lines)


def test_tendency_prescriber_key_applies(tmp_path):
    from fv3net_tpu.runtime.config import TendencyPrescriberConfig

    path = tendency_zarr(tmp_path, "dQ1")
    loop = small_loop(
        tendency_prescriber=TendencyPrescriberConfig(
            dataset=path, variables=["dQ1"]
        )
    )
    T_before = np.asarray(loop.state.dycore.pt).copy()
    seen = False
    for _t, diags in loop:
        if "dQ1_tendency_prescriber" in diags:
            seen = True
    assert seen
    assert not np.allclose(np.asarray(loop.state.dycore.pt), T_before)
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()


def test_bias_correction_key_applies(tmp_path):
    from fv3net_tpu.runtime.config import BiasCorrectionConfig

    path = tendency_zarr(tmp_path, "dQ1", scale=1e-6)
    loop = small_loop(
        bias_correction=BiasCorrectionConfig(dataset=path, variables=["dQ1"])
    )
    seen = False
    for _t, diags in loop:
        if "dQ1_bias_correction" in diags:
            seen = True
    assert seen
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()


def test_online_emulator_key_runs(tmp_path):
    """online_emulator loads a saved model into the physics emulation
    slot (the call_py_fort hook role)."""
    from fv3net_tpu import fit
    from fv3net_tpu.fit.transformed import (
        TransformedParameters,
        train_transformed_model,
    )
    from fv3net_tpu.runtime.config import OnlineEmulatorConfig

    rng = np.random.RandomState(1)
    qv = 10 ** rng.uniform(-6, -2, (128, NPZ))
    batch = Dataset(
        {
            "specific_humidity": Quantity(
                jnp.asarray(qv, jnp.float32), ("sample", "z")
            ),
            "specific_humidity_out": Quantity(
                jnp.asarray(qv * 0.999, jnp.float32), ("sample", "z")
            ),
        }
    )
    hp = TransformedParameters(
        input_variables=["specific_humidity"],
        output_variables=["specific_humidity_out"],
        architecture="linear",
        epochs=5,
    )
    model = train_transformed_model(hp, [batch])
    # the emulator's output name must be a state key to take effect;
    # rename by wrapping predicted_variables
    model.output_variables = ["specific_humidity_out"]
    mpath = str(tmp_path / "emu")
    fit.dump(model, mpath)

    loop = small_loop(online_emulator=OnlineEmulatorConfig(url=mpath))
    assert loop._microphysics_emulator is not None
    for _t, _diags in loop:
        pass
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()


def test_reservoir_corrector_key(tmp_path):
    """reservoir_corrector builds the increment/predict stepper pair and
    applies the reservoir state correction after synchronization."""
    from fv3net_tpu import fit
    from fv3net_tpu.fit.reservoir import (
        ReservoirHyperparameters,
        train_reservoir_model,
    )
    from fv3net_tpu.runtime.config import ReservoirCorrectorConfig

    rng = np.random.RandomState(2)
    steps = 8
    series = jnp.asarray(260 + 5 * rng.rand(steps, NPZ), jnp.float32)
    data = Dataset(
        {
            "inputs": Quantity(series, ("time", "z")),
            "outputs": Quantity(series, ("time", "z")),
        }
    )
    hp = ReservoirHyperparameters(
        input_variables=["air_temperature"],
        output_variables=["air_temperature"],
        state_size=32,
        n_burn=2,
    )
    model = train_reservoir_model(hp, [data])
    mpath = str(tmp_path / "resv")
    fit.dump(model, mpath)

    loop = small_loop(
        reservoir_corrector=ReservoirCorrectorConfig(
            model_path=mpath, synchronize_steps=1
        )
    )
    assert loop._reservoir_incrementer is not None
    for _t, _diags in loop:
        pass
    assert loop._reservoir_incrementer.completed_sync_steps == 2
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()


def test_reference_fv3config_yaml_parses_as_is():
    """A reference-shaped fv3config.yml (Fortran *_nml namelist
    sections, data-asset keys) lowers to this framework's config
    (config.py::lower_fortran_config; reference
    external/fv3kube/fv3kube/base_yamls/FV3GFS/v0.7/fv3config.yml)."""
    from fv3net_tpu.runtime.config import get_config

    cfg = get_config({
        "data_table": "default",
        "diag_table": "default",
        "experiment_name": "default_experiment",
        "forcing": "gs://vcm-fv3config/data/base_forcing/v1.1/",
        "orographic_forcing": "gs://vcm-fv3config/data/orographic/v1.0",
        "namelist": {
            "amip_interp_nml": {"data_set": "reynolds_oi"},
            "atmos_model_nml": {"blocksize": 24},
            "coupler_nml": {"dt_atmos": 900, "days": 0, "hours": 3,
                            "minutes": 0, "seconds": 0},
            "fv_core_nml": {"npx": 49, "npy": 49, "npz": 79,
                            "n_split": 6, "hydrostatic": False,
                            "tau": 5.0, "rf_cutoff": 800.0,
                            "d2_bg": 0.0, "kord_tm": -9,
                            "hord_mt": 6, "layout": [1, 1]},
            "gfs_physics_nml": {"fhswr": 3600.0, "fhlwr": 3600.0,
                                "hybedmf": True, "imp_physics": 11},
        },
    })
    assert cfg.namelist.npx == 48
    assert cfg.namelist.npz == 79
    assert cfg.namelist.n_split == 6
    assert cfg.namelist.hydrostatic is False
    assert cfg.namelist.dt_atmos == 900.0
    assert cfg.namelist.tau == 5.0
    assert cfg.namelist.rf_cutoff == 800.0
    assert cfg.namelist.kord == 9
    assert cfg.namelist.hord == 4
    assert cfg.namelist.radiation == "rrtmg"
    assert cfg.duration_seconds == 3 * 3600.0
    assert cfg.radiation_interval_steps == 4


def test_reference_config_flat_keys_win_and_base_version_routes():
    from fv3net_tpu.runtime.config import get_config

    cfg = get_config({
        "namelist": {
            "fv_core_nml": {"npx": 49, "npz": 79},
            # flat keys in the same namelist dict override lowered ones
            "npz": 32,
            "radiation": "gray",
            "gfs_physics_nml": {"fhswr": 1800.0},
        },
        "duration_seconds": 600.0,
    })
    assert cfg.namelist.npx == 48 and cfg.namelist.npz == 32
    assert cfg.namelist.radiation == "gray"
    assert cfg.duration_seconds == 600.0

    cfg2 = get_config({
        "base_version": "v0.1/aquaplanet_c12_test",
        "duration_seconds": 900.0,
    })
    assert cfg2.namelist.npx == 12 and cfg2.duration_seconds == 900.0


def test_diagnostic_chunks_key(tmp_path):
    """DiagnosticFileConfig.chunks (reference manager.py:36,46) controls
    the stored zarr chunk grid; partial-chunk time appends still read
    back correctly."""
    from fv3net_tpu.runtime.config import DiagnosticFileConfig, TimeConfig
    from fv3net_tpu.runtime.diagnostics.manager import DiagnosticsManager

    cfg = DiagnosticFileConfig(
        name="out.zarr",
        variables=["field"],
        times=TimeConfig(kind="every"),
        chunks={"time": 4, "x": 3},
    )
    t0 = datetime.datetime(2020, 1, 1)
    mgr = DiagnosticsManager([cfg], t0, str(tmp_path))
    data = np.arange(36, dtype=np.float32).reshape(6, 6)
    for k in range(3):
        mgr.observe(
            t0 + datetime.timedelta(hours=k),
            {"field": Quantity(data + k, ("y", "x"))},
        )
    mgr.close()
    arr = zarrio.ZarrArray(str(tmp_path / "out.zarr" / "field"))
    assert tuple(arr.chunks) == (4, 6, 3)
    out = arr.read()
    assert out.shape == (3, 6, 6)
    np.testing.assert_allclose(out[2], data + 2)
