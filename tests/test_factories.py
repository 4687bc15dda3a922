"""Stepper factories from config."""
import datetime

import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu.core import zarrio
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime import factories
from fv3net_tpu.runtime.config import (
    MachineLearningConfig,
    NamelistConfig,
    NudgingConfig,
    UserConfig,
)


def test_no_stepper_for_baseline_config():
    cfg = UserConfig(namelist=NamelistConfig(npx=6, npz=8))
    assert factories.get_postphysics_stepper(cfg, 900.0) is None
    assert factories.get_prephysics_steppers(cfg, 900.0) == []


def test_nudging_stepper_from_config(tmp_path):
    rng = np.random.RandomState(0)
    ref = Dataset(
        {
            "air_temperature": Quantity(
                rng.rand(3, 6, 8, 4, 4).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
            )
        }
    )
    path = str(tmp_path / "ref.zarr")
    zarrio.to_zarr(ref, path)
    cfg = UserConfig(
        namelist=NamelistConfig(npx=4, npz=8),
        nudging=NudgingConfig(
            restarts_path=path,
            timescale_hours={"air_temperature": 3.0},
        ),
    )
    stepper = factories.get_postphysics_stepper(cfg, 900.0)
    assert stepper is not None
    assert stepper.label == "nudging"


def test_ml_stepper_from_config(tmp_path):
    from fv3net_tpu import fit
    from fv3net_tpu.fit.testing import ConstantOutputPredictor

    model = ConstantOutputPredictor(["air_temperature"], ["dQ1"])
    model.set_outputs(dQ1=np.zeros(8))
    mpath = str(tmp_path / "model")
    fit.dump(model, mpath)
    cfg = UserConfig(
        namelist=NamelistConfig(npx=6, npz=8),
        scikit_learn=MachineLearningConfig(model=[mpath]),
    )
    stepper = factories.get_postphysics_stepper(cfg, 900.0)
    assert stepper.label == "machine_learning"


def test_prephysics_prescriber_from_config(tmp_path):
    rng = np.random.RandomState(1)
    data = Dataset(
        {
            "ocean_surface_temperature": Quantity(
                rng.rand(2, 6, 4, 4).astype(np.float32),
                ("time", "tile", "y", "x"),
            )
        }
    )
    path = str(tmp_path / "sst.zarr")
    zarrio.to_zarr(data, path)
    cfg = UserConfig(
        namelist=NamelistConfig(npx=4, npz=8),
        prephysics=[
            {
                "kind": "prescriber",
                "dataset": path,
                "variables": ["ocean_surface_temperature"],
            }
        ],
    )
    steppers = factories.get_prephysics_steppers(cfg, 900.0)
    assert len(steppers) == 1
    assert steppers[0].label == "prescriber"


def test_index_keyed_mapper_sorts_numerically(tmp_path):
    """ZarrMapper keys are str(i); the step-index fallback must sort them
    numerically — lexicographic order serves slice 10 at step 2 once a
    dataset has 10+ times (regression)."""
    rng = np.random.RandomState(0)
    nt = 12
    data = Dataset(
        {
            "dQ1": Quantity(
                (np.arange(nt)[:, None, None, None, None]
                 * np.ones((nt, 6, 4, 3, 3))).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
            )
        }
    )
    path = str(tmp_path / "t.zarr")
    zarrio.to_zarr(data, path)
    from fv3net_tpu.loaders import ZarrMapper
    from fv3net_tpu.runtime.interpolate import mapper_getter

    getter = mapper_getter(
        ZarrMapper(path),
        initial_time=datetime.datetime(2016, 8, 1),
        frequency=datetime.timedelta(seconds=900),
    )
    for step in (0, 2, 10, 11):
        t = datetime.datetime(2016, 8, 1) + datetime.timedelta(
            seconds=900 * step
        )
        got = float(np.asarray(getter(t)["dQ1"].data).mean())
        assert got == float(step), (step, got)
