"""Predictor wrapper tests (reference contract:
external/fv3fit/tests/test_models.py semantics) + post_process +
prepare_config."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.models import (
    CombinedOutputModel,
    DerivedModel,
    EnsembleModel,
    SquashedOutputModel,
    TaperedModel,
    TransformedPredictor,
)
from fv3net_tpu.fit.testing import ConstantOutputPredictor


def constant_model(outputs, inputs=("air_temperature",), nz=5):
    m = ConstantOutputPredictor(list(inputs), list(outputs))
    m.set_outputs(**{k: np.full(nz, v) for k, v in
                     zip(outputs, [0.1, -0.2, 0.3, 0.4])})
    return m


@pytest.fixture
def X():
    return Dataset(
        {
            "air_temperature": Quantity(jnp.full((8, 5), 270.0),
                                        ("sample", "z")),
            "pressure_thickness_of_atmospheric_layer": Quantity(
                jnp.full((8, 5), 1000.0), ("sample", "z")
            ),
        }
    )


def test_combined_output_model(X, tmp_path):
    m = CombinedOutputModel(
        [constant_model(["dQ1"]), constant_model(["dQ2"])]
    )
    out = m.predict(X)
    assert set(out.keys()) == {"dQ1", "dQ2"}
    path = str(tmp_path / "combined")
    fit.dump(m, path)
    loaded = fit.load(path)
    out2 = loaded.predict(X)
    np.testing.assert_allclose(
        np.asarray(out["dQ1"].data), np.asarray(out2["dQ1"].data)
    )
    with pytest.raises(ValueError, match="duplicate"):
        CombinedOutputModel([constant_model(["dQ1"]), constant_model(["dQ1"])])


def test_ensemble_model(X, tmp_path):
    m1 = ConstantOutputPredictor(["air_temperature"], ["dQ1"])
    m1.set_outputs(dQ1=np.full(5, 1.0))
    m2 = ConstantOutputPredictor(["air_temperature"], ["dQ1"])
    m2.set_outputs(dQ1=np.full(5, 3.0))
    ens = EnsembleModel([m1, m2], "mean")
    out = ens.predict(X)
    np.testing.assert_allclose(np.asarray(out["dQ1"].data), 2.0)
    path = str(tmp_path / "ens")
    fit.dump(ens, path)
    out2 = fit.load(path).predict(X)
    np.testing.assert_allclose(np.asarray(out2["dQ1"].data), 2.0)


def test_tapered_model(X, tmp_path):
    base = ConstantOutputPredictor(["air_temperature"], ["dQ1"])
    base.set_outputs(dQ1=np.ones(5))
    m = TaperedModel(base, {"dQ1": {"cutoff": 3, "rate": 1.0}})
    out = m.predict(X)
    arr = np.asarray(out["dQ1"].data)
    assert arr[0, 0] < 0.1 and arr[0, -1] == 1.0
    path = str(tmp_path / "tapered")
    fit.dump(m, path)
    out2 = fit.load(path).predict(X)
    np.testing.assert_allclose(arr, np.asarray(out2["dQ1"].data))


def test_derived_model(X, tmp_path):
    base = ConstantOutputPredictor(["air_temperature"], ["dQ1", "dQ2"])
    base.set_outputs(dQ1=np.full(5, 1e-5), dQ2=np.full(5, -1e-8))
    m = DerivedModel(base, ["column_integrated_dQ1"])
    assert "pressure_thickness_of_atmospheric_layer" in m.input_variables
    out = m.predict(X)
    assert "column_integrated_dQ1" in out
    assert out["column_integrated_dQ1"].dims == ("sample",)
    path = str(tmp_path / "derived")
    fit.dump(m, path)
    out2 = fit.load(path).predict(X)
    np.testing.assert_allclose(
        np.asarray(out["column_integrated_dQ1"].data),
        np.asarray(out2["column_integrated_dQ1"].data),
    )
    with pytest.raises(ValueError, match="unknown derived"):
        DerivedModel(base, ["not_a_variable"])


def test_transformed_predictor(X, tmp_path):
    base = ConstantOutputPredictor(["air_temperature"], ["Q1", "Q2"])
    base.set_outputs(Q1=np.full(5, 2e-5), Q2=np.full(5, 1e-8))
    m = TransformedPredictor(base, [{"name": "Qm_from_Q1_Q2"}])
    out = m.predict(X)
    assert "Qm" in out
    path = str(tmp_path / "transformed")
    fit.dump(m, path)
    out2 = fit.load(path).predict(X)
    np.testing.assert_allclose(
        np.asarray(out["Qm"].data), np.asarray(out2["Qm"].data)
    )


def test_squashed_output_model(X, tmp_path):
    base = ConstantOutputPredictor(["air_temperature"], ["cloud", "other"])
    base.set_outputs(cloud=np.array([1e-9, 1e-3, 2e-3, 0.0, 5e-4]),
                     other=np.ones(5))
    m = SquashedOutputModel(base, squash_by="cloud", squash_threshold=1e-4)
    out = m.predict(X)
    arr = np.asarray(out["cloud"].data)
    np.testing.assert_allclose(arr[0], [0.0, 1e-3, 2e-3, 0.0, 5e-4])
    np.testing.assert_allclose(np.asarray(out["other"].data), 1.0)
    path = str(tmp_path / "squashed")
    fit.dump(m, path)
    out2 = fit.load(path).predict(X)
    np.testing.assert_allclose(arr, np.asarray(out2["cloud"].data))


def test_prepare_config():
    from fv3net_tpu.runtime.segmented_run.prepare_config import prepare_config

    cfg = prepare_config(
        {
            "base_version": "v0.1/aquaplanet_c12_test",
            "namelist": {"npz": 24},
            "duration_seconds": 900.0,
        }
    )
    assert cfg["namelist"]["npx"] == 12  # from base
    assert cfg["namelist"]["npz"] == 24  # overridden
    assert cfg["duration_seconds"] == 900.0


def test_post_process_appends_segments(tmp_path):
    import datetime

    from fv3net_tpu.core import zarrio
    from fv3net_tpu.post_process import post_process

    # fake run dir with two segments each holding a 2-step diags.zarr
    for si, seg in enumerate(["20160801.000000", "20160801.003000"]):
        d = tmp_path / "run" / "artifacts" / seg
        os.makedirs(d)
        ds = Dataset(
            {
                "a": Quantity(
                    np.full((2, 6, 4, 4), float(si)), ("time", "tile", "y", "x")
                )
            },
            coords={"time": np.arange(2) + 2 * si},
        )
        zarrio.to_zarr(ds, str(d / "diags.zarr"))
    written = post_process(str(tmp_path / "run"), str(tmp_path / "out"))
    assert len(written) == 1
    combined = zarrio.open_zarr(written[0])
    assert combined["a"].shape == (4, 6, 4, 4)
    np.testing.assert_allclose(combined["a"].values[:, 0, 0, 0], [0, 0, 1, 1])
    np.testing.assert_allclose(combined.coords["time"], [0, 1, 2, 3])
