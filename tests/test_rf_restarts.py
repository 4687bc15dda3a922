"""Random forest trainer + restarts_to_zarr pipeline."""
import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.random_forest import (
    RandomForestHyperparameters,
    train_random_forest,
)


def test_random_forest_train_predict_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n, nz = 600, 4
    a = rng.randn(n, nz)
    ds = Dataset(
        {
            "a": Quantity(jnp.asarray(a), ("sample", "z")),
            "out": Quantity(jnp.asarray(2 * a), ("sample", "z")),
        }
    )
    hp = RandomForestHyperparameters(
        input_variables=["a"], output_variables=["out"],
        n_estimators=10, n_jobs=2,
    )
    model = train_random_forest(hp, [ds])
    pred = model.predict(ds)
    err = np.asarray(pred["out"].data) - 2 * a
    assert np.sqrt((err ** 2).mean()) < 0.8
    path = str(tmp_path / "rf")
    fit.dump(model, path)
    loaded = fit.load(path)
    np.testing.assert_allclose(
        np.asarray(loaded.predict(ds)["out"].data),
        np.asarray(pred["out"].data),
    )


@pytest.mark.slow
def test_restarts_to_zarr(tmp_path):
    from fv3net_tpu.core import zarrio
    from fv3net_tpu.pipelines.restarts_to_zarr import restarts_to_zarr
    from fv3net_tpu.runtime.segmented_run import api

    url = str(tmp_path / "run")
    api.create(
        url,
        {
            "namelist": {"npx": 6, "npz": 8, "dt_atmos": 900.0},
            "duration_seconds": 900.0,
        },
    )
    api.append_segment(url)
    api.append_segment(url)
    out = str(tmp_path / "restarts.zarr")
    labels = restarts_to_zarr(url, out)
    assert len(labels) == 2
    ds = zarrio.open_zarr(out)
    assert ds["sphum"].shape[0] == 2
    assert np.isfinite(ds["sphum"].values).all()
