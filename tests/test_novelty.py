"""Novelty detector + out-of-sample model tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.novelty import (
    MinMaxNoveltyDetector,
    OCSVMNoveltyDetector,
    OutOfSampleModel,
    taper_decay,
    taper_mask,
    taper_ramp,
)
from fv3net_tpu.fit.testing import ConstantOutputPredictor


def make_batch(center=0.0, n=500, nz=4, seed=0):
    rng = np.random.RandomState(seed)
    return Dataset(
        {
            "a": Quantity(jnp.asarray(center + rng.randn(n, nz)),
                          ("sample", "z")),
        }
    )


def test_taper_functions():
    s = jnp.asarray([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(taper_mask(s, cutoff=0.0)),
                               [1, 0, 0])
    ramp = np.asarray(taper_ramp(s, ramp_min=0.0, ramp_max=1.0))
    np.testing.assert_allclose(ramp, [1.0, 0.5, 0.0])
    decay = np.asarray(taper_decay(s, threshold=0.0, rate=1.0))
    assert decay[0] == 1.0 and 0 < decay[2] < decay[1] < 1


def test_minmax_detector_flags_out_of_range(tmp_path):
    train = make_batch()
    det = MinMaxNoveltyDetector(["a"]).fit(train)
    # in-sample scores <= 0
    _, diags = det.predict_novelties(train)
    assert np.asarray(diags["centered_score"].data).max() <= 1e-12
    # far out-of-range -> novel
    far = make_batch(center=100.0, n=10)
    _, diags = det.predict_novelties(far)
    assert (np.asarray(diags["is_novelty"].data) == 1).all()
    # dump/load
    path = str(tmp_path / "minmax")
    fit.dump(det, path)
    det2 = fit.load(path)
    _, diags2 = det2.predict_novelties(far)
    np.testing.assert_allclose(
        np.asarray(diags["centered_score"].data),
        np.asarray(diags2["centered_score"].data),
    )


def test_ocsvm_detector(tmp_path):
    train = make_batch(n=300)
    det = OCSVMNoveltyDetector(["a"]).fit(train, nu=0.05)
    far = make_batch(center=50.0, n=20, seed=1)
    _, diags_far = det.predict_novelties(far)
    _, diags_in = det.predict_novelties(make_batch(n=50, seed=2))
    assert (
        np.asarray(diags_far["centered_score"].data).mean()
        > np.asarray(diags_in["centered_score"].data).mean()
    )
    path = str(tmp_path / "ocsvm")
    fit.dump(det, path)
    det2 = fit.load(path)
    _, d2 = det2.predict_novelties(far)
    np.testing.assert_allclose(
        np.asarray(diags_far["centered_score"].data),
        np.asarray(d2["centered_score"].data),
    )


def test_out_of_sample_model_suppresses_novel_inputs(tmp_path):
    train = make_batch()
    det = MinMaxNoveltyDetector(["a"]).fit(train)
    base = ConstantOutputPredictor(["a"], ["dQ1"])
    base.set_outputs(dQ1=np.full(4, 2.0))
    model = OutOfSampleModel(base, det, cutoff=0.0)

    out_in = model.predict(train)
    np.testing.assert_allclose(np.asarray(out_in["dQ1"].data), 2.0)

    far = make_batch(center=100.0, n=7)
    out_far = model.predict(far)
    np.testing.assert_allclose(np.asarray(out_far["dQ1"].data), 0.0)
    np.testing.assert_allclose(np.asarray(out_far["taper_values"].data), 0.0)

    path = str(tmp_path / "oos")
    fit.dump(model, path)
    loaded = fit.load(path)
    out2 = loaded.predict(far)
    np.testing.assert_allclose(np.asarray(out2["dQ1"].data), 0.0)


def test_trainer_registry_entries():
    from fv3net_tpu.fit.train import training_function_names

    names = training_function_names()
    assert "min_max_novelty_detector" in names
    assert "ocsvm_novelty_detector" in names
    assert "dense" in names
