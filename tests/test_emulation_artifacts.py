"""Emulation hooks + artifacts tests."""
import datetime
import io
import json

import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core import zarrio
from fv3net_tpu.emulation import (
    IntervalSchedule,
    LevelMask,
    MicrophysicsEmulator,
    RangeMask,
    StorageHook,
    TimeMask,
    compose_masks,
)
from fv3net_tpu.artifacts import StepMetadata, resolve_url

T0 = datetime.datetime(2016, 8, 1)


class IdentityPlusOne:
    """Fake model: adds one to air_temperature."""

    input_variables = ["air_temperature"]
    output_variables = ["air_temperature"]

    def predict_arrays(self, data):
        return {"air_temperature": data["air_temperature"] + 1.0}


def state(nz=4):
    return {
        "air_temperature": jnp.full((2, 3, nz), 250.0),
        "specific_humidity": jnp.full((2, 3, nz), 1e-3),
    }


def test_emulator_applies_model():
    hook = MicrophysicsEmulator(IdentityPlusOne())
    out = hook(state())
    np.testing.assert_allclose(np.asarray(out["air_temperature"]), 251.0)
    np.testing.assert_allclose(np.asarray(out["specific_humidity"]), 1e-3)


def test_range_mask_clips():
    hook = MicrophysicsEmulator(
        IdentityPlusOne(),
        mask=RangeMask("air_temperature", min=None, max=250.5),
    )
    out = hook(state())
    np.testing.assert_allclose(np.asarray(out["air_temperature"]), 250.5)


def test_level_mask_keeps_original_outside_window():
    hook = MicrophysicsEmulator(
        IdentityPlusOne(),
        mask=LevelMask("air_temperature", start=1, stop=3),
    )
    out = hook(state(nz=4))
    T = np.asarray(out["air_temperature"])
    np.testing.assert_allclose(T[..., 0], 250.0)  # outside -> original
    np.testing.assert_allclose(T[..., 1:3], 251.0)  # inside -> emulated
    np.testing.assert_allclose(T[..., 3], 250.0)


def test_compose_masks_order():
    mask = compose_masks(
        [
            LevelMask("air_temperature", start=0, stop=2),
            RangeMask("air_temperature", max=250.2),
        ]
    )
    hook = MicrophysicsEmulator(IdentityPlusOne(), mask=mask)
    out = hook(state(nz=4))
    T = np.asarray(out["air_temperature"])
    np.testing.assert_allclose(T[..., 0], 250.2)  # emulated then clipped
    np.testing.assert_allclose(T[..., 3], 250.0)  # original, clip no-op


def test_time_mask_alternates():
    sched = IntervalSchedule(datetime.timedelta(hours=2), T0)
    tm = TimeMask(sched)
    tm.set_time(T0)  # first half of period -> alpha 1 (all emulator)
    out = tm({"a": jnp.zeros(3)}, {"a": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)
    tm.set_time(T0 + datetime.timedelta(hours=1))  # second half -> state
    out = tm({"a": jnp.zeros(3)}, {"a": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(out["a"]), 0.0)


def test_storage_hook_appends(tmp_path):
    path = str(tmp_path / "capture.zarr")
    hook = StorageHook(path, output_freq_sec=1800.0, variables=["air_temperature"])
    t = T0
    for i in range(4):
        hook(state(), t)
        t += datetime.timedelta(seconds=900)
    ds = zarrio.open_zarr(path)
    # stored at 0 s and 1800 s only
    assert ds["air_temperature"].shape[0] == 2


def test_step_metadata_print_json(capsys=None):
    buf = io.StringIO()
    StepMetadata("training", "/tmp/out", args=["a.yaml"]).print_json(file=buf)
    d = json.loads(buf.getvalue())
    assert d["step_metadata"]["job_type"] == "training"
    assert d["step_metadata"]["args"] == ["a.yaml"]


def test_resolve_url():
    url = resolve_url("gs://bucket", "my-project", "tag1",
                      time=datetime.date(2026, 8, 16))
    assert url == "gs://bucket/my-project/2026-08-16/tag1"
    import pytest

    with pytest.raises(ValueError):
        resolve_url("gs://b", "Bad_Project", "t")


def test_storage_hook_appends_across_segments(tmp_path):
    """A resumed process must append to an existing store, not truncate
    it (segmented-run training-data capture)."""
    import datetime

    import jax.numpy as jnp

    from fv3net_tpu.core import zarrio
    from fv3net_tpu.emulation.hooks import StorageHook

    path = str(tmp_path / "store.zarr")
    t0 = datetime.datetime(2016, 8, 1)
    state = {"air_temperature": jnp.full((3, 4), 250.0)}

    hook1 = StorageHook(path, output_freq_sec=900.0)
    hook1(state, t0)
    hook1(state, t0 + datetime.timedelta(seconds=900))
    # new process, same store
    hook2 = StorageHook(path, output_freq_sec=900.0)
    hook2({"air_temperature": jnp.full((3, 4), 260.0)},
          t0 + datetime.timedelta(seconds=1800))
    out = zarrio.open_zarr(path)["air_temperature"]
    assert out.data.shape[0] == 3
    np.testing.assert_allclose(np.asarray(out.data)[2], 260.0)
