"""DiagnosticFile time-averaging + zarr output tests
(reference behavior: runtime/diagnostics/manager.py:98-178)."""
import datetime

import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core import zarrio
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime.config import DiagnosticFileConfig, TimeConfig
from fv3net_tpu.runtime.diagnostics import DiagnosticsManager

T0 = datetime.datetime(2016, 8, 1)


def diags_at(value):
    return {
        "a": Quantity(jnp.full((6, 4, 4), value), ("tile", "y", "x")),
        "ignored": Quantity(jnp.zeros((6, 4, 4)), ("tile", "y", "x")),
    }


def test_every_step_output(tmp_path):
    cfg = DiagnosticFileConfig(
        name="every.zarr", variables=["a"], times=TimeConfig(kind="every")
    )
    mgr = DiagnosticsManager([cfg], T0, str(tmp_path))
    t = T0
    for i in range(3):
        t += datetime.timedelta(seconds=900)
        mgr.observe(t, diags_at(float(i)))
    mgr.close()
    ds = zarrio.open_zarr(str(tmp_path / "every.zarr"))
    assert ds["a"].shape == (3, 6, 4, 4)
    np.testing.assert_allclose(ds["a"].values[:, 0, 0, 0], [0.0, 1.0, 2.0])
    assert "ignored" not in ds
    np.testing.assert_allclose(ds.coords["time"], [0.0, 0.25, 0.5])


def test_interval_average_output(tmp_path):
    cfg = DiagnosticFileConfig(
        name="avg.zarr",
        variables=["a"],
        times=TimeConfig(kind="interval-average", frequency=1800.0),
    )
    mgr = DiagnosticsManager([cfg], T0, str(tmp_path))
    t = T0
    for i in range(4):  # two 1800 s windows of two 900 s steps each
        t += datetime.timedelta(seconds=900)
        mgr.observe(t, diags_at(float(i)))
    mgr.close()
    ds = zarrio.open_zarr(str(tmp_path / "avg.zarr"))
    assert ds["a"].shape == (2, 6, 4, 4)
    np.testing.assert_allclose(ds["a"].values[:, 0, 0, 0], [0.5, 2.5])


def test_interval_output_subsamples(tmp_path):
    cfg = DiagnosticFileConfig(
        name="int.zarr",
        variables=["a"],
        times=TimeConfig(kind="interval", frequency=1800.0),
    )
    mgr = DiagnosticsManager([cfg], T0, str(tmp_path))
    t = T0
    for i in range(4):
        t += datetime.timedelta(seconds=900)
        mgr.observe(t, diags_at(float(i)))
    mgr.close()
    ds = zarrio.open_zarr(str(tmp_path / "int.zarr"))
    # only the 1800 s multiples: steps 1 and 3 (i=1, 3)
    np.testing.assert_allclose(ds["a"].values[:, 0, 0, 0], [1.0, 3.0])


def test_pull_buffer_batches_across_observations(tmp_path):
    """Buffered device handles drain as one batched pull: rows written
    only at drain points (buffer full or close), values identical to the
    unbuffered path."""
    from fv3net_tpu.runtime.diagnostics.manager import DiagnosticFile
    from fv3net_tpu.runtime.diagnostics.times import (
        time_container_from_config,
    )

    times = time_container_from_config(TimeConfig(kind="every"), T0)
    f = DiagnosticFile(
        str(tmp_path / "buf.zarr"), ["a"], times, pull_buffer=3
    )
    t = T0
    for i in range(5):
        t += datetime.timedelta(seconds=900)
        f.observe(t, diags_at(float(i)))
        if i == 2:
            # first drain happened at the 3rd observe: 3 rows on disk
            ds_mid = zarrio.open_zarr(str(tmp_path / "buf.zarr"))
            assert ds_mid["a"].shape[0] == 3
    f.close()  # drains the 2 still-buffered observations
    ds = zarrio.open_zarr(str(tmp_path / "buf.zarr"))
    np.testing.assert_allclose(
        ds["a"].values[:, 0, 0, 0], [0.0, 1.0, 2.0, 3.0, 4.0]
    )


def test_pull_buffer_interval_average_spans_drains(tmp_path):
    """Interval averaging is computed in observation order even when a
    window boundary lands inside a buffered batch, and each window's
    buffered observations are summed ON DEVICE so only the partial sums
    cross the device->host link."""
    import fv3net_tpu.runtime.diagnostics.manager as mgr_mod

    pulled_counts = []
    orig = mgr_mod._pull_batch

    def counting_pull(arrays, *args, **kwargs):
        pulled_counts.append(len(arrays))
        return orig(arrays, *args, **kwargs)

    cfg = DiagnosticFileConfig(
        name="avgbuf.zarr",
        variables=["a"],
        times=TimeConfig(kind="interval-average", frequency=1800.0),
        pull_buffer=3,
    )
    mgr = DiagnosticsManager([cfg], T0, str(tmp_path))
    t = T0
    try:
        mgr_mod._pull_batch = counting_pull
        for i in range(4):
            t += datetime.timedelta(seconds=900)
            mgr.observe(t, diags_at(float(i)))
        mgr.close()
    finally:
        mgr_mod._pull_batch = orig
    ds = zarrio.open_zarr(str(tmp_path / "avgbuf.zarr"))
    np.testing.assert_allclose(ds["a"].values[:, 0, 0, 0], [0.5, 2.5])
    # drain 1 buffers obs 0,1 (window 1) + obs 2 (window 2): two partial
    # sums cross; drain 2 (close) holds only obs 3: one array
    assert pulled_counts == [2, 1]


def test_pull_dtype_bf16_halves_transfer_and_upcasts(tmp_path):
    """pull_dtype="bfloat16" casts floating diagnostics to bf16 inside
    the device-side batched pull (half the link bytes) and upcasts to
    float32 on the host: stored values equal the bf16 rounding of the
    observed values, stored dtype stays float32."""
    import ml_dtypes

    cfg = DiagnosticFileConfig(
        name="bf16.zarr",
        variables=["a"],
        times=TimeConfig(kind="every"),
        pull_dtype="bfloat16",
    )
    mgr = DiagnosticsManager([cfg], T0, str(tmp_path))
    t = T0
    vals = [1.0 / 3.0, 2.7182818, 101325.0]  # incl. f16-overflow range
    for v in vals:
        t += datetime.timedelta(seconds=900)
        mgr.observe(t, diags_at(v))
    mgr.close()
    ds = zarrio.open_zarr(str(tmp_path / "bf16.zarr"))
    assert ds["a"].dtype == np.float32
    expected = np.asarray(vals, np.float32).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        ds["a"].values[:, 0, 0, 0],
        expected.astype(np.float32),
    )


def test_pull_dtype_bf16_interval_average_across_drains(tmp_path):
    """pull_dtype with interval-average times: the bf16 cast applies to
    the DEVICE-SIDE per-window partial sums; the host accumulates across
    drains in f64.  With pull_buffer=3 and 900 s observations into an
    1800 s window, the first window is split across two drains — the
    stored mean must equal the bf16-rounded partial sums averaged in
    higher precision (advisor r2)."""
    import ml_dtypes

    cfg = DiagnosticFileConfig(
        name="avgbf16.zarr",
        variables=["a"],
        times=TimeConfig(kind="interval-average", frequency=1800.0),
        pull_buffer=3,
        pull_dtype="bfloat16",
    )
    mgr = DiagnosticsManager([cfg], T0, str(tmp_path))
    t = T0
    vals = [1.0 / 3.0, 2.7182818, 101325.0, 0.1]
    for v in vals:
        t += datetime.timedelta(seconds=900)
        mgr.observe(t, diags_at(v))
    mgr.close()
    ds = zarrio.open_zarr(str(tmp_path / "avgbf16.zarr"))
    assert ds["a"].dtype == np.float32

    def bf16_sum(vs):
        # device-side partial sum of the window's buffered observations,
        # then the bf16 cast in the pull
        s = np.sum(np.asarray(vs, np.float32))
        return float(np.float32(s).astype(ml_dtypes.bfloat16))

    # drain boundaries: obs 0,1,2 (drain 1: window-1 sum of [v0,v1],
    # window-2 partial sum of [v2]), obs 3 at close (window-2 partial
    # sum of [v3]); host averages partial sums per window
    w1 = bf16_sum(vals[:2]) / 2.0
    w2 = (bf16_sum(vals[2:3]) + bf16_sum(vals[3:4])) / 2.0
    np.testing.assert_allclose(
        ds["a"].values[:, 0, 0, 0],
        np.asarray([w1, w2], np.float32),
        rtol=1e-6,
    )


def test_pull_dtype_validated_at_config_build():
    """An invalid or non-floating pull_dtype fails when the config is
    BUILT, not at the first diagnostics drain (advisor r2)."""
    import pytest

    with pytest.raises(ValueError, match="pull_dtype"):
        DiagnosticFileConfig(name="x.zarr", pull_dtype="bfoat16")
    with pytest.raises(ValueError, match="floating"):
        DiagnosticFileConfig(name="x.zarr", pull_dtype="int32")
    # valid dtypes still construct
    DiagnosticFileConfig(name="x.zarr", pull_dtype="bfloat16")
    DiagnosticFileConfig(name="x.zarr", pull_dtype="float16")
