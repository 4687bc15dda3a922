"""Segmented run end-to-end: create -> append -> restart-append
(mirrors the reference's Fortran-in-the-loop regression tests,
workflows/prognostic_c48_run/tests/test_regression.py:23-67, with the
jitted model in place of the Fortran subprocess)."""
import os

import numpy as np
import pytest
import yaml

from fv3net_tpu.core import zarrio
from fv3net_tpu.runtime.segmented_run import api
from fv3net_tpu.runtime.checkpoint import load_state


CONFIG = {
    "namelist": {"npx": 6, "npz": 10, "dt_atmos": 900.0, "n_split": 2},
    "duration_seconds": 1800.0,
    "initial_time": "2016-08-01T00:00:00",
    "diagnostics": [
        {
            "name": "diags.zarr",
            "variables": [
                "surface_precipitation_rate",
                "ULWRFtoa",
                "tendency_of_air_temperature_due_to_fv3_physics",
            ],
            "times": {"kind": "every"},
        }
    ],
}


@pytest.mark.slow
def test_create_append_restart(tmp_path):
    url = str(tmp_path / "run")
    api.create(url, CONFIG)
    assert os.path.exists(os.path.join(url, "fv3config.yml"))

    seg1 = api.append_segment(url)
    assert os.path.isdir(os.path.join(seg1, "RESTART"))
    ds = zarrio.open_zarr(os.path.join(seg1, "diags.zarr"))
    assert ds["surface_precipitation_rate"].shape[0] == 2  # 2 x 900 s steps
    assert np.isfinite(ds["ULWRFtoa"].values).all()

    # restart metadata carries the segment end time
    _, t_end = load_state(os.path.join(seg1, "RESTART"))
    assert t_end.isoformat() == "2016-08-01T00:30:00"

    seg2 = api.append_segment(url)
    assert seg2 != seg1
    _, t_end2 = load_state(os.path.join(seg2, "RESTART"))
    assert t_end2.isoformat() == "2016-08-01T01:00:00"

    # segment 2 actually started from segment 1's state
    s1, _ = load_state(os.path.join(seg1, "RESTART"))
    s2, _ = load_state(os.path.join(seg2, "RESTART"))
    assert not np.array_equal(np.asarray(s1.dycore.pt), np.asarray(s2.dycore.pt))


@pytest.mark.slow
def test_segmented_run_matches_on_mesh(tmp_path):
    """The ACTUAL `runfv3 append` path on a device mesh (VERDICT r4 #6):
    two appended segments — restart write -> resume -> zarr diagnostics
    — with namelist layout [2, 4] must match the single-device run
    (end state + on-disk diagnostics) within the documented
    cross-program FMA-reassociation budget.  reference:
    runtime/segmented_run/append.py:17-88 + the 6*lx*ly-rank MPI
    layout of fv_core_nml."""
    import copy

    import jax

    from fv3net_tpu.parallel import halo

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    cfg = {
        "namelist": {
            "npx": 8, "npz": 8, "dt_atmos": 900.0, "n_split": 2,
            "radiation": "gray", "slab_ocean": True,
        },
        "duration_seconds": 3600.0,
        "initial_time": "2016-08-01T00:00:00",
        "fused_chunk_steps": 2,
        "diagnostics": [
            {
                "name": "diags.zarr",
                "variables": ["air_temperature", "surface_pressure"],
                "times": {"kind": "every"},
            }
        ],
    }

    # single-device reference FIRST (the mesh run registers a global
    # active halo mesh; restore it after)
    url1 = str(tmp_path / "single")
    api.create(url1, cfg)
    api.append_segment(url1)
    seg1 = api.append_segment(url1)

    cfg_mesh = copy.deepcopy(cfg)
    cfg_mesh["namelist"]["layout"] = [2, 4]
    url2 = str(tmp_path / "mesh")
    saved_mesh = halo.active_mesh()
    try:
        api.create(url2, cfg_mesh)
        api.append_segment(url2)
        seg2 = api.append_segment(url2)
    finally:
        halo.set_active_mesh(saved_mesh)

    s1, t1 = load_state(os.path.join(seg1, "RESTART"))
    s2, t2 = load_state(os.path.join(seg2, "RESTART"))
    assert t1 == t2
    np.testing.assert_allclose(
        np.asarray(s2.dycore.pt), np.asarray(s1.dycore.pt),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s2.dycore.delp), np.asarray(s1.dycore.delp),
        rtol=2e-4,
    )
    # wind: the field that exposed the auto-SPMD halo miscompile —
    # always assert it in sharded equivalence (CLAUDE.md r3)
    np.testing.assert_allclose(
        np.asarray(s2.dycore.wind), np.asarray(s1.dycore.wind),
        atol=2e-3,
    )
    # on-disk diagnostics match across both segments
    for seg_a, seg_b in ((seg1, seg2),):
        da = zarrio.open_zarr(os.path.join(seg_a, "diags.zarr"))
        db = zarrio.open_zarr(os.path.join(seg_b, "diags.zarr"))
        assert da["air_temperature"].shape == db["air_temperature"].shape
        np.testing.assert_allclose(
            db["air_temperature"].values, da["air_temperature"].values,
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            db["surface_pressure"].values, da["surface_pressure"].values,
            rtol=2e-4,
        )


def test_cli_create(tmp_path):
    from fv3net_tpu.runtime.segmented_run.cli import main

    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CONFIG, f)
    url = str(tmp_path / "run")
    assert main(["create", url, cfg_path]) == 0
    assert os.path.exists(os.path.join(url, "fv3config.yml"))


def test_partial_segment_written_on_mid_run_failure(tmp_path, caplog):
    """A crash mid-segment is a warning, not a loss: diagnostics written
    so far and the last completed state's RESTART survive (reference
    append.py:66-74 partial-segment semantics)."""
    import logging

    from fv3net_tpu.runtime.config import get_config

    url = str(tmp_path / "run")
    api.create(url, CONFIG)
    config = get_config(yaml.safe_load(open(os.path.join(url, "fv3config.yml"))))
    out = str(tmp_path / "seg")

    real_observe = api.DiagnosticsManager.observe
    calls = {"n": 0}

    def flaky_observe(self, time, diags):
        real_observe(self, time, diags)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mid-segment fault")

    # fault injection: fail during the SECOND step's host-side handling
    api.DiagnosticsManager.observe = flaky_observe
    try:
        with caplog.at_level(logging.WARNING):
            api.run_segment(config, out)
    finally:
        api.DiagnosticsManager.observe = real_observe
    assert any("partial" in r.message for r in caplog.records)
    assert os.path.isdir(os.path.join(out, "RESTART"))
    ds = zarrio.open_zarr(os.path.join(out, "diags.zarr"))
    assert ds["surface_precipitation_rate"].shape[0] >= 1
