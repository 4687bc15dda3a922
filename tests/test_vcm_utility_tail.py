"""vcm utility tail: datetime casting, filesystem helpers, tarballs,
restarts-with-time-coordinates, scream helpers.

reference: external/vcm/vcm/convenience.py:98-168 (cast_to_datetime,
convert_timestamps, gsrm_name_from_resolution_string,
check_if_scream_dataset), vcm/cloud/fsspec.py (get_fs/to_url),
vcm/xarray_loaders.py:26 (open_remote_nc), vcm/extract.py
(extract_tarball_to_path), vcm/fv3_restarts/io.py:41
(open_restarts_with_time_coordinates).
"""
import jax

jax.config.update("jax_enable_x64", True)

import datetime  # noqa: E402
import os  # noqa: E402
import tarfile  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fv3net_tpu.core.convenience import (  # noqa: E402
    cast_to_datetime,
    check_if_scream_dataset,
    convert_timestamps,
    gsrm_name_from_resolution_string,
)
from fv3net_tpu.core.dataset import Dataset  # noqa: E402
from fv3net_tpu.core.filesystem import (  # noqa: E402
    LocalFileSystem,
    extract_tarball_to_path,
    get_fs,
    get_protocol,
    open_remote_nc,
    to_url,
)
from fv3net_tpu.core.netcdfio import (  # noqa: E402
    open_restarts_with_time_coordinates,
    write_netcdf,
)
from fv3net_tpu.core.quantity import Quantity  # noqa: E402


def test_cast_to_datetime_variants():
    expected = datetime.datetime(2016, 8, 1, 0, 15, 0)
    assert cast_to_datetime(expected) is expected
    assert cast_to_datetime("20160801.001500") == expected
    assert (
        cast_to_datetime("gs://bucket/run/20160801.001500/") == expected
    )
    assert cast_to_datetime(np.datetime64("2016-08-01T00:15:00")) == expected

    class CFTimeLike:
        year, month, day, hour, minute, second = 2016, 8, 1, 0, 15, 0

    assert cast_to_datetime(CFTimeLike()) == expected


def test_convert_timestamps():
    out = convert_timestamps(["20160801.001500", "20160801.003000"])
    assert out[0] == datetime.datetime(2016, 8, 1, 0, 15)
    assert out[1] == datetime.datetime(2016, 8, 1, 0, 30)


def test_gsrm_name_and_scream_check():
    assert gsrm_name_from_resolution_string("ne30") == "scream"
    assert gsrm_name_from_resolution_string("C48") == "fv3gfs"
    with pytest.raises(ValueError):
        gsrm_name_from_resolution_string("t639")
    q = Quantity(np.zeros((4,)), ("ncol",))
    assert check_if_scream_dataset(Dataset({"a": q}))
    assert not check_if_scream_dataset(
        Dataset({"a": Quantity(np.zeros((4,)), ("x",))})
    )


def test_local_filesystem_and_urls(tmp_path, monkeypatch):
    assert get_protocol("gs://b/k") == "gs"
    assert get_protocol("/local/path") == "file"
    fs = get_fs(str(tmp_path))
    p = tmp_path / "a.txt"
    p.write_bytes(b"hello")
    assert fs.exists(str(p))
    assert fs.cat(str(p)) == b"hello"
    assert str(p) in fs.ls(str(tmp_path))
    assert to_url(fs, str(p)) == str(p)
    # remote protocols fail without a mirror, resolve with one
    with pytest.raises(OSError):
        fs.cat("gs://bucket/a.txt")
    monkeypatch.setenv("FV3NET_FS_MIRROR", str(tmp_path))
    (tmp_path / "bucket").mkdir()
    (tmp_path / "bucket" / "a.txt").write_bytes(b"remote")
    assert fs.cat("gs://bucket/a.txt") == b"remote"


def test_open_remote_nc_roundtrip(tmp_path):
    ds = Dataset({"T": Quantity(np.arange(6.0).reshape(2, 3), ("y", "x"))})
    path = str(tmp_path / "f.nc")
    write_netcdf(ds, path)
    out = open_remote_nc(LocalFileSystem(), path)
    np.testing.assert_allclose(np.asarray(out["T"].data), ds["T"].data)


def test_extract_tarball_to_path(tmp_path):
    src = tmp_path / "payload"
    src.mkdir()
    (src / "x.txt").write_text("data")
    tar = tmp_path / "archive.tar"
    with tarfile.open(tar, "w") as t:
        t.add(src / "x.txt", arcname="x.txt")
    out = extract_tarball_to_path(tar)
    assert out == tmp_path / "archive"
    assert (out / "x.txt").read_text() == "data"


def test_open_restarts_with_time_coordinates(tmp_path):
    def _write_snapshot(prefix, value):
        for tile in range(1, 7):
            ds = Dataset(
                {"T": Quantity(np.full((2, 2), value), ("y", "x"))}
            )
            write_netcdf(ds, str(tmp_path / f"{prefix}.tile{tile}.nc"))

    _write_snapshot("20160801.001500.fv_core.res", 1.0)
    _write_snapshot("20160801.003000.fv_core.res", 2.0)
    _write_snapshot("20160801.003000.sfc_data", 3.0)
    out = open_restarts_with_time_coordinates(str(tmp_path))
    times = list(out)
    assert times == [
        datetime.datetime(2016, 8, 1, 0, 15),
        datetime.datetime(2016, 8, 1, 0, 30),
    ]
    assert set(out[times[1]]) == {"fv_core.res", "sfc_data"}
    first = out[times[0]]["fv_core.res"]["T"]
    assert first.data.shape == (6, 2, 2)
    np.testing.assert_allclose(np.asarray(first.data), 1.0)


def test_generate_fine_res_files_and_budget(tmp_path):
    """generate_fine_res writes the reference per-time per-tile NetCDF
    layout (reference synth/_fine_res.py:8-22) and the variables feed the
    fine-res budget pipeline."""
    import jax.numpy as jnp

    from fv3net_tpu.core.netcdfio import open_tiles
    from fv3net_tpu.pipelines.fine_res_budget import compute_budget
    from fv3net_tpu.synth import generate_fine_res
    from fv3net_tpu.synth.generators import FINE_RES_VARIABLES

    times = ["20160801.001500", "20160801.003000"]
    ds = generate_fine_res(str(tmp_path), times, nz=6, n=8)
    assert set(FINE_RES_VARIABLES) <= set(ds)
    tiles = open_tiles(str(tmp_path / "20160801.001500"))
    assert tiles["T"].data.shape == (6, 6, 8, 8)
    # the synthetic variables drive the budget computation (z-last)
    def zlast(name):
        return jnp.moveaxis(jnp.asarray(tiles[name].data), 1, -1)

    out = compute_budget(
        T_begin=zlast("T"),
        T_end=zlast("T") + 900.0 * zlast("T_storage"),
        q_begin=zlast("sphum"),
        q_end=zlast("sphum") + 900.0 * zlast("sphum_storage"),
        physics_T_tendency=zlast("t_dt_phys_coarse"),
        physics_q_tendency=zlast("qv_dt_phys_coarse"),
        delp_fine=zlast("delp"),
        area=jnp.ones((6, 8, 8)),
        factor=2,
        time_step=900.0,
    )
    for key in ("Q1", "Q2", "dQ1", "dQ2"):
        assert np.isfinite(np.asarray(out[key])).all()
        assert out[key].shape == (6, 4, 4, 6)  # z-last, yx block-coarsened by 2
