"""diagnostics_to_zarr + coarsen_surface dataflow-pipeline analogs.

reference: workflows/dataflow/fv3net/pipelines/diagnostics_to_zarr.py,
coarsen_surface_c3072.py.
"""
import os

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.core import netcdfio, zarrio  # noqa: E402
from fv3net_tpu.core.dataset import Dataset  # noqa: E402
from fv3net_tpu.core.quantity import Quantity  # noqa: E402
from fv3net_tpu.pipelines.coarsen_surface import coarsen_surface  # noqa: E402
from fv3net_tpu.pipelines.diagnostics_to_zarr import (  # noqa: E402
    diagnostics_to_zarr,
    get_all_diagnostic_categories,
)


def _write_tile_ncs(rundir, category, nt=3, n=8):
    rng = np.random.default_rng(0)
    for t in range(1, 7):
        ds = Dataset(
            {
                "t2m": Quantity(
                    rng.normal(size=(nt, n, n)).astype(np.float32),
                    ("time", "grid_yt", "grid_xt"), "K",
                ),
            },
            coords={
                "time": np.arange(nt, dtype=np.float64),
                "grid_yt": np.arange(n, dtype=np.float64),
                "grid_xt": np.arange(n, dtype=np.float64),
            },
        )
        netcdfio.write_netcdf(
            ds, os.path.join(rundir, f"{category}.tile{t}.nc")
        )


def test_diagnostics_to_zarr_roundtrip(tmp_path):
    rundir = str(tmp_path)
    _write_tile_ncs(rundir, "sfc_dt_atmos")
    _write_tile_ncs(rundir, "atmos_dt_atmos")
    assert get_all_diagnostic_categories(rundir) == [
        "atmos_dt_atmos", "sfc_dt_atmos",
    ]
    results = diagnostics_to_zarr(rundir, max_workers=2)
    assert all(r.ok for r in results)
    out = zarrio.open_zarr(os.path.join(rundir, "sfc_dt_atmos.zarr"))
    q = out["t2m"]
    assert q.dims == ("tile", "time", "grid_yt", "grid_xt")
    assert q.data.shape == (6, 3, 8, 8)
    ref = netcdfio.open_tiles(os.path.join(rundir, "sfc_dt_atmos"))
    np.testing.assert_array_equal(
        np.asarray(q.data), np.asarray(ref["t2m"].data)
    )
    # consolidated metadata written
    assert os.path.exists(
        os.path.join(rundir, "sfc_dt_atmos.zarr", ".zmetadata")
    )


def _write_subtile(path, x0, y0, n, values, area):
    ds = Dataset(
        {
            "PRATEsfc": Quantity(
                values.astype(np.float32), ("time", "grid_yt", "grid_xt"),
                "kg/m^2/s",
            ),
        },
        coords={
            "time": np.array([0.0]),
            "grid_yt": y0 + np.arange(n, dtype=np.float64),
            "grid_xt": x0 + np.arange(n, dtype=np.float64),
        },
    )
    netcdfio.write_netcdf(ds, path)
    gs = Dataset(
        {
            "area": Quantity(
                area.astype(np.float32), ("grid_yt", "grid_xt"), "m^2"
            ),
        },
        coords=dict(ds.coords),
    )
    netcdfio.write_netcdf(gs, path.replace("data", "grid_spec"))


def test_coarsen_surface_subtile_stitch(tmp_path):
    """4 subtiles (2x2 io_layout) of a 16x16 tile, coarsened 4x, must
    equal coarsening the assembled tile directly."""
    n, factor = 8, 4
    rng = np.random.default_rng(1)
    full = rng.uniform(1, 2, size=(1, 2 * n, 2 * n))
    area = rng.uniform(0.5, 1.5, size=(2 * n, 2 * n))
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    k = 0
    for iy, y0 in enumerate((0.0, float(n))):
        for ix, x0 in enumerate((0.0, float(n))):
            _write_subtile(
                os.path.join(indir, f"data.tile1.nc.{k:04d}"),
                x0, y0, n,
                full[:, iy * n:(iy + 1) * n, ix * n:(ix + 1) * n],
                area[iy * n:(iy + 1) * n, ix * n:(ix + 1) * n],
            )
            k += 1
    outdir = str(tmp_path / "out")
    results = coarsen_surface(
        indir, outdir, prefix_data="data",
        prefix_grid_spec="grid_spec", coarsening=factor, max_workers=1,
    )
    assert all(r.ok for r in results), [r.error for r in results]
    out = netcdfio.open_netcdf(
        os.path.join(outdir, "C4", "PRATEsfc.tile1.nc")
    )
    got = np.asarray(out["PRATEsfc"].data)
    assert got.shape == (1, (2 * n) // factor, (2 * n) // factor)
    # oracle: plain numpy weighted block average of the full tile
    f32 = np.float32
    w = area.astype(f32)
    xw = (full.astype(f32) * w).reshape(
        1, 2 * n // factor, factor, 2 * n // factor, factor
    ).sum(axis=(2, 4))
    ww = np.broadcast_to(w, full.shape).reshape(
        1, 2 * n // factor, factor, 2 * n // factor, factor
    ).sum(axis=(2, 4))
    np.testing.assert_allclose(got, xw / ww, rtol=2e-6)
    # coordinates stitched in order
    assert np.all(np.diff(out.coords["grid_xt"]) > 0)
