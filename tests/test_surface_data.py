"""Catalog surface boundary conditions -> non-aquaplanet runs
(VERDICT r1 weak #9)."""
import numpy as np
import jax.numpy as jnp

from fv3net_tpu import catalog
from fv3net_tpu.runtime import TimeLoop, names
from fv3net_tpu.runtime.config import get_config


def test_topography_catalog_entry():
    ds = catalog.get("topography/c12")
    land = np.asarray(ds["land_sea_mask"].data)
    phis = np.asarray(ds["surface_geopotential"].data)
    assert land.shape == (6, 12, 12)
    assert set(np.unique(land)) <= {0.0, 1.0}
    frac = land.mean()
    assert 0.05 < frac < 0.6  # continents, not aquaplanet/all-land
    # topography only on land, positive, bounded
    assert (phis[land < 0.5] == 0).all()
    assert phis.max() > 1000.0 and phis.max() < 9.81 * 4000.0
    sst = np.asarray(ds["surface_temperature"].data)
    assert sst.min() > 260.0 and sst.max() < 305.0


def test_timeloop_with_surface_data_runs():
    cfg = get_config(
        {
            "namelist": {
                "npx": 12, "npz": 8,
                "surface_data": "topography/c12",
                "slab_ocean": True, "bucket_land": True, "sea_ice": True,
            },
            "duration_seconds": 1800.0,
        }
    )
    loop = TimeLoop(cfg, dtype=jnp.float32)
    land = np.asarray(loop.state.surface[names.MASK])
    assert land.max() == 1.0 and land.min() == 0.0
    assert np.asarray(loop.state.dycore.phis).max() > 1000.0
    assert "sgh" in loop.state.surface  # enables gravity-wave drag
    for _t, _d in loop:
        pass
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()
    assert np.isfinite(np.asarray(loop.state.dycore.wind)).all()
