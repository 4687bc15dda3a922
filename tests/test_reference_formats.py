"""Input/output compatibility with the reference's file formats: Fortran
log statistics blocks (vcm.fv3.logs role) and the per-category/per-tile
restart NetCDF layout (tests/test_regression.py:78-88 categories)."""
import datetime

import numpy as np
import jax.numpy as jnp

from fv3net_tpu.runtime import fv3logs

SAMPLE_LOG = """
 some unrelated fortran chatter
            2016           8           1           0          15           0
 ZS      6849.180      -412.0000       231.8707
 PS max =    1052.038      min =    439.9279
 Total surface pressure (mb) =    985.9462
 mean dry surface pressure =    983.2382
 Total Water Vapor (kg/m**2) =   27.51812
 --- Micro Phys water substances (kg/m**2) --
 Total cloud water=  3.4418099E-02
 --------------------------------------------
 TE ( Joule/m^2 * E9) =   2.633417
 UA max =    138.3022      min =   -52.00678
 VA max =    60.31665      min =   -67.41895
 TA max =    319.3932      min =    171.7615
 sphum max =   2.3002494E-02  min =   9.9999342E-10
            2016           8           1           0          30           0
 PS max =    1051.000      min =    440.1000
 Total surface pressure (mb) =    985.9000
 UA max =    139.0000      min =   -53.00000
"""


def test_fv3log_parse():
    log = fv3logs.loads(SAMPLE_LOG)
    assert log.dates == [
        datetime.datetime(2016, 8, 1, 0, 15, 0),
        datetime.datetime(2016, 8, 1, 0, 30, 0),
    ]
    assert log.totals["total surface pressure"] == [985.9462, 985.9]
    assert log.totals["total water vapor"] == [27.51812]
    np.testing.assert_allclose(
        log.totals["total cloud water"], [3.4418099e-02]
    )
    assert log.ranges["PS"][0] == (439.9279, 1052.038)
    assert log.ranges["UA"] == [(-52.00678, 138.3022), (-53.0, 139.0)]
    assert log.ranges["sphum"][0][0] > 0


def test_fv3log_concatenate():
    a = fv3logs.loads(SAMPLE_LOG)
    b = fv3logs.loads(SAMPLE_LOG)
    joined = fv3logs.concatenate([a, b])
    assert len(joined.dates) == 4
    assert len(joined.ranges["PS"]) == 4


def test_fortran_restart_roundtrip(tmp_path):
    """save_fortran_restarts writes files the reference-category reader
    (core.netcdfio.open_restarts, the vcm.open_restarts role) ingests."""
    from fv3net_tpu.core import netcdfio
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import add_nonhydrostatic_fields, init_state
    from fv3net_tpu.runtime.checkpoint import save_fortran_restarts
    from fv3net_tpu.runtime.derived_state import ModelState

    grid = make_grid(6)
    dstate, *_ = init_state(grid, nz=8)
    dstate = add_nonhydrostatic_fields(dstate)
    state = ModelState(
        dycore=dstate,
        surface={
            "surface_temperature": jnp.full((6, 6, 6), 300.0),
            "land_sea_mask": jnp.zeros((6, 6, 6)),
        },
    )
    path = str(tmp_path / "RESTART")
    time = datetime.datetime(2016, 8, 1, 3, 0, 0)
    save_fortran_restarts(state, time, path, grid)

    cats = netcdfio.open_restarts(path)
    for cat in ("fv_core.res", "fv_tracer.res", "fv_srf_wnd.res", "sfc_data"):
        assert cat in cats, cat
    core = cats["fv_core.res"]
    assert core["delp"].shape[-3:] == (8, 6, 6)
    np.testing.assert_allclose(
        core["delp"].values[:, 0],
        np.asarray(dstate.delp),
        rtol=1e-6,
    )
    # nonhydrostatic fields present with FV3's negative-DZ convention
    assert (core["DZ"].values < 0).all()
    assert cats["fv_tracer.res"]["sphum"].values.max() > 0
    assert "liq_wat" in cats["fv_tracer.res"]
    assert "tsea" in cats["sfc_data"]
    # coupler.res carries the model time
    text = open(f"{path}/coupler.res").read()
    assert "2016" in text and "Current model time" in text


def test_dgrid_wind_rotation_recovers_eastward_flow():
    """Covariant D-grid components of a solid-body eastward flow must
    reconstruct the true vector — the naive treat-as-east/north reading
    is badly wrong on the rotated tiles (ADVICE r1: the reference rotates
    with wind-rotation matrices, external/vcm/vcm/cubedsphere/rotate.py)."""
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.runtime.checkpoint import dgrid_wind_to_cartesian

    grid = make_grid(12)
    c = grid.corners_xyz
    zhat = np.array([0.0, 0.0, 1.0])

    def _unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def covariant(p1, p2):
        """V.t at the edge midpoint for V = zhat x r (solid body,
        |V| = cos(lat) eastward), t = unit edge tangent."""
        mid = _unit(p1 + p2)
        V = np.cross(np.broadcast_to(zhat, mid.shape), mid)
        t = p2 - p1
        t = _unit(t - np.sum(t * mid, axis=-1, keepdims=True) * mid)
        return np.sum(V * t, axis=-1)

    u_d = covariant(c[:, :, :-1], c[:, :, 1:])[:, None]  # [6,1,n+1,n]
    v_d = covariant(c[:, :-1, :], c[:, 1:, :])[:, None]  # [6,1,n,n+1]
    wind = np.asarray(dgrid_wind_to_cartesian(u_d, v_d, grid))  # [3,6,1,n,n]
    V_true = np.cross(
        np.broadcast_to(zhat, grid.centers_xyz.shape), grid.centers_xyz
    )
    V_true = np.moveaxis(V_true, -1, 0)[:, :, None]
    # small discretization error from edge->center averaging only
    assert np.abs(wind - V_true).max() < 0.02
    # the OLD bug: treating u_cov/v_cov as east/north gives O(1) errors
    # on the polar tiles; verify our result has no spurious northward flow
    north = np.moveaxis(grid.north, -1, 0)[:, :, None]
    v_north = (wind * north).sum(axis=0)
    assert np.abs(v_north).max() < 0.02


def test_slmsk_three_values_normalized(tmp_path):
    """slmsk {0,1,2} from a reference restart: land mask is slmsk==1
    only, and sea-ice points (slmsk==2) seed ice_thickness (ADVICE r1)."""
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.core.netcdfio import write_netcdf, Dataset
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.runtime.checkpoint import (
        load_fortran_restarts,
        save_fortran_restarts,
    )
    from fv3net_tpu.runtime.derived_state import ModelState

    grid = make_grid(6)
    dstate, *_ = init_state(grid, nz=8)
    state = ModelState(
        dycore=dstate,
        surface={"surface_temperature": jnp.full((6, 6, 6), 300.0)},
    )
    path = str(tmp_path / "RESTART")
    save_fortran_restarts(
        state, datetime.datetime(2016, 8, 1), path, grid
    )
    # overwrite sfc_data with a 3-valued slmsk (no hice provided)
    slmsk = np.zeros((6, 6, 6))
    slmsk[0, :3] = 1.0  # land
    slmsk[1, :2] = 2.0  # sea ice
    from fv3net_tpu.core.quantity import Quantity

    for t in range(6):
        write_netcdf(
            Dataset({
                "tsea": Quantity(
                    jnp.full((1, 6, 6), 271.0),
                    ("Time", "yaxis_1", "xaxis_1"),
                ),
                "slmsk": Quantity(
                    jnp.asarray(slmsk[t][None]),
                    ("Time", "yaxis_1", "xaxis_1"),
                ),
            }),
            f"{path}/sfc_data.tile{t + 1}.nc",
        )
    loaded, _ = load_fortran_restarts(path)
    mask = np.asarray(loaded.surface["land_sea_mask"])
    np.testing.assert_array_equal(mask, (slmsk == 1.0).astype(mask.dtype))
    hice = np.asarray(loaded.surface["ice_thickness"])
    assert (hice[slmsk == 2.0] > 0).all()
    assert (hice[slmsk != 2.0] == 0).all()


def test_initial_conditions_from_fortran_restarts(tmp_path):
    """A run configured with initial_conditions pointing at a
    reference-layout RESTART starts from that state and time."""
    from fv3net_tpu.core import netcdfio  # noqa: F401
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.checkpoint import (
        load_fortran_restarts,
        save_fortran_restarts,
    )
    from fv3net_tpu.runtime.config import get_config
    from fv3net_tpu.runtime.derived_state import ModelState

    grid = make_grid(6)
    dstate, *_ = init_state(grid, nz=8, perturbation=2.0)
    state = ModelState(
        dycore=dstate,
        surface={"surface_temperature": jnp.full((6, 6, 6), 301.0)},
    )
    path = str(tmp_path / "RESTART")
    time = datetime.datetime(2016, 9, 15, 6, 0, 0)
    save_fortran_restarts(state, time, path, grid)

    # direct load roundtrip
    loaded, t0 = load_fortran_restarts(path)
    assert t0 == time
    np.testing.assert_allclose(
        np.asarray(loaded.dycore.delp), np.asarray(dstate.delp), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loaded.dycore.pt), np.asarray(dstate.pt), rtol=1e-4
    )

    # through the run config
    cfg = get_config(
        {
            "namelist": {"npx": 6, "npz": 8},
            "initial_conditions": path,
            "duration_seconds": 900.0,
        }
    )
    loop = TimeLoop(cfg, dtype=jnp.float32)
    assert loop.time == time
    np.testing.assert_allclose(
        np.asarray(loop.state.dycore.delp), np.asarray(dstate.delp),
        rtol=1e-6,
    )
    assert float(loop.state.surface["surface_temperature"].max()) == 301.0
    for _t, _d in loop:
        pass
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()
