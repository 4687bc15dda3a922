"""Full complex surface coarsening vs a numpy oracle (VERDICT r1 #6).

The oracle mirrors the reference semantics
(external/vcm/vcm/cubedsphere/coarsen_restarts.py:1111-1460) with
NaN-masked numpy reductions: mode with nan_policy="omit" (ties to the
smallest value), .where()-masked weighted averages, the per-field
SFC_DATA_COARSENING_METHOD dispatch, and the surface_chgres corrections.
Synthetic sfc_data exercises every rule branch (land/ocean/sea-ice mix,
land ice, bare land, zero-vegetation and zero-snow blocks).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu.pipelines.coarsen_restarts import (
    FREEZING_TEMPERATURE,
    SHDMIN_THRESHOLD,
    STYPE_LAND_ICE,
    VTYPE_LAND_ICE,
    coarsen_sfc_data_complex,
    coarsen_state_blended,
    compute_blending_weights,
)

F = 2  # coarsening factor
N = 8


# ------------------------------------------------------------- oracle
def _blocks(x, f=F):
    *lead, ny, nx = x.shape
    return x.reshape(*lead, ny // f, f, nx // f, f).swapaxes(-3, -2)


def o_mode(x, f=F):
    """Blockwise mode omitting NaN, ties -> smallest value."""
    b = _blocks(x, f)
    *lead, nyc, nxc, f1, f2 = b.shape
    flat = b.reshape(-1, f1 * f2)
    out = np.empty(flat.shape[0])
    for i, row in enumerate(flat):
        vals = row[~np.isnan(row)]
        uniq, counts = np.unique(vals, return_counts=True)
        out[i] = uniq[np.argmax(counts)]  # first max -> smallest
    return out.reshape(*lead, nyc, nxc)


def o_wavg(v, w, f=F):
    """NaN-masked weighted block average."""
    shape = np.broadcast_shapes(v.shape, w.shape)
    vb = _blocks(np.broadcast_to(v, shape), f)
    wb = _blocks(np.broadcast_to(w, shape), f)
    m = ~np.isnan(vb) & ~np.isnan(wb)
    num = np.where(m, vb * wb, 0.0).sum(axis=(-2, -1))
    den = np.where(m, wb, 0.0).sum(axis=(-2, -1))
    with np.errstate(invalid="ignore", divide="ignore"):
        return num / den


def o_upsample(x, f=F):
    return np.repeat(np.repeat(x, f, axis=-2), f, axis=-1)


def oracle_complex(ds, area):
    nan = np.nan
    slmsk_c = o_mode(ds["slmsk"])
    dom = np.isclose(ds["slmsk"], o_upsample(slmsk_c))
    vtype_c = o_mode(np.where(dom, ds["vtype"], nan))
    dom_v = np.isclose(ds["vtype"], o_upsample(vtype_c))
    stype_c = o_mode(np.where(dom, ds["stype"], nan))
    dom_s = np.isclose(ds["stype"], o_upsample(stype_c))

    def where(mask, v):
        return np.where(mask, v, nan)

    out = {"slmsk": slmsk_c, "vtype": vtype_c, "stype": stype_c}
    area_b = area
    out["tsea"] = o_wavg(ds["tsea"], area_b)
    out["tg3"] = o_wavg(where(dom, ds["tg3"]), where(dom, area_b))
    out["vfrac"] = o_wavg(where(dom, ds["vfrac"]), where(dom, area_b))
    out["fice"] = o_wavg(where(dom, ds["fice"]), where(dom, area_b))
    out["sncovr"] = o_wavg(where(dom, ds["sncovr"]), where(dom, area_b))
    out["shdmin"] = o_wavg(where(dom, ds["shdmin"]), where(dom, area_b))
    # canopy/zorl: area*vfrac weighting over dominant sfc+vtype, area
    # fallback where the dominant patch has zero vegetation
    mv = dom & dom_v
    for key in ("canopy", "zorl"):
        plain = o_wavg(where(mv, ds[key]), where(mv, area_b))
        wtd = o_wavg(where(mv, ds[key]), where(mv, area_b * ds["vfrac"]))
        avw = np.where(mv, area_b * ds["vfrac"], nan)
        tot = np.nansum(_blocks(avw), axis=(-2, -1))
        out[key] = np.where(tot > 0.0, wtd, plain)
    # soil fields over dominant sfc+stype (3-D over soil levels)
    ms = dom & dom_s
    for key in ("smc", "stc", "slc"):
        out[key] = o_wavg(
            where(ms[:, None], ds[key]), where(ms[:, None], area_b[:, None])
        )
    out["srflag"] = o_mode(ds["srflag"])
    out["slope"] = o_mode(np.where(dom, ds["slope"], nan))
    out["sheleg"] = np.nan_to_num(
        o_wavg(ds["sheleg"], area_b * ds["sncovr"])
    )
    out["hice"] = np.nan_to_num(o_wavg(ds["hice"], area_b * ds["fice"]))
    sea_ice = o_wavg(
        where(dom, ds["tisfc"]), where(dom, area_b * ds["fice"])
    )
    other = o_wavg(where(dom, ds["tisfc"]), where(dom, area_b))
    out["tisfc"] = np.where(np.isclose(slmsk_c, 2.0), sea_ice, other)

    # chgres corrections
    ice = np.isclose(out["vtype"], VTYPE_LAND_ICE)
    out["tsea"] = np.where(
        ice, np.minimum(out["tsea"], FREEZING_TEMPERATURE), out["tsea"]
    )
    out["tg3"] = np.where(
        ice, np.minimum(out["tg3"], FREEZING_TEMPERATURE), out["tg3"]
    )
    out["stype"] = np.where(ice, STYPE_LAND_ICE, out["stype"])
    out["canopy"] = np.where(
        out["shdmin"] < SHDMIN_THRESHOLD, 0.0, out["canopy"]
    )
    out["shdmin"] = np.where(ice, 0.0, out["shdmin"])
    return out


# ----------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def sfc_data():
    rng = np.random.default_rng(3)
    shape = (6, N, N)
    slmsk = rng.choice([0.0, 1.0, 2.0], size=shape, p=[0.45, 0.4, 0.15])
    # force some uniform blocks so slmsk_c==2 (tisfc sea-ice branch) and
    # land-ice blocks definitely occur
    slmsk[0, :2, :2] = 2.0
    slmsk[1, :4, :4] = 1.0
    vtype = np.where(
        slmsk == 1.0, rng.choice([4.0, 7.0, VTYPE_LAND_ICE], size=shape),
        0.0,
    )
    vtype[1, :4, :4] = VTYPE_LAND_ICE  # a dominant land-ice coarse cell
    stype = np.where(slmsk == 1.0, rng.choice([3.0, 6.0], size=shape), 0.0)
    vfrac = np.where(slmsk == 1.0, rng.random(shape), 0.0)
    vfrac[1, 4:6, :2] = 0.0  # zero-vegetation block -> canopy fallback
    sncovr = np.where(rng.random(shape) > 0.7, rng.random(shape), 0.0)
    sncovr[2, :2, :2] = 0.0  # all-zero snow block -> fillna branch
    fice = np.where(slmsk == 2.0, 0.5 + 0.5 * rng.random(shape), 0.0)
    ds = {
        "slmsk": slmsk, "vtype": vtype, "stype": stype,
        "vfrac": vfrac, "sncovr": sncovr, "fice": fice,
        "tsea": 270.0 + 20.0 * rng.random(shape),
        "tg3": 270.0 + 10.0 * rng.random(shape),
        "tisfc": 260.0 + 15.0 * rng.random(shape),
        "canopy": rng.random(shape),
        "zorl": 10.0 * rng.random(shape),
        "sheleg": 5.0 * rng.random(shape),
        "hice": np.where(slmsk == 2.0, 2.0 * rng.random(shape), 0.0),
        "shdmin": 0.02 * rng.random(shape),  # some below threshold
        "srflag": rng.choice([0.0, 1.0], size=shape),
        "slope": rng.choice([1.0, 3.0, 9.0], size=shape),
        "smc": rng.random((6, 4, N, N)),
        "stc": 270.0 + 10.0 * rng.random((6, 4, N, N)),
        "slc": rng.random((6, 4, N, N)),
    }
    area = 1.0 + rng.random(shape)
    return ds, area


def test_complex_surface_matches_oracle(sfc_data):
    ds, area = sfc_data
    got = coarsen_sfc_data_complex(
        {k: jnp.asarray(v) for k, v in ds.items()}, jnp.asarray(area), F
    )
    want = oracle_complex(ds, area)
    assert set(got) == set(want)
    for key in sorted(want):
        g = np.asarray(got[key])
        w = want[key]
        np.testing.assert_allclose(
            g, w, rtol=2e-6, atol=1e-6, equal_nan=True, err_msg=key
        )


def test_branch_coverage(sfc_data):
    """The synthetic data actually exercises every special branch."""
    ds, area = sfc_data
    want = oracle_complex(ds, area)
    # sea-ice dominant coarse cells exist (tisfc partition)
    assert np.isclose(want["slmsk"], 2.0).any()
    # land-ice chgres fired somewhere
    assert np.isclose(want["stype"], STYPE_LAND_ICE).any()
    assert (want["shdmin"] == 0.0).any()
    # canopy got zeroed over bare land
    assert (want["canopy"] == 0.0).any()
    # fillna branches produced finite values
    assert np.isfinite(want["sheleg"]).all()
    assert np.isfinite(want["hice"]).all()


def test_blended_state_coarsening():
    """Blended weights: 1 aloft, tapering toward 0 at the surface; the
    blended state interpolates between the two methods (reference
    coarsen_restarts.py:243,559-679)."""
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.pipelines.coarsen_restarts import (
        coarsen_state_on_pressure,
        coarsen_state_on_sigma,
    )

    grid = make_grid(8)
    state, *_ = init_state(grid, nz=12, perturbation=2.0)
    area = jnp.asarray(grid.area, jnp.float32)
    b = np.asarray(compute_blending_weights(state.delp, area, 2))
    assert b.shape == (6, 12, 4, 4)
    np.testing.assert_allclose(b[:, 0], 1.0)  # top: pure pressure-level
    assert (b[:, -1] < 1.0).all()  # surface levels blend toward sigma
    assert (b >= 0.0).all() and (b <= 1.0).all()

    out_b = coarsen_state_blended(state, area, 2)
    out_p = coarsen_state_on_pressure(state, area, 2)
    out_s = coarsen_state_on_sigma(state, area, 2)
    pt_b = np.asarray(out_b.pt)
    pt_lohi = np.minimum(np.asarray(out_p.pt), np.asarray(out_s.pt))
    pt_hihi = np.maximum(np.asarray(out_p.pt), np.asarray(out_s.pt))
    assert (pt_b >= pt_lohi - 1e-4).all() and (pt_b <= pt_hihi + 1e-4).all()
    # delp is the plain area average in every method
    np.testing.assert_allclose(
        np.asarray(out_b.delp), np.asarray(out_s.delp), rtol=1e-6
    )
