"""Lookup-table netCDF IO roundtrip in the reference file layout.

reference: external/radiation/radiation/io.py:29-257 (load_lw/load_sw/
load_random_numbers over the GCS-downloaded lookup directory).
"""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.physics.radiation.rrtmg import io as rio
from fv3net_tpu.physics.radiation.rrtmg import tables as rtables


def _assert_tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: keys {set(a) ^ set(b)}"
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, dict):
            _assert_tree_equal(va, vb, f"{path}/{k}")
        else:
            arr_a, arr_b = np.asarray(va), np.asarray(vb)
            assert arr_a.shape == arr_b.shape, f"{path}/{k} shape"
            # dtype KIND is preserved (int64 narrows to int32 on disk —
            # classic NetCDF has no 64-bit ints; values must round-trip)
            assert arr_a.dtype.kind == arr_b.dtype.kind, (
                f"{path}/{k} dtype {arr_a.dtype} != {arr_b.dtype}"
            )
            np.testing.assert_array_equal(arr_a, arr_b, err_msg=f"{path}/{k}")


def test_lw_tables_roundtrip(tmp_path):
    lw = rtables.make_lw_tables(seed=3)
    rio.dump_lw(lw, str(tmp_path))
    back = rio.load_lw(str(tmp_path))
    _assert_tree_equal(lw, back)
    # the expected reference file inventory exists on disk
    for fname in ("totplnk.nc", "radlw_ref_data.nc",
                  "radlw_cldprlw_data.nc", "radlw_kgb01_data.nc",
                  "radlw_kgb16_data.nc"):
        assert (tmp_path / fname).exists(), fname


def test_sw_tables_roundtrip(tmp_path):
    sw = rtables.make_sw_tables(seed=4)
    rio.dump_sw(sw, str(tmp_path))
    back = rio.load_sw(str(tmp_path))
    _assert_tree_equal(sw, back)
    for fname in ("radsw_sflux_data.nc", "radsw_ref_data.nc",
                  "radsw_cldprtb_data.nc", "radsw_kgb16_data.nc",
                  "radsw_kgb29_data.nc"):
        assert (tmp_path / fname).exists(), fname
    # scalar entries come back as scalars (reference io reads .values)
    assert np.isscalar(back["scalekur"]) or np.ndim(back["scalekur"]) == 0
    # integer index tables keep integer dtype
    assert np.asarray(back["ix1"]).dtype.kind == "i"


def test_random_numbers_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    lw_rand = rng.random((8, 140 * 32))
    sw_rand = rng.random((8, 112 * 32))
    rio.dump_random_numbers(str(tmp_path), 2, lw_rand, sw_rand)
    back = rio.load_random_numbers(str(tmp_path), 2)
    np.testing.assert_array_equal(back["lw_rand"], lw_rand)
    np.testing.assert_array_equal(back["sw_rand"], sw_rand)
    assert (tmp_path / "rand2d_tile2_lw.nc").exists()
    assert (tmp_path / "rand2d_tile2_sw.nc").exists()
    # tile 0 uses the unsuffixed sw name, as in the reference
    rio.dump_random_numbers(str(tmp_path), 0, lw_rand, sw_rand)
    assert (tmp_path / "rand2d_sw.nc").exists()
    back0 = rio.load_random_numbers(str(tmp_path), 0)
    np.testing.assert_array_equal(back0["sw_rand"], sw_rand)


def test_driver_runs_on_loaded_tables(tmp_path):
    """A wrapper configured with lookup_dir builds its RRTMGDriver from
    the on-disk tables and produces finite fluxes."""
    import datetime

    import jax.numpy as jnp

    from fv3net_tpu.physics.radiation.wrapper import (
        Radiation,
        RadiationConfig,
    )

    rio.dump_lw(rtables.make_lw_tables(), str(tmp_path))
    rio.dump_sw(rtables.make_sw_tables(), str(tmp_path))
    rad = Radiation(
        RadiationConfig(scheme="rrtmg", lookup_dir=str(tmp_path)), 900.0
    )
    rad.init_driver()

    C, L = 4, 8
    rng = np.random.default_rng(1)
    ptop, psfc = 30.0e2, 1000.0e2  # Pa
    pedge = np.linspace(ptop, psfc, L + 1)
    play = 0.5 * (pedge[:-1] + pedge[1:])
    dp = np.tile(np.diff(pedge), (C, 1))  # z-last, index 0 = model top
    state = {
        "air_temperature": jnp.asarray(
            np.tile(288.0 - 40.0 * (1.0 - play / psfc), (C, 1)),
            jnp.float32,
        ),
        "pressure_thickness_of_atmospheric_layer": jnp.asarray(
            dp, jnp.float32
        ),
        "specific_humidity": jnp.asarray(
            rng.uniform(1e-4, 5e-3, (C, L)), jnp.float32
        ),
        "cloud_water_mixing_ratio": jnp.zeros((C, L), jnp.float32),
        "surface_temperature": jnp.full((C,), 290.0, jnp.float32),
        "latitude": jnp.asarray(np.deg2rad([0.0, 20.0, -35.0, 60.0])),
        "longitude": jnp.zeros((C,)),
        "land_sea_mask": jnp.zeros((C,), jnp.float32),
    }
    out = rad(datetime.datetime(2016, 7, 1, 12), state)
    for name in (
        "total_sky_downward_shortwave_flux_at_surface_python",
        "total_sky_downward_longwave_flux_at_surface_python",
    ):
        assert name in out
        assert bool(jnp.isfinite(out[name]).all()), name


def _driver_state(C=4, L=8):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    ptop, psfc = 30.0e2, 1000.0e2  # Pa
    pedge = np.linspace(ptop, psfc, L + 1)
    play = 0.5 * (pedge[:-1] + pedge[1:])
    dp = np.tile(np.diff(pedge), (C, 1))
    return {
        "air_temperature": jnp.asarray(
            np.tile(288.0 - 40.0 * (1.0 - play / psfc), (C, 1)),
            jnp.float32,
        ),
        "pressure_thickness_of_atmospheric_layer": jnp.asarray(
            dp, jnp.float32
        ),
        "specific_humidity": jnp.asarray(
            rng.uniform(1e-4, 5e-3, (C, L)), jnp.float32
        ),
        "cloud_water_mixing_ratio": jnp.zeros((C, L), jnp.float32),
        "surface_temperature": jnp.full((C,), 290.0, jnp.float32),
        "latitude": jnp.asarray(np.deg2rad([0.0, 20.0, -35.0, 60.0])),
        "longitude": jnp.zeros((C,)),
        "land_sea_mask": jnp.zeros((C,), jnp.float32),
    }


def test_foreign_seed_lookup_dir_feeds_through(tmp_path):
    """Measured-data onboarding gate (VERDICT r4 #7): a reference-layout
    lookup directory with FOREIGN content (different random seed than
    the shipped synthetic tables) must validate, drive one radiation
    step to finite fluxes, and demonstrably govern the result — the
    driver may not fall back to any baked-in synthetic assumption.
    reference: external/radiation/radiation/config.py:4-5 (the GCS
    download this replaces), io.py:29-257."""
    import datetime

    import jax.numpy as jnp

    from fv3net_tpu.physics.radiation.rrtmg import validate as rval
    from fv3net_tpu.physics.radiation.wrapper import (
        Radiation,
        RadiationConfig,
    )

    foreign = str(tmp_path / "foreign")
    rio.dump_lw(rtables.make_lw_tables(seed=7), foreign)
    rio.dump_sw(rtables.make_sw_tables(seed=8), foreign)
    # the validator accepts any reference-layout dir, not just the
    # shipped seeds
    assert rval.validate_lookup_dir(foreign) == []

    state = _driver_state()
    t0 = datetime.datetime(2016, 7, 1, 12)
    rad_foreign = Radiation(
        RadiationConfig(scheme="rrtmg", lookup_dir=foreign), 900.0
    )
    rad_foreign.init_driver()
    out_foreign = rad_foreign(t0, state)
    key = "total_sky_downward_longwave_flux_at_surface_python"
    assert bool(jnp.isfinite(out_foreign[key]).all())

    # the shipped synthetic tables give a DIFFERENT answer: proves the
    # on-disk content flows through to the solvers
    rad_default = Radiation(RadiationConfig(scheme="rrtmg"), 900.0)
    rad_default.init_driver()
    out_default = rad_default(t0, state)
    assert (
        float(jnp.max(jnp.abs(out_foreign[key] - out_default[key])))
        > 1e-3
    )

    # and a dir dumped FROM the default tables reproduces the default
    # bit-for-bit: the loader neither rescales nor re-synthesizes
    default_dir = str(tmp_path / "default")
    rio.dump_lw(rtables.make_lw_tables(), default_dir)
    rio.dump_sw(rtables.make_sw_tables(), default_dir)
    rad_rt = Radiation(
        RadiationConfig(scheme="rrtmg", lookup_dir=default_dir), 900.0
    )
    rad_rt.init_driver()
    out_rt = rad_rt(t0, state)
    np.testing.assert_array_equal(
        np.asarray(out_rt[key]), np.asarray(out_default[key])
    )


def test_validate_lookup_dir_accepts_roundtrip_and_rejects_corruption(
    tmp_path,
):
    """validate-lookup-dir (r2 verdict #4): a dumped synthetic table dir
    validates clean; shape corruption, negative absorption coefficients,
    and missing files are each reported."""
    from fv3net_tpu.physics.radiation.rrtmg import validate as rval

    d = str(tmp_path)
    rio.dump_lw(rtables.make_lw_tables(seed=0), d)
    rio.dump_sw(rtables.make_sw_tables(seed=1), d)
    assert rval.validate_lookup_dir(d) == []
    assert rval.main([d]) == 0

    # corrupt: negative absorption coefficients in one band file
    lw_bad = rtables.make_lw_tables(seed=0)
    lw_bad["radlw_kgb03"]["absa"] = -np.abs(
        np.asarray(lw_bad["radlw_kgb03"]["absa"])
    )
    rio.dump_lw(lw_bad, d)
    probs = rval.validate_lookup_dir(d)
    assert any("negative" in p and "kgb03" in p for p in probs)

    # corrupt: wrong shape
    lw_shp = rtables.make_lw_tables(seed=0)
    lw_shp["radlw_kgb01"]["selfref"] = np.zeros((3, 3))
    rio.dump_lw(lw_shp, d)
    probs = rval.validate_lookup_dir(d)
    assert any("shape" in p and "kgb01" in p for p in probs)

    # missing file
    import os

    os.remove(os.path.join(d, "radsw_ref_data.nc"))
    probs = rval.validate_lookup_dir(d)
    assert any("missing file" in p for p in probs)
    assert rval.main([d]) == 1
