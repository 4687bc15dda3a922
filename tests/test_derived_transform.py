"""DerivedMapping + data_transform tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu import data_transform as dt
from fv3net_tpu.derived import DerivedMapping
from fv3net_tpu.ops import thermo

jax.config.update("jax_enable_x64", True)

DIMS3 = ("tile", "z", "y", "x")
DIMS2 = ("tile", "y", "x")


@pytest.fixture
def base():
    rng = np.random.RandomState(0)
    shape = (6, 5, 4, 4)
    return {
        "air_temperature": Quantity(
            jnp.asarray(250 + 30 * rng.rand(*shape)), DIMS3, "degK"
        ),
        "specific_humidity": Quantity(
            jnp.asarray(1e-3 * rng.rand(*shape)), DIMS3, "kg/kg"
        ),
        "pressure_thickness_of_atmospheric_layer": Quantity(
            jnp.asarray(1e4 + 100 * rng.rand(*shape)), DIMS3, "Pa"
        ),
        "dQ1": Quantity(jnp.asarray(1e-5 * rng.randn(*shape)), DIMS3, "K/s"),
        "dQ2": Quantity(jnp.asarray(1e-8 * rng.randn(*shape)), DIMS3),
        "land_sea_mask": Quantity(
            jnp.asarray(rng.randint(0, 3, (6, 4, 4)).astype(float)), DIMS2
        ),
        "latent_heat_flux": Quantity(
            jnp.asarray(100 * rng.rand(6, 4, 4)), DIMS2, "W/m^2"
        ),
    }


def test_passthrough_and_derived(base):
    m = DerivedMapping(base)
    np.testing.assert_array_equal(
        np.asarray(m["air_temperature"].data),
        np.asarray(base["air_temperature"].data),
    )
    # water_vapor_path
    wvp = m["water_vapor_path"]
    assert wvp.dims == DIMS2
    assert (np.asarray(wvp.data) > 0).all()
    # Q1 = dQ1 + pQ1 where pQ1 defaults to zero
    np.testing.assert_allclose(
        np.asarray(m["Q1"].data), np.asarray(base["dQ1"].data)
    )
    # onehot masks partition unity
    total = (
        np.asarray(m["is_land"].data)
        + np.asarray(m["is_sea"].data)
        + np.asarray(m["is_sea_ice"].data)
    )
    np.testing.assert_array_equal(total, 1.0)


def test_relative_humidity_chain(base):
    m = DerivedMapping(base)
    rh = m["relative_humidity"]
    assert rh.dims == DIMS3
    arr = np.asarray(rh.data)
    assert (arr > 0).all() and (arr < 2).all()


def test_find_all_required_inputs():
    deps = DerivedMapping.find_all_required_inputs(["column_integrated_Q1"])
    assert "pressure_thickness_of_atmospheric_layer" in deps
    # Q1 itself is derived -> recursion reaches pQ1 (which is maybe-nonderived)
    assert "pQ1" in deps


def test_qm_roundtrip(base):
    ds = _with_pq(Dataset(dict(base)))
    ds = dt.Q1_from_dQ1_pQ1(ds)
    ds = dt.Q2_from_dQ2_pQ2(ds)
    ds = dt.Qm_from_Q1_Q2(ds)
    want_q1 = np.asarray(ds["Q1"].data).copy()
    ds = dt.Q1_from_Qm_Q2(ds)
    np.testing.assert_allclose(np.asarray(ds["Q1"].data), want_q1, rtol=1e-12)


def _with_pq(ds):
    shape = ds["dQ1"].shape
    ds["pQ1"] = Quantity(jnp.zeros(shape), DIMS3)
    ds["pQ2"] = Quantity(jnp.zeros(shape), DIMS3)
    return ds


def test_q2_flux_roundtrip(base):
    ds = _with_pq(Dataset(dict(base)))
    ds = dt.Q2_from_dQ2_pQ2(ds)
    q2_orig = np.asarray(ds["Q2"].data).copy()
    ds = dt.Q2_flux_from_Q2_tendency(ds, rectify_surface_precipitation_rate=False)
    assert ds["Q2_flux"].dims == ("tile", "z_interface", "y", "x")
    ds = dt.Q2_tendency_from_Q2_flux(ds)
    np.testing.assert_allclose(np.asarray(ds["Q2"].data), q2_orig, rtol=1e-9)


def test_implied_precip_is_evap_minus_drying(base):
    ds = _with_pq(Dataset(dict(base)))
    ds = dt.Q2_from_dQ2_pQ2(ds)
    ds = dt.Q2_flux_from_Q2_tendency(ds, rectify_surface_precipitation_rate=False)
    delp = np.asarray(ds[dt.DELP].data)
    q2 = np.asarray(ds["Q2"].data)
    col_q2 = (q2 * delp / 9.80665).sum(axis=1)
    evap = np.asarray(
        thermo.latent_heat_flux_to_evaporation(
            np.asarray(ds[dt.LHF].data)
        )
    )
    np.testing.assert_allclose(
        np.asarray(ds["implied_surface_precipitation_rate"].data),
        evap - col_q2,
        rtol=1e-9,
    )


def test_chained_transform_config():
    rng = np.random.RandomState(1)
    shape = (6, 5, 4, 4)
    ds = Dataset(
        {
            "dQ1": Quantity(jnp.asarray(rng.randn(*shape)), DIMS3),
            "dQ2": Quantity(jnp.asarray(rng.randn(*shape)), DIMS3),
            "pQ1": Quantity(jnp.zeros(shape), DIMS3),
            "pQ2": Quantity(jnp.zeros(shape), DIMS3),
        }
    )
    chain = dt.ChainedDataTransform(
        [dt.DataTransform("Q1_from_dQ1_pQ1"), dt.DataTransform("Q2_from_dQ2_pQ2"),
         dt.DataTransform("Qm_from_Q1_Q2")]
    )
    out = chain.apply(ds)
    assert "Qm" in out
    assert "dQ1" in chain.input_variables
    assert "Qm" in chain.output_variables
    # intermediate outputs not listed as inputs
    assert "Q1" not in chain.input_variables


def test_tapered_dq1():
    shape = (6, 12, 2, 2)
    ds = Dataset({"dQ1": Quantity(jnp.ones(shape), DIMS3)})
    out = dt.tapered_dQ1(ds, cutoff=6, rate=2.0)
    arr = np.asarray(out["tapered_dQ1"].data)
    assert arr[0, 0, 0, 0] < 0.1  # strongly tapered at top
    np.testing.assert_allclose(arr[0, -1, 0, 0], 1.0)
