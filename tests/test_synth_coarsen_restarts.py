"""synth + restart-coarsening tests."""
import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu import synth
from fv3net_tpu.dycore import init_state
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.pipelines import coarsen_restarts as cr

jax.config.update("jax_enable_x64", True)


def test_synth_generate_roundtrip():
    ds = synth.generate_nudging(nt=2, nz=4, n=4)
    assert ds["air_temperature"].shape == (2, 6, 4, 4, 4)
    T = ds["air_temperature"].values
    assert T.min() >= 220.0 and T.max() <= 310.0
    # deterministic
    ds2 = synth.generate_nudging(nt=2, nz=4, n=4)
    np.testing.assert_array_equal(T, ds2["air_temperature"].values)
    # schema dump/load roundtrip
    schema = synth.read_schema_from_dataset(ds)
    buf = io.StringIO()
    synth.dump(schema, buf)
    buf.seek(0)
    schema2 = synth.load(buf)
    assert set(schema2.variables) == set(schema.variables)
    assert schema2.variables["air_temperature"].shape == [2, 6, 4, 4, 4]


@pytest.fixture(scope="module")
def fine_state():
    grid = make_grid(8)
    state, ak, bk = init_state(grid, nz=8, dtype=jnp.float64, perturbation=3.0)
    return grid, state


@pytest.mark.parametrize("method", ["sigma", "pressure"])
def test_coarsen_state_conserves_mass(fine_state, method):
    grid, state = fine_state
    area = jnp.asarray(grid.area)
    fn = (
        cr.coarsen_state_on_sigma
        if method == "sigma"
        else cr.coarsen_state_on_pressure
    )
    coarse = fn(state, area, 2)
    assert coarse.delp.shape == (6, 8, 4, 4)
    area_c = np.asarray(area).reshape(6, 4, 2, 4, 2).sum(axis=(2, 4))
    m_fine = (np.asarray(state.delp) * np.asarray(area)[:, None]).sum()
    m_coarse = (np.asarray(coarse.delp) * area_c[:, None]).sum()
    np.testing.assert_allclose(m_coarse, m_fine, rtol=1e-10)
    # temperature-like field stays in range
    assert np.asarray(coarse.pt).min() >= np.asarray(state.pt).min() - 1e-6
    assert np.asarray(coarse.pt).max() <= np.asarray(state.pt).max() + 1e-6


def test_coarsen_constant_fields_invariant(fine_state):
    grid, state = fine_state
    area = jnp.asarray(grid.area)
    import dataclasses

    state_const = dataclasses.replace(
        state,
        pt=jnp.full_like(state.pt, 300.0),
        tracers={k: jnp.full_like(v, 0.003) for k, v in state.tracers.items()},
    )
    coarse = cr.coarsen_state_on_sigma(state_const, area, 2)
    np.testing.assert_allclose(np.asarray(coarse.pt), 300.0, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(coarse.tracers["sphum"]), 0.003, rtol=1e-12
    )


def test_coarsen_surface_complex_dominant_type():
    # 4x4 with a 3:1 land:sea corner block
    slmsk = np.zeros((1, 4, 4))
    slmsk[0, :2, :2] = [[1, 1], [1, 0]]
    tsfc = np.where(slmsk == 1, 290.0, 300.0)
    area = np.ones((1, 4, 4))
    out = cr.coarsen_surface_complex(
        {"tsea": jnp.asarray(tsfc)}, {"slmsk": jnp.asarray(slmsk)},
        jnp.asarray(area), 2,
    )
    # dominant type in the corner block is land (3 of 4)
    assert float(out["slmsk"][0, 0, 0]) == 1.0
    # continuous average restricted to land cells -> 290 exactly
    np.testing.assert_allclose(float(out["tsea"][0, 0, 0]), 290.0)
    # all-sea block
    assert float(out["slmsk"][0, 1, 1]) == 0.0
    np.testing.assert_allclose(float(out["tsea"][0, 1, 1]), 300.0)


def test_impose_hydrostatic_balance_consistency():
    rng = np.random.RandomState(0)
    T = rng.uniform(230, 300, (5, 8))
    q = rng.uniform(0, 0.01, (5, 8))
    delp = rng.uniform(800, 1500, (5, 8))
    dz = np.asarray(cr.impose_hydrostatic_balance(T, q, delp))
    assert (dz < 0).all()
    # thicker layers (more mass) -> larger |dz| at same T
    assert dz.shape == (5, 8)
