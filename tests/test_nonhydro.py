"""Nonhydrostatic core tests: balance preservation, implicit acoustic
stability at large dt, buoyant updrafts, and the hydrostatic limit
(conservation-based correctness as in SURVEY §5.2; the reference's
nonhydrostatic solver lives in the out-of-tree fv3gfs-fortran
nh_utils.F90 and has no in-repo unit tests to mirror)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.dycore import (
    DycoreConfig,
    add_nonhydrostatic_fields,
    dynamics_step,
    init_state,
)
from fv3net_tpu.dycore.core import GridArrays
from fv3net_tpu.dycore import nonhydro

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def setup():
    grid = make_grid(12)
    g = GridArrays.from_grid(grid, dtype=jnp.float64)
    return grid, g


def test_hydrostatic_delz_gives_zero_perturbation_pressure():
    grid = make_grid(6)
    state, ak, bk = init_state(grid, nz=10, dtype=jnp.float64)
    state = add_nonhydrostatic_fields(state)
    p = nonhydro.full_pressure(state.delp, state.pt, state.delz)
    pe = 300.0 + jnp.cumsum(state.delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(state.delp[:, :1], 300.0), pe], 1)
    pi_mid = state.delp / (jnp.log(pe[:, 1:]) - jnp.log(pe[:, :-1]))
    np.testing.assert_allclose(np.asarray(p), np.asarray(pi_mid), rtol=1e-12)


def test_vertical_solver_identity_at_rest():
    grid = make_grid(6)
    state, _, _ = init_state(grid, nz=10, dtype=jnp.float64)
    state = add_nonhydrostatic_fields(state)
    w, dz = nonhydro.vertical_solver(
        state.w, state.delz, state.delp, state.pt, 900.0, 300.0
    )
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(dz), np.asarray(state.delz), rtol=1e-9
    )


def test_vertical_solver_stable_and_restoring_at_large_dt():
    """dt = 900 s is ~1000x the acoustic CFL limit; backward Euler must
    stay bounded and push a squeezed (overpressured) layer back out."""
    grid = make_grid(6)
    state, _, _ = init_state(grid, nz=10, dtype=jnp.float64)
    state = add_nonhydrostatic_fields(state)
    k = 6
    dz0 = np.asarray(state.delz)
    factor = np.where(np.arange(10) == k, 0.95, 1.0)[None, :, None, None]
    squeezed = jnp.asarray(dz0 * factor)
    w, dz = nonhydro.vertical_solver(
        state.w, squeezed, state.delp, state.pt, 900.0, 300.0
    )
    assert np.isfinite(np.asarray(w)).all()
    assert np.abs(np.asarray(w)).max() < 50.0
    # the overpressured layer expands back toward hydrostatic
    growth = np.asarray(dz)[:, k] - np.asarray(squeezed)[:, k]
    assert growth.min() > 0.0
    # repeated application converges (no oscillatory blow-up)
    for _ in range(20):
        w, dz = nonhydro.vertical_solver(
            w, dz, state.delp, state.pt, 900.0, 300.0
        )
    assert np.abs(np.asarray(w)).max() < 5.0
    np.testing.assert_allclose(np.asarray(dz)[:, k], dz0[:, k], rtol=0.02)


def test_nonhydrostatic_rest_state_stays_at_rest(setup):
    grid, g = setup
    state, ak, bk = init_state(grid, nz=12, dtype=jnp.float64)
    state = add_nonhydrostatic_fields(state)
    cfg = DycoreConfig(dt=900.0, n_split=2, diff_coef=0.0, hydrostatic=False)
    out = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    np.testing.assert_allclose(np.asarray(out.wind), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.w), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out.delz), np.asarray(state.delz), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.delp), np.asarray(state.delp), rtol=1e-12
    )


def test_warm_bubble_rises_and_conserves_mass(setup):
    grid, g = setup
    state, ak, bk = init_state(
        grid, nz=12, dtype=jnp.float64, perturbation=5.0
    )
    state = add_nonhydrostatic_fields(state)
    cfg = DycoreConfig(dt=900.0, n_split=3, hydrostatic=False)
    m0 = float((np.asarray(state.delp) * grid.area[:, None]).sum())
    h0 = float(
        (np.asarray(state.delz) * grid.area[:, None]).sum()
    )
    for _ in range(5):
        state = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    w = np.asarray(state.w)
    assert np.isfinite(w).all()
    # buoyant ascent somewhere in the bubble, bounded magnitudes
    assert w.max() > 1e-4
    assert np.abs(w).max() < 30.0
    m1 = float((np.asarray(state.delp) * grid.area[:, None]).sum())
    np.testing.assert_allclose(m1, m0, rtol=1e-10)
    # column heights stay physical (the remap conserves height integrals)
    h1 = float((np.asarray(state.delz) * grid.area[:, None]).sum())
    np.testing.assert_allclose(h1, h0, rtol=0.05)


def test_nonhydrostatic_matches_hydrostatic_at_large_scale(setup):
    """At C12 (dx ~ 700 km) the hydrostatic approximation is excellent,
    so the nonhydrostatic core must track the hydrostatic one closely."""
    grid, g = setup
    state_h, ak, bk = init_state(
        grid, nz=12, dtype=jnp.float64, perturbation=3.0
    )
    state_n = add_nonhydrostatic_fields(state_h)
    cfg_h = DycoreConfig(dt=900.0, n_split=3, hydrostatic=True)
    cfg_n = DycoreConfig(dt=900.0, n_split=3, hydrostatic=False)
    for _ in range(5):
        state_h = dynamics_step(
            state_h, g, jnp.asarray(ak), jnp.asarray(bk), cfg_h
        )
        state_n = dynamics_step(
            state_n, g, jnp.asarray(ak), jnp.asarray(bk), cfg_n
        )
    ps_h = np.asarray(state_h.surface_pressure())
    ps_n = np.asarray(state_n.surface_pressure())
    # surface pressure fields agree to a fraction of the signal
    signal = np.abs(ps_h - 1.0e5).max()
    assert signal > 0  # the perturbation did something
    assert np.abs(ps_h - ps_n).max() < 0.2 * signal + 1.0
    # winds agree in magnitude
    wmax_h = np.abs(np.asarray(state_h.wind)).max()
    wmax_n = np.abs(np.asarray(state_n.wind)).max()
    assert abs(wmax_h - wmax_n) < 0.3 * max(wmax_h, 1e-3)


def test_time_loop_nonhydrostatic_runs():
    """The namelist ``hydrostatic`` switch builds a nonhydrostatic
    TimeLoop whose state carries finite w/delz through dynamics+physics."""
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig

    nml = NamelistConfig(
        npx=6, npz=10, dt_atmos=900.0, n_split=2, hydrostatic=False
    )
    loop = TimeLoop(
        UserConfig(namelist=nml, duration_seconds=1800.0),
        dtype=jnp.float64,
    )
    assert loop.state.dycore.w is not None
    for _time, _diags in loop:
        pass
    assert np.isfinite(np.asarray(loop.state.dycore.w)).all()
    assert np.isfinite(np.asarray(loop.state.dycore.delz)).all()
    assert (np.asarray(loop.state.dycore.delz) > 0).all()


def test_nonhydrostatic_mountain_rest_stays_at_rest(setup):
    """Balanced rest over a 2-km mountain with the NONHYDROSTATIC core:
    the EOS full-pressure PGF, geometric geopotential, terrain w-surface
    BC (w_s = u·grad z_s = 0 at rest), and the NH energy remap must all
    preserve the exact balance."""
    from fv3net_tpu.dycore.testcases import mountain_rest_state

    grid, g = setup
    state, ak, bk = mountain_rest_state(grid, nz=10, h_max=2000.0)
    state = add_nonhydrostatic_fields(state)
    cfg = DycoreConfig(
        dt=900.0, n_split=2, advection_order=4, diff_coef=0.004,
        divergence_damp_coef=0.06, remap_te=True, hydrostatic=False,
    )
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    for _ in range(12):  # 3 hours
        state = dynamics_step(state, g, akj, bkj, cfg)
    assert np.abs(np.asarray(state.wind)).max() < 1e-7
    assert np.abs(np.asarray(state.w)).max() < 1e-7
