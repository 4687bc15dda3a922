"""Dycore integration tests: conservation, rest-state preservation,
stability (mirrors the conservation-based correctness guarding noted in
SURVEY §5.2 — the reference relies on conservation diagnostics +
regression, not unit-level dycore tests)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.dycore import DycoreConfig, DycoreState, dynamics_step, init_state
from fv3net_tpu.dycore.core import GridArrays
from fv3net_tpu.dycore import vertical

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def setup():
    grid = make_grid(12)
    g = GridArrays.from_grid(grid, dtype=jnp.float64)
    return grid, g


def total_mass(state, grid):
    return float(
        (np.asarray(state.delp) * grid.area[:, None]).sum()
    )


def test_hybrid_coordinate_monotone():
    ak, bk = vertical.hybrid_coordinate(32)
    for ps in (6e4, 1e5, 1.08e5):
        pe = ak + bk * ps
        assert (np.diff(pe) > 0).all()
    assert ak[0] == pytest.approx(300.0)
    assert bk[-1] == 1.0 and bk[0] == 0.0


def test_resting_atmosphere_stays_at_rest(setup):
    grid, g = setup
    state, ak, bk = init_state(grid, nz=12, dtype=jnp.float64)
    cfg = DycoreConfig(dt=900.0, n_split=2, diff_coef=0.0)
    out = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    # no motion develops; delp unchanged (remap of an unchanged column is
    # the identity up to roundoff)
    np.testing.assert_allclose(np.asarray(out.wind), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out.delp), np.asarray(state.delp), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.pt), np.asarray(state.pt), rtol=1e-9
    )


def test_gravity_wave_conserves_mass_and_stays_finite(setup):
    grid, g = setup
    state, ak, bk = init_state(
        grid, nz=12, dtype=jnp.float64, perturbation=5.0
    )
    cfg = DycoreConfig(dt=900.0, n_split=3)
    m0 = total_mass(state, grid)
    for _ in range(10):
        state = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    m1 = total_mass(state, grid)
    assert np.isfinite(np.asarray(state.pt)).all()
    assert np.isfinite(np.asarray(state.wind)).all()
    np.testing.assert_allclose(m1, m0, rtol=1e-10)
    # wind magnitudes stay physical for a 5 K bump
    assert np.abs(np.asarray(state.wind)).max() < 60.0


def test_tracer_transport_conserves_and_bounded(setup):
    grid, g = setup
    state, ak, bk = init_state(
        grid, nz=12, dtype=jnp.float64, perturbation=3.0
    )
    # tracer blob in [0, 1]
    lon = grid.lon[:, None, :, :]
    lat = grid.lat[:, None, :, :]
    blob = np.exp(-((lon - 1.0) ** 2 + lat ** 2) / 0.1) * np.ones(
        (6, 12, grid.n, grid.n)
    )
    state = DycoreState(
        delp=state.delp,
        pt=state.pt,
        wind=state.wind,
        tracers={"sphum": jnp.asarray(blob)},
        phis=state.phis,
    )
    cfg = DycoreConfig(dt=900.0, n_split=3)
    tm0 = float((np.asarray(state.tracers["sphum"] * state.delp)
                 * grid.area[:, None]).sum())
    for _ in range(5):
        state = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    q = np.asarray(state.tracers["sphum"])
    tm1 = float((q * np.asarray(state.delp) * grid.area[:, None]).sum())
    np.testing.assert_allclose(tm1, tm0, rtol=1e-9)
    # upwind transport + positive-definite remap keep q in physical bounds
    assert q.min() > -1e-10
    assert q.max() < 1.0 + 1e-6


def test_uniform_tracer_stays_uniform(setup):
    grid, g = setup
    state, ak, bk = init_state(
        grid, nz=12, dtype=jnp.float64, perturbation=3.0
    )
    state = DycoreState(
        delp=state.delp,
        pt=state.pt,
        wind=state.wind,
        tracers={"sphum": jnp.full_like(state.delp, 0.5)},
        phis=state.phis,
    )
    cfg = DycoreConfig(dt=900.0, n_split=2)
    for _ in range(3):
        state = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    np.testing.assert_allclose(
        np.asarray(state.tracers["sphum"]), 0.5, rtol=1e-9
    )


def test_lsq_gradient_of_linear_function(setup):
    """The least-squares gradient (used for the PGF) is 2nd-order accurate
    on EVERY cell, including the 8 skewed cube-corner cells."""
    from fv3net_tpu.dycore.core import _lsq_gradient, _ext

    grid, g = setup
    # s = z coordinate of cell center (a smooth function on the sphere)
    s = jnp.asarray(grid.centers_xyz[..., 2])[:, None]  # [6, 1, n, n]
    grad = np.asarray(_lsq_gradient(_ext(s), g))[:, :, 0]
    # analytic surface gradient of f = z/R on unit sphere: (zhat - z khat)/R
    khat = np.moveaxis(grid.centers_xyz, -1, 0)
    zhat = np.zeros_like(khat)
    zhat[2] = 1.0
    want = (zhat - grid.centers_xyz[..., 2][None] * khat) / grid.radius
    err = np.abs(grad - want)
    scale = np.abs(want).max()
    assert err.max() < 0.02 * scale  # global, corners included
    assert err.mean() < 0.005 * scale


@pytest.mark.parametrize("order", [1, 2, 4])
def test_transport_orders_conserve_and_bound(setup, order):
    """All advection orders (upwind / MUSCL / PPM hord family) conserve
    tracer mass and respect bounds on the full cube."""
    grid, g = setup
    state, ak, bk = init_state(
        grid, nz=12, dtype=jnp.float64, perturbation=3.0
    )
    lon = grid.lon[:, None, :, :]
    lat = grid.lat[:, None, :, :]
    blob = np.exp(-((lon - 1.0) ** 2 + lat ** 2) / 0.1) * np.ones(
        (6, 12, grid.n, grid.n)
    )
    state = DycoreState(
        delp=state.delp, pt=state.pt, wind=state.wind,
        tracers={"sphum": jnp.asarray(blob)}, phis=state.phis,
    )
    cfg = DycoreConfig(dt=900.0, n_split=3, advection_order=order)
    tm0 = float((np.asarray(state.tracers["sphum"] * state.delp)
                 * grid.area[:, None]).sum())
    for _ in range(5):
        state = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    q = np.asarray(state.tracers["sphum"])
    tm1 = float((q * np.asarray(state.delp) * grid.area[:, None]).sum())
    np.testing.assert_allclose(tm1, tm0, rtol=1e-9)
    assert q.min() > -1e-9 and q.max() < 1.0 + 1e-6
    assert np.isfinite(np.asarray(state.wind)).all()


def test_ppm_less_diffusive_than_upwind(setup):
    """The PPM operator preserves a transported blob's peak much better
    than 1st-order upwind (the point of FV3's hord operators)."""
    grid, g = setup
    peaks = {}
    for order in (1, 4):
        state, ak, bk = init_state(
            grid, nz=4, dtype=jnp.float64, perturbation=3.0
        )
        lon = grid.lon[:, None, :, :]
        lat = grid.lat[:, None, :, :]
        blob = np.exp(-((lon - 1.0) ** 2 + lat ** 2) / 0.05) * np.ones(
            (6, 4, grid.n, grid.n)
        )
        state = DycoreState(
            delp=state.delp, pt=state.pt, wind=state.wind,
            tracers={"sphum": jnp.asarray(blob)}, phis=state.phis,
        )
        cfg = DycoreConfig(dt=900.0, n_split=3, advection_order=order)
        for _ in range(8):
            state = dynamics_step(
                state, g, jnp.asarray(ak), jnp.asarray(bk), cfg
            )
        peaks[order] = float(np.asarray(state.tracers["sphum"]).max())
    assert peaks[4] > peaks[1]


def test_divergence_damping_preserves_rest_and_damps(setup):
    grid, g = setup
    state, ak, bk = init_state(grid, nz=12, dtype=jnp.float64)
    cfg = DycoreConfig(
        dt=900.0, n_split=2, diff_coef=0.0, divergence_damp_coef=0.05
    )
    out = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    np.testing.assert_allclose(np.asarray(out.wind), 0.0, atol=1e-10)

    # a gravity-wave case loses divergent kinetic energy faster with
    # divergence damping on
    def ke_after(coef):
        s, ak_, bk_ = init_state(
            grid, nz=12, dtype=jnp.float64, perturbation=5.0
        )
        c = DycoreConfig(
            dt=900.0, n_split=3, divergence_damp_coef=coef
        )
        for _ in range(6):
            s = dynamics_step(s, g, jnp.asarray(ak_), jnp.asarray(bk_), c)
        assert np.isfinite(np.asarray(s.wind)).all()
        return float((np.asarray(s.wind) ** 2).sum())

    assert ke_after(0.08) < ke_after(0.0)


def test_te_remap_conserves_total_energy(setup):
    """The energy-conserving remap (remap_te, FV3's te_map) preserves the
    column-integrated total energy through the vertical remap far better
    than the plain theta_v remap."""
    from fv3net_tpu.dycore.core import _column_te

    grid, g = setup

    def te_budget(remap_te):
        state, ak, bk = init_state(
            grid, nz=12, dtype=jnp.float64, perturbation=5.0
        )
        cfg = DycoreConfig(
            dt=900.0, n_split=3, remap_te=remap_te, advection_order=4
        )

        def column_energy(s):
            import fv3net_tpu.ops.thermo as th
            from fv3net_tpu.core.constants import (
                KAPPA,
                REFERENCE_SURFACE_PRESSURE,
            )

            delp = jnp.moveaxis(s.delp, 1, -1)
            pe = th.pressure_at_interface(delp)
            lnpe = jnp.log(pe)
            dlnp = lnpe[..., 1:] - lnpe[..., :-1]
            pmid = delp / dlnp
            tv = jnp.moveaxis(s.pt, 1, -1) * (
                pmid / REFERENCE_SURFACE_PRESSURE
            ) ** KAPPA
            ke = 0.5 * sum(
                jnp.moveaxis(s.wind[c], 1, -1) ** 2 for c in range(3)
            )
            te, _ = _column_te(pe, tv, ke, s.phis)
            return float((te * delp * grid.area[..., None]).sum())

        e0 = column_energy(state)
        for _ in range(5):
            state = dynamics_step(
                state, g, jnp.asarray(ak), jnp.asarray(bk), cfg
            )
        assert np.isfinite(np.asarray(state.pt)).all()
        return abs(column_energy(state) - e0) / abs(e0)

    drift_plain = te_budget(False)
    drift_te = te_budget(True)
    # the dynamics itself exchanges energy; what the TE remap removes is
    # the remap-induced component — require a clear improvement
    assert drift_te < drift_plain


def test_jablonowski_williamson_balanced_jet(setup):
    """JW06 steady-state: the balanced zonal jet must survive a day of
    integration with bounded drift (the canonical dycore balance test)."""
    from fv3net_tpu.dycore.testcases import baroclinic_wave_state

    grid, g = setup
    state, ak, bk = baroclinic_wave_state(grid, nz=10, perturb=False,
                                          dtype=jnp.float64)
    u0 = np.asarray(state.wind)
    assert np.abs(u0).max() == pytest.approx(35.0, abs=2.0)
    cfg = DycoreConfig(
        dt=900.0, n_split=4, advection_order=4, diff_coef=0.001,
        divergence_damp_coef=0.06, remap_te=True,
    )
    m0 = total_mass(state, grid)
    for _ in range(24):  # 6 hours
        state = dynamics_step(state, g, jnp.asarray(ak), jnp.asarray(bk), cfg)
    wind = np.asarray(state.wind)
    assert np.isfinite(wind).all()
    np.testing.assert_allclose(total_mass(state, grid), m0, rtol=1e-10)
    # the jet survives; drift stays a small fraction of the jet speed
    assert np.abs(wind).max() > 25.0
    assert np.abs(wind - u0).max() < 8.0


def test_jablonowski_williamson_wave_grows(setup):
    """The perturbed JW06 case must diverge from the balanced run (the
    baroclinic instability the test is named for)."""
    from fv3net_tpu.dycore.testcases import baroclinic_wave_state

    grid, g = setup
    cfg = DycoreConfig(
        dt=900.0, n_split=4, advection_order=4, diff_coef=0.001,
        divergence_damp_coef=0.06, remap_te=True,
    )

    def run(perturb):
        state, ak, bk = baroclinic_wave_state(
            grid, nz=10, perturb=perturb, dtype=jnp.float64
        )
        for _ in range(12):
            state = dynamics_step(
                state, g, jnp.asarray(ak), jnp.asarray(bk), cfg
            )
        return np.asarray(state.wind)

    balanced = run(False)
    perturbed = run(True)
    diff = np.abs(perturbed - balanced).max()
    assert 0.1 < diff < 10.0  # the bump persists and evolves, no blowup


def test_mountain_rest_state_stays_at_rest(setup):
    """Resting isothermal atmosphere over a 2-km mountain: the
    terrain-following PGF must not manufacture circulation (the classic
    topography balance test).  Exact here: the log-pressure geopotential
    convention makes phi + R T0 ln p discretely constant, the LSQ
    gradient is linear, and damping acts on Tv (balance-neutral) rather
    than theta."""
    from fv3net_tpu.dycore.testcases import mountain_rest_state

    grid, g = setup
    state, ak, bk = mountain_rest_state(grid, nz=10, h_max=2000.0)
    cfg = DycoreConfig(
        dt=900.0, n_split=2, advection_order=4, diff_coef=0.004,
        divergence_damp_coef=0.06, remap_te=True,
    )
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    for _ in range(24):  # 6 hours
        state = dynamics_step(state, g, akj, bkj, cfg)
    assert np.abs(np.asarray(state.wind)).max() < 1e-8
    np.testing.assert_allclose(
        np.asarray(state.surface_pressure()),
        np.asarray(state.delp).sum(axis=1) + 300.0,
    )
