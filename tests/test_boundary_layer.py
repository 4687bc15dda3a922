"""GFS-fidelity boundary layer: Monin-Obukhov surface layer + Hong-Pan
K-profile PBL (physics/surface_layer.py, physics/pbl.py kprofile).

Physics-contract tests: similarity-theory limits, PBL-height response,
countergradient conservation — the properties the GFS sfc_diff/moninedmf
stages guarantee (reference: Fortran physics behind wrapper.apply_physics).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.physics.surface_layer import (
    SurfaceLayerParams,
    monin_obukhov_fluxes,
    _psi_functions,
)
from fv3net_tpu.physics.pbl import (
    KProfileParams,
    kprofile_diffusivity,
    implicit_diffusion,
)


def _sfc_inputs(t_sfc=300.0, t_air=299.0, v=8.0):
    shape = (4,)
    return dict(
        t_air=jnp.full(shape, t_air),
        q_air=jnp.full(shape, 0.01),
        p_sfc=jnp.full(shape, 1.0e5),
        delp_sfc=jnp.full(shape, 2.0e3),
        wind_speed=jnp.full(shape, v),
        t_surface=jnp.full(shape, t_sfc),
    )


def test_psi_neutral_zero():
    pm, ph = _psi_functions(jnp.zeros(3))
    assert np.allclose(np.asarray(pm), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(ph), 0.0, atol=1e-6)


def test_psi_signs():
    pm_u, ph_u = _psi_functions(jnp.full(1, -1.0))
    pm_s, ph_s = _psi_functions(jnp.full(1, 1.0))
    # unstable corrections are positive (enhanced mixing), stable negative
    assert float(pm_u[0]) > 0 and float(ph_u[0]) > 0
    assert float(pm_s[0]) < 0 and float(ph_s[0]) < 0


def test_monin_obukhov_stability_response():
    """Unstable stratification must give larger heat exchange than stable
    at the same wind speed (the central similarity-theory property)."""
    unstable = monin_obukhov_fluxes(**_sfc_inputs(t_sfc=302.0, t_air=299.0))
    stable = monin_obukhov_fluxes(**_sfc_inputs(t_sfc=296.0, t_air=299.0))
    # same |dT| => flux magnitude larger in the unstable case
    assert float(unstable["SHTFLsfc"][0]) > 0
    assert float(stable["SHTFLsfc"][0]) < 0
    assert abs(float(unstable["SHTFLsfc"][0])) > abs(
        float(stable["SHTFLsfc"][0])
    )
    assert float(unstable["obukhov_inv"][0]) < 0  # L<0 unstable
    assert float(stable["obukhov_inv"][0]) > 0


def test_monin_obukhov_charnock_roughness():
    """Stronger wind -> larger u*; ocean drag coefficient rises with wind
    (Charnock) instead of staying constant like the bulk scheme."""
    lo = monin_obukhov_fluxes(**_sfc_inputs(v=4.0))
    hi = monin_obukhov_fluxes(**_sfc_inputs(v=20.0))
    assert float(hi["ustar"][0]) > float(lo["ustar"][0])
    # implied Cd = ustar^2 / v^2 increases with wind speed over ocean
    cd_lo = float(lo["ustar"][0]) ** 2 / 4.0 ** 2
    cd_hi = float(hi["ustar"][0]) ** 2 / 20.0 ** 2
    assert cd_hi > cd_lo


def test_monin_obukhov_land_roughness():
    """Rougher land surface -> more drag than ocean at the same wind."""
    ocean = monin_obukhov_fluxes(**_sfc_inputs())
    land = monin_obukhov_fluxes(
        **_sfc_inputs(), land_frac=jnp.ones(4)
    )
    assert float(land["drag_factor"][0]) > float(ocean["drag_factor"][0])


def _column(nz=24, dtheta=None):
    """Idealized convective column: well-mixed layer below an inversion.
    Arrays z-LAST, level 0 = model top."""
    dz = jnp.full((2, nz), 200.0)
    # surface-first theta: 300 K mixed layer up to 1 km, +5 K/km above
    z_s = np.cumsum(np.full(nz, 200.0)) - 100.0
    th = np.where(z_s < 1000.0, 300.0, 300.0 + 5e-3 * (z_s - 1000.0))
    if dtheta is not None:
        th = th + dtheta
    thv = jnp.asarray(np.broadcast_to(th[::-1], (2, nz)))
    speed = jnp.full((2, nz), 5.0)
    return thv, speed, dz


def test_kprofile_height_tracks_instability():
    """Surface heating (wthv>0) deepens the diagnosed PBL vs neutral."""
    thv, speed, dz = _column()
    ustar = jnp.full(2, 0.3)
    K_m, K_h, gamma, h_conv = kprofile_diffusivity(
        thv, speed, dz, ustar, jnp.full(2, -0.01), jnp.full(2, 0.2)
    )
    _, _, _, h_neut = kprofile_diffusivity(
        thv, speed, dz, ustar, jnp.zeros(2), jnp.zeros(2)
    )
    assert float(h_conv[0]) > float(h_neut[0])
    assert float(h_conv[0]) >= 800.0  # reaches the inversion region
    assert np.isfinite(np.asarray(K_m)).all()


def test_kprofile_shape():
    """Nonlocal K: zero-ish near surface/PBL top, maximal in between; the
    free troposphere gets only the background/local value."""
    thv, speed, dz = _column()
    K_m, K_h, gamma, h = kprofile_diffusivity(
        thv, speed, dz, jnp.full(2, 0.4), jnp.full(2, -0.02),
        jnp.full(2, 0.15),
    )
    Ks = np.asarray(K_m)[0][::-1]  # surface-first interfaces
    kmax = Ks.max()
    assert kmax > 10.0  # vigorous convective mixing
    imax = Ks.argmax()
    zif = np.cumsum(np.full(24, 200.0))[:-1]
    assert zif[imax] < float(h[0])  # max inside the PBL
    # above the PBL: at most the local/background diffusivity
    above = Ks[zif > float(h[0]) * 1.2]
    assert above.max() < 0.5 * kmax


def test_kprofile_countergradient_unstable_only():
    thv, speed, dz = _column()
    _, _, g_conv, _ = kprofile_diffusivity(
        thv, speed, dz, jnp.full(2, 0.3), jnp.full(2, -0.02),
        jnp.full(2, 0.2),
    )
    _, _, g_stab, _ = kprofile_diffusivity(
        thv, speed, dz, jnp.full(2, 0.3), jnp.full(2, 0.02),
        jnp.full(2, -0.05),
    )
    assert float(np.abs(np.asarray(g_conv)).max()) > 0
    assert float(np.abs(np.asarray(g_stab)).max()) == 0.0


def test_implicit_diffusion_conserves_with_kprofile():
    """The implicit solve conserves the mass-weighted column integral for
    any K profile (no-flux boundaries)."""
    thv, speed, dz = _column()
    K_m, K_h, _, _ = kprofile_diffusivity(
        thv, speed, dz, jnp.full(2, 0.4), jnp.full(2, -0.02),
        jnp.full(2, 0.15),
    )
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(300.0, 5.0, (2, 24)))
    dm = jnp.full((2, 24), 2000.0)
    dz_if = jnp.full((2, 23), 200.0)
    Xn = implicit_diffusion(X, K_h, dz_if, dm, 900.0)
    before = float((X * dm).sum())
    after = float((Xn * dm).sum())
    assert abs(after - before) / abs(before) < 1e-6
    # diffusion reduces variance
    assert float(jnp.var(Xn)) < float(jnp.var(X))


def test_driver_kprofile_runs_and_conserves_water():
    """physics_step with the GFS-fidelity schemes: finite, water closed
    (precip + column water change = evaporation)."""
    import jax

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst
    from fv3net_tpu.ops import thermo

    grid = make_grid(12)
    g = GridArrays.from_grid(grid)
    state, *_ = init_state(grid, nz=20)
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.full_like(sst, 0.4)
    cfg = PhysicsConfig()  # monin_obukhov + kprofile are the defaults
    out, diags = physics_step(state, sst, cosz, g.lat, 900.0, cfg)
    assert np.isfinite(np.asarray(out.pt)).all()
    assert "HPBLsfc" in diags
    h = np.asarray(diags["HPBLsfc"])
    assert (h > 0).all() and (h < 6000.0).all()
    # water budget: d(column water)/dt = evap - precip
    dm = np.asarray(thermo.layer_mass(jnp.moveaxis(state.delp, 1, -1)))
    q0 = np.moveaxis(np.asarray(state.tracers["sphum"]), 1, -1)
    qc0 = np.moveaxis(np.asarray(state.tracers["cloud_water"]), 1, -1)
    q1 = np.moveaxis(np.asarray(out.tracers["sphum"]), 1, -1)
    qc1 = np.moveaxis(np.asarray(out.tracers["cloud_water"]), 1, -1)
    dwater = (((q1 + qc1) - (q0 + qc0)) * dm).sum(axis=-1) / 900.0
    evap = np.asarray(diags["evaporation"])
    precip = np.asarray(diags["PRATEsfc"])
    np.testing.assert_allclose(dwater, evap - precip, atol=5e-7)
