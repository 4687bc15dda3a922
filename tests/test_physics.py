"""Column physics tests: conservation and qualitative behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core import constants as c
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics import microphysics as mp
from fv3net_tpu.physics import pbl as pbl_mod
from fv3net_tpu.physics import radiation_gray as rad

jax.config.update("jax_enable_x64", True)


@pytest.fixture
def column():
    nz = 20
    delp = np.full((4, nz), 1.0e5 / nz)
    pmid = np.asarray(thermo.pressure_at_midpoint_log(delp))
    T = 300.0 - 60.0 * (1.0 - pmid / pmid[..., -1:])  # warm at surface
    q = 0.8 * np.asarray(mp.saturation_specific_humidity(T, pmid))
    return delp, pmid, T, q


def test_saturation_specific_humidity_monotone_in_T():
    p = 9e4
    T = np.linspace(230, 310, 50)
    qs = np.asarray(mp.saturation_specific_humidity(T, p))
    assert (np.diff(qs) > 0).all()
    assert 0 < qs[0] < qs[-1] < 0.1


def test_gscond_condenses_supersaturation(column):
    delp, pmid, T, q = column
    q_super = 1.2 * np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = np.zeros_like(q_super)
    T2, q2, qc2 = mp.gscond(T, q_super, qc, pmid, 900.0)
    T2, q2, qc2 = map(np.asarray, (T2, q2, qc2))
    assert (qc2 > 0).all()  # condensate formed
    assert (T2 > T).all()  # latent heating
    # water conserved
    np.testing.assert_allclose(q2 + qc2, q_super, rtol=1e-12)
    # final state not supersaturated (to linearization accuracy)
    qs2 = np.asarray(mp.saturation_specific_humidity(T2, pmid))
    assert (q2 <= qs2 * 1.02).all()


def test_gscond_evaporates_cloud_in_subsaturated_air(column):
    delp, pmid, T, q = column
    q_dry = 0.3 * np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = np.full_like(q_dry, 1e-4)
    T2, q2, qc2 = map(np.asarray, mp.gscond(T, q_dry, qc, pmid, 900.0))
    assert (qc2 < 1e-4).all()  # some evaporation
    assert (qc2 >= -1e-15).all()  # never negative
    assert (T2 < T).all()  # evaporative cooling
    np.testing.assert_allclose(q2 + qc2, q_dry + 1e-4, rtol=1e-12)


def test_microphysics_step_conserves_enthalpy_and_water(column):
    delp, pmid, T, q = column
    # saturated air so gscond does not evaporate the cloud before precpd
    q = np.asarray(mp.saturation_specific_humidity(T, pmid))
    qc = np.full_like(q, 5e-4)  # above autoconversion threshold
    dt = 900.0
    T2, q2, qc2, precip, snow = map(
        np.asarray, mp.microphysics_step(T, q, qc, pmid, delp, dt)
    )
    assert (precip > 0).any()
    dm = delp / c.GRAVITY
    # column water: vapor + cloud + precipitated
    w1 = ((q + qc) * dm).sum(-1)
    w2 = ((q2 + qc2) * dm).sum(-1) + precip * dt
    np.testing.assert_allclose(w2, w1, rtol=1e-9)
    assert (qc2 >= -1e-15).all() and (q2 >= 0).all()


def test_gray_radiation_cools_atmosphere_at_night():
    nz = 16
    delp = np.full((3, nz), 1.0e5 / nz)
    T = np.full((3, nz), 280.0)
    heating, diags = rad.gray_radiation(
        T, delp, t_surface=np.full(3, 285.0),
        cos_zenith=np.full(3, -0.5),  # night
        lat=np.zeros(3),
    )
    heating = np.asarray(heating)
    # net column LW cooling at night
    col = (heating * delp).sum(-1)
    assert (col < 0).all()
    assert float(diags["DSWRFtoa"][0]) == 0.0
    # OLR between ~sigma*240^4 and ~sigma*290^4
    olr = np.asarray(diags["ULWRFtoa"])
    assert (olr > 100).all() and (olr < 450).all()


def test_gray_radiation_energy_consistency():
    """Column heating integral equals net flux convergence at boundaries."""
    nz = 24
    rng = np.random.RandomState(0)
    delp = np.full((5, nz), 1.0e5 / nz)
    T = 250 + 40 * rng.rand(5, nz)
    ts = np.full(5, 290.0)
    heating, d = rad.gray_radiation(
        T, delp, ts, cos_zenith=np.full(5, 0.4), lat=np.full(5, 0.5)
    )
    lw_sw_col = (np.asarray(heating) * delp / c.GRAVITY * c.CP_AIR).sum(-1)
    want = (
        np.asarray(d["ULWRFsfc"]) - np.asarray(d["ULWRFtoa"])
        + np.asarray(d["DSWRFtoa"]) - np.asarray(d["DSWRFsfc"])
        - np.asarray(d["DLWRFsfc"])
    )
    np.testing.assert_allclose(lw_sw_col, want, rtol=1e-9)


def test_implicit_diffusion_conserves_and_smooths():
    nz = 12
    rng = np.random.RandomState(1)
    X = rng.rand(6, nz) * 10
    dm = np.full((6, nz), 1000.0)
    dz = np.full((6, nz - 1), 500.0)
    K = np.full((6, nz - 1), 20.0)
    X2 = np.asarray(pbl_mod.implicit_diffusion(X, K, dz, dm, 900.0))
    # conservation of the mass-weighted integral
    np.testing.assert_allclose((X2 * dm).sum(-1), (X * dm).sum(-1), rtol=1e-12)
    # variance decreases
    assert X2.var(-1).max() < X.var(-1).max()
    # long-time limit: approaches well mixed (slowest mode decays on a
    # ~50 h timescale for these parameters)
    X2 = np.asarray(
        pbl_mod.implicit_diffusion(jnp.asarray(X2), K, dz, dm, 1.0e8)
    )
    np.testing.assert_allclose(
        X2, np.broadcast_to(X2.mean(-1, keepdims=True), X2.shape), rtol=1e-2
    )


def test_implicit_diffusion_unconditionally_stable():
    nz = 10
    X = np.zeros((1, nz))
    X[0, 5] = 100.0
    dm = np.full((1, nz), 100.0)
    dz = np.full((1, nz - 1), 100.0)
    K = np.full((1, nz - 1), 1000.0)  # huge K, dt -> would explode explicit
    X2 = np.asarray(pbl_mod.implicit_diffusion(X, K, dz, dm, 10000.0))
    assert np.isfinite(X2).all()
    assert X2.min() >= -1e-9 and X2.max() <= 100.0


def test_orographic_gwd_decelerates_flow():
    """Mountain-wave drag opposes the low-level wind, conserves sign
    (never accelerates), and vanishes over flat terrain."""
    import numpy as np
    import jax.numpy as jnp
    from fv3net_tpu.physics.gravity_wave_drag import GWDParams, orographic_gwd

    rng = np.random.RandomState(0)
    ncol, nz = 64, 16
    # stable stratification, westerly shear
    pe = np.linspace(300.0, 1.0e5, nz + 1)
    delp = np.broadcast_to(np.diff(pe), (ncol, nz))
    pmid = np.broadcast_to(0.5 * (pe[1:] + pe[:-1]), (ncol, nz))
    T = 220.0 + 70.0 * (pmid / 1.0e5) ** 0.6
    u = 10.0 + 20.0 * (1.0 - pmid / 1.0e5)  # stronger aloft
    wind = jnp.asarray(np.stack([u, np.zeros_like(u)]), jnp.float64)
    sgh = jnp.asarray(
        np.where(np.arange(ncol) < 32, 400.0, 0.0), jnp.float64
    )
    dwind, tau0 = orographic_gwd(
        wind, jnp.asarray(T), jnp.asarray(delp), jnp.asarray(pmid),
        sgh, 900.0, GWDParams(),
    )
    dw = np.asarray(dwind)
    tau = np.asarray(tau0)
    # stress launched only over mountains
    assert (tau[:32] > 0).all() and (tau[32:] == 0).all()
    # drag opposes the (westerly) flow and never accelerates it
    assert (dw[0] <= 1e-12).all()
    assert dw[0, :32].min() < 0.0
    assert np.abs(dw[1]).max() < 1e-12  # no cross-flow torque
    # flat columns feel nothing
    np.testing.assert_allclose(dw[:, 32:], 0.0, atol=1e-15)
    # the one-step deceleration cannot reverse the wind
    u_new = np.asarray(wind)[0] + 900.0 * dw[0]
    assert (u_new >= -1e-9).all()


def test_gwd_in_physics_step():
    import numpy as np
    import jax.numpy as jnp
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(6)
    state, *_ = init_state(grid, nz=10, dtype=jnp.float64)
    import dataclasses as dc

    # impose a zonal jet so the drag has something to chew on
    east = np.stack([-np.sin(grid.lon), np.cos(grid.lon),
                     np.zeros_like(grid.lon)])
    wind = jnp.asarray(10.0 * east[:, :, None, :, :]
                       * np.ones((1, 6, 10, 6, 6)))
    state = dc.replace(state, wind=wind)
    lat = jnp.asarray(grid.lat)
    sgh = jnp.full_like(lat, 500.0)
    new, diags = physics_step(
        state, aquaplanet_sst(lat), jnp.full_like(lat, 0.3), lat, 900.0,
        PhysicsConfig(), sgh=sgh,
    )
    assert "taugwd" in diags
    assert float(np.asarray(diags["taugwd"]).max()) > 0
    # kinetic energy decreases relative to the no-GWD step
    new0, _ = physics_step(
        state, aquaplanet_sst(lat), jnp.full_like(lat, 0.3), lat, 900.0,
        PhysicsConfig(),
    )
    ke = float((np.asarray(new.wind) ** 2).sum())
    ke0 = float((np.asarray(new0.wind) ** 2).sum())
    assert ke < ke0
