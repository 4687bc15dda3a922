"""Mass-flux convection contracts (physics/convection_mf.py).

Guarantees tested (reference: the GFS SAS deep-convection stage behind
``wrapper.apply_physics``):
- stable/dry columns are exact no-ops,
- an unstable moist column triggers, precipitates, warms the column,
- precipitation equals the column drying (water closure),
- column moist static energy is conserved to roundoff,
- tendencies are bounded (CFL cap on the mass flux),
- jit + vmap-shaped batching works on the full [6, ny, nx, nz] layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.core.constants import (
    CP_AIR,
    LATENT_HEAT_VAPORIZATION_0_C as LV,
)
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics.convection_mf import MassFluxParams, mass_flux_convection

NZ = 24
DT = 900.0


def _column(unstable: bool):
    """Build a single-column profile, z-last, level 0 = model top."""
    # pressure levels from ~30 hPa to ~1000 hPa
    pe = jnp.linspace(3000.0, 101325.0, NZ + 1)
    delp = pe[1:] - pe[:-1]
    pmid = 0.5 * (pe[1:] + pe[:-1])
    # dry adiabat-ish temperature profile
    T_sfc = 302.0 if unstable else 270.0
    T = T_sfc * (pmid / pmid[-1]) ** 0.19
    if unstable:
        # very moist boundary layer -> large CAPE
        q = jnp.where(
            jnp.arange(NZ) >= NZ - 5, 0.018, 1e-4
        )
    else:
        q = jnp.full((NZ,), 1e-5)
    shape = (1, 1, 1, NZ)
    return (
        T.reshape(shape),
        q.reshape(shape),
        pmid.reshape(shape),
        delp.reshape(shape),
    )


def test_stable_column_noop():
    T, q, pmid, delp = _column(unstable=False)
    T2, q2, qc, precip = mass_flux_convection(T, q, pmid, delp, DT)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), rtol=0, atol=1e-12)
    assert float(precip.max()) == 0.0


def test_unstable_column_triggers_and_rains():
    T, q, pmid, delp = _column(unstable=True)
    T2, q2, qc, precip = mass_flux_convection(T, q, pmid, delp, DT)
    assert float(precip.max()) > 0.0
    # net column drying
    dm = thermo.layer_mass(delp)
    dq_col = float((((q2 - q) * dm).sum(axis=-1)).min())
    assert dq_col < 0.0
    # column-mean warming from latent heating
    dT_col = float(((T2 - T) * dm).sum(axis=-1).max())
    assert dT_col > 0.0


def test_water_closure():
    """Vapor leaving the column = precip + detrained cloud water."""
    T, q, pmid, delp = _column(unstable=True)
    _, q2, qc_det, precip = mass_flux_convection(T, q, pmid, delp, DT)
    dm = thermo.layer_mass(delp)
    drying = -((q2 - q) * dm).sum(axis=-1)
    sink = np.asarray(precip) * DT + np.asarray(
        (qc_det * dm).sum(axis=-1)
    )
    np.testing.assert_allclose(
        sink, np.asarray(drying), rtol=1e-6, atol=1e-10
    )


def test_moist_static_energy_closure():
    T, q, pmid, delp = _column(unstable=True)
    T2, q2, qc_det, precip = mass_flux_convection(T, q, pmid, delp, DT)
    dm = thermo.layer_mass(delp)
    # cp*int(dT dm) equals L * (P dt + detrained condensate): every kg
    # of condensed vapor released latent heat (heating renormalized)
    heat = CP_AIR * ((T2 - T) * dm).sum(axis=-1)
    latent = LV * (
        precip * DT + (qc_det * dm).sum(axis=-1)
    )
    np.testing.assert_allclose(
        np.asarray(heat), np.asarray(latent), rtol=1e-5, atol=1e-4
    )


def test_shallow_scheme_detrains_without_precip():
    """SHALLOW_PARAMS: non-precipitating cumulus confined below the
    sigma cap, all condensate detrained into cloud water."""
    from fv3net_tpu.physics.convection_mf import SHALLOW_PARAMS

    T, q, pmid, delp = _column(unstable=True)
    T2, q2, qc_det, precip = mass_flux_convection(
        T, q, pmid, delp, DT, SHALLOW_PARAMS
    )
    qc_det = np.asarray(qc_det)
    assert float(np.asarray(precip).max()) < 1e-12  # no rain
    assert qc_det.max() > 0.0  # cloud water produced
    # detrainment confined below the sigma_top_min cap
    sigma = np.asarray(pmid) / np.asarray(pmid)[..., -1:]
    assert (sigma[qc_det > 0] >= SHALLOW_PARAMS.sigma_top_min - 1e-6).all()
    # exact conversion: column drying equals detrained condensate
    dm = np.asarray(thermo.layer_mass(delp))
    drying = -(((np.asarray(q2) - np.asarray(q)) * dm).sum(-1))
    np.testing.assert_allclose(
        drying, (qc_det * dm).sum(-1), rtol=1e-6, atol=1e-12
    )


def test_bounded_tendencies():
    T, q, pmid, delp = _column(unstable=True)
    T2, q2, _, _ = mass_flux_convection(
        T, q, pmid, delp, DT, MassFluxParams(tau=600.0)
    )
    # per-step temperature change stays physically bounded
    assert float(jnp.abs(T2 - T).max()) < 15.0
    assert float(q2.min()) >= 0.0


def test_jit_batched_full_layout():
    rng = np.random.default_rng(0)
    shape = (6, 4, 4, NZ)
    pe = np.linspace(3000.0, 101325.0, NZ + 1)
    delp = np.broadcast_to(pe[1:] - pe[:-1], shape).copy()
    pmid = np.broadcast_to(0.5 * (pe[1:] + pe[:-1]), shape).copy()
    T = 300.0 * (pmid / pmid[..., -1:]) ** 0.19 + rng.normal(0, 1, shape)
    q = np.where(np.arange(NZ) >= NZ - 5, 0.017, 1e-4) + 0.0 * T
    f = jax.jit(lambda *a: mass_flux_convection(*a, DT))
    T2, q2, qc, precip = f(
        jnp.asarray(T), jnp.asarray(q), jnp.asarray(pmid), jnp.asarray(delp)
    )
    assert T2.shape == shape and precip.shape == shape[:-1]
    assert np.isfinite(np.asarray(T2)).all()
    assert np.isfinite(np.asarray(precip)).all()
    assert float(precip.max()) > 0.0


def test_driver_integration_mass_flux_scheme():
    """physics_step with convection_scheme='mass_flux' runs end to end."""
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.physics import PhysicsConfig, physics_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(6)
    state, *_ = init_state(grid, nz=16, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    t_sfc = aquaplanet_sst(lat)
    cosz = jnp.full_like(lat, 0.5)
    pcfg = PhysicsConfig(convection_scheme="mass_flux")
    new_state, diags = jax.jit(
        lambda s: physics_step(s, t_sfc, cosz, lat, DT, pcfg)
    )(state)
    assert np.isfinite(np.asarray(new_state.pt)).all()
    assert np.isfinite(np.asarray(diags["PRATEsfc"])).all()
    assert float(diags["PRATEsfc"].min()) >= 0.0

def test_momentum_transport():
    """Convective momentum transport: redistribution only (column
    momentum closed to roundoff), active inside the cloud layer, and
    the thermodynamic outputs are unchanged by its presence."""
    T, q, pmid, delp = _column(unstable=True)
    # sheared wind: strong westerlies aloft, calm surface
    u = jnp.broadcast_to(
        30.0 * (1.0 - jnp.asarray(pmid)[0, 0, 0] / float(pmid[..., -1].max())),
        pmid.shape,
    )
    wind = jnp.stack([u, 0.5 * u, jnp.zeros_like(u)])
    T2, q2, qc, pr, dwind = mass_flux_convection(
        T, q, pmid, delp, DT, MassFluxParams(), wind=wind
    )
    dw = np.asarray(dwind)
    assert np.abs(dw).max() > 0.0  # transport happened
    # column momentum conserved to f32 roundoff of the transported
    # amount (the closure is exact in real arithmetic)
    dm = np.asarray(thermo.layer_mass(delp))
    col = (dw * dm).sum(axis=-1)
    scale = (np.abs(dw) * dm).sum(axis=-1)
    assert (np.abs(col) <= 1e-4 * scale + 1e-8).all()
    # thermodynamics are independent of the momentum pass
    T2b, q2b, _, prb = mass_flux_convection(T, q, pmid, delp, DT)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T2b), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q2b), rtol=0, atol=0)
    # momentum_transport=False is a clean no-op
    *_, dw0 = mass_flux_convection(
        T, q, pmid, delp, DT,
        MassFluxParams(momentum_transport=False), wind=wind,
    )
    assert float(jnp.abs(dw0).max()) == 0.0
    # pgcon=1 cancels the detrained plume anomaly; what remains is
    # subsidence of the (linear-shear) profile, a uniform tendency the
    # conservation closure removes — transport degenerates to ~zero
    *_, dw1 = mass_flux_convection(
        T, q, pmid, delp, DT, MassFluxParams(pgcon=1.0), wind=wind
    )
    assert float(jnp.abs(dw1).max()) < 1e-2 * np.abs(dw).max()
