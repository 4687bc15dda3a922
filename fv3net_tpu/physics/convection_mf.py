"""Bulk mass-flux convection (simplified Arakawa-Schubert family).

The GFS deep-convection stage is SAS (an entraining-plume bulk mass-flux
scheme with a quasi-equilibrium CAPE closure); this module implements
that family's core structure — parcel-origin selection by moist static
energy, an entraining updraft, bulk-Richardson... CAPE closure, upwind
compensating subsidence, cloud-top detrainment, and closed column energy
and water budgets — as batched z-last JAX with one `lax.scan` over the
(short) vertical axis for the plume ascent (reference: the Fortran
model's deep-convection stage behind ``wrapper.apply_physics``; the
Betts-Miller adjustment in ``physics/convection.py`` remains the default
scheme, this one is selected with ``ConvectionParams``-level
``PhysicsConfig(convection_scheme="mass_flux")``).

Guarantees (tested in tests/test_mass_flux_convection.py):
- no-op on columns without CAPE,
- precipitation >= 0 and exactly equal to the column drying,
- column moist static energy conserved to roundoff (heating is
  renormalized onto the convective layers so cp*dT integrates to L*P),
- bounded mass flux (CFL-limited against layer masses).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from fv3net_tpu.ops import zscan
from jax import lax

from fv3net_tpu.core.constants import (
    CP_AIR,
    GRAVITY,
    LATENT_HEAT_VAPORIZATION_0_C as LV,
)
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics.microphysics import saturation_specific_humidity


@dataclasses.dataclass(frozen=True)
class MassFluxParams:
    entrainment: float = 1.0e-4  # 1/m fractional entrainment rate
    tau: float = 3600.0  # s, CAPE relaxation timescale
    cape_crit: float = 100.0  # J/kg threshold to trigger
    precip_efficiency: float = 0.9  # condensate fraction raining out
    max_mass_fraction: float = 0.25  # CFL cap: M dt <= this * min dm
    source_depth: int = 4  # levels above the surface scanned for the
    # maximum-MSE parcel origin
    # shallow-scheme cap: buoyancy zeroed where p/ps < sigma_top_min
    # (0 = uncapped deep convection)
    sigma_top_min: float = 0.0
    # minimum cloud depth in layers (deep convection requires a real
    # tower; shallow cumulus may be a single buoyant layer)
    min_depth_layers: int = 2
    # convective momentum transport: the updraft carries horizontal
    # momentum (entraining toward the environment like MSE), compensating
    # subsidence advects environment momentum downward, and the plume's
    # momentum anomaly detrains at cloud top reduced by the
    # pressure-gradient correction pgcon (GFS SAS cnvgwd/pgcon = 0.55,
    # Han & Pan 2011 eq. 8: convection-induced pressure gradients return
    # ~55% of the apparent momentum source).  Column net momentum is
    # closed exactly (redistribution only)
    momentum_transport: bool = True
    pgcon: float = 0.55


#: GFS shalcnv-style shallow cumulus: the same entraining-plume core
#: confined below ~0.65 p/ps with high entrainment, weak mass flux, and
#: NO precipitation — all condensate detrains into cloud water
#: (reference: the Fortran model's shallow-convection stage behind
#: ``wrapper.apply_physics``, Han & Pan 2011 mass-flux shallow scheme).
SHALLOW_PARAMS = MassFluxParams(
    entrainment=3.0e-4,
    tau=1800.0,
    cape_crit=5.0,
    precip_efficiency=0.0,
    max_mass_fraction=0.1,
    source_depth=2,
    sigma_top_min=0.65,
    min_depth_layers=0,
)


def _pick(x, idx):
    """x[..., nz] at per-column idx via one-hot contraction (gathers are
    the dominant TPU cost -- CLAUDE.md perf learnings)."""
    oh = (idx[..., None] == jnp.arange(x.shape[-1])).astype(x.dtype)
    return (x * oh).sum(axis=-1)


def mass_flux_convection(
    T, q, pmid, delp, dt: float,
    params: MassFluxParams = MassFluxParams(),
    wind=None,
) -> Tuple[jnp.ndarray, ...]:
    """Apply bulk mass-flux convection.

    Args: T, q, pmid, delp all (..., nz) z-last, level 0 = model top.
    ``wind``: optional (ncomp, ..., nz) horizontal-momentum components;
    when given (and params.momentum_transport), convective momentum
    transport is computed and a fifth output ``dwind`` (same shape,
    momentum increment over dt) is returned.

    Returns (T_new, q_new, qc_detrained, precip_rate[kg/m^2/s][, dwind]).
    """
    nz = T.shape[-1]
    dm = thermo.layer_mass(delp)
    qsat = saturation_specific_humidity(T, pmid)
    dz = jnp.abs(thermo.hydrostatic_dz(T, q, delp))

    # surface-first views (ascent direction = increasing index)
    rev = lambda x: x[..., ::-1]
    T_s, q_s, dz_s, dm_s, qs_s = map(rev, (T, q, dz, dm, qsat))
    z_s = zscan.cumsum(dz_s, axis=-1) - 0.5 * dz_s

    h = CP_AIR * T_s + GRAVITY * z_s + LV * q_s
    hsat = CP_AIR * T_s + GRAVITY * z_s + LV * qs_s

    # parcel origin: max MSE within the lowest source_depth levels
    ksrc = jnp.argmax(
        jnp.where(
            jnp.arange(nz) < params.source_depth, h, -jnp.inf
        ),
        axis=-1,
    )
    h_src = _pick(h, ksrc)

    # entraining updraft MSE via scan over z (batched over all columns)
    eps_dz = params.entrainment * dz_s

    def ascend(hu_prev, xs):
        hbar_k, is_src_k, eps_k = xs
        hu = jnp.where(
            is_src_k,
            hbar_k,
            (hu_prev + eps_k * hbar_k) / (1.0 + eps_k),
        )
        return hu, hu

    zl = lambda v: jnp.moveaxis(v, -1, 0)
    is_src = jnp.arange(nz) == ksrc[..., None]
    _, hu_z = lax.scan(
        ascend, h_src, (zl(h), zl(is_src), zl(eps_dz))
    )
    h_u = jnp.moveaxis(hu_z, 0, -1)

    # buoyant levels above the source; CAPE in MSE form.  A shallow
    # scheme caps the cloud layer: levels with sigma < sigma_top_min
    # (i.e. above the shallow-top pressure fraction) cannot be buoyant
    kidx = jnp.arange(nz)
    above = kidx >= ksrc[..., None]
    buoy = (h_u - hsat) / (CP_AIR * T_s)  # dimensionless-ish buoyancy
    buoyant = above & (buoy > 0.0)
    if params.sigma_top_min > 0.0:
        sigma_s = rev(pmid) / rev(pmid)[..., :1]  # surface-first p/ps
        buoyant = buoyant & (sigma_s >= params.sigma_top_min)
    cape = (GRAVITY * jnp.where(buoyant, buoy, 0.0) * dz_s).sum(axis=-1)

    # cloud top = highest buoyant level; cloud base = first buoyant level
    ktop = jnp.where(
        buoyant.any(axis=-1),
        (nz - 1) - jnp.argmax(buoyant[..., ::-1], axis=-1),
        0,
    )
    kbase = jnp.argmax(buoyant, axis=-1)
    active = (
        (cape > params.cape_crit)
        & buoyant.any(axis=-1)
        & (ktop >= kbase + params.min_depth_layers)
    )

    # CAPE-relaxation closure for the cloud-base mass flux, CFL-capped
    rho_b = _pick(rev(pmid), kbase) / (287.05 * _pick(T_s, kbase))
    w_conv = jnp.sqrt(jnp.maximum(cape, 0.0)) * (dt / params.tau)
    Mb = jnp.where(active, rho_b * jnp.minimum(w_conv, 0.2), 0.0)
    dm_min = dm_s.min(axis=-1)
    Mb = jnp.minimum(Mb, params.max_mass_fraction * dm_min / dt)

    # in-cloud mask (base..top) for subsidence; updraft properties
    incloud = (kidx >= kbase[..., None]) & (kidx <= ktop[..., None])
    # compensating subsidence (upwind from above, surface-first: above =
    # index k+1); zero at the column top
    X_above = lambda X: jnp.concatenate(
        [X[..., 1:], X[..., -1:]], axis=-1
    )
    sub = lambda X: jnp.where(
        incloud, Mb[..., None] * (X_above(X) - X) / dm_s, 0.0
    )
    dT_s = sub(T_s) + jnp.where(
        incloud, Mb[..., None] * GRAVITY * dz_s / CP_AIR / dm_s, 0.0
    )  # dry-adiabatic warming of subsiding air
    dq_s = sub(q_s)

    # cloud-top detrainment of the plume's saturated vapor into the
    # environment (condensate handling comes from the column closure
    # below)
    at_top = kidx == ktop[..., None]
    q_u_top = _pick(qs_s, ktop)
    dm_top = _pick(dm_s, ktop)
    dq_s = dq_s + jnp.where(
        at_top,
        (Mb * (q_u_top - _pick(q_s, ktop)))[..., None]
        / dm_top[..., None],
        0.0,
    )

    dT = rev(dT_s) * dt
    dq = rev(dq_s) * dt
    q_new = jnp.maximum(q + dq, 1e-10)
    dq = q_new - q

    # exact water closure: the column's net vapor loss all condensed;
    # a precip_efficiency fraction rains out, the rest detrains as
    # cloud water at the cloud top (SAS anvil / non-precipitating
    # shallow cumulus source of qc)
    dq_col = -(dq * dm).sum(axis=-1)
    residual = jnp.maximum(dq_col, 0.0)  # kg/m^2 vapor condensed
    precip = params.precip_efficiency * residual / dt
    at_top_rev = rev(at_top.astype(T.dtype))
    qc_det = (
        at_top_rev
        * ((1.0 - params.precip_efficiency) * residual)[..., None]
        / dm_top[..., None]
    )
    # energy closure: every kg condensed released latent heat —
    # renormalize so cp*int(dT) = L*(P dt + C_det) = L*residual,
    # distributing the correction over the convective layers
    w = jnp.where(rev(incloud), dm, 0.0)
    wsum = jnp.maximum(w.sum(axis=-1), 1.0)
    excess = LV * residual - CP_AIR * (dT * dm).sum(axis=-1)
    dT = dT + jnp.where(
        rev(incloud), excess[..., None] / (CP_AIR * wsum[..., None]), 0.0
    )
    T_new = T + dT
    if wind is None:
        return T_new, q_new, qc_det, precip
    if not params.momentum_transport:
        return T_new, q_new, qc_det, precip, jnp.zeros_like(wind)

    # ---- convective momentum transport ---------------------------------
    # plume momentum via the same entraining ascent as MSE (the leading
    # component axis rides the scan's batch dimensions)
    u_s = wind[..., ::-1]  # surface-first
    u_src = _pick(u_s, ksrc)
    _, up_z = lax.scan(
        ascend, u_src, (zl(u_s), zl(is_src), zl(eps_dz))
    )
    u_p = jnp.moveaxis(up_z, 0, -1)
    # environment: compensating subsidence + cloud-top detrainment of the
    # plume's momentum anomaly, reduced by the pressure-gradient factor
    du_s = sub(u_s)
    anomaly = (1.0 - params.pgcon) * (_pick(u_p, ktop) - _pick(u_s, ktop))
    du_s = du_s + jnp.where(
        at_top, (Mb * anomaly)[..., None] / dm_top[..., None], 0.0
    )
    # exact column-momentum closure: convection redistributes momentum,
    # it cannot create any — remove the residual uniformly (per unit
    # mass) over the convective layers
    total = (du_s * dm_s).sum(axis=-1)
    du_s = du_s - jnp.where(incloud, (total / wsum)[..., None], 0.0)
    dwind = du_s[..., ::-1] * dt
    return T_new, q_new, qc_det, precip, dwind
