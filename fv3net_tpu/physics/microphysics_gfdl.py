"""GFDL-style six-category bulk cloud microphysics, pure jnp.

The reference model family (fv3gfs-fortran, SURVEY.md §2.1 — the
submodule's ``gfdl_cloud_microphys.F90``; SHiELD production runs and the
C3072 fine-res source datasets use it) carries six water species:
vapor, cloud liquid, cloud ice, rain, snow and graupel.  This module is
an independent TPU-first implementation of that scheme family
(Lin, Farley & Orville 1983 JCAM; Rutledge & Hobbs 1984; Chen & Lin
2013 GRL; Zhou et al. 2019 BAMS "GFDL MP"), NOT a line port: the
process set, category graph, and conservation discipline follow the
published scheme, with simplified (documented) collection kernels, and
everything is vectorized over columns with the two column-sequential
parts — sedimentation — as ``lax.scan`` over the short z axis.

Design notes (TPU):
- all arrays are z-last ``[..., nz]`` with k=0 at the model top, as the
  rest of ``fv3net_tpu.physics``;
- phase-change latent heats are CONSTANT (0 C values), as in the GFDL
  scheme's internal energy bookkeeping, which makes column moist
  enthalpy ``cp*T + Lv0*qv - Lf0*(qi+qs+qg)`` close to roundoff (tested
  in tests/test_microphysics_gfdl.py);
- every transfer is a clipped move between categories: total water
  (six species + surface precipitation) closes exactly;
- sedimentation is the standard time-implicit upstream fall
  (unconditionally stable at any vt*dt/dz), one scan per call with all
  four falling species batched into the same body.

Selected by ``PhysicsConfig.microphysics_scheme = "gfdl"`` (namelist
key ``microphysics``); the Zhao-Carr scheme (microphysics.py) stays the
default because the reference's emulation experiments hook that scheme.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from jax import lax

from fv3net_tpu.core.constants import CP_AIR, GRAVITY, RDGAS, RVGAS
from fv3net_tpu.ops import thermo

EPS = RDGAS / RVGAS

# constant latent heats (0 C reference values, GFDL bookkeeping)
LV0 = 2.5e6  # J/kg vapor <-> liquid
LF0 = 3.34e5  # J/kg liquid <-> ice
LS0 = LV0 + LF0  # vapor <-> ice

T_FREEZE = 273.16
T_HOMOG = 233.16  # homogeneous freezing of cloud liquid
RHO_REF = 1.2  # kg/m3 reference air density for fall speeds


@dataclasses.dataclass(frozen=True)
class GFDLMPParams:
    """Process rates / thresholds.

    The collection (accretion) kernels are simplified to
    ``c * donor * sqrt(collector)`` power laws — the full scheme's
    gamma-function integrals over assumed size distributions reduce to
    ~q^(7/8)-type laws; sqrt keeps the same qualitative saturation
    behavior with one cheap transcendental.
    """

    n_sub: int = 2  # process/sedimentation subcycles per call
    # fast saturation adjustment
    n_adjust: int = 2
    # warm rain
    ql0: float = 1.0e-3  # kg/kg liquid autoconversion threshold
    c_praut: float = 1.0e-3  # 1/s beyond threshold
    c_pracw: float = 0.8  # rain collecting cloud water
    c_prevp: float = 1.0e-3  # rain evaporation efficiency
    # ice / snow
    qi0: float = 1.0e-4  # kg/kg ice -> snow autoconversion threshold
    c_psaut: float = 1.0e-3  # 1/s beyond threshold (colder = faster)
    c_psaci: float = 0.6  # snow collecting cloud ice
    c_psacw: float = 0.6  # snow collecting (riming) cloud water
    tau_idep: float = 600.0  # s, vapor <-> ice relaxation timescale
    # graupel
    qs0: float = 6.0e-4  # kg/kg snow -> graupel threshold
    c_pgaut: float = 1.0e-3  # 1/s beyond threshold
    c_pgacw: float = 0.8  # graupel riming cloud water
    c_pgacr: float = 0.8  # graupel collecting (freezing) rain
    c_pgfr: float = 2.0e-4  # 1/(s K) rain freezing below -2 C
    # melting / sublimation
    c_smlt: float = 8.0e-3  # 1/(s K) snow melt above 0 C
    c_gmlt: float = 4.0e-3  # 1/(s K) graupel melt above 0 C
    c_ssub: float = 5.0e-4  # snow sublimation efficiency
    # sedimentation: vt = vfac * (rho*q*1e3)^vexp * sqrt(RHO_REF/rho),
    # clipped to vmax (magnitudes per the published fall-speed laws)
    vi_fac: float = 0.8
    vi_exp: float = 0.16
    vi_max: float = 1.0
    vr_fac: float = 8.0
    vr_exp: float = 0.1364
    vr_max: float = 12.0
    vs_fac: float = 1.5
    vs_exp: float = 0.0968
    vs_max: float = 2.5
    vg_fac: float = 4.0
    vg_exp: float = 0.125
    vg_max: float = 10.0


def _qsat_water(T, p):
    es = thermo.saturation_pressure(T)
    es = jnp.minimum(es, 0.9 * p)
    return EPS * es / (p - (1.0 - EPS) * es)


def _qsat_ice(T, p):
    """Saturation over ice: Magnus-type with the ice coefficients
    (lower than over water below freezing, driving the WBF transfer)."""
    tc = T - T_FREEZE
    es = 611.2 * jnp.exp(22.587 * tc / (tc + 273.86))
    es = jnp.minimum(es, 0.9 * p)
    return EPS * es / (p - (1.0 - EPS) * es)


def _sat_adjust(T, qv, ql, qi, p, n_iter: int):
    """Fast adjustment: condensation/evaporation w.r.t. liquid
    saturation, homogeneous freezing below T_HOMOG, cloud-ice melt
    above freezing.  All with the constant latent heats."""
    for _ in range(n_iter):
        qsw = _qsat_water(T, p)
        dqsdT = LV0 * qsw / (RVGAS * T * T)
        dq = (qv - qsw) / (1.0 + (LV0 / CP_AIR) * dqsdT)
        cond = jnp.maximum(dq, 0.0)  # condense to liquid
        evap = jnp.minimum(jnp.maximum(-dq, 0.0), ql)  # evaporate liquid
        dql = cond - evap
        qv = qv - dql
        ql = ql + dql
        T = T + (LV0 / CP_AIR) * dql
    # homogeneous freezing (all liquid at T < T_HOMOG; ramp to -36 C)
    frz = ql * jnp.clip((T_HOMOG + 4.0 - T) / 4.0, 0.0, 1.0)
    ql = ql - frz
    qi = qi + frz
    T = T + (LF0 / CP_AIR) * frz
    # cloud-ice melt above freezing, limited by the available heat
    heat_room = jnp.maximum(T - T_FREEZE, 0.0) * CP_AIR / LF0
    melt = jnp.minimum(qi, heat_room)
    qi = qi - melt
    ql = ql + melt
    T = T - (LF0 / CP_AIR) * melt
    return T, qv, ql, qi


def _terminal_velocity(rho, q, fac, expo, vmax):
    """vt = fac * (rho*q*1e3)^expo * sqrt(RHO_REF/rho), clipped."""
    x = jnp.maximum(rho * q * 1.0e3, 0.0)
    vt = fac * x**expo * jnp.sqrt(RHO_REF / jnp.maximum(rho, 0.1))
    return jnp.clip(jnp.where(q > 1.0e-10, vt, 0.0), 0.0, vmax)


def _sediment(species, vts, dz, dm, dt):
    """Time-implicit upstream fall of several species at once.

    species/vts: tuples of [..., nz] mixing ratios and velocities
    (k=0 = top).  Returns (new_species tuple, surface fluxes tuple in
    kg/m^2/s).  Per layer: q_new = (q + in*dt/dm) / (1 + vt*dt/dz),
    out = q_new * vt * dm / dz — mass-exact and stable for any vt.
    """
    ns = len(species)
    xs = tuple(
        jnp.moveaxis(v, -1, 0) for v in (*species, *vts, dz, dm)
    )
    zero = jnp.zeros(species[0].shape[:-1], species[0].dtype)

    def body(carry, xs_k):
        qs_k = xs_k[:ns]
        vt_k = xs_k[ns : 2 * ns]
        dz_k, dm_k = xs_k[2 * ns], xs_k[2 * ns + 1]
        outs, new_q, fluxes = [], [], carry
        for i in range(ns):
            q_new = (qs_k[i] + fluxes[i] * dt / dm_k) / (
                1.0 + vt_k[i] * dt / dz_k
            )
            outs.append(q_new * vt_k[i] * dm_k / dz_k)  # kg/m^2/s
            new_q.append(q_new)
        return tuple(outs), tuple(new_q)

    sfc, ys = lax.scan(body, (zero,) * ns, xs)
    return tuple(jnp.moveaxis(y, 0, -1) for y in ys), sfc


def gfdl_microphysics_step(
    T, qv, ql, qi, qr, qs, qg, p, delp, dt: float,
    params: GFDLMPParams = GFDLMPParams(),
) -> Tuple[jnp.ndarray, ...]:
    """One microphysics call over z-last column arrays.

    Returns ``(T, qv, ql, qi, qr, qs, qg, rain_sfc, frozen_sfc)`` with
    the surface precipitation rates in kg/m^2/s (``frozen_sfc`` = snow +
    graupel + sedimented cloud ice reaching the surface).
    """
    dm = thermo.layer_mass(delp)
    tv = thermo.virtual_temperature(T, qv)
    rho = p / (RDGAS * tv)
    dz = dm / rho  # hydrostatic layer depth, m

    rain_sfc = jnp.zeros(T.shape[:-1], T.dtype)
    snow_sfc = jnp.zeros(T.shape[:-1], T.dtype)

    dts = dt / params.n_sub
    for _ in range(params.n_sub):
        # ---- fast adjustment --------------------------------------------
        T, qv, ql, qi = _sat_adjust(T, qv, ql, qi, p, params.n_adjust)

        cold = T < T_FREEZE
        warm_exc = jnp.maximum(T - T_FREEZE, 0.0)
        cold_exc = jnp.maximum(T_FREEZE - T, 0.0)

        def move(rate, donor):
            """Clipped transfer amount for this subcycle (kg/kg)."""
            return jnp.minimum(jnp.maximum(rate, 0.0) * dts, donor)

        # ---- warm rain ---------------------------------------------------
        praut = move(params.c_praut * (ql - params.ql0), ql)
        pracw = move(params.c_pracw * ql * jnp.sqrt(qr), ql - praut)
        ql = ql - praut - pracw
        qr = qr + praut + pracw

        # rain evaporation in subsaturated air (rate in 1/s via c_prevp,
        # capped by the rain and by the saturation deficit)
        qsw = _qsat_water(T, p)
        deficit_w = jnp.maximum(qsw - qv, 0.0)
        prevp = jnp.minimum(
            move(params.c_prevp * deficit_w * 1e3 * jnp.sqrt(qr * 1e3), qr),
            deficit_w,
        )
        qr = qr - prevp
        qv = qv + prevp
        T = T - (LV0 / CP_AIR) * prevp

        # ---- ice phase -----------------------------------------------------
        # vapor deposition onto / sublimation off cloud ice+snow where cold
        qsi = _qsat_ice(T, p)
        dq_i = (qv - qsi) / (
            1.0 + (LS0 / CP_AIR) * LS0 * qsi / (RVGAS * T * T)
        )
        relax = dts / (params.tau_idep + dts)
        has_ice_sfcarea = (qi + qs) > 1.0e-8
        pidep = jnp.where(
            cold & (has_ice_sfcarea | (dq_i > 5.0e-5)),
            dq_i * relax,
            0.0,
        )
        dep = jnp.maximum(pidep, 0.0)
        sub = jnp.minimum(jnp.maximum(-pidep, 0.0), qi)
        qi = qi + dep - sub
        qv = qv - dep + sub
        T = T + (LS0 / CP_AIR) * (dep - sub)

        # snow sublimation in subsaturated (over-ice) air: only below
        # freezing (above, melting dominates), capped by the deficit so
        # it cannot push past ice saturation
        deficit_i = jnp.maximum(qsi - qv, 0.0)
        pssub = jnp.minimum(
            move(
                jnp.where(cold, params.c_ssub, 0.0)
                * deficit_i * 1e3 * jnp.sqrt(qs * 1e3),
                qs,
            ),
            deficit_i,
        )
        qs = qs - pssub
        qv = qv + pssub
        T = T - (LS0 / CP_AIR) * pssub

        # ice -> snow autoconversion (faster when warmer ice, per the
        # scheme's exp(0.025 dT) aggregation factor)
        agg = jnp.exp(0.025 * (T - T_FREEZE))
        psaut = move(params.c_psaut * agg * (qi - params.qi0), qi)
        # snow collecting cloud ice
        psaci = move(
            params.c_psaci * agg * qi * jnp.sqrt(qs), qi - psaut
        )
        qi = qi - psaut - psaci
        qs = qs + psaut + psaci

        # riming: snow/graupel collecting cloud water.  Below freezing
        # the collected water freezes onto the collector (+Lf); above,
        # it sheds as rain (no phase change).
        psacw = move(params.c_psacw * ql * jnp.sqrt(qs), ql)
        pgacw = move(params.c_pgacw * ql * jnp.sqrt(qg), ql - psacw)
        ql = ql - psacw - pgacw
        qs = qs + jnp.where(cold, psacw, 0.0)
        qg = qg + jnp.where(cold, pgacw, 0.0)
        qr = qr + jnp.where(cold, 0.0, psacw + pgacw)
        T = T + (LF0 / CP_AIR) * jnp.where(cold, psacw + pgacw, 0.0)

        # snow -> graupel when rimed snow exceeds the threshold
        pgaut = move(params.c_pgaut * (qs - params.qs0), qs)
        qs = qs - pgaut
        qg = qg + pgaut

        # rain freezing: collected by graupel + heterogeneous freezing
        # below -2 C (both +Lf)
        pgacr = move(
            jnp.where(cold, params.c_pgacr * qr * jnp.sqrt(qg), 0.0), qr
        )
        pgfr = move(
            params.c_pgfr * jnp.maximum(cold_exc - 2.0, 0.0) * qr,
            qr - pgacr,
        )
        qr = qr - pgacr - pgfr
        qg = qg + pgacr + pgfr
        T = T + (LF0 / CP_AIR) * (pgacr + pgfr)

        # melting above freezing (-Lf), limited by the available heat
        heat_room = warm_exc * CP_AIR / LF0
        psmlt = jnp.minimum(
            move(params.c_smlt * warm_exc * jnp.sqrt(qs * 1e3), qs),
            heat_room,
        )
        pgmlt = jnp.minimum(
            move(params.c_gmlt * warm_exc * jnp.sqrt(qg * 1e3), qg),
            jnp.maximum(heat_room - psmlt, 0.0),
        )
        qs = qs - psmlt
        qg = qg - pgmlt
        qr = qr + psmlt + pgmlt
        T = T - (LF0 / CP_AIR) * (psmlt + pgmlt)

        # ---- sedimentation ----------------------------------------------
        vti = _terminal_velocity(
            rho, qi, params.vi_fac, params.vi_exp, params.vi_max
        )
        vtr = _terminal_velocity(
            rho, qr, params.vr_fac, params.vr_exp, params.vr_max
        )
        vts = _terminal_velocity(
            rho, qs, params.vs_fac, params.vs_exp, params.vs_max
        )
        vtg = _terminal_velocity(
            rho, qg, params.vg_fac, params.vg_exp, params.vg_max
        )
        (qi, qr, qs, qg), (f_i, f_r, f_s, f_g) = _sediment(
            (qi, qr, qs, qg), (vti, vtr, vts, vtg), dz, dm, dts
        )
        rain_sfc = rain_sfc + f_r * dts / dt
        snow_sfc = snow_sfc + (f_i + f_s + f_g) * dts / dt

        # closing adjustment: melt/evaporation cooling above can leave
        # transient supersaturation (the scheme ends its slow-process
        # block with a final adjustment)
        T, qv, ql, qi = _sat_adjust(T, qv, ql, qi, p, 1)

    return T, qv, ql, qi, qr, qs, qg, rain_sfc, snow_sfc


GFDL_TRACER_NAMES = ("ice_wat", "rainwat", "snowwat", "graupel")
