"""Physics driver: radiation -> surface -> PBL -> microphysics.

The jittable pure-function replacement for the reference's Fortran
physics sequence (``step_pre_radiation`` / ``step_radiation`` /
``step_post_radiation_physics`` / ``apply_physics``, reference:
workflows/prognostic_c48_run/runtime/loop.py:384-426).  Operates on the
dycore state (dynamics layout [6, nz, ny, nx]); internally transposes to
z-last columns so every scheme is batched over all 6*ny*nx columns.

Diagnostics use the reference's physics naming conventions
(e.g. ``PRATEsfc``, ``LHTFLsfc``, ``SHTFLsfc``, flux names as in
external/vcm/vcm/derived_mapping.py:198-383).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from fv3net_tpu.core.constants import CP_AIR, GRAVITY, KAPPA, REFERENCE_SURFACE_PRESSURE
from fv3net_tpu.dycore.state import (
    DycoreState,
    temperature_from_theta_v,
    theta_v_from_temperature,
)
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics import convection as conv
from fv3net_tpu.physics import convection_mf as cmf
from fv3net_tpu.physics import gravity_wave_drag as gwd_mod
from fv3net_tpu.physics import microphysics as mp
from fv3net_tpu.physics import microphysics_gfdl as mp_gfdl
from fv3net_tpu.physics import pbl as pbl_mod
from fv3net_tpu.physics import radiation_gray as rad
from fv3net_tpu.physics import surface as sfc
from fv3net_tpu.physics import surface_layer as sl_mod


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    ptop: float = 300.0
    # "gray" (Frierson gray gas) or "rrtmg" (the band solvers in
    # fv3net_tpu.physics.radiation; wired by runtime/fused.py which
    # builds the spectral data once and passes radiation_fn)
    radiation_scheme: str = "gray"
    radiation: rad.GrayRadiationParams = rad.GrayRadiationParams()
    surface: sfc.SurfaceParams = sfc.SurfaceParams()
    pbl: pbl_mod.PBLParams = pbl_mod.PBLParams()
    # GFS-fidelity boundary layer: "monin_obukhov" surface similarity +
    # "kprofile" nonlocal Hong-Pan PBL (the GFS sfc_diff + moninedmf
    # stages); "bulk"/"ramp" select the simpler round-1 schemes
    surface_scheme: str = "monin_obukhov"
    pbl_scheme: str = "kprofile"
    surface_layer: sl_mod.SurfaceLayerParams = sl_mod.SurfaceLayerParams()
    kprofile: pbl_mod.KProfileParams = pbl_mod.KProfileParams()
    microphysics: mp.MicrophysicsParams = mp.MicrophysicsParams()
    # "zhao_carr" (default; the scheme the reference's emulation hooks
    # target) or "gfdl" (six-category bulk scheme,
    # physics/microphysics_gfdl.py; requires the ice_wat/rainwat/
    # snowwat/graupel tracers in the state)
    microphysics_scheme: str = "zhao_carr"
    gfdl_mp: mp_gfdl.GFDLMPParams = mp_gfdl.GFDLMPParams()
    convection: conv.ConvectionParams = conv.ConvectionParams()
    use_convection: bool = True
    # "betts_miller" (default adjustment scheme) or "mass_flux" (the
    # SAS-family entraining-plume scheme in physics/convection_mf.py,
    # the GFS deep-convection stage's structure)
    convection_scheme: str = "betts_miller"
    mass_flux: cmf.MassFluxParams = cmf.MassFluxParams()
    # GFS shalcnv-style shallow cumulus (runs after deep convection,
    # confined below ~0.65 p/ps, detrains all condensate into qc)
    use_shallow_convection: bool = True
    shallow: cmf.MassFluxParams = cmf.SHALLOW_PARAMS
    # orographic gravity-wave drag (active where the caller provides a
    # nonzero subgrid-orography field, see physics_step's ``sgh``)
    gwd: gwd_mod.GWDParams = gwd_mod.GWDParams()
    use_gwd: bool = True
    # stratospheric methane-oxidation water source (GFS h2o_phys role,
    # physics/h2ophys.py); off by default — it adds water mass
    stratospheric_h2o: bool = False
    # stratospheric thermal sponge: Newtonian relaxation of T toward
    # ``top_sponge_tref`` with a weight ramping linearly from 0 at
    # ``top_sponge_pa`` to 1 at p=0 — an upper-boundary option for
    # untuned middle-atmosphere radiation.  OFF by default since r4:
    # the r3 day-21 coupled blow-up attributed to "~6 K/day synthetic-
    # k-table heating" was re-measured after the r3 Rayleigh-sponge
    # default landed — the clear-sky stratospheric budget of the
    # synthetic tables is in fact weakly STABILIZING (net cooling
    # growing with T, equilibrium ~190-235 K, |rates| <= 0.3 K/day on
    # the 3-profile battery; scripts/calibrate_ktables.py + the 30-day
    # sponge-off soak in docs/acceptance.md), so the wind sponge alone
    # bounds the top of model and the thermal crutch is retired
    # (r3 verdict #7).  Set top_sponge_days>0 to re-enable.
    top_sponge_pa: float = 10000.0
    top_sponge_days: float = 0.0
    top_sponge_tref: float = 235.0
    # stratospheric EDDY damping: relax T toward its instantaneous
    # per-level GLOBAL MEAN above ``strat_eddy_damp_pa`` (linear ramp
    # to p=0) with timescale ``strat_eddy_damp_days``.  Unlike the
    # retired top_sponge this does NOT touch the level-mean temperature
    # — the radiative calibration still governs <T>(p) — it only damps
    # meridional structure/waves, standing in for the scale-selective
    # radiative damping (tau_rad ~ 5-10 d, Dickinson 1973) that the
    # synthetic k-tables' weak Planck-feedback anisotropy cannot
    # supply.  Without it, multi-week coupled soaks over topography
    # build an unbounded lower-stratospheric jet (thermal wind of the
    # unchecked polar-night gradient) that breaks the model at days
    # ~22-26 (r5 soak_debug bisection: top sponges only move the
    # breaking level below themselves).  0 disables.
    strat_eddy_damp_days: float = 1.0
    strat_eddy_damp_pa: float = 25000.0
    # bulk TOA calibration of the synthetic k-distributions: the
    # production solar constant is 1368.22 * solcon_scale.  Measured
    # (scripts/toa_balance.py, C48 coupled day-0 climate): OLR 313.4
    # vs 322.1 W/m^2 absorbed solar -> +8.7 W/m^2 net heating, which
    # the water-vapor feedback amplified into a +6 K/month coupled
    # drift; 0.973 zeros the initial imbalance.  The f64 oracle path
    # (RRTMGConfig default) is untouched
    solcon_scale: float = 0.973


def _zlast(x):
    """[6, nz, ny, nx] -> [6, ny, nx, nz]."""
    return jnp.moveaxis(x, 1, -1)


def _zmid(x):
    return jnp.moveaxis(x, -1, 1)


def physics_step(
    state: DycoreState,
    t_surface: jnp.ndarray,  # [6, ny, nx]
    cos_zenith: jnp.ndarray,  # [6, ny, nx]
    lat: jnp.ndarray,  # [6, ny, nx] radians
    dt: float,
    cfg: PhysicsConfig = PhysicsConfig(),
    microphysics_emulator=None,
    gscond_emulator=None,
    emulator_piggy_back: bool = False,
    radiation_fn=None,
    sgh=None,  # [6, ny, nx] subgrid-orography std (m) enables GWD
    evap_factor=None,  # [6, ny, nx] bucket-land beta (physics/land.py)
    land_frac=None,  # [6, ny, nx] land fraction for the radiation surface
    ice_frac=None,  # [6, ny, nx] sea-ice fraction (albedo feedback)
) -> Tuple[DycoreState, Dict[str, jnp.ndarray]]:
    """Apply one physics interval; returns (new_state, diagnostics).

    ``microphysics_emulator``: optional callable replacing the native
    Zhao-Carr scheme (the call_py_fort emulation slot, reference
    external/emulation/emulation/__init__.py:1-18).  It receives the
    z-last column state dict {air_temperature, specific_humidity,
    cloud_water_mixing_ratio, pressure} and returns the same dict with
    its updates applied (see fv3net_tpu.emulation.MicrophysicsEmulator);
    precipitation diagnostics then come from the implied column drying.
    """
    # coerce auxiliary inputs to the state dtype: under jax_enable_x64
    # callers easily hand f64 lat/SST (np geometry) alongside an f32
    # state, and the mix breaks scan carries downstream (PBL solve)
    dtype = state.pt.dtype
    t_surface = jnp.asarray(t_surface, dtype)
    cos_zenith = jnp.asarray(cos_zenith, dtype)
    lat = jnp.asarray(lat, dtype)
    if sgh is not None:
        sgh = jnp.asarray(sgh, dtype)
    if evap_factor is not None:
        evap_factor = jnp.asarray(evap_factor, dtype)
    if land_frac is not None:
        land_frac = jnp.asarray(land_frac, dtype)
    if ice_frac is not None:
        ice_frac = jnp.asarray(ice_frac, dtype)

    delp = _zlast(state.delp)
    pt = _zlast(state.pt)
    q = _zlast(state.tracers["sphum"])
    qc = _zlast(state.tracers["cloud_water"])
    wind = jnp.stack([_zlast(state.wind[c]) for c in range(3)])

    gfdl_mode = cfg.microphysics_scheme == "gfdl"
    if gfdl_mode:
        # six-category mode: "cloud_water" is the LIQUID species
        # (GFS liq_wat) and the four extra species must be in the state
        missing = [
            k for k in mp_gfdl.GFDL_TRACER_NAMES if k not in state.tracers
        ]
        if missing:
            raise ValueError(
                "microphysics_scheme='gfdl' needs tracers "
                f"{mp_gfdl.GFDL_TRACER_NAMES}, missing {missing} "
                "(see runtime config: microphysics namelist key)"
            )
        if microphysics_emulator is not None or gscond_emulator is not None:
            raise ValueError(
                "the microphysics emulation hooks target the Zhao-Carr "
                "scheme; use microphysics_scheme='zhao_carr'"
            )
        qi_g = _zlast(state.tracers["ice_wat"])
        qr_g = _zlast(state.tracers["rainwat"])
        qs_g = _zlast(state.tracers["snowwat"])
        qg_g = _zlast(state.tracers["graupel"])

    pe = thermo.pressure_at_interface(delp, toa_pressure=cfg.ptop)
    pmid = thermo.pressure_at_midpoint_log(delp, toa_pressure=cfg.ptop)
    T = temperature_from_theta_v(pt, pmid, q)
    T0, q0 = T, q

    # ---- radiation ------------------------------------------------------
    # ``radiation_fn``: optional override (the rrtmg band solvers built by
    # runtime/fused.py) with signature
    # (T, delp, q, qc, t_surface, cos_zenith, lat) -> (heating, diags)
    if radiation_fn is not None:
        o3_rad = (
            _zlast(state.tracers["o3mr"])
            if "o3mr" in state.tracers
            else None
        )
        # in six-category mode the radiation's condensate path is
        # liquid + cloud ice (its internal T-ramp then splits optics)
        qc_rad = qc + qi_g if gfdl_mode else qc
        heating, rad_diags = radiation_fn(
            T, delp, q, qc_rad, t_surface, cos_zenith, lat, o3=o3_rad,
            land=land_frac, ice=ice_frac,
        )
    else:
        albedo = None
        if ice_frac is not None:
            # sea-ice albedo feedback for the gray scheme: blend the
            # broadband ice albedo over the icy fraction
            albedo = (
                cfg.radiation.albedo
                + ice_frac * (0.60 - cfg.radiation.albedo)
            )
        heating, rad_diags = rad.gray_radiation(
            T, delp, t_surface, cos_zenith, lat, cfg.radiation,
            albedo=albedo,
        )
    T = T + dt * heating

    if cfg.top_sponge_days > 0:
        # upper-boundary Newtonian relaxation (see PhysicsConfig note)
        w_sp = jnp.clip(
            (cfg.top_sponge_pa - pmid) / cfg.top_sponge_pa, 0.0, 1.0
        )
        rate = w_sp * (dt / (cfg.top_sponge_days * 86400.0))
        T = T + rate * (cfg.top_sponge_tref - T)

    if cfg.strat_eddy_damp_days > 0:
        # relax toward the per-level global mean (see PhysicsConfig
        # note): mean-preserving eddy damping of the stratosphere.
        # Plain cell mean over the cube (bounded-area-ratio cells) —
        # this is a damping closure, not a conservation statement
        w_ed = jnp.clip(
            (cfg.strat_eddy_damp_pa - pmid) / cfg.strat_eddy_damp_pa,
            0.0, 1.0,
        )
        t_bar = T.mean(axis=tuple(range(T.ndim - 1)))  # [nz]
        rate = w_ed * (dt / (cfg.strat_eddy_damp_days * 86400.0))
        T = T + rate * (t_bar - T)

    # ---- surface fluxes -------------------------------------------------
    wind_sfc = wind[..., -1]
    speed = jnp.sqrt((wind_sfc ** 2).sum(axis=0))
    if cfg.surface_scheme == "monin_obukhov":
        fluxes = sl_mod.monin_obukhov_fluxes(
            T[..., -1], q[..., -1], pe[..., -1], delp[..., -1], speed,
            t_surface, cfg.surface_layer, land_frac=land_frac,
            evap_factor=evap_factor,
        )
    else:
        fluxes = sfc.bulk_surface_fluxes(
            T[..., -1], q[..., -1], pe[..., -1], delp[..., -1], speed,
            t_surface, cfg.surface, evap_factor=evap_factor,
        )
    mass_sfc = delp[..., -1] / GRAVITY
    T = T.at[..., -1].add(dt * fluxes["SHTFLsfc"] / (CP_AIR * mass_sfc))
    q = q.at[..., -1].add(dt * fluxes["evaporation"] / mass_sfc)
    drag = jnp.exp(-dt * fluxes["drag_factor"])
    wind = wind.at[..., -1].multiply(drag[None])

    # ---- PBL implicit diffusion ----------------------------------------
    dz = jnp.abs(thermo.hydrostatic_dz(T, q, delp, toa_pressure=cfg.ptop))
    dz_if = 0.5 * (dz[..., :-1] + dz[..., 1:])
    dm = thermo.layer_mass(delp)
    theta_d = T * (REFERENCE_SURFACE_PRESSURE / pmid) ** KAPPA
    hpbl = None
    if cfg.pbl_scheme == "kprofile" and "ustar" in fluxes:
        thv = thermo.virtual_temperature(theta_d, q)
        spd_prof = jnp.sqrt((wind ** 2).sum(axis=0))
        K_m, K_h, gamma, hpbl = pbl_mod.kprofile_diffusivity(
            thv, spd_prof, dz, fluxes["ustar"], fluxes["obukhov_inv"],
            fluxes["hpbl_flux"], cfg.kprofile,
        )
        # explicit countergradient (nonlocal) heat flux within the PBL:
        # F_i = rho_i K_h_i gamma_i upward at interior interfaces
        rho_if = 0.5 * (dm[..., :-1] + dm[..., 1:]) / jnp.maximum(
            dz_if, 1e-3
        )
        F = rho_if * K_h * gamma  # [K kg/m^2/s], positive upward
        zero = jnp.zeros_like(F[..., :1])
        F_pad = jnp.concatenate([zero, F, zero], axis=-1)
        theta_d = theta_d + dt * (F_pad[..., 1:] - F_pad[..., :-1]) / dm
    else:
        sigma_if = (pe[..., 1:-1]) / pe[..., -1:]
        K_m = K_h = pbl_mod.diffusivity_profile(sigma_if, cfg.pbl)
    theta_d = pbl_mod.implicit_diffusion(theta_d, K_h, dz_if, dm, dt)
    T = theta_d * (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    q = pbl_mod.implicit_diffusion(q, K_h, dz_if, dm, dt)
    wind = jnp.stack(
        [
            pbl_mod.implicit_diffusion(wind[c], K_m, dz_if, dm, dt)
            for c in range(3)
        ]
    )

    # ---- orographic gravity-wave drag -----------------------------------
    if cfg.use_gwd and sgh is not None:
        dwind, tau_gwd = gwd_mod.orographic_gwd(
            wind, T, delp, pmid, jnp.asarray(sgh), dt, cfg.gwd
        )
        wind = wind + dt * dwind

    # ---- moist convection (Betts-Miller adjustment) ---------------------
    conv_precip = jnp.zeros_like(t_surface)
    if cfg.use_convection:
        if cfg.convection_scheme == "mass_flux":
            T, q, qc_det, conv_precip, dwind = cmf.mass_flux_convection(
                T, q, pmid, delp, dt, cfg.mass_flux, wind=wind
            )
            qc = qc + qc_det  # detrained anvil condensate
            wind = wind + dwind  # convective momentum transport
        else:
            T, q, conv_precip = conv.betts_miller(
                T, q, pmid, delp, dt, cfg.convection
            )
        if cfg.use_shallow_convection:
            T, q, qc_det_sh, p_sh, dwind_sh = cmf.mass_flux_convection(
                T, q, pmid, delp, dt, cfg.shallow, wind=wind
            )
            qc = qc + qc_det_sh  # detrained condensate -> qc
            # SHALLOW_PARAMS has precip_efficiency=0 so p_sh is zero,
            # but a user-configured precipitating shallow scheme must
            # still close the column water budget
            conv_precip = conv_precip + p_sh
            wind = wind + dwind_sh

    # ---- microphysics ---------------------------------------------------
    def _emulator_result(emulator):
        emu_state = {
            "air_temperature": T,
            "specific_humidity": q,
            "cloud_water_mixing_ratio": qc,
            "pressure": pmid,
        }
        out = emulator(emu_state)
        T_e = out["air_temperature"]
        q_e = out["specific_humidity"]
        qc_e = out.get("cloud_water_mixing_ratio", qc)
        return T_e, q_e, qc_e

    emu_diags = {}  # merged into diags once rad_diags seed it below

    def _zhao_carr_diags(source, T_s, q_s, qc_s, precip_s, stage="zhao_carr"):
        # piggy-backed per-source tendency diagnostics, named as the
        # reference emulation diags expect (reference
        # diagnostics/prognostic_run/emulation/tendencies.py:4-20)
        emu_diags[f"tendency_of_air_temperature_due_to_{stage}_{source}"] = _zmid(
            (T_s - T) / dt
        )
        emu_diags[f"tendency_of_specific_humidity_due_to_{stage}_{source}"] = _zmid(
            (q_s - q) / dt
        )
        emu_diags[f"tendency_of_cloud_water_due_to_{stage}_{source}"] = _zmid(
            (qc_s - qc) / dt
        )
        if precip_s is not None:
            emu_diags[f"surface_precipitation_due_to_{stage}_{source}"] = precip_s

    if gfdl_mode:
        gfdl_params = cfg.gfdl_mp or mp_gfdl.GFDLMPParams()
        (
            T, q, qc, qi_g, qr_g, qs_g, qg_g, rain_g, frozen_g,
        ) = mp_gfdl.gfdl_microphysics_step(
            T, q, qc, qi_g, qr_g, qs_g, qg_g, pmid, delp, dt, gfdl_params
        )
        precip = rain_g + frozen_g
        snow = frozen_g
    elif microphysics_emulator is None and gscond_emulator is None:
        T, q, qc, precip, snow = mp.microphysics_step(
            T, q, qc, pmid, delp, dt, cfg.microphysics
        )
    elif gscond_emulator is not None:
        # the reference's finer hook point: emulate ONLY the
        # grid-scale condensation stage (call_py_fort 'gscond' hook,
        # emulation/config.py:309-324), run precpd natively
        T_e, q_e, qc_e = _emulator_result(gscond_emulator)
        if emulator_piggy_back:
            # run the native stage too; the NATIVE result advances the
            # state and both sources are emitted for offline skill
            # evaluation (reference emulation/single_run.py semantics)
            T_n, q_n, qc_n = mp.gscond(T, q, qc, pmid, dt, cfg.microphysics)
            _zhao_carr_diags("emulator", T_e, q_e, qc_e, None, "gscond")
            _zhao_carr_diags("physics", T_n, q_n, qc_n, None, "gscond")
            T_g, q_g, qc_g = T_n, q_n, qc_n
        else:
            T_g, q_g, qc_g = T_e, q_e, qc_e
        T, q, qc, precip, snow = mp.precpd(
            T_g, q_g, qc_g, pmid, delp, dt, cfg.microphysics
        )
    else:
        T_e, q_e, qc_e = _emulator_result(microphysics_emulator)
        # implied surface precipitation from total-water convergence
        dm = thermo.layer_mass(delp)
        dq_col_e = ((q + qc) - (q_e + qc_e)) * dm
        precip_e = jnp.maximum(dq_col_e.sum(axis=-1) / dt, 0.0)
        if emulator_piggy_back:
            T_n, q_n, qc_n, precip_n, snow_n = mp.microphysics_step(
                T, q, qc, pmid, delp, dt, cfg.microphysics
            )
            _zhao_carr_diags("emulator", T_e, q_e, qc_e, precip_e)
            _zhao_carr_diags("physics", T_n, q_n, qc_n, precip_n)
            T, q, qc, precip, snow = T_n, q_n, qc_n, precip_n, snow_n
        else:
            T, q, qc = T_e, q_e, qc_e
            precip = precip_e
            snow = jnp.zeros_like(precip)

    # ---- stratospheric methane-oxidation water (GFS h2o_phys) -----------
    if cfg.stratospheric_h2o:
        from fv3net_tpu.physics import h2ophys as h2o_mod

        q = q + dt * h2o_mod.h2o_tendency(q, pmid)

    # ---- linearized ozone photochemistry --------------------------------
    skip_tracers = {"sphum", "cloud_water"}
    if gfdl_mode:
        skip_tracers.update(mp_gfdl.GFDL_TRACER_NAMES)
    extra_tracers = {
        k: v for k, v in state.tracers.items() if k not in skip_tracers
    }
    if "o3mr" in extra_tracers:
        from fv3net_tpu.physics import ozone as o3_mod

        o3 = _zlast(extra_tracers["o3mr"])
        do3 = o3_mod.ozone_tendency(o3, pmid, lat)
        extra_tracers["o3mr"] = _zmid(jnp.maximum(o3 + dt * do3, 0.0))

    pt_new = theta_v_from_temperature(T, pmid, q)
    delz_new = state.delz
    if state.delz is not None:
        # physics heats at constant pressure: the layer expands by the
        # virtual-temperature ratio, keeping the equation-of-state
        # nonhydrostatic perturbation from jumping at the physics boundary
        tv_ratio = thermo.virtual_temperature(T, q) / thermo.virtual_temperature(
            T0, q0
        )
        delz_new = state.delz * _zmid(tv_ratio)
    new_state = DycoreState(
        delp=state.delp,
        pt=_zmid(pt_new),
        wind=jnp.stack([_zmid(wind[c]) for c in range(3)]),
        # additional tracers (o3mr, ...) pass through — the dycore
        # transports every tracer in the dict
        tracers={
            **extra_tracers,
            "sphum": _zmid(q),
            "cloud_water": _zmid(qc),
            **(
                {
                    "ice_wat": _zmid(qi_g),
                    "rainwat": _zmid(qr_g),
                    "snowwat": _zmid(qs_g),
                    "graupel": _zmid(qg_g),
                }
                if gfdl_mode
                else {}
            ),
        },
        phis=state.phis,
        w=state.w,
        delz=delz_new,
    )

    diags = dict(rad_diags)
    diags.update(emu_diags)
    if cfg.use_gwd and sgh is not None:
        diags["taugwd"] = tau_gwd  # launched mountain-wave stress, N/m^2
    if hpbl is not None:
        diags["HPBLsfc"] = hpbl  # diagnosed PBL depth, m (GFS name)
    diags["PRATEsfc"] = precip + conv_precip
    diags["CPRATsfc"] = conv_precip  # convective precip (GFS diag name)
    diags["SNOWsfc"] = snow  # frozen precip rate, kg/m^2/s
    diags["LHTFLsfc"] = fluxes["LHTFLsfc"]
    diags["SHTFLsfc"] = fluxes["SHTFLsfc"]
    diags["evaporation"] = fluxes["evaporation"]  # kg/m^2/s (bucket budget)
    diags["tendency_of_air_temperature_due_to_fv3_physics"] = _zmid(
        (T - T0) / dt
    )
    diags["tendency_of_specific_humidity_due_to_fv3_physics"] = _zmid(
        (q - q0) / dt
    )
    return new_state, diags
