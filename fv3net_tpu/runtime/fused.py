"""Fused whole-model step: dynamics + physics + optional in-jit ML
correction as ONE jitted function.

This is the performance path: where the reference crosses
Fortran <-> Python <-> TF per substep (reference: runtime/loop.py:633-664),
here the entire hybrid step compiles to a single XLA program — no host
round-trips, everything fused.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from fv3net_tpu.dycore import DycoreConfig, dynamics_step
from fv3net_tpu.dycore.core import GridArrays
from fv3net_tpu.dycore.state import (
    DycoreState,
    temperature_from_theta_v,
    theta_v_from_temperature,
)
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics import PhysicsConfig, physics_step


def ml_correction_fn(model) -> Tuple[Callable, object]:
    """From a fit.DenseModel, build a pure (params, state) -> state
    function applying dQ1/dQ2 corrective tendencies inside jit — the
    PureMLStepper hot path without its Python/Dataset boundary."""
    from fv3net_tpu.fit import packer

    def apply(params, state: DycoreState, pmid, dt: float) -> DycoreState:
        q = state.tracers["sphum"]
        T = temperature_from_theta_v(state.pt, pmid, q)
        cols = {
            "air_temperature": packer.stack_columns(T),
            "specific_humidity": packer.stack_columns(q),
        }
        X, _ = packer.pack(cols, model.input_variables)
        Y = model.apply_packed(params, X)
        out = packer.unpack(Y, model.output_info)
        grid_shape = (T.shape[0], T.shape[2], T.shape[3])
        dQ1 = packer.unstack_columns(out["dQ1"], grid_shape)
        dQ2 = packer.unstack_columns(out["dQ2"], grid_shape)
        # MSE-conserving non-negative humidity limiter
        dQ2, dQ1 = thermo.non_negative_sphum_mse_conserving(q, dQ2, dt, q1=dQ1)
        T = T + dt * dQ1
        q = q + dt * dQ2
        tracers = dict(state.tracers)
        tracers["sphum"] = q
        return dataclasses.replace(
            state, pt=theta_v_from_temperature(T, pmid, q), tracers=tracers
        )

    return apply, model.params


def _build_radiation_fn(phys_cfg: PhysicsConfig) -> Optional[Callable]:
    """The band-solver closure handed to physics_step (None for the
    default gray scheme, which physics_step computes internally).

    scheme "rrtmg" = the real RRTMG solvers (rrtmg/driver.py,
    oracle-validated); "synthband" = the compact synthetic band model
    (physics/radiation/driver.py)."""
    if phys_cfg.radiation_scheme not in ("rrtmg", "synthband"):
        return None
    import datetime

    if phys_cfg.radiation_scheme == "rrtmg":
        from fv3net_tpu.physics.radiation.rrtmg.driver import (
            RRTMGConfig,
            RRTMGDriver,
        )

        driver = RRTMGDriver(RRTMGConfig())
    else:
        from fv3net_tpu.physics.radiation.driver import (
            DriverConfig,
            RadiationDriver,
        )

        driver = RadiationDriver(DriverConfig())
    epoch = datetime.datetime(2016, 7, 1)  # isol=0: date only seeds o3

    def radiation_fn(T, delp, q, qc, t_surface, cos_zenith, lat, o3=None,
                     land=None, ice=None):
        state = {
            "air_temperature": T,
            "pressure_thickness_of_atmospheric_layer": delp,
            "specific_humidity": q,
            "cloud_water_mixing_ratio": qc,
            "surface_temperature": t_surface,
            "latitude": lat,
            "longitude": jnp.zeros_like(lat),
        }
        if o3 is not None:  # prognostic o3mr tracer reaches the bands
            state["ozone_mixing_ratio"] = o3
        if land is not None:
            state["land_sea_mask"] = land
        if ice is not None:  # sea-ice albedo feedback
            state["ice_fraction"] = ice
        out = driver(epoch, state, cosz=cos_zenith)
        heating = out["tendency_of_air_temperature_due_to_radiation"]
        return heating, {
            "ULWRFtoa": out[
                "total_sky_upward_longwave_flux_at_top_of_atmosphere_python"
            ],
            "USWRFtoa": out[
                "total_sky_upward_shortwave_flux_at_top_of_atmosphere_python"
            ],
            "DSWRFsfc": out[
                "total_sky_downward_shortwave_flux_at_surface_python"
            ],
            "DLWRFsfc": out[
                "total_sky_downward_longwave_flux_at_surface_python"
            ],
        }

    return radiation_fn


def build_fused_step(
    g: GridArrays,
    ak: jnp.ndarray,
    bk: jnp.ndarray,
    dyn_cfg: DycoreConfig,
    phys_cfg: PhysicsConfig,
    ml_apply: Optional[Callable] = None,
):
    """Returns jitted step(state, ml_params, t_surface, cos_zenith) ->
    state."""
    from fv3net_tpu.dycore.core import validate_acoustic_cfl

    validate_acoustic_cfl(g, dyn_cfg)
    radiation_fn = _build_radiation_fn(phys_cfg)

    def step(state: DycoreState, ml_params, t_surface, cos_zenith):
        state = dynamics_step(state, g, ak, bk, dyn_cfg)
        state, _ = physics_step(
            state, t_surface, cos_zenith, g.lat, dyn_cfg.dt, phys_cfg,
            radiation_fn=radiation_fn,
        )
        if ml_apply is not None:
            delp_c = jnp.moveaxis(state.delp, 1, -1)
            pmid = jnp.moveaxis(
                thermo.pressure_at_midpoint_log(
                    delp_c, toa_pressure=dyn_cfg.ptop
                ),
                -1,
                1,
            )
            state = ml_apply(ml_params, state, pmid, dyn_cfg.dt)
        return state

    return jax.jit(step)


def build_fused_multi_step(
    g: GridArrays,
    ak: jnp.ndarray,
    bk: jnp.ndarray,
    dyn_cfg: DycoreConfig,
    phys_cfg: PhysicsConfig,
    ml_apply: Optional[Callable] = None,
    n_steps: int = 8,
    radiation_interval: int = 1,
):
    """``n_steps`` model steps as ONE jitted lax.scan, computing radiation
    only every ``radiation_interval`` steps and reusing the stored heating
    rates and fluxes in between — standard NWP practice (GFS calls RRTMG
    hourly against a 900 s dt_atmos; the reference's Fortran side does the
    same via its own radiation interval namelist, exposed to the config at
    SURVEY §2.8 FortranFileConfig).  Cuts the in-loop cost of the band
    solvers by ~the interval factor.

    Returns jitted fn(state, ml_params, t_surface, cos_zenith) -> state.
    """
    from fv3net_tpu.dycore.core import validate_acoustic_cfl

    validate_acoustic_cfl(g, dyn_cfg)
    base_radiation = _build_radiation_fn(phys_cfg)
    if base_radiation is None:
        from fv3net_tpu.physics import radiation_gray as _gray

        def base_radiation(T, delp, q, qc, t_surface, cos_zenith, lat,
                           o3=None):
            return _gray.gray_radiation(
                T, delp, t_surface, cos_zenith, lat, phys_cfg.radiation
            )

    def rad_inputs(state: DycoreState):
        delp = jnp.moveaxis(state.delp, 1, -1)
        q = jnp.moveaxis(state.tracers["sphum"], 1, -1)
        qc = jnp.moveaxis(state.tracers["cloud_water"], 1, -1)
        pmid = thermo.pressure_at_midpoint_log(
            delp, toa_pressure=dyn_cfg.ptop
        )
        pt = jnp.moveaxis(state.pt, 1, -1)
        T = temperature_from_theta_v(pt, pmid, q)
        o3 = (
            jnp.moveaxis(state.tracers["o3mr"], 1, -1)
            if "o3mr" in state.tracers
            else None
        )
        return T, delp, q, qc, o3

    def multi(state: DycoreState, ml_params, t_surface, cos_zenith):
        T0, delp0, q0, qc0, o30 = rad_inputs(state)
        # cache pytree structure without paying for a solve
        shapes = jax.eval_shape(
            base_radiation, T0, delp0, q0, qc0, t_surface, cos_zenith,
            g.lat, o30
        )
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )

        def body(carry, i):
            s, cache = carry
            s = dynamics_step(s, g, ak, bk, dyn_cfg)
            T, delp, q, qc, o3 = rad_inputs(s)
            cache = jax.lax.cond(
                i % radiation_interval == 0,
                lambda _: base_radiation(
                    T, delp, q, qc, t_surface, cos_zenith, g.lat, o3
                ),
                lambda _: cache,
                None,
            )
            heating, rdiags = cache
            s, _ = physics_step(
                s, t_surface, cos_zenith, g.lat, dyn_cfg.dt, phys_cfg,
                radiation_fn=lambda *_a, **_k: (heating, rdiags),
            )
            if ml_apply is not None:
                delp_c = jnp.moveaxis(s.delp, 1, -1)
                pmid = jnp.moveaxis(
                    thermo.pressure_at_midpoint_log(
                        delp_c, toa_pressure=dyn_cfg.ptop
                    ),
                    -1,
                    1,
                )
                s = ml_apply(ml_params, s, pmid, dyn_cfg.dt)
            return (s, cache), None

        (state, _), _ = jax.lax.scan(
            body, (state, cache0), jnp.arange(n_steps)
        )
        return state

    return jax.jit(multi)
