"""Fused whole-model step: dynamics + physics + optional in-jit ML
correction as ONE jitted function.

This is the performance path: where the reference crosses
Fortran <-> Python <-> TF per substep (reference: runtime/loop.py:633-664),
here the entire hybrid step compiles to a single XLA program — no host
round-trips, everything fused.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

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
    radiation_fn = None
    if phys_cfg.radiation_scheme == "rrtmg":
        import datetime

        from fv3net_tpu.physics.radiation.driver import (
            DriverConfig,
            RadiationDriver,
        )

        driver = RadiationDriver(DriverConfig())
        epoch = datetime.datetime(2016, 7, 1)  # isol=0: date only seeds o3

        def radiation_fn(T, delp, q, qc, t_surface, cos_zenith, lat):
            out = driver(
                epoch,
                {
                    "air_temperature": T,
                    "pressure_thickness_of_atmospheric_layer": delp,
                    "specific_humidity": q,
                    "cloud_water_mixing_ratio": qc,
                    "surface_temperature": t_surface,
                    "latitude": lat,
                    "longitude": jnp.zeros_like(lat),
                },
                cosz=cos_zenith,
            )
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
