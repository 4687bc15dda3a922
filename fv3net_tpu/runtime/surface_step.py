"""One physics interval INCLUDING the prognostic surface updates, as a
pure jittable function.

This is the single implementation shared by the per-step TimeLoop path
(`TimeLoop._step_physics`) and the fused production chunk
(`runtime/fused.py::build_fused_production_chunk`) — extracting it is what
lets an ML-corrected run with a real surface (slab ocean / sea ice /
bucket land / Noah soil) execute inside one jitted lax.scan chunk instead
of dropping to per-step dispatch (reference semantics:
workflows/prognostic_c48_run/runtime/loop.py:633-664).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from fv3net_tpu.dycore.state import DycoreState
from fv3net_tpu.physics import PhysicsConfig, physics_step
from fv3net_tpu.runtime import names


def surface_coupling_factors(
    surface: Dict[str, jnp.ndarray], nml
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """(evap_factor, ice_frac) from the current surface state.

    evap_factor: land evaporation efficiency (Noah beta over soil
    moisture, or the bucket beta), 1 over ocean.  ice_frac: sea-ice
    fraction for the radiative albedo feedback, with snow-covered land
    blended in under the Noah model.
    """
    evap_factor = None
    mask = surface.get(names.MASK)
    if nml.land_model == "noah":
        from fv3net_tpu.physics.soil import evaporation_efficiency as noah_beta

        beta = noah_beta(surface["soil_moisture_layers"])
        evap_factor = (
            beta if mask is None else jnp.where(mask > 0.5, beta, 1.0)
        )
    elif nml.bucket_land:
        from fv3net_tpu.physics.land import (
            BucketLandParams,
            evaporation_efficiency,
        )

        land_p = BucketLandParams(field_capacity_m=nml.bucket_capacity_m)
        beta = evaporation_efficiency(surface["soil_moisture"], land_p)
        evap_factor = (
            beta if mask is None else jnp.where(mask > 0.5, beta, 1.0)
        )

    ice_frac = None
    if nml.sea_ice:
        from fv3net_tpu.physics.sea_ice import ice_fraction

        ice_frac = ice_fraction(surface["ice_thickness"])
    if nml.land_model == "noah":
        # snow-covered land is radiatively white like sea ice: blend the
        # snow cover into the high-albedo fraction
        from fv3net_tpu.physics.soil import snow_cover_fraction

        snow_cov = snow_cover_fraction(surface["snow_water_equivalent"])
        if mask is not None:
            snow_cov = jnp.where(mask > 0.5, snow_cov, 0.0)
        ice_frac = (
            snow_cov if ice_frac is None else jnp.maximum(ice_frac, snow_cov)
        )
    return evap_factor, ice_frac


def physics_with_surface(
    dycore: DycoreState,
    surface: Dict[str, jnp.ndarray],
    cosz: jnp.ndarray,
    lat: jnp.ndarray,
    dt: float,
    nml,
    phys_cfg: PhysicsConfig,
    radiation_fn=None,
    microphysics_emulator=None,
    gscond_emulator=None,
    emulator_piggy_back: bool = False,
) -> Tuple[DycoreState, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """One physics interval + the prognostic surface updates, pure.

    Returns (new_dycore, new_surface, raw_diags).  ``surface`` is not
    mutated; the returned dict carries the updated prognostic surface
    fields (TSFC/SST under slab ocean, ice thickness, soil/snow states,
    per-step TOTAL_PRECIP accumulation).
    """
    surface = dict(surface)
    mask = surface.get(names.MASK)
    evap_factor, ice_frac = surface_coupling_factors(surface, nml)

    new_dycore, raw = physics_step(
        dycore,
        surface[names.TSFC],
        cosz,
        lat,
        dt,
        phys_cfg,
        radiation_fn=radiation_fn,
        microphysics_emulator=microphysics_emulator,
        gscond_emulator=gscond_emulator,
        emulator_piggy_back=emulator_piggy_back,
        # subgrid-orography std enables mountain-wave drag when a
        # surface field provides it (zero/absent on aquaplanets)
        sgh=surface.get("sgh"),
        evap_factor=evap_factor,
        land_frac=mask,
        ice_frac=ice_frac,
    )

    if nml.land_model == "noah":
        from fv3net_tpu.physics.soil import noah_land_step

        snow_rate = raw.get("SNOWsfc", jnp.zeros_like(raw["PRATEsfc"]))
        rain_rate = jnp.maximum(raw["PRATEsfc"] - snow_rate, 0.0)
        stc1, smc1, swe1, sdiags = noah_land_step(
            surface["soil_temperature"],
            surface["soil_moisture_layers"],
            surface["snow_water_equivalent"],
            surface["deep_soil_temperature"],
            surface[names.TSFC],
            rain_rate,
            snow_rate,
            raw["evaporation"],
            dt,
        )
        if mask is not None:  # noah only on land points
            land = mask > 0.5
            stc1 = jnp.where(land[None], stc1, surface["soil_temperature"])
            smc1 = jnp.where(
                land[None], smc1, surface["soil_moisture_layers"]
            )
            swe1 = jnp.where(land, swe1, 0.0)
            for k in ("ground_heat_flux", "snow_melt_heat",
                      "RUNOFFsfc", "DRAINsfc"):
                sdiags[k] = jnp.where(land, sdiags[k], 0.0)
        surface["soil_temperature"] = stc1
        surface["soil_moisture_layers"] = smc1
        surface["snow_water_equivalent"] = swe1
        # ground + snowmelt heat leave the skin budget (subtracted by
        # slab_ocean.net_surface_flux via GHFLXsfc)
        raw["GHFLXsfc"] = (
            sdiags["ground_heat_flux"] + sdiags["snow_melt_heat"]
        )
        raw["RUNOFFsfc"] = sdiags["RUNOFFsfc"]
        raw["DRAINsfc"] = sdiags["DRAINsfc"]
        raw["SNODsfc"] = swe1
        raw["snow_cover"] = sdiags["snow_cover"]
    elif nml.bucket_land:
        from fv3net_tpu.physics.land import (
            BucketLandParams,
            bucket_hydrology_update,
        )

        land_p = BucketLandParams(field_capacity_m=nml.bucket_capacity_m)
        w_new, runoff = bucket_hydrology_update(
            surface["soil_moisture"],
            raw["PRATEsfc"],
            raw["evaporation"],
            dt,
            land_p,
        )
        if mask is not None:  # bucket only on land points
            w_new = jnp.where(mask > 0.5, w_new, surface["soil_moisture"])
            runoff = jnp.where(mask > 0.5, runoff, 0.0)
        surface["soil_moisture"] = w_new
        raw["soil_moisture"] = w_new
        raw["RUNOFFsfc"] = runoff

    if nml.slab_ocean:
        from fv3net_tpu.physics.slab_ocean import (
            SlabOceanParams,
            slab_ocean_update,
        )

        tsfc = surface[names.TSFC]
        # band-radiation runs may omit the reflected/upward surface
        # fluxes; close the budget with sigma*Ts^4 and ocean albedo
        raw.setdefault("ULWRFsfc", 5.670374e-8 * tsfc ** 4)
        raw.setdefault("USWRFsfc", 0.06 * raw["DSWRFsfc"])
        ocean_params = SlabOceanParams(
            mixed_layer_depth_m=nml.mixed_layer_depth_m
        )
        if nml.sea_ice:
            from fv3net_tpu.physics.sea_ice import (
                ice_fraction,
                slab_ocean_seaice_update,
            )

            new_tsfc, h_new = slab_ocean_seaice_update(
                tsfc,
                surface["ice_thickness"],
                raw,
                dt,
                ocean_params,
                land_mask=mask,
            )
            surface["ice_thickness"] = h_new
            raw["ice_thickness"] = h_new
            raw["ice_fraction"] = ice_fraction(h_new)
        else:
            new_tsfc = slab_ocean_update(
                tsfc, raw, dt, ocean_params, land_mask=mask,
            )
        surface[names.TSFC] = new_tsfc
        surface[names.SST] = new_tsfc

    # per-step physics precip accumulation [m] — the TOTAL_PRECIP state
    # the postphysics precipitation_sum builds on (reference
    # loop.py:536-554, diagnostics/compute.py:123-146)
    surface[names.TOTAL_PRECIP] = raw["PRATEsfc"] * dt / 1000.0
    return new_dycore, surface, raw
