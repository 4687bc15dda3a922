"""Fine-resolution Q1/Q2 apparent-source budgets.

reference: workflows/fine_res_budget/budget/ — budgets.py (storage from
begin/end snapshots, pressure-level coarsening of fine-res fields and
physics tendencies; the training targets for fine-res ML) and
pipeline.py:34-70 (the Beam driver, here a plain map over timesteps).

Apparent sources (Yanai): Q1 = dT/dt|storage - coarse-resolvable
tendencies; computed here as the coarsened storage minus coarsened
physics tendencies, on the coarse pressure coordinate.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from fv3net_tpu.core.constants import TOA_PRESSURE
from fv3net_tpu.ops import coarsen as _c
from fv3net_tpu.ops import remap as _remap
from fv3net_tpu.ops import thermo


def storage(begin: jnp.ndarray, end: jnp.ndarray, time_step: float):
    """(field_end - field_begin) / dt (reference budgets.py storage)."""
    return (end - begin) / time_step


@partial(jax.jit, static_argnames=("factor",))
def pressure_level_average(
    field, delp_fine, delp_coarse, area, factor: int,
    toa_pressure: float = TOA_PRESSURE,
):
    """Coarsen a z-last (..., y, x, nz) field on surfaces of constant
    pressure: PPM-regrid each fine column to the (upsampled) coarse
    pressure coordinate, then area-weighted block average
    (reference budgets.py Grid.pressure_level_average)."""
    pi_fine = thermo.pressure_at_interface(delp_fine, toa_pressure)
    pi_coarse = thermo.pressure_at_interface(delp_coarse, toa_pressure)
    pi_up = jnp.moveaxis(
        _c.block_upsample(jnp.moveaxis(pi_coarse, -1, -3), factor), -3, -1
    )
    regridded = _remap.remap_ppm(pi_fine, field, pi_up, iv=1, kord=1)
    x = jnp.moveaxis(regridded, -1, -3)
    out = _c.weighted_block_average(x, jnp.expand_dims(area, -3), factor)
    return jnp.moveaxis(out, -3, -1)


@partial(jax.jit, static_argnames=("factor",))
def exposed_area(delp_fine, delp_coarse, area, factor: int,
                 toa_pressure: float = TOA_PRESSURE):
    """Area where the coarse pressure midpoint lies above the fine surface
    (reference budgets.py area_above_fine_surface)."""
    p_c = thermo.pressure_at_midpoint_log(delp_coarse, toa_pressure)
    p_up = jnp.moveaxis(
        _c.block_upsample(jnp.moveaxis(p_c, -1, -3), factor), -3, -1
    )
    ps = thermo.surface_pressure_from_delp(delp_fine, toa_pressure)
    ok = p_up <= ps[..., None]
    w = jnp.where(ok, area[..., None], 0.0)
    return jnp.moveaxis(
        _c.block_sum(jnp.moveaxis(w, -1, -3), factor), -3, -1
    )


def compute_budget(
    T_begin, T_end, q_begin, q_end,
    physics_T_tendency, physics_q_tendency,
    delp_fine, area, factor: int, time_step: float,
    toa_pressure: float = TOA_PRESSURE,
) -> Dict[str, jnp.ndarray]:
    """Coarsened apparent sources Q1 [K/s] and Q2 [kg/kg/s].

    All fields z-last (..., y, x, nz) on the fine grid; returns fields on
    the coarse grid with the coarse pressure coordinate.
    """
    delp_coarse = jnp.moveaxis(
        _c.weighted_block_average(
            jnp.moveaxis(delp_fine, -1, -3), jnp.expand_dims(area, -3), factor
        ),
        -3, -1,
    )

    def coarse(f):
        return pressure_level_average(
            f, delp_fine, delp_coarse, area, factor, toa_pressure
        )

    dT_storage = storage(T_begin, T_end, time_step)
    dq_storage = storage(q_begin, q_end, time_step)
    out = {
        "delp": delp_coarse,
        "exposed_area": exposed_area(delp_fine, delp_coarse, area, factor,
                                     toa_pressure),
        "T_storage": coarse(dT_storage),
        "sphum_storage": coarse(dq_storage),
        "pQ1": coarse(physics_T_tendency),
        "pQ2": coarse(physics_q_tendency),
    }
    # apparent sources: what the coarse model must add beyond its physics
    out["Q1"] = out["T_storage"]
    out["Q2"] = out["sphum_storage"]
    out["dQ1"] = out["Q1"] - out["pQ1"]
    out["dQ2"] = out["Q2"] - out["pQ2"]
    return out
