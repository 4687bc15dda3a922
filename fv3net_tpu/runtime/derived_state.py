"""Named-variable view over the model state.

The DerivedFV3State analog (reference: workflows/prognostic_c48_run/
runtime/derived_state.py:83-160 + FV3StateMapper:41-57): dict-like access
to physical variables by the reference's names, lazily computed from the
dycore state (which stores theta_v + Cartesian winds), plus setters that
write back consistently.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from fv3net_tpu.core.constants import TOA_PRESSURE
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.dycore.state import (
    DycoreState,
    temperature_from_theta_v,
    theta_v_from_temperature,
)
from fv3net_tpu.ops import thermo
from fv3net_tpu.runtime import names


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelState:
    """Full prognostic state: dycore fields + surface fields.

    ``time`` is host-side metadata carried outside the jitted step.
    """

    dycore: DycoreState
    surface: Dict[str, jnp.ndarray]  # [6, ny, nx] fields by reference names

    def copy(self) -> "ModelState":
        return ModelState(dycore=self.dycore, surface=dict(self.surface))


DIMS_3D = ("tile", "z", "y", "x")
DIMS_2D = ("tile", "y", "x")


class DerivedState:
    """Lazy named access over ModelState.

    get: state[name] -> Quantity; set: state[name] = Quantity updates the
    underlying prognostic fields consistently (the
    ``set_state_mass_conserving`` spirit re-expressed functionally).
    """

    def __init__(self, state: ModelState, grid_arrays, ptop: float = TOA_PRESSURE):
        self.state = state
        self._g = grid_arrays
        self._ptop = ptop

    # -- helpers ----------------------------------------------------------
    def _pmid(self):
        delp = jnp.moveaxis(self.state.dycore.delp, 1, -1)
        pm = thermo.pressure_at_midpoint_log(delp, toa_pressure=self._ptop)
        return jnp.moveaxis(pm, -1, 1)

    def _temperature(self):
        d = self.state.dycore
        return temperature_from_theta_v(d.pt, self._pmid(), d.tracers["sphum"])

    def _east_north(self):
        """Unit east/north at centers, [3, 6, ny, nx]."""
        return self._g.east, self._g.north

    # -- mapping interface ------------------------------------------------
    def keys(self):
        base = [
            names.TEMP,
            names.SPHUM,
            names.CLOUD,
            names.DELP,
            names.EASTWARD_WIND,
            names.NORTHWARD_WIND,
            names.AREA,
            "surface_geopotential",
            "surface_pressure",
            "latitude",
            "longitude",
        ]
        return base + list(self.state.surface)

    def __contains__(self, key) -> bool:
        return key in self.keys()

    def __getitem__(self, key: str) -> Quantity:
        d = self.state.dycore
        if key == names.TEMP:
            return Quantity(self._temperature(), DIMS_3D, "degK")
        if key == names.SPHUM:
            return Quantity(d.tracers["sphum"], DIMS_3D, "kg/kg")
        if key == names.CLOUD:
            return Quantity(d.tracers["cloud_water"], DIMS_3D, "kg/kg")
        if key == names.DELP:
            return Quantity(d.delp, DIMS_3D, "Pa")
        if key == names.EASTWARD_WIND:
            east, _ = self._east_north()
            u = (d.wind * east[:, :, None]).sum(axis=0)
            return Quantity(u, DIMS_3D, "m/s")
        if key == names.NORTHWARD_WIND:
            _, north = self._east_north()
            v = (d.wind * north[:, :, None]).sum(axis=0)
            return Quantity(v, DIMS_3D, "m/s")
        if key == names.AREA:
            return Quantity(self._g.area, DIMS_2D, "m^2")
        if key == "surface_geopotential":
            return Quantity(d.phis, DIMS_2D, "m^2/s^2")
        if key == "surface_pressure":
            return Quantity(
                d.delp.sum(axis=1) + self._ptop, DIMS_2D, "Pa"
            )
        if key == "latitude":
            return Quantity(self._g.lat, DIMS_2D, "radians")
        if key == "longitude":
            return Quantity(self._g.lon, DIMS_2D, "radians")
        if key == "ozone_mixing_ratio" and "o3mr" in d.tracers:
            return Quantity(d.tracers["o3mr"], DIMS_3D, "kg/kg")
        if key in d.tracers:
            return Quantity(d.tracers[key], DIMS_3D, "kg/kg")
        if key in self.state.surface:
            return Quantity(self.state.surface[key], DIMS_2D)
        raise KeyError(key)

    def __setitem__(self, key: str, value: Quantity):
        data = jnp.asarray(value.data if isinstance(value, Quantity) else value)
        d = self.state.dycore
        # incoming data must not widen the prognostic state's dtype
        data = data.astype(d.pt.dtype)
        if key == names.TEMP:
            pt = theta_v_from_temperature(data, self._pmid(), d.tracers["sphum"])
            self.state.dycore = dataclasses.replace(d, pt=pt)
        elif key == names.SPHUM:
            # the set_state_mass_conserving semantics (reference
            # derived_state.py:123-145 -> wrapper.set_state_mass_conserving):
            # overwriting specific humidity changes the layer's water mass,
            # so delp is rescaled to keep the DRY air mass per layer exact:
            # delp_dry = delp*(1-q) invariant.  The implied column water
            # source/sink is closed by precipitation_sum in the TimeLoop
            # (reference loop.py:536-554).  Temperature is held fixed
            # (theta_v recomputed at the new pmid and q).
            T = self._temperature()
            q_old = d.tracers["sphum"]
            delp_new = d.delp * (1.0 - q_old) / (1.0 - data)
            tracers = dict(d.tracers)
            tracers["sphum"] = data
            self.state.dycore = dataclasses.replace(
                d, delp=delp_new, tracers=tracers
            )
            pt = theta_v_from_temperature(T, self._pmid(), data)
            self.state.dycore = dataclasses.replace(
                self.state.dycore, pt=pt
            )
        elif key == names.CLOUD:
            tracers = dict(d.tracers)
            tracers["cloud_water"] = data
            self.state.dycore = dataclasses.replace(d, tracers=tracers)
        elif key == "ozone_mixing_ratio" and "o3mr" in d.tracers:
            tracers = dict(d.tracers)
            tracers["o3mr"] = data
            self.state.dycore = dataclasses.replace(d, tracers=tracers)
        elif key in d.tracers:
            tracers = dict(d.tracers)
            tracers[key] = data
            self.state.dycore = dataclasses.replace(d, tracers=tracers)
        elif key == names.EASTWARD_WIND or key == names.NORTHWARD_WIND:
            east, north = self._east_north()
            basis = east if key == names.EASTWARD_WIND else north
            cur = (d.wind * basis[:, :, None]).sum(axis=0)
            wind = d.wind + (data - cur)[None] * basis[:, :, None]
            self.state.dycore = dataclasses.replace(d, wind=wind)
        elif key in self.state.surface or data.ndim == 3:
            self.state.surface[key] = data
        else:
            raise KeyError(f"cannot set {key!r}")
