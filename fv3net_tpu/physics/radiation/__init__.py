"""Radiation driver package.

reference: external/radiation — a pure-Python RRTMG port (21.5k LoC:
radlw/radsw band solvers, aerosols, clouds, astronomy, surface albedo,
gases) exposed through a ``Radiation`` wrapper class
(radiation/wrapper_api.py:119-349: validate() / init_driver() /
__call__(time, state)).

This package keeps that driver API; backends are selectable:

- ``gray``: the Frierson-style gray-gas scheme
  (fv3net_tpu.physics.radiation_gray) — fully functional.
- ``rrtmg``: the RRTMG-J band solver port (in progress).  NOTE: the
  reference's RRTMG lookup tables (spectral k-distributions, cloud
  optics, aerosol properties) are downloaded from GCS at runtime
  (reference radiation/config.py:4-5); this environment is zero-egress,
  so the band solvers validate against the driver contract but cannot be
  initialized with real coefficients until the tables are vendored.
"""
from fv3net_tpu.physics.radiation.wrapper import (  # noqa: F401
    Radiation,
    RadiationConfig,
)
