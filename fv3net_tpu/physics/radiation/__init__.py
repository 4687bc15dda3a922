"""Radiation driver package.

reference: external/radiation — a pure-Python RRTMG port (21.5k LoC:
radlw/radsw band solvers, aerosols, clouds, astronomy, surface albedo,
gases) exposed through a ``Radiation`` wrapper class
(radiation/wrapper_api.py:119-349: validate() / init_driver() /
__call__(time, state)).

This package keeps that driver API; backends are selectable:

- ``gray``: the Frierson-style gray-gas scheme
  (fv3net_tpu.physics.radiation_gray).
- ``rrtmg``: the RRTMG-structured correlated-k solver (params/spectra/
  optics/lw/sw/driver modules): RRTMG's published band discretization
  (16 LW bands / 140 g-points, 14 SW bands / 112 g-points), McICA
  maximum-random cloud overlap, delta-two-stream SW with adding, and
  linear-in-tau LW emission.  The reference's measured k-tables are
  GCS-hosted (radiation/config.py:4-5) and unreachable in this
  zero-egress environment, so spectra.py generates physically-motivated
  k-distributions locally (exact Planck/solar band partitions; lognormal
  line-strength models tuned to observed band optical depths).
"""
from fv3net_tpu.physics.radiation.wrapper import (  # noqa: F401
    Radiation,
    RadiationConfig,
)
from fv3net_tpu.physics.radiation.driver import (  # noqa: F401
    DriverConfig,
    RadiationDriver,
)
