"""In-physics emulation hooks.

reference: external/emulation — where the reference's Fortran physics
calls Python hooks through call_py_fort (``gscond``/``microphysics``/
``store``, emulation/__init__.py:1-18), this framework composes the
hooks as plain functions around the native jnp microphysics
(fv3net_tpu.physics.microphysics): an ``MicrophysicsEmulator`` can
replace the scheme inside the physics step, masks gate which fields the
emulator is allowed to overwrite, and a ``StorageHook`` captures
physics-state snapshots for training-data generation.
"""
from fv3net_tpu.emulation.hooks import (  # noqa: F401
    IntervalSchedule,
    LevelMask,
    MicrophysicsEmulator,
    RangeMask,
    StorageHook,
    TimeMask,
    compose_masks,
    get_hooks,
)
