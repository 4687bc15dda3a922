"""Column physics, pure jnp, batched over all columns.

Replaces the reference's GFS physics path (Fortran ``wrapper.step_*`` +
``apply_physics``, reference workflows/prognostic_c48_run/runtime/
loop.py:384-426) with a jittable column suite:

- Zhao-Carr-style large-scale condensation + precipitation
  (microphysics.py; the scheme the reference *emulates* with ML, see
  external/emulation/emulation/_emulate/microphysics.py:50-81)
- gray-gas LW + simple SW radiation with a diurnal cycle
  (radiation_gray.py; the full RRTMG port mirrors external/radiation and
  lands in fv3net_tpu.physics.radiation)
- bulk surface fluxes + implicit vertical diffusion PBL (surface.py,
  pbl.py)

Layout: all functions take (..., nz) z-last column arrays; level 0 = top.
"""
from fv3net_tpu.physics.driver import PhysicsConfig, physics_step  # noqa: F401
