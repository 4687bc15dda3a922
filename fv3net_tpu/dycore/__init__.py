"""TPU-native dynamical core (hydrostatic + nonhydrostatic options).

Replaces the reference's out-of-tree FV3 Fortran dycore (reference:
.gitmodules external/fv3gfs-fortran; driven through fv3gfs.wrapper at
workflows/prognostic_c48_run/runtime/loop.py:376-426).  The design keeps
FV3's signature architecture — vertically-Lagrangian layers with periodic
PPM remap to a hybrid pressure coordinate (Lin 2004) — but is built
TPU-first: the whole cube is one [6, nz, ny, nx] array batch, horizontal
operators are Green-Gauss finite-volume stencils over halo-extended
arrays, winds are 3-D Cartesian tangent vectors (no polar/edge special
cases), and the step is a single jitted pure function
``step(state) -> state``.
"""
from fv3net_tpu.dycore.state import (  # noqa: F401
    DycoreState,
    add_nonhydrostatic_fields,
    init_state,
)
from fv3net_tpu.dycore.core import DycoreConfig, dynamics_step  # noqa: F401
