"""Real RRTMG band solvers (JAX, batched, pluggable k-tables).

lw: longwave (16 bands / 140 g-points); sw: shortwave (14 bands / 112
g-points); tables: documented table schemas + synthetic fabrication.
Validated quantitatively against the reference's in-tree Python port on
shared synthetic tables (tests/test_rrtmg_oracle.py).
"""
from fv3net_tpu.physics.radiation.rrtmg import params  # noqa: F401
from fv3net_tpu.physics.radiation.rrtmg.tables import (  # noqa: F401
    make_lw_tables,
)
from fv3net_tpu.physics.radiation.rrtmg.lw import (  # noqa: F401
    lwrad,
    prep_lw_tables,
)
