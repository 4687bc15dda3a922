"""TPU-native numeric operator library.

The analog of the reference's ``vcm.calc`` + ``external/mappm`` +
``vcm.cubedsphere`` kernel layers (reference: external/vcm/vcm/calc/thermo/,
external/mappm/mappm/mappm.f90, external/vcm/vcm/cubedsphere/coarsen.py),
re-designed as pure jnp/Pallas functions over raw arrays with the vertical
(column) axis innermost so physics stays embarrassingly parallel on device.
"""
from fv3net_tpu.ops import thermo  # noqa: F401
