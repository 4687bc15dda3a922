"""fv3net_tpu: a TPU-native framework with the capabilities of fv3net.

A ground-up JAX/XLA/Pallas re-design of the fv3net suite
(github.com/ai2cm/fv3net): ML-corrected atmospheric simulation on the
6-tile cubed sphere, with

- a pure-JAX prognostic step (dycore + physics + ML correction) replacing
  the Fortran fv3gfs wrapper (reference: workflows/prognostic_c48_run),
- Pallas/XLA kernels for the PPM vertical remap (reference: external/mappm)
  and cubed-sphere block coarsening (reference: external/vcm/vcm/cubedsphere),
- sharding over a ``jax.sharding.Mesh`` with halo exchange via collectives
  instead of MPI (reference: pace.util + mpi4py),
- a named-variable state API (Quantity/Dataset) and zarr I/O at the
  boundaries so diagnostics/training pipelines keep xarray-like semantics.
"""

__version__ = "0.1.0"

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.dataset import Dataset

__all__ = ["Quantity", "Dataset", "__version__"]
