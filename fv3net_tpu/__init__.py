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

import os as _os

if _os.environ.get("FV3NET_JAX_PLATFORMS"):
    # explicit platform override for subprocess workflows (pipeline
    # CLIs, workflow-template steps, tests): some environments pin a
    # platform via sitecustomize in a way that ignores JAX_PLATFORMS,
    # so a dedicated variable is the reliable way to force e.g. CPU in
    # children.  Applied at package import, before any backend use.
    import jax as _jax

    _jax.config.update(
        "jax_platforms", _os.environ["FV3NET_JAX_PLATFORMS"]
    )

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.dataset import Dataset

__all__ = ["Quantity", "Dataset", "__version__"]
