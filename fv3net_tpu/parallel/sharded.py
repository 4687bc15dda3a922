"""Multi-device sharding of the model state over a JAX mesh.

The TPU-native replacement for the reference's MPI domain decomposition
(reference: §2.9 of the design survey; pace.util CubedSpherePartitioner +
CubedSphereCommunicator over mpi4py, runtime/main.py:32,
runtime/loop.py:210-212).  Design:

- One 1-D mesh axis ``"fv"`` shards the intra-tile y axis of every
  [6, nz, ny, nx] field (the analog of a ``layout=(1, N)`` MPI rank
  layout; the 6-tile axis stays local so cube-topology gathers never
  need special-case communication code).
- The halo exchange is the same static gather (fv3net_tpu.parallel.halo)
  executed under jit with sharding annotations: XLA partitions the
  gather and inserts the needed collectives over ICI automatically — the
  "annotate shardings, let XLA insert collectives" recipe.  A hand-tuned
  shard_map + ppermute edge exchange is a later-round optimization with
  the same call signature.
- Global reductions (metrics psum) and replicated parameters follow from
  the same sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FV_AXIS = "fv"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the ``fv`` (intra-tile y) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (FV_AXIS,))


def state_sharding(mesh: Mesh):
    """PartitionSpec tree for a DycoreState: 3-D fields sharded over ny."""
    from fv3net_tpu.dycore.state import DycoreState

    s3 = NamedSharding(mesh, P(None, None, FV_AXIS, None))  # [6, nz, ny, nx]
    s2 = NamedSharding(mesh, P(None, FV_AXIS, None))  # [6, ny, nx]
    s_wind = NamedSharding(mesh, P(None, None, None, FV_AXIS, None))

    def spec(state: DycoreState):
        return DycoreState(
            delp=s3,
            pt=s3,
            wind=s_wind,
            tracers={k: s3 for k in state.tracers},
            phis=s2,
            w=None if state.w is None else s3,
            delz=None if state.delz is None else s3,
        )

    return spec, s3, s2, s_wind


def shard_state(state, mesh: Mesh):
    """Place a DycoreState on the mesh with y-axis sharding."""
    spec, s3, s2, s_wind = state_sharding(mesh)
    return jax.device_put(state, spec(state))


def shard_field2d(field, mesh: Mesh):
    return jax.device_put(field, NamedSharding(mesh, P(None, FV_AXIS, None)))


def replicate(tree, mesh: Mesh):
    """Replicate (e.g. model parameters, ak/bk) across the mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P())
    )
