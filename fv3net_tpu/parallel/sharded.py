"""Multi-device sharding of the model state over a JAX mesh.

The TPU-native replacement for the reference's MPI domain decomposition
(reference: §2.9 of the design survey; pace.util CubedSpherePartitioner +
CubedSphereCommunicator over mpi4py, runtime/main.py:32,
runtime/loop.py:210-212; 6 tiles x layout_x x layout_y ranks,
segmented_run/run.py:58-59).  Design:

- A 2-D mesh ``("fv", "fv_x")`` shards the intra-tile (y, x) axes of
  every [6, nz, ny, nx] field (the analog of an MPI
  ``layout=(px, py)``); the 6-tile axis stays local so cube-topology
  gathers never need special-case communication code, and the usable
  device count scales as ny*nx rather than ny.  A 1-D layout is the
  px=1 special case.
- The default halo exchange is the static gather
  (fv3net_tpu.parallel.halo) executed under jit with sharding
  annotations: XLA partitions the gather and inserts the collectives
  over ICI automatically.  The explicit corner-aware shard_map +
  lax.ppermute exchange lives in parallel/shardmap_halo.py
  (bit-compared against the gather path) for square layouts.
- Global reductions (metrics psum) and replicated parameters follow from
  the same sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FV_AXIS = "fv"  # intra-tile y
FV_X_AXIS = "fv_x"  # intra-tile x


def default_layout(n_devices: int) -> Tuple[int, int]:
    """Squarest (py, px) factorization with py >= px."""
    px = int(np.floor(np.sqrt(n_devices)))
    while n_devices % px:
        px -= 1
    return n_devices // px, px


def make_mesh(
    n_devices: Optional[int] = None,
    devices=None,
    layout: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """2-D device mesh over the intra-tile (y, x) axes.

    ``layout=(py, px)``: defaults to the squarest factorization of the
    device count (8 -> (4, 2)); pass (n, 1) for the legacy 1-D mesh."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if layout is None:
        layout = default_layout(devices.size)
    py, px = layout
    if py * px != devices.size:
        raise ValueError(f"layout {layout} != {devices.size} devices")
    mesh = Mesh(devices.reshape(py, px), (FV_AXIS, FV_X_AXIS))
    # register as the halo-exchange mesh: halo_append then routes
    # multi-device exchanges through the explicit ppermute path
    from fv3net_tpu.parallel import halo as _halo

    _halo.set_active_mesh(mesh)
    return mesh


def state_sharding(mesh: Mesh):
    """PartitionSpec tree for a DycoreState: 3-D fields sharded over
    (ny, nx)."""
    from fv3net_tpu.dycore.state import DycoreState

    x_axis = FV_X_AXIS if FV_X_AXIS in mesh.axis_names else None
    s3 = NamedSharding(
        mesh, P(None, None, FV_AXIS, x_axis)
    )  # [6, nz, ny, nx]
    s2 = NamedSharding(mesh, P(None, FV_AXIS, x_axis))  # [6, ny, nx]
    s_wind = NamedSharding(mesh, P(None, None, None, FV_AXIS, x_axis))

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
    x_axis = FV_X_AXIS if FV_X_AXIS in mesh.axis_names else None
    return jax.device_put(
        field, NamedSharding(mesh, P(None, FV_AXIS, x_axis))
    )


def shard_yx(field, mesh: Mesh):
    """Shard the trailing (y, x) axes of an arbitrary-rank array (2-D
    surface fields [6, ny, nx], Noah soil columns [nlayer, 6, ny, nx],
    ...); rank < 2 replicates."""
    import numpy as _np

    nd = _np.ndim(field)
    if nd < 2:
        return replicate(field, mesh)
    x_axis = FV_X_AXIS if FV_X_AXIS in mesh.axis_names else None
    spec = P(*([None] * (nd - 2)), FV_AXIS, x_axis)
    return jax.device_put(field, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate (e.g. model parameters, ak/bk) across the mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P())
    )
