"""Sharded (per-host parallel) zarr IO for distributed arrays.

reference: pace.util.ZarrMonitor writes per-rank regions of one shared
zarr store (runtime/diagnostics/manager.py:58-60) and
pace.util.open_restart does distributed restart reads
(runtime/nudging.py:133-139).  The TPU-native equivalents operate on
`jax.Array` shardings: every host writes/reads only the shards it
addresses, so a multi-host run performs parallel IO against one store
with no gather to a single host.

Safety: concurrent chunk writes are lock-free only when zarr chunk
boundaries align with shard boundaries — ``write_sharded`` chunks the
array by the sharding automatically when creating it.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from fv3net_tpu.core.zarrio import ZarrArray, ZarrGroup


def _shard_chunks(arr: jax.Array) -> Tuple[int, ...]:
    """Chunk sizes equal to one shard's extent along each axis."""
    db = arr.sharding.shard_shape(arr.shape)
    return tuple(int(s) for s in db)


def write_sharded(
    group: ZarrGroup,
    name: str,
    arr: jax.Array,
    dims: Optional[Tuple[str, ...]] = None,
) -> ZarrArray:
    """Write a (possibly distributed) jax.Array: each host writes only its
    addressable shards, one zarr chunk per shard, replica 0 only."""
    try:
        za = group[name]
    except (FileNotFoundError, OSError):
        za = group.create_array(
            name,
            shape=arr.shape,
            dtype=np.dtype(arr.dtype),
            chunks=_shard_chunks(arr),
            dims=dims,
        )
    for shard in arr.addressable_shards:
        if shard.replica_id != 0:
            continue  # exactly one owner per region across all replicas
        sel = tuple(
            slice(*s.indices(n)) for s, n in zip(shard.index, arr.shape)
        )
        za[sel] = np.asarray(shard.data)
    return za


def read_sharded(
    group: ZarrGroup,
    name: str,
    sharding: jax.sharding.Sharding,
) -> jax.Array:
    """Distributed read: each host reads only the regions of the store its
    devices own, then assembles a global jax.Array
    (`pace.util.open_restart` re-expressed over jax shardings)."""
    za = group[name]
    shape = za.shape
    device_map = sharding.addressable_devices_indices_map(shape)
    cache: dict = {}
    singles = []
    for device, index in device_map.items():
        sel = tuple(
            slice(*s.indices(n)) for s, n in zip(index, shape)
        )
        # read once per distinct region, reuse across replicas
        block = _read_region(za, sel, cache)
        singles.append(jax.device_put(block, device))
    return jax.make_array_from_single_device_arrays(
        shape, sharding, singles
    )


def _read_region(za: ZarrArray, sel, cache):
    key = tuple((s.start, s.stop) for s in sel)
    if key not in cache:
        # chunk-aligned fast path: one chunk read when the region is a chunk
        starts = [s.start for s in sel]
        sizes = [s.stop - s.start for s in sel]
        if (
            tuple(sizes) == za.chunks
            and all(st % c == 0 for st, c in zip(starts, za.chunks))
        ):
            idx = tuple(st // c for st, c in zip(starts, za.chunks))
            cache[key] = za._read_chunk(idx)
        else:
            cache[key] = za.read()[sel]
    return cache[key]
