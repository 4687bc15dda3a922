"""Cubed-sphere halo exchange as precomputed gathers (single-process form).

The reference exchanges halos via MPI (pace.util
CubedSphereCommunicator.start_halo_update, used at
external/fv3fit/fv3fit/_shared/halos.py:76-160) with special handling of
the 12 cube edges and 8 corners.  On TPU, when the whole cube lives on one
chip as a ``[6, ..., ny, nx]`` array, a halo update is a *gather*: static
index tables (derived from the geometric topology in
fv3net_tpu.grid.geometry.derive_topology) map each halo cell to its source
cell, and XLA compiles the update to on-chip copies — no communication
machinery at all.  The multi-device form (shard_map + collectives) lives in
fv3net_tpu.parallel.sharded and reuses these tables.

Two-phase fill: west/east halos first from neighbor interiors, then
south/north rows across the full extended width, so that the 8 cube
corners (3 tiles meeting) receive third-tile data through the
north/south neighbor — the standard treatment.

Vector fields are exchanged componentwise with no rotation because the
dycore carries horizontal vectors in 3-D Cartesian components.
"""
from __future__ import annotations

import dataclasses
import jax
from functools import lru_cache
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.grid.geometry import EdgeMatch, NUM_TILES

WEST, EAST, SOUTH, NORTH = 0, 1, 2, 3


def _neighbor_cell(ne: int, d: np.ndarray, s: np.ndarray, n: int):
    """Interior cell (j, i) at depth ``d`` from neighbor edge ``ne``,
    running index ``s`` along that edge."""
    if ne == WEST:
        return s, d
    if ne == EAST:
        return s, n - 1 - d
    if ne == SOUTH:
        return d, s
    if ne == NORTH:
        return n - 1 - d, s
    raise ValueError(ne)


def _neighbor_ext_row(ne: int, d: np.ndarray, s_ext: np.ndarray, n: int, h: int):
    """Extended-array coords of neighbor cells at depth d from edge ne,
    where ``s_ext`` is an extended running index in [-h, n+h)."""
    if ne == WEST:
        return h + s_ext, h + d
    if ne == EAST:
        return h + s_ext, h + n - 1 - d
    if ne == SOUTH:
        return h + d, h + s_ext
    if ne == NORTH:
        return h + n - 1 - d, h + s_ext
    raise ValueError(ne)


@dataclasses.dataclass(frozen=True)
class HaloTables:
    """Static gather tables for halo width ``h`` on a C{n} cube."""

    n: int
    h: int
    # phase A: west/east halos [6, n, h] (j, depth) source indices
    we_tile: np.ndarray
    we_j: np.ndarray
    we_i: np.ndarray
    # destination i for the west/east block, [2*h]
    we_dst_i: np.ndarray
    # phase B: south/north rows [6, 2h, n+2h] source indices into EXT arrays
    sn_tile: np.ndarray
    sn_j: np.ndarray
    sn_i: np.ndarray
    sn_dst_j: np.ndarray


def build_halo_tables(
    topology: Dict[Tuple[int, int], EdgeMatch], n: int, h: int
) -> HaloTables:
    # ---- phase A: west+east, interior sources ------------------------------
    we_tile = np.zeros((NUM_TILES, n, 2 * h), np.int32)
    we_j = np.zeros((NUM_TILES, n, 2 * h), np.int32)
    we_i = np.zeros((NUM_TILES, n, 2 * h), np.int32)
    we_dst_i = np.concatenate([np.arange(h), h + n + np.arange(h)]).astype(np.int32)

    ss = np.arange(n)
    dd = np.arange(h)
    S, D = np.meshgrid(ss, dd, indexing="ij")  # [n, h]
    for t in range(NUM_TILES):
        for which, e in enumerate((WEST, EAST)):
            m = topology[(t, e)]
            s_nbr = (n - 1 - S) if m.reversed else S
            jj, ii = _neighbor_cell(m.neighbor_edge, D, s_nbr, n)
            cols = slice(0, h) if e == WEST else slice(h, 2 * h)
            we_tile[t, :, cols] = m.neighbor_tile
            # west halo: dst i = h-1-d -> store depth-reversed so dst columns
            # are in increasing i order
            if e == WEST:
                we_j[t, :, 0:h] = jj[:, ::-1]
                we_i[t, :, 0:h] = ii[:, ::-1]
            else:
                we_j[t, :, h : 2 * h] = jj
                we_i[t, :, h : 2 * h] = ii

    # ---- phase B: south+north rows over full extended width ---------------
    width = n + 2 * h
    sn_tile = np.zeros((NUM_TILES, 2 * h, width), np.int32)
    sn_j = np.zeros((NUM_TILES, 2 * h, width), np.int32)
    sn_i = np.zeros((NUM_TILES, 2 * h, width), np.int32)
    sn_dst_j = np.concatenate([np.arange(h), h + n + np.arange(h)]).astype(np.int32)

    s_ext = np.arange(-h, n + h)  # extended running index
    D2, SE = np.meshgrid(dd, s_ext, indexing="ij")  # [h, width]
    for t in range(NUM_TILES):
        for which, e in enumerate((SOUTH, NORTH)):
            m = topology[(t, e)]
            s_nbr = (n - 1 - SE) if m.reversed else SE
            jj, ii = _neighbor_ext_row(m.neighbor_edge, D2, s_nbr, n, h)
            rows = slice(0, h) if e == SOUTH else slice(h, 2 * h)
            sn_tile[t, rows, :] = m.neighbor_tile
            if e == SOUTH:
                # dst j = h-1-d: store depth-reversed
                sn_j[t, 0:h, :] = jj[::-1, :]
                sn_i[t, 0:h, :] = ii[::-1, :]
            else:
                sn_j[t, h : 2 * h, :] = jj
                sn_i[t, h : 2 * h, :] = ii

    return HaloTables(
        n=n,
        h=h,
        we_tile=we_tile,
        we_j=we_j,
        we_i=we_i,
        we_dst_i=we_dst_i,
        sn_tile=sn_tile,
        sn_j=sn_j,
        sn_i=sn_i,
        sn_dst_j=sn_dst_j,
    )


@lru_cache(maxsize=None)
def _cached_topology():
    """The cube edge topology (independent of resolution)."""
    from fv3net_tpu.grid.geometry import make_grid

    return make_grid(4).topology


@lru_cache(maxsize=None)
def _cached_tables(n: int, h: int) -> HaloTables:
    return build_halo_tables(_cached_topology(), n, h)


def halo_append_gather(
    field: jnp.ndarray, h: int, tables: HaloTables = None
) -> jnp.ndarray:
    """Gather-table halo append (reference implementation; see
    ``halo_append`` for the production static-slice version)."""
    n = field.shape[-1]
    if field.shape[-2] != n:
        raise ValueError(f"expected square tiles, got {field.shape}")
    if tables is None:
        tables = _cached_tables(n, h)

    lead_shape = field.shape[1:-2]
    B = int(np.prod(lead_shape)) if lead_shape else 1
    f = field.reshape(NUM_TILES, B, n, n)

    # phase A: gather west/east halo blocks [6, B, n, 2h]
    we = f[tables.we_tile[:, None, :, :], jnp.arange(B)[None, :, None, None],
           tables.we_j[:, None, :, :], tables.we_i[:, None, :, :]]

    ext = jnp.zeros((NUM_TILES, B, n + 2 * h, n + 2 * h), field.dtype)
    ext = ext.at[:, :, h : h + n, h : h + n].set(f)
    ext = ext.at[:, :, h : h + n, tables.we_dst_i].set(we)

    # phase B: gather south/north rows [6, B, 2h, n+2h] from ext.  Applied
    # twice: corner cells whose source lies in a neighbor's own south/north
    # halo (when my S/N edge matches the neighbor's W/E edge) only become
    # valid after the first pass has filled that neighbor halo.
    for _ in range(2):
        sn = ext[tables.sn_tile[:, None, :, :], jnp.arange(B)[None, :, None, None],
                 tables.sn_j[:, None, :, :], tables.sn_i[:, None, :, :]]
        ext = ext.at[:, :, tables.sn_dst_j, :].set(sn)

    return ext.reshape((NUM_TILES,) + tuple(lead_shape) + (n + 2 * h, n + 2 * h))


def _oriented_block(src, ne: int, rev: bool, h: int, west_or_south: bool,
                    offset: int = 0):
    """Extract the h-deep edge block of a neighbor tile's array ``src``
    [..., R, C] next to its edge ``ne``, oriented so that axis -2 runs
    along the shared edge (the destination's running index) and axis -1 is
    depth from the neighbor's edge.  ``offset`` skips that many rows/cols
    at the array boundary (h when ``src`` is an extended array whose own
    halo borders must not be used as depth source).

    All operations are static slices / flips / transposes — no gathers.
    """
    C = src.shape[-1]
    R = src.shape[-2]
    if ne == WEST:
        block = src[..., :, offset : offset + h]  # [.., s, d]
    elif ne == EAST:
        block = jnp.flip(src[..., :, C - offset - h : C - offset], axis=-1)
    elif ne == SOUTH:
        block = jnp.swapaxes(src[..., offset : offset + h, :], -1, -2)
    elif ne == NORTH:
        block = jnp.swapaxes(
            jnp.flip(src[..., R - offset - h : R - offset, :], axis=-2),
            -1, -2,
        )
    else:
        raise ValueError(ne)
    if rev:
        block = jnp.flip(block, axis=-2)
    # depth currently increases away from the neighbor's edge; the
    # destination's west/south halo wants columns/rows ordered toward the
    # interior (i.e. depth decreasing), east/north wants depth increasing
    if west_or_south:
        block = jnp.flip(block, axis=-1)
    return block


def halo_append_concat(field: jnp.ndarray, h: int) -> jnp.ndarray:
    """Concatenation-assembled halo append (bit-identical to the
    ``slices`` impl — same neighbor blocks, different assembly).

    The ``slices`` impl issues ~37 ``.at[].set`` updates per call; in
    the dycore substep loop XLA lowered those to dynamic-update-slice
    chains with full-buffer copies (58 ms/chunk of DUS in the v5e
    device trace — the dominant non-radiation cost).  Here every stage
    writes its output exactly once: per-tile rows are built with
    ``concatenate([west, interior, east])`` and the south/north passes
    rebuild the array with ``concatenate`` along y, so the whole
    exchange is 4 array-sized writes.
    """
    n = field.shape[-1]
    if field.shape[-2] != n:
        raise ValueError(f"expected square tiles, got {field.shape}")
    topo = _cached_topology()
    lead_shape = field.shape[1:-2]
    B = int(np.prod(lead_shape)) if lead_shape else 1
    f = field.reshape(NUM_TILES, B, n, n)

    # phase A: [6, B, n, n+2h] rows with west/east halos in place
    rows_a = []
    for t in range(NUM_TILES):
        mw, me = topo[(t, WEST)], topo[(t, EAST)]
        wb = _oriented_block(
            f[mw.neighbor_tile], mw.neighbor_edge, mw.reversed, h,
            west_or_south=True,
        )
        eb = _oriented_block(
            f[me.neighbor_tile], me.neighbor_edge, me.reversed, h,
            west_or_south=False,
        )
        rows_a.append(jnp.concatenate([wb, f[t], eb], axis=-1))
    wext = jnp.stack(rows_a)

    # phase B: south/north rows over the full extended width, twice (the
    # second pass fixes corners whose source was a neighbor's own halo)
    zrows = jnp.zeros((NUM_TILES, B, h, n + 2 * h), field.dtype)
    ext = jnp.concatenate([zrows, wext, zrows], axis=-2)
    for _ in range(2):
        tiles = []
        for t in range(NUM_TILES):
            ms, mn = topo[(t, SOUTH)], topo[(t, NORTH)]
            sb = _oriented_block(
                ext[ms.neighbor_tile], ms.neighbor_edge, ms.reversed, h,
                west_or_south=True, offset=h,
            )
            nb = _oriented_block(
                ext[mn.neighbor_tile], mn.neighbor_edge, mn.reversed, h,
                west_or_south=False, offset=h,
            )
            tiles.append(jnp.concatenate(
                [
                    jnp.swapaxes(sb, -1, -2),
                    ext[t, :, h: h + n, :],
                    jnp.swapaxes(nb, -1, -2),
                ],
                axis=-2,
            ))
        ext = jnp.stack(tiles)
    return ext.reshape(
        (NUM_TILES,) + tuple(lead_shape) + (n + 2 * h, n + 2 * h)
    )


# ---------------------------------------------------------------------------
# active-mesh registry: the multi-device halo backend
# ---------------------------------------------------------------------------
# ``parallel.sharded.make_mesh`` registers the mesh it builds so that
# halo_append — called deep inside jitted dycore graphs where no mesh
# handle is in scope — can route the exchange through the explicit
# shard_map+ppermute path (shardmap_halo.halo_append_shardmap) instead of
# leaving the gather formulation to the XLA auto-SPMD partitioner
# (r2 verdict #5: the partitioner once miscompiled a halo formulation
# silently; explicit point-to-point transfers retire that class).
_ACTIVE_MESH = None


def set_active_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh multi-device halo
    exchanges should run on."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh():
    return _ACTIVE_MESH


class no_explicit_halo:
    """Context manager: temporarily clear the active mesh so graphs
    traced inside fall back to the gather/concat halo — needed for
    single-device reference computations in a process that also runs a
    multi-device mesh (a shard_map committed to the mesh cannot consume
    single-device-committed operands)."""

    def __enter__(self):
        global _ACTIVE_MESH
        self._saved = _ACTIVE_MESH
        _ACTIVE_MESH = None
        return self

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._saved
        return False


def _shardmap_eligible(field, h: int, mesh) -> bool:
    import os

    if os.environ.get("FV3NET_HALO_EXPLICIT", "on").lower() in (
        "off", "0", "false",
    ):
        return False
    if mesh is None or field.ndim < 3 or field.shape[0] != NUM_TILES:
        return False
    try:
        py = mesh.shape["fv"]
        px = mesh.shape["fv_x"]
    except Exception:
        return False
    n = field.shape[-1]
    if field.shape[-2] != n or n % py or n % px:
        return False
    return h <= min(n // py, n // px)


def halo_append(field: jnp.ndarray, h: int, tables=None,
                impl: str = None) -> jnp.ndarray:
    """Append an ``h``-deep halo to ``field`` of shape [6, ..., ny, nx].

    Returns [6, ..., ny+2h, nx+2h] whose interior equals ``field`` and
    whose border holds the adjacent tiles' data (corners included).

    Three bit-equivalent implementations (``impl``):

    - ``"concat"``: neighbor blocks are static slices + flips/transposes
      of the neighbor tile (every (tile, edge) relation on the cube is
      an affine map), assembled with ``concatenate`` so every stage
      writes once.  The fast single-device path.
    - ``"slices"``: same blocks placed with ``.at[].set`` — kept as the
      historical formulation (XLA lowered its DUS chains to full-buffer
      copies inside the dycore substep loop; see halo_append_concat).
    - ``"gather"``: precomputed index tables.  The multi-device path: the
      XLA SPMD partitioner MISCOMPILES the slice/flip/transpose
      formulation when the halo'd value feeds multiple gradient-style
      consumers in a large sharded graph (silently-wrong boundary values,
      reproduced on the CPU backend at every device count; the gather
      formulation partitions correctly and is exact vs f64 there —
      sharded equivalence tests guard this).

    - ``"shardmap"``: the explicit shard_map+ppermute exchange
      (parallel/shardmap_halo.py) over the registered active mesh —
      point-to-point transfers the partitioner cannot reinterpret.  The
      default on multi-device processes once a mesh is registered
      (``set_active_mesh``, done by ``sharded.make_mesh``) and the grid
      divides the layout; env ``FV3NET_HALO_EXPLICIT=off`` reverts to
      the gather path.

    Default: concat on a single-device process; shardmap when an active
    mesh is registered and eligible; gather otherwise.
    """
    if impl is None:
        if len(jax.devices()) == 1:
            impl = "concat"
        elif _shardmap_eligible(field, h, _ACTIVE_MESH):
            impl = "shardmap"
        else:
            impl = "gather"
    if impl == "shardmap":
        from fv3net_tpu.parallel.shardmap_halo import halo_append_shardmap

        return halo_append_shardmap(field, h, _ACTIVE_MESH)
    if impl == "gather":
        return halo_append_gather(field, h, tables)
    if impl == "concat":
        return halo_append_concat(field, h)
    n = field.shape[-1]
    if field.shape[-2] != n:
        raise ValueError(f"expected square tiles, got {field.shape}")
    topo = _cached_topology()

    lead_shape = field.shape[1:-2]
    B = int(np.prod(lead_shape)) if lead_shape else 1
    f = field.reshape(NUM_TILES, B, n, n)

    ext = jnp.zeros((NUM_TILES, B, n + 2 * h, n + 2 * h), field.dtype)
    ext = ext.at[:, :, h : h + n, h : h + n].set(f)

    # phase A: west/east halos from neighbor interiors
    for t in range(NUM_TILES):
        for e in (WEST, EAST):
            m = topo[(t, e)]
            block = _oriented_block(
                f[m.neighbor_tile], m.neighbor_edge, m.reversed, h,
                west_or_south=(e == WEST),
            )  # [B, n, h] with axis -2 = destination j
            if e == WEST:
                ext = ext.at[t, :, h : h + n, 0:h].set(block)
            else:
                ext = ext.at[t, :, h : h + n, h + n :].set(block)

    # phase B: south/north rows over the full extended width, twice (the
    # second pass fixes corners whose source was a neighbor's own halo)
    for _ in range(2):
        for t in range(NUM_TILES):
            for e in (SOUTH, NORTH):
                m = topo[(t, e)]
                src = ext[m.neighbor_tile]  # [B, n+2h, n+2h]
                block = _oriented_block(
                    src, m.neighbor_edge, m.reversed, h,
                    west_or_south=(e == SOUTH), offset=h,
                )  # [B, n+2h, h], axis -2 = extended running index
                rows = jnp.swapaxes(block, -1, -2)  # [B, h, n+2h]
                if e == SOUTH:
                    ext = ext.at[t, :, 0:h, :].set(rows)
                else:
                    ext = ext.at[t, :, h + n :, :].set(rows)

    return ext.reshape(
        (NUM_TILES,) + tuple(lead_shape) + (n + 2 * h, n + 2 * h)
    )


def halo_append_numpy(field: np.ndarray, h: int) -> np.ndarray:
    """Host-side float64-exact halo append (numpy fancy indexing over the
    gather tables).  Used for geometry-table construction, which must not
    round adjacent-center differences through the device dtype."""
    n = field.shape[-1]
    tables = _cached_tables(n, h)
    lead_shape = field.shape[1:-2]
    B = int(np.prod(lead_shape)) if lead_shape else 1
    f = np.ascontiguousarray(field).reshape(NUM_TILES, B, n, n)

    we = f[tables.we_tile[:, None, :, :], np.arange(B)[None, :, None, None],
           tables.we_j[:, None, :, :], tables.we_i[:, None, :, :]]
    ext = np.zeros((NUM_TILES, B, n + 2 * h, n + 2 * h), field.dtype)
    ext[:, :, h : h + n, h : h + n] = f
    ext[:, :, h : h + n, tables.we_dst_i] = we
    for _ in range(2):
        sn = ext[tables.sn_tile[:, None, :, :],
                 np.arange(B)[None, :, None, None],
                 tables.sn_j[:, None, :, :], tables.sn_i[:, None, :, :]]
        ext[:, :, tables.sn_dst_j, :] = sn
    return ext.reshape(
        (NUM_TILES,) + tuple(lead_shape) + (n + 2 * h, n + 2 * h)
    )
