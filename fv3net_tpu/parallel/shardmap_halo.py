"""Explicit shard_map + lax.ppermute cubed-sphere halo exchange.

The hand-written multi-device halo path promised in parallel/sharded.py:
instead of relying on the XLA auto-SPMD partitioner to shard the
gather-table halo (which once miscompiled the static-slice variant,
CLAUDE.md), this module moves exactly the data the halo needs over ICI
with point-to-point ``ppermute``s inside a ``shard_map``.

Decomposition (reference analog: 6 tiles x layout_x x layout_y MPI
ranks, pace.util CubedSpherePartitioner + corner-aware halo exchange,
external/fv3fit/fv3fit/_shared/halos.py:76-160):

- mesh axes ``("fv", "fv_x")`` of any RECTANGULAR shape (py, px) (r2
  verdict #5 generalized beyond square): across rotated cube edges,
  where a (py-partitioned) edge faces a (px-partitioned) one, each
  destination boundary block receives the one-or-more source edge
  strips overlapping its window (one ``ppermute`` round per overlap
  slot, sub-split when two destinations share a source) and selects
  its exact span with one dynamic slice;
- the 6-tile axis stays local to every device (each device owns a
  (ny/py, nx/px) block of all 6 tiles), with the flip/transpose
  orientation applied by the SENDER — uniform code on every shard;
- corners: the same two-phase scheme as the single-process gather halo
  (parallel/halo.py): west/east halos from interiors first, then
  south/north rows over the full extended width, run twice so the 8
  cube corners receive third-tile data.

``halo_blocks_shardmap`` returns per-shard extended blocks (a
[6, ..., py, px, my+2h, mx+2h] global array): the natural shape for
block-local stencils.  ``halo_append_shardmap`` reassembles the full
extended global array — the drop-in multi-device backend of
``parallel.halo.halo_append``.  ``blocks_to_global`` reassembles
interiors for comparison against the single-process halo.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from fv3net_tpu.grid.geometry import NUM_TILES
from fv3net_tpu.parallel.halo import (
    EAST,
    NORTH,
    SOUTH,
    WEST,
    _cached_topology,
    _oriented_block,
)

AXES = ("fv", "fv_x")


def _lin(r: int, c: int, px: int) -> int:
    return r * px + c


def _edge_geometry(t: int, e: int, py: int, px: int, topo):
    """Static transfer plan for tile ``t`` edge ``e`` on a (py, px)
    layout.

    Works in DESTINATION-edge coordinates: destination boundary block
    ``s`` (of p_d blocks, length m_frac = 1/p_d of the edge) needs the
    source-edge strips of the neighbor edge, whose blocks — re-indexed
    so block ``k`` covers the k-th fraction of the edge in destination
    order (global reversal folded in) — have length 1/p_s.  Returns
    (nbr, ne, rev, p_d, p_s, k_lo[s], rounds, src_lin[k], dst_lin[s])
    with k_lo the first overlapping source block per destination.
    """
    m = topo[(t, e)]
    ne, rev = m.neighbor_edge, m.reversed
    p_d = py if e in (WEST, EAST) else px
    p_s = py if ne in (WEST, EAST) else px

    # overlap in units of 1/(p_d*p_s) of the edge length
    m_d, m_s = p_s, p_d  # m_d/m_s in those units
    k_lo = np.array([(s * m_d) // m_s for s in range(p_d)])
    k_hi = np.array([((s + 1) * m_d - 1) // m_s for s in range(p_d)])
    rounds = int((k_hi - k_lo + 1).max())

    def src_lin(k: int) -> int:
        j = (p_s - 1 - k) if rev else k
        if ne == WEST:
            rc = (j, 0)
        elif ne == EAST:
            rc = (j, px - 1)
        elif ne == SOUTH:
            rc = (0, j)
        else:
            rc = (py - 1, j)
        return _lin(*rc, px)

    def dst_lin(s: int) -> int:
        if e == WEST:
            rc = (s, 0)
        elif e == EAST:
            rc = (s, px - 1)
        elif e == SOUTH:
            rc = (0, s)
        else:
            rc = (py - 1, s)
        return _lin(*rc, px)

    return m.neighbor_tile, ne, rev, p_d, p_s, k_lo, k_hi, rounds, \
        src_lin, dst_lin


def _round_perms(p_d, k_lo, k_hi, r, src_lin, dst_lin):
    """(src, dst) pairs for overlap round ``r``, sub-split so each
    ppermute has unique sources (a source block may overlap two
    destination windows when the destination grain is finer)."""
    pairs = []
    for s in range(p_d):
        k = int(k_lo[s]) + r
        if k <= int(k_hi[s]):
            pairs.append((src_lin(k), dst_lin(s)))
    subrounds = []
    while pairs:
        seen = set()
        this, rest = [], []
        for sd in pairs:
            if sd[0] in seen:
                rest.append(sd)
            else:
                seen.add(sd[0])
                this.append(sd)
        subrounds.append(this)
        pairs = rest
    return subrounds


def _shift_perm(py: int, px: int, axis: str, direction: int) -> list:
    """Intra-tile neighbor pairs: send along +/-1 in y ('fv') or x."""
    pairs = []
    for r in range(py):
        for c in range(px):
            if axis == "fv":
                r2 = r + direction
                if 0 <= r2 < py:
                    pairs.append((_lin(r, c, px), _lin(r2, c, px)))
            else:
                c2 = c + direction
                if 0 <= c2 < px:
                    pairs.append((_lin(r, c, px), _lin(r, c2, px)))
    return pairs


def _gather_edge_strip(pp, send, geom, my_edge_idx, m_s: int, m_d: int,
                       margin: int):
    """Receive this destination's edge strip from the (possibly
    finer/coarser-grained) source edge blocks.

    ``send``: this shard's oriented local strip, [..., m_s + 2*margin, h]
    with axis -2 running along the edge in destination order (margin
    columns of own-halo context at each end for the phase-B extended
    rows; 0 in phase A).  Returns [..., m_d + 2*margin, h].
    """
    nbr, ne, rev, p_d, p_s, k_lo, k_hi, rounds, src_lin, dst_lin = geom
    pieces = []
    for r in range(rounds):
        got = None
        for pairs in _round_perms(p_d, k_lo, k_hi, r, src_lin, dst_lin):
            g = pp(send, pairs)
            got = g if got is None else got + g
        # drop the overlapping margin of non-leading pieces so the
        # concatenation is contiguous in edge coordinates
        pieces.append(got if r == 0 else got[..., 2 * margin :, :])
    buf = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, -2)
    if rounds == 1 and m_s == m_d:
        return buf  # aligned layouts: the strip IS the window
    # my window starts at s*m_d - k_lo(s)*m_s in edge coords (margin
    # included on both ends of the buffer and the window alike)
    starts = jnp.asarray(
        [s * m_d - int(k_lo[s]) * m_s for s in range(p_d)], jnp.int32
    )
    start = jnp.take(starts, jnp.clip(my_edge_idx, 0, p_d - 1))
    return lax.dynamic_slice_in_dim(buf, start, m_d + 2 * margin, axis=-2)


def _local_halo_fn(f, h: int, py: int, px: int, topo):
    """Per-shard body: f [6, B, my, mx] local block ->
    [6, B, my+2h, mx+2h]."""
    nt6, B, my, mx = f.shape
    dtype = f.dtype
    r_idx = lax.axis_index("fv")
    c_idx = lax.axis_index("fv_x")

    ext = jnp.zeros((NUM_TILES, B, my + 2 * h, mx + 2 * h), dtype)
    ext = ext.at[:, :, h : h + my, h : h + mx].set(f)

    def pp(x, perm):
        return lax.ppermute(x, AXES, perm)

    # ---------------- phase A: west/east halos from interiors ----------
    # intra-tile x shifts (all 6 tiles in one ppermute each)
    recv_w = pp(f[..., :, mx - h :], _shift_perm(py, px, "fv_x", +1))
    recv_e = pp(f[..., :, :h], _shift_perm(py, px, "fv_x", -1))
    # tile-edge transfers for boundary shards
    for t in range(NUM_TILES):
        for e in (WEST, EAST):
            geom = _edge_geometry(t, e, py, px, topo)
            ne = geom[1]
            m_s = my if ne in (WEST, EAST) else mx
            send = _oriented_block(
                f[geom[0]], ne, geom[2], h, west_or_south=(e == WEST)
            )  # [B, m_s, h], axis -2 = edge coord in destination order
            got = _gather_edge_strip(
                pp, send, geom, r_idx, m_s, my, margin=0
            )
            if e == WEST:
                on_edge = c_idx == 0
                recv_w = recv_w.at[t].set(
                    jnp.where(on_edge, got, recv_w[t])
                )
            else:
                on_edge = c_idx == px - 1
                recv_e = recv_e.at[t].set(
                    jnp.where(on_edge, got, recv_e[t])
                )
    ext = ext.at[:, :, h : h + my, :h].set(recv_w)
    ext = ext.at[:, :, h : h + my, h + mx :].set(recv_e)

    # ---------------- phase B (x2): south/north rows, extended width ---
    for _ in range(2):
        # sending my top interior rows to the shard above fills ITS south
        # halo; what I receive from below fills MY south halo
        rows_from_below = pp(
            ext[:, :, h + my - h : h + my, :],
            _shift_perm(py, px, "fv", +1),
        )
        rows_from_above = pp(
            ext[:, :, h : 2 * h, :], _shift_perm(py, px, "fv", -1)
        )
        south_recv = rows_from_below
        north_recv = rows_from_above
        for t in range(NUM_TILES):
            for e in (SOUTH, NORTH):
                geom = _edge_geometry(t, e, py, px, topo)
                ne = geom[1]
                m_s = my if ne in (WEST, EAST) else mx
                send = _oriented_block(
                    ext[geom[0]], ne, geom[2], h,
                    west_or_south=(e == SOUTH), offset=h,
                )  # [B, m_s+2h, h] axis -2 = extended edge coord
                got = _gather_edge_strip(
                    pp, send, geom, c_idx, m_s, mx, margin=h
                )  # [B, mx+2h, h]
                got = jnp.swapaxes(got, -1, -2)  # [B, h, mx+2h]
                if e == SOUTH:
                    on_edge = r_idx == 0
                    south_recv = south_recv.at[t].set(
                        jnp.where(on_edge, got, south_recv[t])
                    )
                else:
                    on_edge = r_idx == py - 1
                    north_recv = north_recv.at[t].set(
                        jnp.where(on_edge, got, north_recv[t])
                    )
        ext = ext.at[:, :, :h, :].set(south_recv)
        ext = ext.at[:, :, h + my :, :].set(north_recv)

    return ext


def halo_blocks_shardmap(field: jnp.ndarray, h: int, mesh: Mesh):
    """Halo exchange over a rectangular ("fv", "fv_x") mesh via explicit
    ppermutes.  ``field``: [6, ..., ny, nx] (globally addressed, sharded
    or shardable as P(None, ..., 'fv', 'fv_x')).

    Returns per-shard extended blocks [6, ..., py, px, my+2h, mx+2h]
    where my = ny/py, mx = nx/px; block (r, c) holds the local subdomain
    plus its h-deep halo (cube corners included).
    """
    py = mesh.shape["fv"]
    px = mesh.shape["fv_x"]
    n = field.shape[-1]
    if field.shape[-2] != n:
        raise ValueError(f"expected square tiles, got {field.shape}")
    if n % py or n % px:
        raise ValueError(f"C{n} not divisible by layout ({py}, {px})")
    my, mx = n // py, n // px
    if h > min(my, mx):
        raise ValueError(
            f"halo {h} exceeds subdomain size ({my}, {mx})"
        )
    topo = _cached_topology()

    lead_shape = field.shape[1:-2]
    B = int(np.prod(lead_shape)) if lead_shape else 1
    f4 = field.reshape(NUM_TILES, B, n, n)

    fn = jax.shard_map(
        partial(_local_halo_fn, h=h, py=py, px=px, topo=topo),
        mesh=mesh,
        in_specs=P(None, None, "fv", "fv_x"),
        out_specs=P(None, None, "fv", "fv_x"),
    )
    # shard_map output [6, B, py*(my+2h), px*(mx+2h)]: blocks concatenated
    ext_cat = fn(f4)
    blocks = ext_cat.reshape(
        NUM_TILES, B, py, my + 2 * h, px, mx + 2 * h
    ).transpose(0, 1, 2, 4, 3, 5)
    return blocks.reshape(
        (NUM_TILES,) + tuple(lead_shape)
        + (py, px, my + 2 * h, mx + 2 * h)
    )


def halo_append_shardmap(field: jnp.ndarray, h: int, mesh: Mesh):
    """Drop-in ``halo_append`` backed by the explicit ppermute exchange:
    [6, ..., n, n] -> the extended global [6, ..., n+2h, n+2h].

    All neighbor-addressing data movement happens inside the shard_map
    (point-to-point ppermutes); the reassembly below is plain static
    slicing/concatenation of the per-shard blocks, which the partitioner
    cannot get wrong element-wise (r2 verdict #5: retires the
    auto-SPMD-partitioned gather halo as the default sharded mechanism).
    """
    py = mesh.shape["fv"]
    px = mesh.shape["fv_x"]
    n = field.shape[-1]
    my, mx = n // py, n // px
    blocks = halo_blocks_shardmap(field, h, mesh)
    lead = field.shape[1:-2]
    bl = blocks.reshape((NUM_TILES, -1) + blocks.shape[-4:])
    B = bl.shape[1]

    def rows(r_blocks, j0, j1):
        """[6, B, px, rows, mx(+h cols as sliced)] -> assemble one row
        band over the full extended width from the px blocks of one
        block-row."""
        west = r_blocks[:, :, 0, j0:j1, :h]
        mid = (
            jnp.swapaxes(r_blocks[:, :, :, j0:j1, h : h + mx], 2, 3)
            .reshape(NUM_TILES, B, j1 - j0, px * mx)
        )
        east = r_blocks[:, :, px - 1, j0:j1, h + mx :]
        return jnp.concatenate([west, mid, east], axis=-1)

    bands = []
    for r in range(py):
        rb = bl[:, :, r]  # [6, B, px, my+2h, mx+2h]
        if r == 0:
            bands.append(rows(rb, 0, h))  # south halo rows
        bands.append(rows(rb, h, h + my))
        if r == py - 1:
            bands.append(rows(rb, h + my, h + my + h))  # north halo rows
    ext = jnp.concatenate(bands, axis=-2)
    return ext.reshape(
        (NUM_TILES,) + tuple(lead) + (n + 2 * h, n + 2 * h)
    )


def blocks_to_global(blocks: jnp.ndarray, h: int) -> jnp.ndarray:
    """Reassemble block interiors into the global [6, ..., ny, nx]."""
    *lead, py, px, me_y, me_x = blocks.shape
    my, mx = me_y - 2 * h, me_x - 2 * h
    interior = blocks[..., h : h + my, h : h + mx]
    # [..., py, px, my, mx] -> [..., py*my, px*mx]
    out = jnp.swapaxes(interior, -3, -2)
    return out.reshape(tuple(lead) + (py * my, px * mx))


def block_slice(ext: np.ndarray, r: int, c: int, m: int, h: int,
                mx: int = None):
    """Block (r, c)'s extended window inside the single-process extended
    array (global interior offset r*m, c*mx)."""
    if mx is None:
        mx = m
    return ext[..., r * m : r * m + m + 2 * h,
               c * mx : c * mx + mx + 2 * h]
