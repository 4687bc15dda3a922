"""Explicit shard_map + lax.ppermute cubed-sphere halo exchange.

The hand-written multi-device halo path promised in parallel/sharded.py:
instead of relying on the XLA auto-SPMD partitioner to shard the
gather-table halo (which once miscompiled the static-slice variant,
CLAUDE.md), this module moves exactly the data the halo needs over ICI
with point-to-point ``ppermute``s inside a ``shard_map``.

Decomposition (reference analog: 6 tiles x layout_x x layout_y MPI
ranks, pace.util CubedSpherePartitioner + corner-aware halo exchange,
external/fv3fit/fv3fit/_shared/halos.py:76-160):

- mesh axes ``("fv", "fv_x")`` of shape (p, p) — a SQUARE intra-tile
  layout so every tile-edge subdomain is corner-aligned with exactly one
  neighbor subdomain even across transposed cube edges (the same
  constraint FMS imposes on cubed-sphere layouts);
- the 6-tile axis stays local to every device (each device owns a
  (ny/p, nx/p) block of all 6 tiles), so a tile-edge transfer for tile t
  is one static (source shard -> dest shard) pair per boundary block,
  with the flip/transpose orientation applied by the SENDER — uniform
  code on every shard;
- corners: the same two-phase scheme as the single-process gather halo
  (parallel/halo.py): west/east halos from interiors first, then
  south/north rows over the full extended width, run twice so the 8
  cube corners receive third-tile data.

Returns per-shard extended blocks (a [6, ..., p, p, m+2h, m+2h] global
array): the natural shape for block-local stencils.  ``blocks_to_global``
reassembles interiors for comparison against the single-process halo.
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


def _lin(r: int, c: int, p: int) -> int:
    return r * p + c


def _edge_perm(t: int, e: int, p: int, topo) -> Tuple[list, int, int]:
    """(source, destination) shard pairs for tile ``t`` edge ``e`` on a
    p x p layout, plus the neighbor-edge code.  Destination shards are
    the boundary blocks of edge ``e``; the source shard of each is the
    corner-aligned boundary block of the neighbor tile's edge."""
    m = topo[(t, e)]
    ne, rev = m.neighbor_edge, m.reversed
    pairs = []
    for s in range(p):  # s = destination running block index along edge
        s_src = (p - 1 - s) if rev else s
        if e == WEST:
            dst = (s, 0)
        elif e == EAST:
            dst = (s, p - 1)
        elif e == SOUTH:
            dst = (0, s)
        else:
            dst = (p - 1, s)
        if ne == WEST:
            src = (s_src, 0)
        elif ne == EAST:
            src = (s_src, p - 1)
        elif ne == SOUTH:
            src = (0, s_src)
        else:
            src = (p - 1, s_src)
        pairs.append((_lin(*src, p), _lin(*dst, p)))
    return pairs, m.neighbor_tile, ne, rev


def _shift_perm(p: int, axis: str, direction: int) -> list:
    """Intra-tile neighbor pairs: send along +/-1 in y ('fv') or x."""
    pairs = []
    for r in range(p):
        for c in range(p):
            if axis == "fv":
                r2 = r + direction
                if 0 <= r2 < p:
                    pairs.append((_lin(r, c, p), _lin(r2, c, p)))
            else:
                c2 = c + direction
                if 0 <= c2 < p:
                    pairs.append((_lin(r, c, p), _lin(r, c2, p)))
    return pairs


def _local_halo_fn(f, h: int, p: int, topo):
    """Per-shard body: f [6, B, m, m] local block -> [6, B, m+2h, m+2h]."""
    nt6, B, m, m2 = f.shape
    assert m == m2
    dtype = f.dtype
    r_idx = lax.axis_index("fv")
    c_idx = lax.axis_index("fv_x")

    ext = jnp.zeros((NUM_TILES, B, m + 2 * h, m + 2 * h), dtype)
    ext = ext.at[:, :, h : h + m, h : h + m].set(f)

    def pp(x, perm):
        return lax.ppermute(x, AXES, perm)

    # ---------------- phase A: west/east halos from interiors ----------
    # intra-tile x shifts (all 6 tiles in one ppermute each)
    recv_w = pp(f[..., :, m - h :], _shift_perm(p, "fv_x", +1))
    recv_e = pp(f[..., :, :h], _shift_perm(p, "fv_x", -1))
    # tile-edge transfers for boundary shards
    for t in range(NUM_TILES):
        for e in (WEST, EAST):
            pairs, nbr, ne, rev = _edge_perm(t, e, p, topo)
            send = _oriented_block(
                f[nbr], ne, rev, h, west_or_south=(e == WEST)
            )  # [B, m, h], axis -2 = destination j within the block
            got = pp(send, pairs)
            if e == WEST:
                on_edge = c_idx == 0
                cur = recv_w[t]
            else:
                on_edge = c_idx == p - 1
                cur = recv_e[t]
            merged = jnp.where(on_edge, got, cur)
            if e == WEST:
                recv_w = recv_w.at[t].set(merged)
            else:
                recv_e = recv_e.at[t].set(merged)
    ext = ext.at[:, :, h : h + m, :h].set(recv_w)
    ext = ext.at[:, :, h : h + m, h + m :].set(recv_e)

    # ---------------- phase B (x2): south/north rows, extended width ---
    for _ in range(2):
        rows_n = pp(
            ext[:, :, h + m - h : h + m, :], _shift_perm(p, "fv", +1)
        )  # my south neighbor's top interior rows -> arrives as my south? no:
        # sending my top interior rows to the shard ABOVE fills ITS south
        # halo; receiving from below fills MY south halo.
        rows_s = pp(ext[:, :, h : 2 * h, :], _shift_perm(p, "fv", -1))
        # rows_n: what I receive from my -y neighbor = my SOUTH halo rows
        south_recv = rows_n
        north_recv = rows_s
        for t in range(NUM_TILES):
            for e in (SOUTH, NORTH):
                pairs, nbr, ne, rev = _edge_perm(t, e, p, topo)
                send = _oriented_block(
                    ext[nbr], ne, rev, h,
                    west_or_south=(e == SOUTH), offset=h,
                )  # [B, m+2h, h] axis -2 = extended running index
                send = jnp.swapaxes(send, -1, -2)  # [B, h, m+2h]
                got = pp(send, pairs)
                if e == SOUTH:
                    on_edge = r_idx == 0
                    merged = jnp.where(on_edge, got, south_recv[t])
                    south_recv = south_recv.at[t].set(merged)
                else:
                    on_edge = r_idx == p - 1
                    merged = jnp.where(on_edge, got, north_recv[t])
                    north_recv = north_recv.at[t].set(merged)
        ext = ext.at[:, :, :h, :].set(south_recv)
        ext = ext.at[:, :, h + m :, :].set(north_recv)

    return ext


def halo_blocks_shardmap(field: jnp.ndarray, h: int, mesh: Mesh):
    """Halo exchange over a square ("fv", "fv_x") mesh via explicit
    ppermutes.  ``field``: [6, ..., ny, nx] (globally addressed, sharded
    or shardable as P(None, ..., 'fv', 'fv_x')).

    Returns per-shard extended blocks [6, ..., p, p, m+2h, m+2h] where
    m = ny/p; block (r, c) holds the local subdomain plus its h-deep
    halo (cube corners included).
    """
    py = mesh.shape["fv"]
    px = mesh.shape["fv_x"]
    if py != px:
        raise ValueError(
            f"explicit ppermute halo requires a square layout, got "
            f"({py}, {px})"
        )
    p = py
    n = field.shape[-1]
    if field.shape[-2] != n:
        raise ValueError(f"expected square tiles, got {field.shape}")
    if n % p:
        raise ValueError(f"C{n} not divisible by layout {p}")
    m = n // p
    if h > m:
        raise ValueError(f"halo {h} exceeds subdomain size {m}")
    topo = _cached_topology()

    lead_shape = field.shape[1:-2]
    B = int(np.prod(lead_shape)) if lead_shape else 1
    f4 = field.reshape(NUM_TILES, B, n, n)

    fn = jax.shard_map(
        partial(_local_halo_fn, h=h, p=p, topo=topo),
        mesh=mesh,
        in_specs=P(None, None, "fv", "fv_x"),
        out_specs=P(None, None, "fv", "fv_x"),
    )
    # shard_map output [6, B, p*(m+2h), p*(m+2h)]: blocks concatenated
    ext_cat = fn(f4)
    blocks = ext_cat.reshape(
        NUM_TILES, B, p, m + 2 * h, p, m + 2 * h
    ).transpose(0, 1, 2, 4, 3, 5)
    return blocks.reshape(
        (NUM_TILES,) + tuple(lead_shape) + (p, p, m + 2 * h, m + 2 * h)
    )


def blocks_to_global(blocks: jnp.ndarray, h: int) -> jnp.ndarray:
    """Reassemble block interiors into the global [6, ..., ny, nx]."""
    *lead, p, p2, me, me2 = blocks.shape
    m = me - 2 * h
    interior = blocks[..., h : h + m, h : h + m]
    # [..., p, p, m, m] -> [..., p*m, p*m]
    out = jnp.swapaxes(interior, -3, -2)
    return out.reshape(tuple(lead) + (p * m, p * m))


def block_slice(ext: np.ndarray, r: int, c: int, m: int, h: int):
    """Block (r, c)'s extended window inside the single-process extended
    array (global interior offset r*m, c*m)."""
    return ext[..., r * m : r * m + m + 2 * h, c * m : c * m + m + 2 * h]
