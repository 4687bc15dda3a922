"""Pallas TPU kernel for RRTMG k-table weighted-selection contractions.

The RRTMG gas optics fetch k-coefficients as Σ_k w_k[n]·tab[ids_k[n], g]
— a small set of weighted row selections per atmosphere point.  The XLA
path (fv3net_tpu.physics.radiation.rrtmg.lw) expresses this as one-hot /
factored matmuls, which is MXU-friendly but materializes fat
[C, L, nspa, G] interpolation intermediates in HBM (measured: the
radiation conditional accesses ~40 GB per call on v5e, with the
elementwise fusions already running at ~77% of HBM bandwidth — only
BYTE REDUCTION can speed it up further).  This kernel builds the
[block_n, rows] selection-weight matrix entirely in VMEM from the raw
(ids, w) planes and contracts it against the (VMEM-resident) table in
one MXU dot, so HBM traffic is just the [K, N] index/weight planes and
the [N, G] output — the intermediates never exist.

Reference algorithm: external/radiation/radiation/radlw_main.py taumol
row-gather semantics (see rrtmg/lw.py for the full derivation notes).

Numerics: each selected row contributes exactly w_k·tab[ids_k] (same as
the XLA path); only the summation association differs (K flat terms vs
nested pressure×species sums), within f32 rounding.  The dot runs at
HIGHEST precision (full f32) so the selection itself is exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLOCK_N = 512


def _ktable_kernel(ids_ref, w_ref, tab_ref, out_ref):
    """One block: ids/w [K, BN] + tab [R, G] -> out [BN, G]."""
    K = ids_ref.shape[0]
    R = tab_ref.shape[0]
    BN = ids_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BN, R), 1)
    W = jnp.zeros((BN, R), tab_ref.dtype)
    for k in range(K):  # K is static and small (<= ~16)
        sel = (ids_ref[k, :][:, None] == iota).astype(tab_ref.dtype)
        W = W + sel * w_ref[k, :][:, None]
    out_ref[:] = jnp.dot(
        W, tab_ref[:],
        preferred_element_type=tab_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _weighted_select_dot_flat(ids, w, tab, block_n=_BLOCK_N,
                              interpret=False):
    K, N = ids.shape
    R, G = tab.shape
    n_pad = -N % block_n
    if n_pad:
        ids = jnp.pad(ids, ((0, 0), (0, n_pad)))
        w = jnp.pad(w, ((0, 0), (0, n_pad)))
    Np = N + n_pad
    out = pl.pallas_call(
        _ktable_kernel,
        out_shape=jax.ShapeDtypeStruct((Np, G), tab.dtype),
        grid=(Np // block_n,),
        in_specs=[
            pl.BlockSpec((K, block_n), lambda i: (0, i)),
            pl.BlockSpec((K, block_n), lambda i: (0, i)),
            pl.BlockSpec((R, G), lambda i: (0, 0)),  # table: VMEM-resident
        ],
        out_specs=pl.BlockSpec((block_n, G), lambda i: (i, 0)),
        interpret=interpret,
    )(ids, w, tab)
    return out[:N] if n_pad else out


def weighted_select_dot(terms, tab, interpret=False):
    """``Σ_k w_k·tab[ids_k]`` with no HBM intermediates.

    terms: list of (ids, w) with matching leading shapes [...] (any
    rank); ids int32 (pre-clipped to [0, rows)), w float or None (=1).
    tab: [rows, G].  Returns [..., G].
    """
    lead = terms[0][0].shape
    ids = jnp.stack(
        [jnp.asarray(i, jnp.int32).reshape(-1) for i, _ in terms]
    )
    one = jnp.ones(ids.shape[1:], tab.dtype)
    w = jnp.stack(
        [one if wk is None else jnp.asarray(wk, tab.dtype).reshape(-1)
         for _, wk in terms]
    )
    out = _weighted_select_dot_flat(ids, w, tab, interpret=interpret)
    return out.reshape(lead + (tab.shape[-1],))


def _spec_kernel(wids_ref, ww_ref, sids_ref, sw_ref, tab_ref, out_ref,
                 *, n_paths, kw, nspa, ng):
    """Factored spec-band contraction, one band, all in VMEM:

      out = Σ_p Σ_s S_p[:, s] ⊙ (W_p @ tab)[:, s*ng:(s+1)*ng]

    W_p [BN, nbase] is built from ``kw`` (row, weight) pairs per path
    and S_p [BN, nspa] from the species-stencil terms — the [BN,
    nspa*ng] interpolation block A_p lives only in VMEM (the XLA path
    materializes the [C, L, nspa, G] equivalent in HBM)."""
    BN = wids_ref.shape[1]
    nbase = tab_ref.shape[0]
    st = sids_ref.shape[0] // n_paths  # stencil terms per path
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (BN, nbase), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (BN, nspa), 1)
    acc = jnp.zeros((BN, ng), tab_ref.dtype)
    for p in range(n_paths):
        W = jnp.zeros((BN, nbase), tab_ref.dtype)
        for k in range(p * kw, (p + 1) * kw):
            W = W + (wids_ref[k, :][:, None] == iota_b).astype(
                tab_ref.dtype
            ) * ww_ref[k, :][:, None]
        A = jnp.dot(
            W, tab_ref[:],
            preferred_element_type=tab_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # [BN, nspa*ng], VMEM only
        S = jnp.zeros((BN, nspa), tab_ref.dtype)
        for k in range(p * st, (p + 1) * st):
            S = S + (sids_ref[k, :][:, None] == iota_s).astype(
                tab_ref.dtype
            ) * sw_ref[k, :][:, None]
        for s in range(nspa):
            acc = acc + S[:, s][:, None] * A[:, s * ng:(s + 1) * ng]
    out_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "kw", "nspa", "ng", "block_n", "interpret"),
)
def _spec_dot_flat(wids, ww, sids, sw, tab, n_paths, kw, nspa, ng,
                   block_n=_BLOCK_N, interpret=False):
    N = wids.shape[1]
    n_pad = -N % block_n
    if n_pad:
        pad = lambda a: jnp.pad(a, ((0, 0), (0, n_pad)))  # noqa: E731
        wids, ww, sids, sw = map(pad, (wids, ww, sids, sw))
    Np = N + n_pad
    kern = functools.partial(
        _spec_kernel, n_paths=n_paths, kw=kw, nspa=nspa, ng=ng
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Np, ng), tab.dtype),
        grid=(Np // block_n,),
        in_specs=[
            pl.BlockSpec((wids.shape[0], block_n), lambda i: (0, i)),
            pl.BlockSpec((ww.shape[0], block_n), lambda i: (0, i)),
            pl.BlockSpec((sids.shape[0], block_n), lambda i: (0, i)),
            pl.BlockSpec((sw.shape[0], block_n), lambda i: (0, i)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, ng), lambda i: (i, 0)),
        interpret=interpret,
    )(wids, ww, sids, sw, tab)
    return out[:N] if n_pad else out


def spec_band_dot(w_paths, s_paths, tab_flat, nspa, interpret=False):
    """Factored spec-band tau: Σ_p scale_p·contract(S_p, (W_p @ tab)).

    w_paths: per path a list of (row, weight) base-selection pairs
    (equal length across paths); s_paths: per path a list of (pos,
    weight) stencil pairs (scales pre-folded); tab_flat
    [nbase, nspa*ng].  Returns [..., ng]."""
    lead = w_paths[0][0][0].shape
    kw = len(w_paths[0])
    n_paths = len(w_paths)
    flat_i = lambda a: jnp.asarray(a, jnp.int32).reshape(-1)  # noqa: E731
    flat_f = lambda a: jnp.asarray(  # noqa: E731
        a, tab_flat.dtype
    ).reshape(-1)
    wids = jnp.stack([flat_i(i) for path in w_paths for i, _ in path])
    ww = jnp.stack([flat_f(w) for path in w_paths for _, w in path])
    sids = jnp.stack([flat_i(i) for path in s_paths for i, _ in path])
    sw = jnp.stack([flat_f(w) for path in s_paths for _, w in path])
    ng = tab_flat.shape[1] // nspa
    out = _spec_dot_flat(
        wids, ww, sids, sw, tab_flat,
        n_paths=n_paths, kw=kw, nspa=nspa, ng=ng, interpret=interpret,
    )
    return out.reshape(lead + (ng,))


def weighted_select_dot_xla(terms, tab):
    """Reference XLA form of the same contraction (one-hot einsum) —
    used on non-TPU backends and in equivalence tests."""
    rows = tab.shape[0]
    iota = jnp.arange(rows, dtype=jnp.int32)
    W = None
    for ids, wk in terms:
        oh = (jnp.asarray(ids, jnp.int32)[..., None] == iota).astype(
            tab.dtype
        )
        contrib = oh if wk is None else oh * jnp.asarray(
            wk, tab.dtype
        )[..., None]
        W = contrib if W is None else W + contrib
    return jnp.einsum(
        "...r,rg->...g", W, tab, precision=jax.lax.Precision.HIGHEST
    )
