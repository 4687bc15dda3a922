"""Diagnostic files: running time averages flushed to zarr.

reference: workflows/prognostic_c48_run/runtime/diagnostics/
manager.py:98-178 — DiagnosticFile.observe accumulates per-variable sums
keyed by the time container's indicator; completed buckets are stored to
a zarr store (there via pace.util.ZarrMonitor per MPI rank; here one
host writes the whole cube, and under sharding each host writes its
shard region).
"""
from __future__ import annotations

import datetime
import os
from typing import Dict, List, Mapping, Optional, Sequence

import jax
import numpy as np

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core import zarrio
from fv3net_tpu.runtime.diagnostics.times import (
    IntervalAveragedTimes,
    time_container_from_config,
)


def _sum_groups_device(flat, sizes):
    """Sequential per-group sums of a flat tuple of device arrays as ONE
    jitted dispatch (sizes static).  The adds run in observation order,
    so a group sum matches the host's sequential accumulation to f32
    roundoff (the host then continues in f64; window means are stored
    float32, so the ~1-ulp difference is below the on-disk rounding)."""
    import jax

    key = tuple(sizes)
    fn = _sum_groups_device._cache.get(key)
    if fn is None:
        def impl(flat_t):
            out = []
            i = 0
            for n in key:
                s = flat_t[i]
                for j in range(i + 1, i + n):
                    s = s + flat_t[j]
                out.append(s)
                i += n
            return tuple(out)

        fn = jax.jit(impl)
        _sum_groups_device._cache[key] = fn
    return fn(tuple(flat))


_sum_groups_device._cache = {}


def _host_sum(arrs):
    """Sequential sum of non-device arrays (CPU/numpy fallback)."""
    s = np.asarray(arrs[0]).copy()
    for a in arrs[1:]:
        s = s + np.asarray(a)
    return s


class _Packed:
    """One observation's variables flattened to a single device buffer
    by ONE jitted dispatch issued at OBSERVE time.  Execution is
    in-order through the TPU tunnel, so an op enqueued at drain time
    would wait behind every chunk dispatched since; packing immediately
    places it right after the producing chunk, and the later drain's
    np.asarray finds bytes already computed (r5 phase baseline: the
    eager ravel/cast/concat chain at drain time cost ~0.4 s/drain in
    dispatch round-trips alone)."""

    __slots__ = ("names", "shapes", "dtypes", "buffer", "cast")

    def __init__(self, names, shapes, dtypes, buffer, cast):
        self.names = names
        self.shapes = shapes
        self.dtypes = dtypes
        self.buffer = buffer
        self.cast = cast

    def unpack(self, buf: np.ndarray):
        out = {}
        off = 0
        for name, shape in zip(self.names, self.shapes):
            n = int(np.prod(shape))
            piece = buf[off:off + n].reshape(shape)
            if self.cast and piece.dtype != np.float32:
                piece = piece.astype(np.float32)
            out[name] = piece
            off += n
        return out


def _pack_obs(snap: Dict, pull_dtype) -> Optional[_Packed]:
    """Pack one observation {name: device array} into a _Packed, or
    None when the arrays are not uniformly packable (mixed host arrays
    or non-castable dtypes -> the legacy drain path handles them)."""
    import jax.numpy as jnp

    names = list(snap)
    arrs = [snap[n] for n in names]
    if not arrs or not all(isinstance(a, jax.Array) for a in arrs):
        return None
    pdt = jnp.dtype(pull_dtype) if pull_dtype is not None else None
    cast = pdt is not None and all(
        jnp.issubdtype(a.dtype, jnp.floating) for a in arrs
    )
    if cast:
        target = str(pdt)
    else:
        if len({a.dtype for a in arrs}) != 1:
            return None
        target = str(arrs[0].dtype)
    buffer = _concat_jit(len(arrs), target)(tuple(arrs))
    return _Packed(
        names, [a.shape for a in arrs], [a.dtype for a in arrs],
        buffer, cast,
    )


def _concat_jit(n: int, dtype: str):
    """Cached jitted ravel+cast+concat over an n-tuple of arrays (jit
    retraces per shape signature; the executable cache makes repeated
    drains one dispatch)."""
    import jax as _jax
    import jax.numpy as jnp

    key = (n, dtype)
    fn = _concat_jit._cache.get(key)
    if fn is None:
        fn = _jax.jit(
            lambda xs: jnp.concatenate(
                [jnp.ravel(x).astype(dtype) for x in xs]
            )
        )
        _concat_jit._cache[key] = fn
    return fn


_concat_jit._cache = {}


def _pull_batch(arrays, pull_dtype=None):
    """Device->host transfer of several arrays as ONE buffer.

    Per-array ``np.asarray`` pulls each pay a tunnel/PCIe round-trip;
    concatenating the raveled arrays on device (an async dispatch) and
    pulling once runs at the link's bandwidth instead (measured ~5x on
    the TPU tunnel: 4 C48 3-D fields went ~1.7 s -> ~0.35 s).

    ``pull_dtype`` (e.g. ``"bfloat16"``) casts floating device arrays to
    that dtype INSIDE the device-side concat so only half the bytes
    cross the link; the host side upcasts back to float32 before any
    accumulation/zarr write (bf16 keeps f32 range, so large-magnitude
    fields like surface pressure are safe — f16 would overflow)."""
    import collections

    import jax.numpy as jnp

    pdt = jnp.dtype(pull_dtype) if pull_dtype is not None else None
    cast_idx = set()
    groups = collections.defaultdict(list)
    for i, a in enumerate(arrays):
        if isinstance(a, jax.Array):
            dt = a.dtype
            if pdt is not None and jnp.issubdtype(dt, jnp.floating):
                dt = pdt
                cast_idx.add(i)
            groups[dt].append(i)
    from fv3net_tpu.runtime import timing

    out = list(arrays)
    for dt, idxs in groups.items():
        if len(idxs) < 2:
            if idxs and idxs[0] in cast_idx:
                # still shrink the lone transfer: cast on device
                out[idxs[0]] = arrays[idxs[0]].astype(dt)
            continue
        with timing.phases.clock("pull_concat_dispatch"):
            # ONE jitted dispatch for the whole ravel+cast+concat chain:
            # eagerly, each op is its own device RPC — ~13 round-trips
            # per drain through the TPU tunnel (measured 0.4 s/drain,
            # r5 phase baseline)
            flat = _concat_jit(len(idxs), str(dt))(
                tuple(arrays[i] for i in idxs)
            )
        with timing.phases.clock("pull_transfer"):
            buf = np.asarray(flat)
        timing.add_counter("pull_bytes", float(buf.nbytes))
        off = 0
        for i in idxs:
            n = int(np.prod(arrays[i].shape))
            piece = buf[off:off + n].reshape(arrays[i].shape)
            if i in cast_idx:
                piece = piece.astype(np.float32)
            out[i] = piece
            off += n
    result = []
    for i, a in enumerate(out):
        if isinstance(a, jax.Array):
            with timing.phases.clock("pull_transfer"):
                a = np.asarray(a)
            timing.add_counter("pull_bytes", float(a.nbytes))
        else:
            a = np.asarray(a)
        if i in cast_idx and a.dtype != np.float32:
            # singleton group: pulled in pull_dtype without a concat
            a = a.astype(np.float32)
        result.append(a)
    return result


class DiagnosticFile:
    """One output zarr with its own variable set and time selection.

    ``pull_buffer`` observations are held as DEVICE array handles and
    transferred as one batched pull: through the TPU tunnel each pull
    RPC costs a round-trip comparable to a fused chunk's compute, so
    batching across chunk boundaries amortizes it (the zarr rows land
    up to ``pull_buffer - 1`` observations late; ``close()`` drains)."""

    def __init__(self, path: str, variables: Sequence[str], times,
                 renames: Optional[Mapping[str, str]] = None,
                 chunks: Optional[Mapping[str, int]] = None,
                 pull_buffer: int = 4,
                 pull_dtype: Optional[str] = None):
        self._path = path
        self._variables = list(variables)
        self._renames = dict(renames or {})
        self._chunks = dict(chunks or {})
        self._times = times
        self._sums: Dict[str, np.ndarray] = {}
        self._counts = 0
        self._current_label: Optional[datetime.datetime] = None
        self._stored_times: List[datetime.datetime] = []
        self._store: Optional[zarrio.ZarrGroup] = None
        self._averaging = isinstance(times, IntervalAveragedTimes)
        self._pull_buffer = max(1, int(pull_buffer))
        self._pull_dtype = pull_dtype
        self._pending: List[tuple] = []
        # True: observe() only buffers/packs; the caller schedules the
        # pulls via drain_ready() at a point where they overlap device
        # compute (the production segmented loop)
        self._defer_drains = False

    def observe(self, time: datetime.datetime,
                diagnostics: Mapping[str, Quantity]) -> None:
        label = self._times.indicator(time)
        if label is None:
            return
        present = [n for n in self._variables if n in diagnostics]
        snap = {n: diagnostics[n].data for n in present}
        dims = {n: diagnostics[n].dims for n in present}
        if not self._averaging and snap:
            # pack NOW (one jitted dispatch, queued right behind the
            # producing chunk — see _Packed); averaging files keep raw
            # handles so the drain can device-sum each window first
            packed = _pack_obs(snap, self._pull_dtype)
            if packed is not None:
                from fv3net_tpu.runtime import timing

                timing.add_counter(
                    "pack_bytes", float(packed.buffer.nbytes)
                )
                timing.add_counter("pack_count", 1)
                snap = packed
        self._pending.append((label, snap, dims))
        if self._defer_drains:
            return
        if len(self._pending) >= self._pull_buffer:
            self._drain()

    def drain_ready(self) -> None:
        """Drain buffered observations EXCEPT the newest one, whose
        producing chunk is typically still computing — called by the
        production loop right after observing a fresh chunk, so the
        pulls (of finished chunks' buffers) overlap the in-flight
        chunk's compute instead of blocking on it (in-order execution;
        docs/performance.md r5)."""
        if len(self._pending) > self._pull_buffer:
            self._drain(keep_newest=True)

    def _drain(self, keep_newest: bool = False) -> None:
        if not self._pending:
            return
        if keep_newest:
            pending, self._pending = (
                self._pending[:-1], self._pending[-1:]
            )
        else:
            pending, self._pending = self._pending, []
        if not pending:
            return
        if self._averaging:
            # interval-average files: sum each window's buffered
            # observations ON DEVICE (one jitted dispatch, observation
            # order) and pull only the per-window partial sums — the
            # transferred bytes shrink by ~the group size, on top of the
            # batched-RPC saving
            groups: List[list] = []  # [label, {name: [arrs]}, dims, count]
            for label, snap, dims in pending:
                if groups and groups[-1][0] == label:
                    g = groups[-1]
                    for n, a in snap.items():
                        g[1].setdefault(n, []).append(a)
                    g[2].update(dims)
                    g[3] += 1
                else:
                    groups.append(
                        [label, {n: [a] for n, a in snap.items()},
                         dict(dims), 1]
                    )
            flat: List = []
            sizes: List[int] = []
            slots: List[tuple] = []
            for gi, (_, snap, _, _) in enumerate(groups):
                for name, arrs in snap.items():
                    if len(arrs) > 1 and all(
                        isinstance(a, jax.Array) for a in arrs
                    ):
                        flat.extend(arrs)
                        sizes.append(len(arrs))
                        slots.append((gi, name))
            if flat:
                sums = _sum_groups_device(flat, sizes)
                for (gi, name), s in zip(slots, sums):
                    groups[gi][1][name] = [s]
            order: List = []
            for _, snap, _, _ in groups:
                for name, arrs in snap.items():
                    # non-device (or singleton) entries: host-sum below
                    order.append(
                        arrs[0] if len(arrs) == 1
                        else _host_sum(arrs)
                    )
            buf = _pull_batch(order, self._pull_dtype)
            i = 0
            for label, snap, dims, count in groups:
                pulled = {}
                for n in snap:
                    pulled[n] = buf[i]
                    i += 1
                self._process(label, pulled, dims, count=count)
            return
        # instantaneous/subsampled files: every observation becomes its
        # own zarr row.  Pre-packed buffers are pulled INDIVIDUALLY —
        # no drain-time device op: execution is in-order, so a concat
        # enqueued now would wait behind the lookahead chunk dispatched
        # after these observations, idling the host (and then the
        # device) for a whole chunk's compute.  Each buffer pull only
        # waits for its own (already finished) producer.  Legacy
        # (unpacked) handles still go through one batched transfer
        # (np.asarray, NOT jax.device_get: device_get's
        # copy_to_host_async path is pathologically slow through the
        # axon TPU tunnel).
        from fv3net_tpu.runtime import timing

        legacy = []
        for _, snap, _ in pending:
            if not isinstance(snap, _Packed):
                legacy.extend(snap.values())
        buf = _pull_batch(legacy, self._pull_dtype) if legacy else []
        i = 0
        for label, snap, dims in pending:
            if isinstance(snap, _Packed):
                with timing.phases.clock("pull_transfer"):
                    host = np.asarray(snap.buffer)
                timing.add_counter("pull_bytes", float(host.nbytes))
                pulled = snap.unpack(host)
            else:
                pulled = {}
                for n in snap:
                    pulled[n] = buf[i]
                    i += 1
            self._process(label, pulled, dims)

    def _process(self, label, pulled: Dict[str, np.ndarray],
                 dims: Mapping[str, tuple], count: int = 1) -> None:
        present = list(pulled)
        if self._averaging:
            if self._current_label is not None and label != self._current_label:
                self._flush()
            self._current_label = label
            for name in present:
                out = self._renames.get(name, name)
                arr = np.asarray(pulled[name], dtype=np.float64)
                if out in self._sums:
                    self._sums[out] = self._sums[out] + arr
                else:
                    self._sums[out] = arr.copy()
                    self._dims = getattr(self, "_dims", {})
                    self._dims[out] = dims[name]
            self._counts += count
        else:
            self._current_label = label
            self._dims = getattr(self, "_dims", {})
            for name in present:
                out = self._renames.get(name, name)
                # instantaneous snapshot: no accumulation, keep the
                # pulled dtype (the f64 detour doubles host copies)
                self._sums[out] = pulled[name]
                self._dims[out] = dims[name]
            self._counts = 1
            self._flush()

    def _flush(self) -> None:
        if self._counts == 0 or not self._sums:
            self._sums = {}
            self._counts = 0
            return
        if self._counts == 1:
            mean = self._sums
        else:
            mean = {k: v / self._counts for k, v in self._sums.items()}
        t_index = len(self._stored_times)
        if self._store is None:
            self._store = zarrio.ZarrGroup.create(self._path)
            for name, arr in mean.items():
                dims = ("time",) + tuple(self._dims[name])
                chunk = (self._chunks.get("time", 1),) + tuple(
                    min(self._chunks.get(d, s), s)
                    for d, s in zip(dims[1:], arr.shape)
                )
                self._store.create_array(
                    name,
                    shape=(0,) + arr.shape,
                    chunks=chunk,
                    dtype="float32",
                    dims=dims,
                    fill_value="NaN",
                )
        from fv3net_tpu.runtime import timing

        with timing.phases.clock("zarr_write"):
            for name, arr in mean.items():
                za = self._store[name]
                za.resize_time(t_index + 1)
                za[(t_index,)] = arr.astype(np.float32, copy=False)
        self._stored_times.append(self._current_label)
        self._write_times()
        self._sums = {}
        self._counts = 0

    def _write_times(self) -> None:
        # time coordinate in hours since the first stored time
        t0 = self._stored_times[0]
        hours = np.array(
            [(t - t0).total_seconds() / 3600.0 for t in self._stored_times]
        )
        if "time" not in self._store.array_names():
            self._store.create_array(
                "time",
                shape=(0,),
                chunks=(1024,),
                dtype="float64",
                dims=("time",),
                attrs={"units": f"hours since {t0.isoformat()}"},
            )
        za = self._store["time"]
        za.resize_time(len(hours))
        za[:] = hours

    def close(self) -> None:
        self._drain()
        if self._averaging:
            self._flush()


class DiagnosticsManager:
    """All configured diagnostic files (reference manager.py:181-200
    get_diagnostic_files)."""

    def __init__(self, configs, initial_time: datetime.datetime,
                 output_dir: str, async_writes: bool = False):
        """``async_writes=True`` runs observe (device pull + host
        conversion + zarr write) on ONE worker thread so it overlaps the
        next chunks' device compute — the pull's np.asarray and the disk
        IO both release the GIL.  Ordering per file is preserved (single
        worker); worker exceptions re-raise on the next observe/close."""
        import concurrent.futures

        self._executor = (
            concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="diag-writer"
            )
            if async_writes
            else None
        )
        self._pending: List = []
        self.files = []
        for cfg in configs:
            # Fortran-style configs lower to ordinary diagnostic files
            # (config.py FortranFileConfig.to_diagnostic_config)
            if hasattr(cfg, "to_diagnostic_config"):
                cfg = cfg.to_diagnostic_config()
            times = time_container_from_config(cfg.times, initial_time)
            if getattr(cfg, "tensorboard", False):
                # reference manager.py:54-56: tensorboard: true swaps
                # the zarr sink for a TensorBoard event log
                from fv3net_tpu.runtime.diagnostics.tensorboard import (
                    TensorBoardSink,
                )

                self.files.append(
                    TensorBoardSink(
                        os.path.join(output_dir, "tensorboard"),
                        cfg.variables,
                        times,
                    )
                )
                continue
            path = os.path.join(output_dir, cfg.name)
            self.files.append(
                DiagnosticFile(
                    path, cfg.variables, times,
                    renames=getattr(cfg, "renames", None),
                    chunks=getattr(cfg, "chunks", None),
                    pull_buffer=getattr(cfg, "pull_buffer", 4),
                    pull_dtype=getattr(cfg, "pull_dtype", None),
                )
            )

    def set_defer_drains(self, defer: bool) -> None:
        for f in self.files:
            if hasattr(f, "_defer_drains"):
                f._defer_drains = defer

    def drain_ready(self) -> None:
        for f in self.files:
            if hasattr(f, "drain_ready"):
                f.drain_ready()

    def observe(self, time, diagnostics) -> None:
        if self._executor is None:
            for f in self.files:
                f.observe(time, diagnostics)
            return
        self._check_async_errors(block=False)
        self._pending.append(
            self._executor.submit(self._observe_sync, time, diagnostics)
        )

    def _observe_sync(self, time, diagnostics) -> None:
        for f in self.files:
            f.observe(time, diagnostics)

    def _check_async_errors(self, block: bool) -> None:
        remaining = []
        for fut in self._pending:
            if block or fut.done():
                fut.result()  # re-raise worker exceptions here
            else:
                remaining.append(fut)
        self._pending = remaining

    def close(self) -> None:
        if self._executor is not None:
            self._check_async_errors(block=True)
            self._executor.shutdown(wait=True)
            self._executor = None
        for f in self.files:
            f.close()
