"""Named-array container: the xarray.DataArray / pace.util.Quantity analog.

fv3net passes state between layers as xarray objects (reference:
workflows/prognostic_c48_run/runtime/derived_state.py:41-57,
external/vcm throughout).  xarray is not part of this framework's TPU
runtime: instead ``Quantity`` is a thin, pytree-registered wrapper around
a JAX (or numpy) array with named dims + units, so that

- the hot path stays pure JAX (``.data`` goes straight into jitted code),
- boundary code keeps xarray-like ergonomics (dim-aligned arithmetic,
  named reductions, isel),
- states are pytrees: dims/units ride along as aux data through jit.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Hashable, Mapping, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jax.Array]


def _normalize_dims(dims: Sequence[Hashable], ndim: int) -> Tuple[str, ...]:
    dims = tuple(str(d) for d in dims)
    if len(dims) != ndim:
        raise ValueError(f"got {len(dims)} dims {dims} for array with ndim={ndim}")
    return dims


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Quantity:
    """An array with named dimensions, units and attributes."""

    data: Array
    dims: Tuple[str, ...]
    units: str = ""
    attrs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if not isinstance(self.data, (np.ndarray, jax.Array)):
            self.data = np.asarray(self.data)
        self.dims = _normalize_dims(self.dims, self.data.ndim)
        if self.units and "units" not in self.attrs:
            self.attrs = {**self.attrs, "units": self.units}

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.dims, self.units, tuple(self.attrs.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        dims, units, attrs = aux
        obj = object.__new__(cls)
        obj.data = children[0]
        obj.dims = dims
        obj.units = units
        obj.attrs = dict(attrs)
        return obj

    # -- basic properties --------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self) -> Dict[str, int]:
        return dict(zip(self.dims, self.data.shape))

    @property
    def values(self) -> np.ndarray:
        return np.asarray(self.data)

    def item(self):
        return np.asarray(self.data).item()

    def get_axis_num(self, dim: str) -> int:
        return self.dims.index(dim)

    def __repr__(self):
        return (
            f"Quantity(dims={self.dims}, shape={self.shape}, "
            f"dtype={self.dtype}, units={self.units!r})"
        )

    # -- construction helpers ----------------------------------------------
    def with_data(self, data: Array) -> "Quantity":
        return Quantity(data, self.dims, self.units, dict(self.attrs))

    def assign_attrs(self, **attrs) -> "Quantity":
        new = dict(self.attrs)
        new.update(attrs)
        units = attrs.get("units", self.units)
        return Quantity(self.data, self.dims, units, new)

    def astype(self, dtype) -> "Quantity":
        return self.with_data(self.data.astype(dtype))

    def copy(self) -> "Quantity":
        if isinstance(self.data, np.ndarray):
            return Quantity(self.data.copy(), self.dims, self.units, dict(self.attrs))
        return Quantity(self.data, self.dims, self.units, dict(self.attrs))

    def rename_dims(self, name_map: Mapping[str, str]) -> "Quantity":
        dims = tuple(name_map.get(d, d) for d in self.dims)
        return Quantity(self.data, dims, self.units, dict(self.attrs))

    def expand_dims(self, dim: str, axis: int = 0) -> "Quantity":
        data = jnp.expand_dims(self.data, axis) if isinstance(
            self.data, jax.Array
        ) else np.expand_dims(self.data, axis)
        dims = list(self.dims)
        dims.insert(axis if axis >= 0 else len(dims) + axis + 1, dim)
        return Quantity(data, tuple(dims), self.units, dict(self.attrs))

    # -- indexing ------------------------------------------------------------
    def isel(self, indexers: Mapping[str, Any] = None, **kwargs) -> "Quantity":
        indexers = dict(indexers or {})
        indexers.update(kwargs)
        idx = []
        out_dims = []
        for d, n in zip(self.dims, self.shape):
            if d in indexers:
                sel = indexers[d]
                idx.append(sel)
                if isinstance(sel, slice) or (
                    hasattr(sel, "ndim") and getattr(sel, "ndim", 0) > 0
                ) or isinstance(sel, (list, tuple)):
                    out_dims.append(d)
            else:
                idx.append(slice(None))
                out_dims.append(d)
        data = self.data[tuple(idx)]
        return Quantity(data, tuple(out_dims), self.units, dict(self.attrs))

    def transpose(self, *dims: str) -> "Quantity":
        if not dims:
            dims = tuple(reversed(self.dims))
        axes = [self.dims.index(d) for d in dims]
        xp = jnp if isinstance(self.data, jax.Array) else np
        return Quantity(xp.transpose(self.data, axes), tuple(dims), self.units,
                        dict(self.attrs))

    # -- dim-aligned broadcasting -------------------------------------------
    def _binary_op(self, other, op):
        if isinstance(other, Quantity):
            dims, a, b = _align(self, other)
            return Quantity(op(a, b), dims)
        return Quantity(op(self.data, other), self.dims, self.units,
                        dict(self.attrs))

    def _rbinary_op(self, other, op):
        if isinstance(other, Quantity):
            dims, a, b = _align(self, other)
            return Quantity(op(b, a), dims)
        return Quantity(op(other, self.data), self.dims, self.units,
                        dict(self.attrs))

    def __add__(self, o): return self._binary_op(o, lambda a, b: a + b)
    def __radd__(self, o): return self._rbinary_op(o, lambda a, b: a + b)
    def __sub__(self, o): return self._binary_op(o, lambda a, b: a - b)
    def __rsub__(self, o): return self._rbinary_op(o, lambda a, b: a - b)
    def __mul__(self, o): return self._binary_op(o, lambda a, b: a * b)
    def __rmul__(self, o): return self._rbinary_op(o, lambda a, b: a * b)
    def __truediv__(self, o): return self._binary_op(o, lambda a, b: a / b)
    def __rtruediv__(self, o): return self._rbinary_op(o, lambda a, b: a / b)
    def __pow__(self, o): return self._binary_op(o, lambda a, b: a ** b)
    def __neg__(self): return self.with_data(-self.data)
    def __abs__(self):
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self.with_data(xp.abs(self.data))
    def __lt__(self, o): return self._binary_op(o, lambda a, b: a < b)
    def __le__(self, o): return self._binary_op(o, lambda a, b: a <= b)
    def __gt__(self, o): return self._binary_op(o, lambda a, b: a > b)
    def __ge__(self, o): return self._binary_op(o, lambda a, b: a >= b)

    # -- reductions -----------------------------------------------------------
    def _reduce(self, fn, dim=None, **kwargs):
        if dim is None:
            return Quantity(fn(self.data, **kwargs), ())
        dims = (dim,) if isinstance(dim, str) else tuple(dim)
        axes = tuple(self.dims.index(d) for d in dims)
        out_dims = tuple(d for d in self.dims if d not in dims)
        return Quantity(fn(self.data, axis=axes, **kwargs), out_dims)

    def sum(self, dim=None):
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self._reduce(xp.sum, dim)

    def mean(self, dim=None):
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self._reduce(xp.mean, dim)

    def min(self, dim=None):
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self._reduce(xp.min, dim)

    def max(self, dim=None):
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self._reduce(xp.max, dim)

    def cumsum(self, dim: str):
        xp = jnp if isinstance(self.data, jax.Array) else np
        axis = self.dims.index(dim)
        return Quantity(xp.cumsum(self.data, axis=axis), self.dims, self.units,
                        dict(self.attrs))

    def diff(self, dim: str):
        axis = self.dims.index(dim)
        xp = jnp if isinstance(self.data, jax.Array) else np
        return Quantity(xp.diff(self.data, axis=axis), self.dims, self.units,
                        dict(self.attrs))

    def fillna(self, value) -> "Quantity":
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self.with_data(xp.where(xp.isnan(self.data), value, self.data))

    def where(self, cond, other=np.nan) -> "Quantity":
        cond_data = cond.data if isinstance(cond, Quantity) else cond
        other_data = other.data if isinstance(other, Quantity) else other
        xp = jnp if isinstance(self.data, jax.Array) else np
        return self.with_data(xp.where(cond_data, self.data, other_data))


def _align(a: Quantity, b: Quantity):
    """Broadcast two quantities by dim name, xarray-style.

    Output dims: dims of ``a`` followed by dims of ``b`` not in ``a``.
    """
    out_dims = list(a.dims) + [d for d in b.dims if d not in a.dims]
    use_jax = isinstance(a.data, jax.Array) or isinstance(b.data, jax.Array)
    xp = jnp if use_jax else np

    def expand(q: Quantity):
        data = q.data
        # move existing axes into out_dims order, inserting size-1 axes
        src_order = [q.dims.index(d) for d in out_dims if d in q.dims]
        data = xp.transpose(data, src_order)
        shape_iter = iter(data.shape)
        full_shape = [
            next(shape_iter) if d in q.dims else 1 for d in out_dims
        ]
        return data.reshape(full_shape)

    return tuple(out_dims), expand(a), expand(b)


def zeros_like(q: Quantity) -> Quantity:
    xp = jnp if isinstance(q.data, jax.Array) else np
    return Quantity(xp.zeros_like(q.data), q.dims, q.units, dict(q.attrs))


def ones_like(q: Quantity) -> Quantity:
    xp = jnp if isinstance(q.data, jax.Array) else np
    return Quantity(xp.ones_like(q.data), q.dims, q.units, dict(q.attrs))


def full_like(q: Quantity, value) -> Quantity:
    xp = jnp if isinstance(q.data, jax.Array) else np
    return Quantity(xp.full_like(q.data, value), q.dims, q.units, dict(q.attrs))


def where(cond, x, y) -> Quantity:
    """Dim-aligned three-way where; at least one argument must be a Quantity."""
    for template in (cond, x, y):
        if isinstance(template, Quantity):
            break
    else:
        raise TypeError("where() requires at least one Quantity argument")

    def data_of(v):
        return v.data if isinstance(v, Quantity) else v

    qs = [v for v in (cond, x, y) if isinstance(v, Quantity)]
    # successively align to find output dims
    out = qs[0]
    for q in qs[1:]:
        dims, _, _ = _align(out, q)
        out = Quantity(np.empty([0] * len(dims)), dims) if False else out
    # simple path: rely on _align pairing via arithmetic identities
    use_jax = any(isinstance(data_of(v), jax.Array) for v in (cond, x, y))
    xp = jnp if use_jax else np

    # Build the union dim order
    out_dims = []
    for q in qs:
        for d in q.dims:
            if d not in out_dims:
                out_dims.append(d)

    def expand(v):
        if not isinstance(v, Quantity):
            return v
        src_order = [v.dims.index(d) for d in out_dims if d in v.dims]
        data = xp.transpose(v.data, src_order)
        shape_iter = iter(data.shape)
        full_shape = [next(shape_iter) if d in v.dims else 1 for d in out_dims]
        return data.reshape(full_shape)

    return Quantity(
        xp.where(expand(cond), expand(x), expand(y)), tuple(out_dims)
    )
