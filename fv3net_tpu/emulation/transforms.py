"""Tensor transforms for emulator training.

reference: external/fv3fit/fv3fit/emulation/transforms/transforms.py —
the TensorTransform protocol (forward/backward over dict states),
LogTransform, Difference, and composition; design doc
docs/design-docs/log-transformed-emulator.md.  jnp instead of tf.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp

State = Dict[str, jnp.ndarray]


class TensorTransform:
    """forward: physical -> training space; backward: inverse."""

    def forward(self, x: State) -> State:
        raise NotImplementedError

    def backward(self, y: State) -> State:
        raise NotImplementedError


@dataclasses.dataclass
class LogTransform(TensorTransform):
    """y = log(max(x, epsilon)) per field (reference transforms.py:111)."""

    field: str
    to: str = ""
    epsilon: float = 1e-30

    def __post_init__(self):
        self.to = self.to or f"log_{self.field}"

    def forward(self, x: State) -> State:
        out = dict(x)
        if self.field in x:  # tolerate absent fields (e.g. targets at
            # prediction time, reference transforms.py forward semantics)
            out[self.to] = jnp.log(jnp.maximum(x[self.field], self.epsilon))
        return out

    def backward(self, y: State) -> State:
        out = dict(y)
        if self.to in y:
            out[self.field] = jnp.exp(y[self.to])
        return out


@dataclasses.dataclass
class LimitValueTransform(TensorTransform):
    """Clip a field on backward (zero-floor emulator outputs)."""

    field: str
    lower: float = 0.0
    upper: float = None

    def forward(self, x: State) -> State:
        return dict(x)

    def backward(self, y: State) -> State:
        out = dict(y)
        if self.field in y:
            out[self.field] = jnp.clip(y[self.field], self.lower, self.upper)
        return out


@dataclasses.dataclass
class Difference(TensorTransform):
    """to = after - before; backward reconstructs after
    (reference transforms.py:18)."""

    to: str
    before: str
    after: str

    def forward(self, x: State) -> State:
        out = dict(x)
        if self.before in x and self.after in x:
            out[self.to] = x[self.after] - x[self.before]
        return out

    def backward(self, y: State) -> State:
        out = dict(y)
        if self.to in y and self.before in y:
            out[self.after] = y[self.before] + y[self.to]
        return out


@dataclasses.dataclass
class ComposedTransform(TensorTransform):
    """Apply forward in order, backward in reverse
    (reference ComposedTransformFactory)."""

    transforms: List[TensorTransform]

    def forward(self, x: State) -> State:
        for t in self.transforms:
            x = t.forward(x)
        return x

    def backward(self, y: State) -> State:
        for t in reversed(self.transforms):
            y = t.backward(y)
        return y
