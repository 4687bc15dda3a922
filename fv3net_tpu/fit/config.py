"""Optimizer / learning-rate-schedule / regularizer configs.

Reference semantics: external/fv3fit/fv3fit/_shared/config.py:39-80
(OptimizerConfig / LearningRateScheduleConfig instantiate Keras
objects by name+kwargs; RegularizerConfig at keras/_models/shared/)
— here the names resolve to optax transforms, the TPU-native
optimization stack.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "LearningRateScheduleConfig",
    "OptimizerConfig",
    "OutputLimit",
    "OutputLimitConfig",
    "RegularizerConfig",
]


@dataclasses.dataclass
class LearningRateScheduleConfig:
    """``name`` is any optax schedule factory (exponential_decay,
    cosine_decay_schedule, piecewise_constant_schedule, constant_schedule,
    ...); ``kwargs`` are passed through (reference config.py:39-47)."""

    name: str
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def instance(self):
        try:
            factory = getattr(optax, self.name)
        except AttributeError:
            raise ValueError(f"unknown optax schedule {self.name!r}")
        return factory(**self.kwargs)


@dataclasses.dataclass
class OptimizerConfig:
    """``name`` is any optax optimizer factory (adam, sgd, adamw,
    rmsprop, lion, ...); the Keras names ``Adam``/``SGD`` are accepted
    lowercase-mapped for config portability (reference config.py:50-80).
    """

    name: str = "adam"
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    learning_rate_schedule: Optional[LearningRateScheduleConfig] = None

    @property
    def instance(self) -> optax.GradientTransformation:
        name = self.name.lower()
        try:
            factory = getattr(optax, name)
        except AttributeError:
            raise ValueError(f"unknown optax optimizer {self.name!r}")
        kwargs = dict(self.kwargs)
        if self.learning_rate_schedule is not None:
            kwargs["learning_rate"] = self.learning_rate_schedule.instance
        return factory(**kwargs)


@dataclasses.dataclass
class OutputLimit:
    """Optional min/max bounds for one output variable (reference:
    fv3fit/keras/_models/shared/output_limit.py:11 ``OutputLimit``).

    ``limit_array`` applies a zero-slope clamp: values below ``min``
    become ``min``, values at or above ``max`` become ``max`` — the
    piecewise activation the reference builds from nested tf.where
    calls, which is exactly a clip."""

    min: Optional[float] = None
    max: Optional[float] = None

    def __post_init__(self):
        if self.min is not None and self.max is not None:
            if self.max <= self.min:
                raise ValueError(
                    f"max value ({self.max}) must be greater than min "
                    f"value ({self.min})."
                )

    def limit_array(self, x):
        if self.min is None and self.max is None:
            return x
        return jnp.clip(
            x,
            None if self.min is None else self.min,
            None if self.max is None else self.max,
        )


@dataclasses.dataclass
class OutputLimitConfig:
    """Per-output-variable range limiting applied to trainer predictions
    (reference: fv3fit/keras/_models/shared/output_limit.py:51
    ``OutputLimitConfig``, wired into the dense/convolutional/
    precipitative configs).  ``limits`` maps output variable names to
    ``OutputLimit`` bounds; unlisted outputs pass through.

    The TPU build applies the clamp in two jit-friendly forms:
    ``apply_limits`` on a dict of per-variable arrays, or
    ``packed_bounds``/``limit_packed`` building per-feature min/max
    vectors from a ``PackingInfo`` so the clamp runs as one fused
    ``jnp.clip`` on the packed [sample, feature] output inside the
    prognostic step."""

    limits: Mapping[str, OutputLimit] = dataclasses.field(
        default_factory=dict
    )

    def __post_init__(self):
        self.limits = {
            k: v if isinstance(v, OutputLimit) else OutputLimit(**dict(v))
            for k, v in dict(self.limits).items()
        }

    def __bool__(self) -> bool:
        return any(
            v.min is not None or v.max is not None
            for v in self.limits.values()
        )

    def apply_limits(self, outputs: Mapping[str, Any]) -> dict:
        return {
            name: (
                self.limits[name].limit_array(arr)
                if name in self.limits
                else arr
            )
            for name, arr in outputs.items()
        }

    def packed_bounds(self, names, features):
        """(min_vec, max_vec) float32 [total_features] with +-inf where
        unbounded, aligned with the packed feature layout."""
        import numpy as np

        lo, hi = [], []
        for name, nf in zip(names, features):
            lim = self.limits.get(name, OutputLimit())
            lo += [(-np.inf if lim.min is None else lim.min)] * nf
            hi += [(np.inf if lim.max is None else lim.max)] * nf
        return np.asarray(lo, np.float32), np.asarray(hi, np.float32)

    def limit_packed(self, Y, info) -> Any:
        """Clamp a packed [sample, feature] prediction (one fused clip)."""
        if not self:
            return Y
        lo, hi = self.packed_bounds(info.names, info.features)
        return jnp.clip(Y, jnp.asarray(lo, Y.dtype), jnp.asarray(hi, Y.dtype))

    def to_dict(self) -> dict:
        return {
            name: {"min": lim.min, "max": lim.max}
            for name, lim in self.limits.items()
        }

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "OutputLimitConfig":
        return cls(limits=dict(d or {}))


@dataclasses.dataclass
class RegularizerConfig:
    """Weight-penalty config: 'none', 'l1', 'l2' or 'l1_l2' with
    strengths in ``kwargs`` (the keras.regularizers analog).  The
    ``penalty`` callable maps a params pytree to a scalar to be added to
    the training loss; bias terms (1-D leaves) are excluded, matching
    kernel-only regularization in the reference."""

    name: str = "none"
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)

    def penalty(self, params) -> jnp.ndarray:
        name = self.name.lower()
        if name == "none":
            return jnp.asarray(0.0)
        l1 = float(self.kwargs.get("l1", 0.01 if "l1" in name else 0.0))
        l2 = float(self.kwargs.get("l2", 0.01 if name.endswith("l2") else 0.0))
        leaves = [
            leaf
            for leaf in jax.tree_util.tree_leaves(params)
            if hasattr(leaf, "ndim") and leaf.ndim >= 2
        ]
        total = jnp.asarray(0.0)
        for leaf in leaves:
            if l1:
                total = total + l1 * jnp.sum(jnp.abs(leaf))
            if l2:
                total = total + l2 * jnp.sum(leaf * leaf)
        return total
