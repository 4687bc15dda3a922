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
