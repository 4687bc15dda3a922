"""Per-feature standard normalization (reference: the
standard_denormalize layers at external/fv3fit/fv3fit/keras/_models/
shared/utils.py), as plain arrays so it fuses into the jitted model."""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class StandardScaler:
    mean: jnp.ndarray  # [features]
    std: jnp.ndarray  # [features]

    @classmethod
    def fit(cls, X: jnp.ndarray, epsilon: float = 1e-7) -> "StandardScaler":
        mean = jnp.mean(X, axis=0)
        std = jnp.std(X, axis=0)
        return cls(mean=mean, std=jnp.maximum(std, epsilon))

    def normalize(self, X: jnp.ndarray) -> jnp.ndarray:
        return (X - self.mean) / self.std

    def denormalize(self, X: jnp.ndarray) -> jnp.ndarray:
        return X * self.std + self.mean

    def to_arrays(self) -> dict:
        return {"mean": np.asarray(self.mean), "std": np.asarray(self.std)}

    @classmethod
    def from_arrays(cls, d) -> "StandardScaler":
        return cls(mean=jnp.asarray(d["mean"]), std=jnp.asarray(d["std"]))
