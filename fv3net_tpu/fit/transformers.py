"""Latent-space transformers and the generic dataset predictor.

Reference semantics: external/fv3fit/fv3fit/reservoir/transformers/
{transformer.py:291-330 DoNothingAutoencoder, sk_transformer.py:18-120
SkTransformer} and _shared/xr_prediction.py:139-210 DatasetPredictor —
re-designed for TPU: the SkTransformer's sklearn PCA+scaler pair becomes
a jnp SVD-based PCA (encode/decode are single matmuls).
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.predictor import Predictor

__all__ = ["DoNothingAutoencoder", "PCATransformer", "DatasetPredictor"]


@io.register("do-nothing-transformer")
class DoNothingAutoencoder:
    """Identity transformer: encode concatenates per-variable feature
    arrays, decode splits them back (reference transformer.py:291-330;
    used to run reservoirs in raw space and in tests)."""

    def __init__(self, original_feature_sizes: Sequence[int]):
        self.original_feature_sizes = list(original_feature_sizes)

    @property
    def n_latent_dims(self) -> int:
        return int(sum(self.original_feature_sizes))

    def encode(self, x: Sequence[jnp.ndarray]) -> jnp.ndarray:
        self.original_feature_sizes = [arr.shape[-1] for arr in x]
        return jnp.concatenate(list(x), axis=-1)

    def decode(self, latent: jnp.ndarray) -> List[jnp.ndarray]:
        if not self.original_feature_sizes:
            raise ValueError("Must encode data before decoding.")
        split = np.cumsum(self.original_feature_sizes)[:-1]
        return jnp.split(latent, split, axis=-1)

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {"original_feature_sizes": self.original_feature_sizes}, f
            )

    @classmethod
    def load(cls, path: str) -> "DoNothingAutoencoder":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(meta["original_feature_sizes"])


@io.register("sk-transformer")
class PCATransformer:
    """Standard-scaled PCA encoder/decoder (the reference SkTransformer's
    PCA+StandardScaler stack, sk_transformer.py:18-120) with the fit an
    SVD and encode/decode single matmuls — the MXU formulation.

    ``predict`` returns the encode/decode roundtrip so reconstruction
    error can be audited offline, as in the reference."""

    def __init__(
        self,
        mean: jnp.ndarray,
        std: jnp.ndarray,
        components: jnp.ndarray,  # [n_latent, n_features]
        enforce_positive_outputs: bool = False,
        original_feature_sizes: Optional[Sequence[int]] = None,
    ):
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.components = jnp.asarray(components)
        self.enforce_positive_outputs = enforce_positive_outputs
        self.original_feature_sizes = (
            list(original_feature_sizes) if original_feature_sizes else None
        )

    @classmethod
    def fit(
        cls,
        x: Sequence[np.ndarray],
        n_components: int,
        enforce_positive_outputs: bool = False,
    ) -> "PCATransformer":
        sizes = [arr.shape[-1] for arr in x]
        X = np.concatenate([np.asarray(a) for a in x], axis=-1)
        X = X.reshape(-1, X.shape[-1])
        mean = X.mean(axis=0)
        std = np.maximum(X.std(axis=0), 1e-7)
        Xn = (X - mean) / std
        # principal axes from the thin SVD of the normalized data
        _, _, vt = np.linalg.svd(Xn, full_matrices=False)
        if n_components > vt.shape[0]:
            raise ValueError(
                f"n_components={n_components} exceeds the "
                f"{vt.shape[0]} components available from data of shape "
                f"{X.shape} (min(n_samples, n_features))"
            )
        return cls(
            jnp.asarray(mean),
            jnp.asarray(std),
            jnp.asarray(vt[:n_components]),
            enforce_positive_outputs=enforce_positive_outputs,
            original_feature_sizes=sizes,
        )

    @property
    def n_latent_dims(self) -> int:
        return int(self.components.shape[0])

    def encode(self, x: Sequence[jnp.ndarray]) -> jnp.ndarray:
        arrs = list(x)
        self.original_feature_sizes = [a.shape[-1] for a in arrs]
        X = jnp.concatenate(arrs, axis=-1)
        return ((X - self.mean) / self.std) @ self.components.T

    def decode(self, latent: jnp.ndarray) -> List[jnp.ndarray]:
        X = (latent @ self.components) * self.std + self.mean
        if self.enforce_positive_outputs:
            X = jnp.maximum(X, 0.0)
        if not self.original_feature_sizes:
            raise ValueError("Must encode data before decoding.")
        split = np.cumsum(self.original_feature_sizes)[:-1]
        return jnp.split(X, split, axis=-1)

    def predict(self, x: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        return self.decode(self.encode(x))

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "weights.npz"),
            mean=np.asarray(self.mean),
            std=np.asarray(self.std),
            components=np.asarray(self.components),
        )
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "enforce_positive_outputs": self.enforce_positive_outputs,
                    "original_feature_sizes": self.original_feature_sizes,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "PCATransformer":
        z = np.load(os.path.join(path, "weights.npz"))
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(
            jnp.asarray(z["mean"]),
            jnp.asarray(z["std"]),
            jnp.asarray(z["components"]),
            enforce_positive_outputs=meta["enforce_positive_outputs"],
            original_feature_sizes=meta["original_feature_sizes"],
        )


@io.register("dataset-predictor")
class DatasetPredictor(Predictor):
    """Generic Dataset-in/Dataset-out wrapper over any io-registered
    model exposing ``predict_arrays`` on packed [sample, feature]
    arrays (reference xr_prediction.py:139-210): handles stacking,
    optional halo appending for convolution-style models, and nested
    dump/load through the io registry."""

    def __init__(
        self,
        input_variables: Sequence[str],
        output_variables: Sequence[str],
        model,
        n_halo: int = 0,
    ):
        super().__init__(list(input_variables), list(output_variables))
        self.model = model
        self.n_halo = n_halo

    def predict(self, X: Dataset) -> Dataset:
        if self.n_halo > 0:
            from fv3net_tpu.parallel.halo import halo_append

            X = Dataset(
                {
                    name: type(X[name])(
                        halo_append(jnp.asarray(X[name].data), self.n_halo),
                        X[name].dims,
                        X[name].units,
                    )
                    for name in X
                },
                coords=dict(X.coords),
            )
        data = packer.dataset_to_samples(X, self.input_variables)
        out = self.model.predict_arrays(data)
        return packer.samples_to_dataset(out)

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        io.dump(self.model, os.path.join(path, "base_model"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "output_variables": self.output_variables,
                    "n_halo": self.n_halo,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "DatasetPredictor":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        model = io.load(os.path.join(path, "base_model"))
        return cls(
            meta["input_variables"],
            meta["output_variables"],
            model,
            n_halo=meta["n_halo"],
        )
