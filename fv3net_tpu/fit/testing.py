"""Test predictors (reference: external/fv3fit/fv3fit/testing.py:36,135
ConstantOutputPredictor registered as 'constant-output')."""
from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit import io
from fv3net_tpu.fit.predictor import Predictor


@io.register("constant-output")
class ConstantOutputPredictor(Predictor):
    """Returns configured constant values, broadcast to the sample count.

    Used (as in the reference's machine_learning_mocks.py:31-60) to
    exercise the online ML path without training a model.
    """

    def __init__(
        self,
        input_variables: Sequence[str],
        output_variables: Sequence[str],
        outputs: Dict[str, np.ndarray] = None,
    ):
        super().__init__(input_variables, output_variables)
        self.outputs = {
            k: np.asarray(v) for k, v in (outputs or {}).items()
        }

    def set_outputs(self, **outputs):
        self.outputs.update({k: np.asarray(v) for k, v in outputs.items()})

    def predict(self, X: Dataset) -> Dataset:
        n_samples = next(iter(X.values())).shape[0]
        out = {}
        for name in self.output_variables:
            value = self.outputs.get(name, np.zeros(1))
            arr = jnp.broadcast_to(
                jnp.asarray(value), (n_samples,) + np.asarray(value).shape
            )
            dims = ("sample",) + tuple(
                f"z" if i == 0 else f"dim_{i}" for i in range(np.asarray(value).ndim)
            )
            out[name] = Quantity(arr, dims[: arr.ndim])
        return Dataset(out)

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "outputs.npz"),
            **{k: v for k, v in self.outputs.items()},
        )
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": list(self.input_variables),
                    "output_variables": list(self.output_variables),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "ConstantOutputPredictor":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        outputs = {}
        npz_path = os.path.join(path, "outputs.npz")
        if os.path.exists(npz_path):
            z = np.load(npz_path)
            outputs = {k: z[k] for k in z.files}
        return cls(meta["input_variables"], meta["output_variables"], outputs)
