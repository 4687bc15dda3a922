"""Random-forest trainer (scikit-learn backed).

reference: external/fv3fit/fv3fit/sklearn/_random_forest.py:39 — the
"sklearn_random_forest" trainer producing a Predictor over packed
[sample, feature] arrays.  Inference runs on host (forests don't map to
the MXU); the predictor is used offline and by prescribed-tendency
workflows, matching the reference's usage.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import List

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function


@dataclasses.dataclass
class RandomForestHyperparameters:
    """(reference _random_forest.py RandomForestHyperparameters subset)"""

    input_variables: List[str] = dataclasses.field(default_factory=list)
    output_variables: List[str] = dataclasses.field(default_factory=list)
    n_estimators: int = 100
    max_depth: int = None
    min_samples_leaf: int = 1
    n_jobs: int = -1
    random_state: int = 0


@io.register("sklearn_random_forest")
class RandomForestModel(Predictor):
    def __init__(self, input_variables, output_variables, regressor,
                 input_info, output_info):
        super().__init__(list(input_variables), list(output_variables))
        self.regressor = regressor
        self.input_info = input_info
        self.output_info = output_info

    def predict(self, X: Dataset) -> Dataset:
        data = packer.dataset_to_samples(X, self.input_variables)
        Xp, _ = packer.pack(data, self.input_variables)
        Y = self.regressor.predict(np.asarray(Xp))
        out = packer.unpack(jnp.asarray(Y), self.output_info)
        return packer.samples_to_dataset(out)

    def feature_importances(self):
        """Per-input importance mean/std across the tree ensemble,
        split by packed input variable (reference
        sklearn/_random_forest.py input_sensitivity feature importances,
        surfaced through fv3fit.InputSensitivity)."""
        trees = getattr(self.regressor, "estimators_", None)
        if trees:
            per_tree = np.stack([t.feature_importances_ for t in trees])
            mean = per_tree.mean(axis=0)
            std = per_tree.std(axis=0)
        else:
            mean = np.asarray(self.regressor.feature_importances_)
            std = np.zeros_like(mean)
        out = {}
        for name, sl in self.input_info.slices().items():
            out[name] = (mean[sl], std[sl])
        return out

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "regressor.pkl"), "wb") as f:
            pickle.dump(self.regressor, f)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "output_variables": self.output_variables,
                    "input_info": self.input_info.to_dict(),
                    "output_info": self.output_info.to_dict(),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "RandomForestModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        with open(os.path.join(path, "regressor.pkl"), "rb") as f:
            regressor = pickle.load(f)
        return cls(
            meta["input_variables"],
            meta["output_variables"],
            regressor,
            packer.PackingInfo.from_dict(meta["input_info"]),
            packer.PackingInfo.from_dict(meta["output_info"]),
        )


@register_training_function("sklearn_random_forest", RandomForestHyperparameters)
def train_random_forest(hp: RandomForestHyperparameters, train_batches,
                        val=None) -> RandomForestModel:
    from sklearn.ensemble import RandomForestRegressor

    xs, ys = [], []
    x_info = y_info = None
    for ds in train_batches:
        data = packer.dataset_to_samples(
            ds, list(hp.input_variables) + list(hp.output_variables)
        )
        X, x_info = packer.pack(data, hp.input_variables)
        Y, y_info = packer.pack(data, hp.output_variables)
        xs.append(np.asarray(X))
        ys.append(np.asarray(Y))
    reg = RandomForestRegressor(
        n_estimators=hp.n_estimators,
        max_depth=hp.max_depth,
        min_samples_leaf=hp.min_samples_leaf,
        n_jobs=hp.n_jobs,
        random_state=hp.random_state,
    )
    reg.fit(np.concatenate(xs), np.concatenate(ys))
    return RandomForestModel(
        hp.input_variables, hp.output_variables, reg, x_info, y_info
    )
