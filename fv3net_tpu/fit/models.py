"""Composable predictor wrappers.

reference: external/fv3fit/fv3fit/_shared/models.py:19-485 — the
registered wrapper classes ``combined_output_model`` / ``tapered_model``
/ ``derived_model`` / ``ensemble`` / ``output_transformed_model`` /
``squashed_output_model`` (out_of_sample lands with the novelty
detectors).  Same composition semantics over this framework's
Dataset-of-Quantities predictors; nested models serialize into numbered
subdirectories of the artifact dir.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Mapping, Sequence

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit import io
from fv3net_tpu.fit.predictor import Predictor


def _dump_models(models, path):
    names = []
    for i, model in enumerate(models):
        sub = os.path.join(path, f"model_{i}")
        io.dump(model, sub)
        names.append(f"model_{i}")
    return names


def _load_models(path, names):
    return [io.load(os.path.join(path, n)) for n in names]


@io.register("combined_output_model")
class CombinedOutputModel(Predictor):
    """Concatenate outputs of models with disjoint output sets
    (reference models.py:19-62)."""

    def __init__(self, models: Sequence[Predictor]):
        inputs: List[str] = []
        outputs: List[str] = []
        for m in models:
            for v in m.input_variables:
                if v not in inputs:
                    inputs.append(v)
            for v in m.output_variables:
                if v in outputs:
                    raise ValueError(f"duplicate output variable {v}")
                outputs.append(v)
        super().__init__(inputs, outputs)
        self.models = list(models)

    def predict(self, X: Dataset) -> Dataset:
        out: Dict[str, Quantity] = {}
        for m in self.models:
            pred = m.predict(X)
            out.update({k: pred[k] for k in pred})
        return Dataset(out)

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        names = _dump_models(self.models, path)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"models": names}, f)

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(_load_models(path, meta["models"]))


@io.register("ensemble")
class EnsembleModel(Predictor):
    """Mean/median over member predictions (reference models.py:223-276)."""

    def __init__(self, models: Sequence[Predictor], reduction: str = "mean"):
        if reduction not in ("mean", "median"):
            raise ValueError(f"reduction must be mean|median, got {reduction}")
        first = models[0]
        super().__init__(
            list(first.input_variables), list(first.output_variables)
        )
        self.models = list(models)
        self.reduction = reduction

    def predict(self, X: Dataset) -> Dataset:
        preds = [m.predict(X) for m in self.models]
        out = {}
        for var in self.output_variables:
            stack = jnp.stack([jnp.asarray(p[var].data) for p in preds])
            red = jnp.mean(stack, 0) if self.reduction == "mean" else (
                jnp.median(stack, 0)
            )
            out[var] = Quantity(red, preds[0][var].dims, preds[0][var].units)
        return Dataset(out)

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        names = _dump_models(self.models, path)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"models": names, "reduction": self.reduction}, f)

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(_load_models(path, meta["models"]), meta["reduction"])


@io.register("tapered_model")
class TaperedModel(Predictor):
    """Exponentially taper listed outputs in the upper levels
    (reference models.py:65-107 + TaperConfig)."""

    def __init__(self, model: Predictor, tapering: Mapping[str, dict]):
        super().__init__(
            list(model.input_variables), list(model.output_variables)
        )
        self.model = model
        self.tapering = {k: dict(v) for k, v in tapering.items()}

    def predict(self, X: Dataset) -> Dataset:
        from fv3net_tpu.data_transform import vertical_tapering_scale_factors

        pred = self.model.predict(X)
        out = {k: pred[k] for k in pred}
        for var, cfg in self.tapering.items():
            q = out[var]
            scale = vertical_tapering_scale_factors(
                q.shape[-1], cutoff=cfg["cutoff"], rate=cfg["rate"]
            )
            out[var] = Quantity(
                jnp.asarray(q.data) * jnp.asarray(scale), q.dims, q.units
            )
        return Dataset(out)

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        io.dump(self.model, os.path.join(path, "base_model"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"tapering": self.tapering}, f)

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(io.load(os.path.join(path, "base_model")),
                   meta["tapering"])


@io.register("derived_model")
class DerivedModel(Predictor):
    """Add DerivedMapping-computed outputs to a base model's predictions
    (reference models.py:110-220)."""

    def __init__(self, model: Predictor, derived_output_variables: Sequence[str]):
        from fv3net_tpu.derived import DerivedMapping

        self._check = [
            v for v in derived_output_variables if v not in DerivedMapping.VARIABLES
        ]
        if self._check:
            raise ValueError(
                f"unknown derived variables: {self._check}"
            )
        extra_inputs = DerivedMapping.find_all_required_inputs(
            derived_output_variables
        )
        inputs = list(model.input_variables) + [
            v for v in extra_inputs if v not in model.input_variables
        ]
        outputs = list(model.output_variables) + list(derived_output_variables)
        super().__init__(inputs, outputs)
        self.base_model = model
        self.derived_output_variables = list(derived_output_variables)

    def predict(self, X: Dataset) -> Dataset:
        from fv3net_tpu.derived import DerivedMapping

        pred = self.base_model.predict(X)
        combined = {k: X[k] for k in X}
        combined.update({k: pred[k] for k in pred})
        mapping = DerivedMapping(combined)
        out = {k: pred[k] for k in pred}
        for var in self.derived_output_variables:
            out[var] = mapping[var]
        return Dataset(out)

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        io.dump(self.base_model, os.path.join(path, "base_model"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {"derived_output_variables": self.derived_output_variables}, f
            )

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(
            io.load(os.path.join(path, "base_model")),
            meta["derived_output_variables"],
        )


@io.register("output_transformed_model")
class TransformedPredictor(Predictor):
    """Apply registered data transforms to base predictions
    (reference models.py:279-337)."""

    def __init__(self, model: Predictor, transforms: Sequence[dict]):
        from fv3net_tpu.data_transform import ChainedDataTransform, DataTransform

        self._transform = ChainedDataTransform(
            [DataTransform(**t) for t in transforms]
        )
        self._transforms_config = [dict(t) for t in transforms]
        inputs = list(model.input_variables)
        for v in self._transform.input_variables:
            if v not in inputs and v not in model.output_variables:
                inputs.append(v)
        outputs = list(model.output_variables) + list(
            self._transform.output_variables
        )
        super().__init__(inputs, outputs)
        self.base_model = model

    def predict(self, X: Dataset) -> Dataset:
        pred = self.base_model.predict(X)
        merged = Dataset({k: X[k] for k in X})
        for k in pred:
            merged[k] = pred[k]
        transformed = self._transform.apply(merged)
        return Dataset({v: transformed[v] for v in self.output_variables})

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        io.dump(self.base_model, os.path.join(path, "base_model"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"transforms": self._transforms_config}, f)

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(io.load(os.path.join(path, "base_model")),
                   meta["transforms"])


@io.register("squashed_output_model")
class SquashedOutputModel(Predictor):
    """Zero outputs where a target variable falls below a threshold
    (reference models.py:442-485: squash_to where squash_by <
    squash_threshold)."""

    def __init__(
        self,
        model: Predictor,
        squash_by: str,
        squash_threshold: float,
        additional_squash_target_variables: Sequence[str] = (),
    ):
        super().__init__(
            list(model.input_variables), list(model.output_variables)
        )
        if squash_by not in model.output_variables:
            raise ValueError(
                f"squash_by variable {squash_by!r} not in model outputs"
            )
        self.model = model
        self.squash_by = squash_by
        self.squash_threshold = squash_threshold
        self.additional = list(additional_squash_target_variables)

    def predict(self, X: Dataset) -> Dataset:
        pred = self.model.predict(X)
        by = jnp.asarray(pred[self.squash_by].data)
        mask = by >= self.squash_threshold
        out = {}
        targets = {self.squash_by, *self.additional}
        for var in pred:
            q = pred[var]
            if var in targets:
                out[var] = Quantity(
                    jnp.where(mask, jnp.asarray(q.data), 0.0), q.dims, q.units
                )
            else:
                out[var] = q
        return Dataset(out)

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        io.dump(self.model, os.path.join(path, "base_model"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "squash_by": self.squash_by,
                    "squash_threshold": self.squash_threshold,
                    "additional_squash_target_variables": self.additional,
                },
                f,
            )

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(
            io.load(os.path.join(path, "base_model")),
            meta["squash_by"],
            meta["squash_threshold"],
            meta["additional_squash_target_variables"],
        )
