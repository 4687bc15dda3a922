"""Novelty detection + out-of-sample gating.

reference: external/fv3fit/fv3fit/_shared/novelty_detector.py:21-60
(NoveltyDetector protocol: is_novelty / novelty_score / centered_score),
sklearn/_min_max_novelty_detector.py:35-160 and
_ocsvm_novelty_detector.py (trainers "min_max_novelty_detector" /
"ocsvm_novelty_detector"), _shared/taper_function.py (taper_mask /
taper_ramp / taper_decay), _shared/models.py:340-440 OutOfSampleModel
("out_of_sample").
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function

NOVELTY_OUTPUT_VAR = "is_novelty"
SCORE_OUTPUT_VAR = "novelty_score"
CENTERED_SCORE_OUTPUT_VAR = "centered_score"
TAPER_VALUES_OUTPUT_VAR = "taper_values"


# ---------------------------------------------------------------------------
# taper functions (reference _shared/taper_function.py)
# ---------------------------------------------------------------------------


def taper_mask(score, cutoff: float = 0.0, **_):
    """0 where score > cutoff, else 1."""
    return jnp.where(score > cutoff, 0.0, 1.0)


def taper_ramp(score, ramp_min: float = 0.0, ramp_max: float = 1.0, **_):
    """Linear 1 -> 0 ramp between ramp_min and ramp_max."""
    return jnp.clip((ramp_max - score) / (ramp_max - ramp_min), 0.0, 1.0)


def taper_decay(score, threshold: float = 0.0, rate: float = 1.0, **_):
    """Exponential suppression beyond the threshold."""
    return jnp.where(
        score > threshold, jnp.exp(-(score - threshold) / rate), 1.0
    )


_TAPERS = {"taper_mask": taper_mask, "taper_ramp": taper_ramp,
           "taper_decay": taper_decay}


def get_taper_function(name: str, config: Dict) -> Callable:
    fn = _TAPERS[name]
    return lambda score: fn(score, **config)


# ---------------------------------------------------------------------------
# detectors
# ---------------------------------------------------------------------------


class NoveltyDetector(Predictor):
    """Scores samples by distance from the training distribution; outputs
    is_novelty / novelty_score / centered_score (reference
    novelty_detector.py:21-60)."""

    def __init__(self, input_variables: Sequence[str]):
        super().__init__(
            list(input_variables),
            [NOVELTY_OUTPUT_VAR, SCORE_OUTPUT_VAR, CENTERED_SCORE_OUTPUT_VAR],
        )

    def _score(self, X: Dataset) -> jnp.ndarray:
        raise NotImplementedError

    def predict_novelties(self, X: Dataset, cutoff: float = 0.0):
        centered = self._score(X)
        diags = Dataset(
            {
                SCORE_OUTPUT_VAR: Quantity(centered, ("sample",)),
                CENTERED_SCORE_OUTPUT_VAR: Quantity(centered, ("sample",)),
                NOVELTY_OUTPUT_VAR: Quantity(
                    (centered > cutoff).astype(jnp.float32), ("sample",)
                ),
            }
        )
        return centered, diags

    def predict(self, X: Dataset) -> Dataset:
        _, diags = self.predict_novelties(X)
        return diags


@io.register("minmax")
class MinMaxNoveltyDetector(NoveltyDetector):
    """Per-feature min/max bounds: centered score = largest normalized
    bound violation over features; <= 0 in-sample
    (reference _min_max_novelty_detector.py:48-160)."""

    def __init__(self, input_variables, minima=None, maxima=None, info=None):
        super().__init__(input_variables)
        self.minima = minima
        self.maxima = maxima
        self.info = info

    def fit(self, batch: Dataset) -> "MinMaxNoveltyDetector":
        data = packer.dataset_to_samples(batch, self.input_variables)
        X, self.info = packer.pack(data, self.input_variables)
        self.minima = jnp.min(X, axis=0)
        self.maxima = jnp.max(X, axis=0)
        return self

    def _score(self, Xd: Dataset) -> jnp.ndarray:
        data = packer.dataset_to_samples(Xd, self.input_variables)
        X, _ = packer.pack(data, self.input_variables)
        scale = jnp.maximum(self.maxima - self.minima, 1e-12)
        above = (X - self.maxima) / scale
        below = (self.minima - X) / scale
        return jnp.max(jnp.maximum(above, below), axis=1)

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "bounds.npz"),
            minima=np.asarray(self.minima),
            maxima=np.asarray(self.maxima),
        )
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "info": self.info.to_dict(),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "MinMaxNoveltyDetector":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "bounds.npz"))
        return cls(
            meta["input_variables"],
            minima=jnp.asarray(z["minima"]),
            maxima=jnp.asarray(z["maxima"]),
            info=packer.PackingInfo.from_dict(meta["info"]),
        )


@io.register("ocsvm")
class OCSVMNoveltyDetector(NoveltyDetector):
    """One-class SVM detector via scikit-learn (offline scoring;
    reference _ocsvm_novelty_detector.py:46)."""

    def __init__(self, input_variables, model=None, info=None):
        super().__init__(input_variables)
        self.model = model
        self.info = info

    def fit(self, batch: Dataset, gamma: float = "scale", nu: float = 0.1):
        from sklearn.svm import OneClassSVM

        data = packer.dataset_to_samples(batch, self.input_variables)
        X, self.info = packer.pack(data, self.input_variables)
        self.model = OneClassSVM(gamma=gamma, nu=nu).fit(np.asarray(X))
        return self

    def _score(self, Xd: Dataset) -> jnp.ndarray:
        data = packer.dataset_to_samples(Xd, self.input_variables)
        X, _ = packer.pack(data, self.input_variables)
        # sklearn: decision_function > 0 means in-sample; flip sign so
        # larger = more novel (matching the centered-score convention)
        return jnp.asarray(-self.model.decision_function(np.asarray(X)))

    def dump(self, path: str) -> None:
        import pickle

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "model.pkl"), "wb") as f:
            pickle.dump(self.model, f)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "info": self.info.to_dict(),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "OCSVMNoveltyDetector":
        import pickle

        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        with open(os.path.join(path, "model.pkl"), "rb") as f:
            model = pickle.load(f)
        return cls(
            meta["input_variables"], model=model,
            info=packer.PackingInfo.from_dict(meta["info"]),
        )


# ---------------------------------------------------------------------------
# trainers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MinMaxNoveltyDetectorHyperparameters:
    input_variables: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class OCSVMNoveltyDetectorHyperparameters:
    input_variables: List[str] = dataclasses.field(default_factory=list)
    gamma: str = "scale"
    nu: float = 0.1
    max_samples: int = 20000


@register_training_function(
    "min_max_novelty_detector", MinMaxNoveltyDetectorHyperparameters
)
def train_min_max_novelty_detector(hyperparameters, train_batches, val=None):
    det = MinMaxNoveltyDetector(hyperparameters.input_variables)
    for batch in train_batches:
        if det.minima is None:
            det.fit(batch)
        else:
            data = packer.dataset_to_samples(batch, det.input_variables)
            X, _ = packer.pack(data, det.input_variables)
            det.minima = jnp.minimum(det.minima, jnp.min(X, axis=0))
            det.maxima = jnp.maximum(det.maxima, jnp.max(X, axis=0))
    return det


@register_training_function(
    "ocsvm_novelty_detector", OCSVMNoveltyDetectorHyperparameters
)
def train_ocsvm_novelty_detector(hyperparameters, train_batches, val=None):
    det = OCSVMNoveltyDetector(hyperparameters.input_variables)
    batch = list(train_batches)[0]
    det.fit(batch, gamma=hyperparameters.gamma, nu=hyperparameters.nu)
    return det


# ---------------------------------------------------------------------------
# out-of-sample wrapper (reference models.py:340-440)
# ---------------------------------------------------------------------------


@io.register("out_of_sample")
class OutOfSampleModel(Predictor):
    """Taper base-model outputs by novelty score."""

    def __init__(
        self,
        base_model: Predictor,
        novelty_detector: NoveltyDetector,
        cutoff: float = 0.0,
        taper: Optional[Callable] = None,
        taper_config: Optional[Dict] = None,
    ):
        inputs = sorted(
            set(base_model.input_variables)
            | set(novelty_detector.input_variables)
        )
        outputs = sorted(
            set(base_model.output_variables)
            | set(novelty_detector.output_variables)
            | {TAPER_VALUES_OUTPUT_VAR}
        )
        super().__init__(inputs, outputs)
        self.base_model = base_model
        self.novelty_detector = novelty_detector
        self.cutoff = cutoff
        self._taper_config = taper_config or {"name": "taper_mask",
                                              "cutoff": cutoff}
        self.taper = taper or get_taper_function(
            self._taper_config["name"],
            {k: v for k, v in self._taper_config.items() if k != "name"},
        )

    def predict(self, X: Dataset) -> Dataset:
        base = self.base_model.predict(X)
        centered, diags = self.novelty_detector.predict_novelties(
            X, cutoff=self.cutoff
        )
        taper_values = self.taper(centered)
        out = {k: diags[k] for k in diags}
        out[TAPER_VALUES_OUTPUT_VAR] = Quantity(taper_values, ("sample",))
        for var in self.base_model.output_variables:
            q = base[var]
            arr = jnp.asarray(q.data)
            t = taper_values.reshape((-1,) + (1,) * (arr.ndim - 1))
            out[var] = Quantity(arr * t, q.dims, q.units)
        return Dataset(out)

    def dump(self, path):
        os.makedirs(path, exist_ok=True)
        io.dump(self.base_model, os.path.join(path, "base_model"))
        io.dump(self.novelty_detector, os.path.join(path, "novelty_detector"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {"cutoff": self.cutoff, "tapering_function": self._taper_config},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "OutOfSampleModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(
            io.load(os.path.join(path, "base_model")),
            io.load(os.path.join(path, "novelty_detector")),
            cutoff=meta.get("cutoff", 0.0),
            taper_config=meta.get("tapering_function"),
        )


@io.register("constant-output-novelty")
class ConstantOutputNoveltyDetector(NoveltyDetector):
    """Test stub emitting a constant novelty score (reference
    fv3fit/testing.py constant-output-novelty) — exercises the
    out-of-sample taper path without a trained detector."""

    def __init__(self, input_variables: Sequence[str], score: float = 0.0):
        super().__init__(input_variables)
        self.score = float(score)

    def _score(self, X: Dataset) -> jnp.ndarray:
        n = next(iter(X.values())).shape[0]
        return jnp.full((n,), self.score, jnp.float32)

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {"input_variables": self.input_variables, "score": self.score},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "ConstantOutputNoveltyDetector":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        return cls(meta["input_variables"], meta["score"])
