"""Training registry + config + CLI.

Reference surface: ``@register_training_function(name, HyperparamCls)``
and ``get_training_function`` (external/fv3fit/fv3fit/_shared/
training_config.py), the ``python -m fv3fit.train`` CLI
(external/fv3fit/fv3fit/train.py:33-192: yaml config, dotted-path
overrides, seed, dump of configs next to the model, provenance print).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Type

import numpy as np

_TRAINING_FUNCTIONS: Dict[str, Tuple[Callable, Type]] = {}


def register_training_function(name: str, hyperparameter_class: Type):
    """Decorator registering ``fn(hyperparameters, train_batches,
    validation_batches) -> Predictor`` under ``name``."""

    def decorator(fn):
        if name in _TRAINING_FUNCTIONS:
            raise ValueError(f"training function {name!r} already registered")
        _TRAINING_FUNCTIONS[name] = (fn, hyperparameter_class)
        return fn

    return decorator


def get_training_function(name: str) -> Callable:
    return _TRAINING_FUNCTIONS[name][0]


def get_hyperparameter_class(name: str) -> Type:
    return _TRAINING_FUNCTIONS[name][1]


def training_function_names():
    return sorted(_TRAINING_FUNCTIONS)


@dataclasses.dataclass
class TrainingConfig:
    """Top-level training configuration (reference train.py:110-135
    TrainingConfig.from_dict semantics, minus wandb)."""

    model_type: str
    hyperparameters: Any
    random_seed: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "TrainingConfig":
        model_type = d["model_type"]
        hp_cls = get_hyperparameter_class(model_type)
        hp = hp_cls(**d.get("hyperparameters", {}))
        return cls(
            model_type=model_type,
            hyperparameters=hp,
            random_seed=d.get("random_seed", 0),
        )

    def to_dict(self) -> dict:
        return {
            "model_type": self.model_type,
            "hyperparameters": dataclasses.asdict(self.hyperparameters),
            "random_seed": self.random_seed,
        }


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed + 1)


def apply_config_overrides(d: dict, overrides: Sequence[str]) -> dict:
    """Apply ``a.b.c=value`` dotted-path CLI overrides (reference
    train.py:110-117)."""
    import yaml

    for item in overrides:
        path, value = item.split("=", 1)
        keys = path.split(".")
        node = d
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = yaml.safe_load(value)
    return d


def train_main(
    config_dict: dict,
    train_batches,
    validation_batches,
    output_path: str,
):
    """Core training flow: resolve trainer, fit, dump with provenance."""
    from fv3net_tpu.fit import io

    config = TrainingConfig.from_dict(config_dict)
    set_random_seed(config.random_seed)
    train_fn = get_training_function(config.model_type)
    model = train_fn(config.hyperparameters, train_batches, validation_batches)
    io.dump(model, output_path)
    with open(os.path.join(output_path, "train.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(config.to_dict(), f)
    print(
        json.dumps(
            {"step": "train", "model_type": config.model_type,
             "output": output_path}
        )
    )
    return model


def main(argv: Optional[Sequence[str]] = None) -> int:
    """CLI: train <training.yaml> <data.yaml> <output> [overrides...]
    (reference: python -m fv3fit.train, train.py:225)."""
    import yaml

    parser = argparse.ArgumentParser("fv3net_tpu.fit.train")
    parser.add_argument("training_config")
    parser.add_argument("training_data_config")
    parser.add_argument("output_path")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    with open(args.training_config) as f:
        config_dict = yaml.safe_load(f)
    config_dict = apply_config_overrides(config_dict, args.overrides)
    with open(args.training_data_config) as f:
        data_config = yaml.safe_load(f)

    def open_batches(cfg, variables):
        """Reference-shaped loader configs (fv3fit.data registry /
        loaders.BatchesLoader, reference train.py:139-141) or the legacy
        {kind, path, variables} dict."""
        if "kind" in cfg or ("path" in cfg and "variables" in cfg):
            from fv3net_tpu.loaders import batches_from_config

            return batches_from_config(cfg)
        from fv3net_tpu.fit.data import tfdataset_loader_from_dict

        loader = tfdataset_loader_from_dict(cfg)
        return loader.open_tfdataset(None, variables)

    hp = config_dict.get("hyperparameters", {})
    variables = list(hp.get("input_variables", [])) + list(
        hp.get("output_variables", [])
    )
    val_config = data_config.pop("validation", None)
    train_batches = open_batches(data_config, variables)
    val_batches = open_batches(val_config, variables) if val_config else None
    train_main(config_dict, train_batches, val_batches, args.output_path)
    return 0


if __name__ == "__main__":
    # `python -m fv3net_tpu.fit.train` loads this file as __main__, a
    # SECOND module instance whose trainer registry would be empty —
    # delegate to the canonical instance that fv3net_tpu.fit populates
    from fv3net_tpu.fit.train import main as _canonical_main

    raise SystemExit(_canonical_main())
