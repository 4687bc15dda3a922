"""Hyperparameter sweeps (reference: fv3fit's wandb sweep integration,
external/fv3fit/fv3fit/train.py:119-134 + workflows/argo/wandb-sweep.yaml
— a sweep config fans training jobs out over the cluster).

Zero-egress, single-host: the same sweep-config surface (grid / random
over dotted-path parameter spaces) runs locally through the pipeline
runner, each trial training with `train_main` and logging one tracking
run; `tracking-query` then lists/filters the trials.
"""
from __future__ import annotations

import copy
import itertools
import random as _random
from typing import Any, Dict, List

from fv3net_tpu.pipelines.runner import run_pipeline


def _set_dotted(d: Dict[str, Any], path: str, value) -> None:
    keys = path.split(".")
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def expand_sweep(sweep_config: Dict[str, Any],
                 seed: int = 0) -> List[Dict[str, Any]]:
    """Sweep config -> list of parameter assignments.

    ``{"method": "grid"|"random", "count": N (random only),
       "parameters": {"dotted.path": {"values": [...]} |
                      {"min": a, "max": b}}}``
    (the wandb sweep-config subset the reference uses)."""
    method = sweep_config.get("method", "grid")
    params = sweep_config["parameters"]
    if method == "grid":
        names = list(params)
        value_lists = []
        for n in names:
            spec = params[n]
            if "values" not in spec:
                raise ValueError(f"grid sweeps need 'values' for {n}")
            value_lists.append(spec["values"])
        return [
            dict(zip(names, combo))
            for combo in itertools.product(*value_lists)
        ]
    if method == "random":
        rng = _random.Random(seed)
        count = int(sweep_config.get("count", 10))
        out = []
        for _ in range(count):
            trial = {}
            for n, spec in params.items():
                if "values" in spec:
                    trial[n] = rng.choice(spec["values"])
                else:
                    lo, hi = float(spec["min"]), float(spec["max"])
                    val = rng.uniform(lo, hi)
                    if spec.get("distribution") == "log_uniform":
                        import math

                        val = math.exp(
                            rng.uniform(math.log(lo), math.log(hi))
                        )
                    trial[n] = val
            out.append(trial)
        return out
    raise ValueError(f"unknown sweep method {method!r}")


def run_sweep(
    base_config: Dict[str, Any],
    sweep_config: Dict[str, Any],
    train_batches,
    output_root: str,
    validation_batches=None,
    max_workers: int = 1,
    seed: int = 0,
):
    """Train one model per sweep trial; returns pipeline ItemResults whose
    values are the per-trial output paths."""
    import os

    from fv3net_tpu.fit.train import train_main

    trials = expand_sweep(sweep_config, seed=seed)

    def one(indexed) -> str:
        i, assignment = indexed
        cfg = copy.deepcopy(base_config)
        for path, value in assignment.items():
            _set_dotted(cfg, path, value)
        out = os.path.join(output_root, f"trial_{i:03d}")
        train_main(cfg, train_batches, validation_batches, out)
        return out

    return run_pipeline(
        list(enumerate(trials)), one, max_workers=max_workers,
        num_retries=0,
    )


def main(argv=None) -> int:
    """python -m fv3net_tpu.fit.sweep <sweep.yaml> <data.yaml> <output>
    (the wandb-sweep Argo template role): the sweep yaml holds a
    ``base`` training config plus ``method``/``parameters``/``count``."""
    import argparse
    import json

    import yaml

    p = argparse.ArgumentParser(prog="fv3fit-sweep")
    p.add_argument("sweep_config")
    p.add_argument("training_data_config")
    p.add_argument("output_root")
    p.add_argument("--max-workers", type=int, default=1)
    args = p.parse_args(argv)

    with open(args.sweep_config) as f:
        sweep_yaml = yaml.safe_load(f)
    base = sweep_yaml.pop("base")
    with open(args.training_data_config) as f:
        data_config = yaml.safe_load(f)
    from fv3net_tpu.loaders import batches_from_config

    batches = batches_from_config(data_config)
    results = run_sweep(
        base, sweep_yaml, batches, args.output_root,
        max_workers=args.max_workers,
    )
    print(json.dumps({
        "trials": [r.value for r in results if r.ok],
        "failed": sum(1 for r in results if not r.ok),
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
