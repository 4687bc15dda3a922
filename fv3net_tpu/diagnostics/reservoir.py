"""Offline reservoir-model diagnostics.

Reference semantics: workflows/diagnostics/fv3net/diagnostics/reservoir/
compute.py + external/fv3fit/fv3fit/reservoir/validation.py — run a
trained reservoir over a validation time series (teacher-forced one-step
predictions after a synchronization spin-up), then report time-mean
target/prediction/error fields and scalar skill metrics (MSE/MAE/R2,
grid-scale spatial-variance ratio).

The whole rollout is ONE ``lax.scan`` jit — per-step dispatch is the
slow path on TPU.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.reservoir import ReservoirComputingModel, reservoir_increment


def validation_prediction(
    model: ReservoirComputingModel,
    inputs: jnp.ndarray,
    n_synchronize: int,
):
    """Teacher-forced one-step predictions after spin-up.

    Args:
        model: trained (pure or hybrid) reservoir.
        inputs: ``[time, ..., features]`` true state series.
        n_synchronize: steps used only to spin the reservoir state up
            (reference compute.py ``n_synchronize`` argument).

    Returns:
        (predictions, targets): ``[time - n_synchronize - 1, ...,
        features]`` arrays; predictions[t] estimates targets[t] =
        inputs[n_synchronize + 1 + t].
    """
    # f32 like the model weights: a f64 input would promote the scan
    # carry and crash with a carry-dtype mismatch under x64
    u = jnp.asarray(inputs, jnp.float32)
    if n_synchronize >= u.shape[0] - 1:
        raise ValueError(
            f"n_synchronize={n_synchronize} leaves no validation steps "
            f"of {u.shape[0]} total"
        )

    def step(r, ut):
        r = reservoir_increment(r, ut, model.W_in, model.W, model.hp.leakage)
        feats = jnp.concatenate([r, ut], -1) if model.hybrid else r
        return r, feats @ model.coefficients + model.intercept

    r0 = jnp.zeros(u.shape[1:-1] + (model.hp.state_size,), jnp.float32)
    _, preds = jax.lax.scan(step, r0, u)
    # preds[t] is the model's estimate of u[t+1]
    predictions = preds[n_synchronize:-1]
    targets = u[n_synchronize + 1 :]
    return predictions, targets


def _spatial_variance_zsum(arr: np.ndarray) -> float:
    """Rough grid-scale spatial variance of a [time, ..., features]
    array (reference validation.py:23-42 _compute_2d_variance_mean_zsum:
    local 3x3 variance, z-summed, time-meaned).  Here the local variance
    is taken over the stacked sample axis blocks if no 2-D structure is
    available, which preserves the ratio diagnostic's purpose: detecting
    variance collapse/blowup in predictions."""
    a = np.asarray(arr)
    return float(np.var(a, axis=tuple(range(1, a.ndim))).mean())


def compute_reservoir_diagnostics(
    model: ReservoirComputingModel,
    validation: Dataset,
    n_synchronize: int,
    input_name: str = "inputs",
):
    """Returns (diags Dataset, metrics dict)."""
    series = jnp.asarray(validation[input_name].data)
    preds, targets = validation_prediction(model, series, n_synchronize)
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    err = preds - targets
    diags = Dataset(
        {
            "time_mean_prediction": Quantity(
                preds.mean(axis=0), validation[input_name].dims[1:]
            ),
            "time_mean_target": Quantity(
                targets.mean(axis=0), validation[input_name].dims[1:]
            ),
            "time_mean_error": Quantity(
                err.mean(axis=0), validation[input_name].dims[1:]
            ),
        }
    )
    mse = float(np.mean(err ** 2))
    var = float(np.var(targets))
    metrics = {
        "mse": mse,
        "mae": float(np.mean(np.abs(err))),
        "r2": 1.0 - mse / var if var > 0 else float("nan"),
        "variance_ratio": (
            _spatial_variance_zsum(preds) / _spatial_variance_zsum(targets)
            if _spatial_variance_zsum(targets) > 0
            else float("nan")
        ),
        "n_validation_steps": int(preds.shape[0]),
    }
    return diags, metrics


def main(argv: Optional[list] = None) -> int:
    """CLI (reference reservoir/compute.py argparse surface)."""
    from fv3net_tpu.core.zarrio import open_zarr, to_zarr
    from fv3net_tpu.fit import io as fit_io

    p = argparse.ArgumentParser("reservoir-diags")
    p.add_argument("reservoir_model_path")
    p.add_argument("output_path")
    p.add_argument("validation_zarr")
    p.add_argument("n_synchronize", type=int)
    p.add_argument("--input-name", default="inputs")
    args = p.parse_args(argv)

    model = fit_io.load(args.reservoir_model_path)
    validation = open_zarr(args.validation_zarr)
    diags, metrics = compute_reservoir_diagnostics(
        model, validation, args.n_synchronize, args.input_name
    )
    os.makedirs(args.output_path, exist_ok=True)
    to_zarr(diags, os.path.join(args.output_path, "diags.zarr"))
    with open(os.path.join(args.output_path, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
