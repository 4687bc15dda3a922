"""Offline ML model evaluation.

reference: workflows/diagnostics/fv3net/diagnostics/offline/compute.py
(``python -m fv3net.diagnostics.offline.compute``): evaluate a trained
predictor against held-out batches — R2 / RMSE / bias per variable
(column-resolved and column-integrated), plus an HTML report
(offline/views/).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.ops import statistics as stats


def compute_offline_diags(
    model, batches: List[Dataset]
) -> Dict[str, Quantity]:
    """Per-output-variable verification diagnostics over test batches."""
    preds = []
    truths = []
    for batch in batches:
        pred = model.predict(batch)
        preds.append(pred)
        truths.append(batch)

    out: Dict[str, Quantity] = {}
    for var in model.output_variables:
        if var not in truths[0]:
            continue
        p = jnp.concatenate([jnp.asarray(d[var].data) for d in preds], axis=0)
        t = jnp.concatenate([jnp.asarray(d[var].data) for d in truths], axis=0)
        out[f"{var}_r2"] = Quantity(stats.r2_score(t, p), ())
        out[f"{var}_rmse"] = Quantity(stats.root_mean_squared_error(t, p), ())
        out[f"{var}_bias"] = Quantity(stats.bias(t, p), ())
        if p.ndim == 2:  # [sample, z] -> per-level profiles
            out[f"{var}_r2_profile"] = Quantity(
                stats.r2_score(t, p, axis=0), ("z",)
            )
            out[f"{var}_rmse_profile"] = Quantity(
                stats.root_mean_squared_error(t, p, axis=0), ("z",)
            )
            out[f"{var}_bias_profile"] = Quantity(stats.bias(t, p, axis=0),
                                                  ("z",))
    return out


def offline_report(
    diags: Dict[str, Quantity], output_dir: str,
    title: str = "Offline ML diagnostics",
) -> str:
    """HTML report of the offline evaluation (reference offline/views/)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from fv3net_tpu.report import ImagePlot, create_report

    scalars = {
        k: f"{float(np.asarray(v.data)):.4g}"
        for k, v in diags.items()
        if v.ndim == 0
    }
    sections = {"Vertical profiles": []}
    for name, q in diags.items():
        if q.ndim != 1:
            continue
        fig, ax = plt.subplots(figsize=(4, 4))
        arr = np.asarray(q.data)
        ax.plot(arr, np.arange(len(arr)))
        ax.invert_yaxis()
        ax.set_ylabel("level (0 = top)")
        ax.set_title(name)
        if name.endswith("_r2_profile"):
            ax.set_xlim(-0.5, 1.0)
        sections["Vertical profiles"].append(ImagePlot(fig, caption=name))
        plt.close(fig)
    return create_report(sections, title, output_dir, metrics=scalars)


def main(argv=None) -> int:
    """CLI: offline compute (reference offline/compute.py:61,315)."""
    import yaml

    from fv3net_tpu import fit
    from fv3net_tpu.loaders import batches_from_config

    parser = argparse.ArgumentParser("offline-diags")
    parser.add_argument("model_path")
    parser.add_argument("data_config")
    parser.add_argument("output_dir")
    args = parser.parse_args(argv)

    model = fit.load(args.model_path)
    with open(args.data_config) as f:
        data_config = yaml.safe_load(f)
    batches = batches_from_config(data_config)
    diags = compute_offline_diags(model, batches)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(
            {k: float(np.asarray(v.data)) for k, v in diags.items()
             if v.ndim == 0},
            f,
            indent=2,
        )
    offline_report(diags, args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
