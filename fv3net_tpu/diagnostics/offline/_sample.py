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

    delp = None
    if "pressure_thickness_of_atmospheric_layer" in truths[0]:
        delp = jnp.concatenate(
            [
                jnp.asarray(
                    d["pressure_thickness_of_atmospheric_layer"].data
                )
                for d in truths
            ],
            axis=0,
        )

    out: Dict[str, Quantity] = {}
    n_samples = 0
    for var in model.output_variables:
        if var not in truths[0]:
            continue
        p = jnp.concatenate([jnp.asarray(d[var].data) for d in preds], axis=0)
        t = jnp.concatenate([jnp.asarray(d[var].data) for d in truths], axis=0)
        n_samples = int(p.shape[0])
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
            # predicted-vs-target joint density (the reference's
            # offline/views scatter/density panels)
            lo = float(jnp.minimum(t.min(), p.min()))
            hi = float(jnp.maximum(t.max(), p.max()))
            if hi > lo:
                edges = jnp.linspace(lo, hi, 41)
                ti = jnp.clip(
                    jnp.searchsorted(edges, t.ravel()) - 1, 0, 39
                )
                pi = jnp.clip(
                    jnp.searchsorted(edges, p.ravel()) - 1, 0, 39
                )
                dens = jnp.zeros(1600, jnp.float32).at[
                    ti * 40 + pi
                ].add(1.0).reshape(40, 40)
                out[f"{var}_density"] = Quantity(
                    dens / jnp.maximum(dens.sum(), 1),
                    ("target_bins", "predicted_bins"),
                    "fraction",
                    attrs={"edges": np.asarray(edges).tolist()},
                )
            # column-integrated (mass-weighted) skill — the reference's
            # column_integrated_* diagnostics (offline/compute_diagnostics)
            if delp is not None and delp.shape == p.shape:
                from fv3net_tpu.core.constants import GRAVITY

                p_col = (p * delp).sum(axis=1) / GRAVITY
                t_col = (t * delp).sum(axis=1) / GRAVITY
                out[f"column_integrated_{var}_r2"] = Quantity(
                    stats.r2_score(t_col, p_col), ()
                )
                out[f"column_integrated_{var}_bias"] = Quantity(
                    stats.bias(t_col, p_col), ()
                )
    out["n_test_samples"] = Quantity(jnp.asarray(float(n_samples)), ())
    return out


def input_sensitivity(model, batch: Dataset) -> Dict[str, np.ndarray]:
    """Mean input->output Jacobians (reference
    offline/_input_sensitivity.py; uses the exact fv3fit-analog jacobian
    diagnostics).  Returns {f"{out}__{in}": [z_out, z_in]} arrays."""
    try:
        from fv3net_tpu.fit.jacobian import compute_jacobians
    except ImportError:
        return {}
    base = {}
    for name in model.input_variables:
        if name not in batch:
            return {}
        base[name] = jnp.asarray(batch[name].data).mean(axis=0)
    try:
        jacs = compute_jacobians(model, base)
    except Exception:
        return {}
    out = {}
    for out_name, per_in in jacs.items():
        for in_name, mat in per_in.items():
            out[f"{out_name}__{in_name}"] = np.asarray(mat)
    return out


def offline_report(
    diags: Dict[str, Quantity], output_dir: str,
    title: str = "Offline ML diagnostics",
    sensitivities: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    """HTML report of the offline evaluation (reference offline/views/:
    metric table, vertical-profile skill panels, predicted-vs-target
    density panels, input-sensitivity Jacobian heatmaps)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from fv3net_tpu.report import ImagePlot, create_report

    scalars = {
        k: f"{float(np.asarray(v.data)):.4g}"
        for k, v in diags.items()
        if v.ndim == 0
    }
    sections = {"Vertical profiles": [], "Predicted vs target": []}
    for name, q in diags.items():
        if q.ndim == 1:
            fig, ax = plt.subplots(figsize=(4, 4))
            arr = np.asarray(q.data)
            ax.plot(arr, np.arange(len(arr)))
            ax.invert_yaxis()
            ax.set_ylabel("level (0 = top)")
            ax.set_title(name)
            if name.endswith("_r2_profile"):
                ax.set_xlim(-0.5, 1.0)
            sections["Vertical profiles"].append(
                ImagePlot(fig, caption=name)
            )
            plt.close(fig)
        elif q.ndim == 2 and name.endswith("_density"):
            fig, ax = plt.subplots(figsize=(4, 4))
            dens = np.asarray(q.data)
            edges = np.asarray(q.attrs.get("edges", np.arange(41)))
            ax.pcolormesh(
                edges, edges, np.log10(dens.T + 1e-8), cmap="viridis"
            )
            ax.plot(edges, edges, "w--", lw=0.7)
            ax.set_xlabel("target")
            ax.set_ylabel("predicted")
            ax.set_title(name)
            sections["Predicted vs target"].append(
                ImagePlot(fig, caption=name)
            )
            plt.close(fig)
    if sensitivities:
        sections["Input sensitivity (Jacobians)"] = []
        for name, mat in sensitivities.items():
            fig, ax = plt.subplots(figsize=(4, 4))
            vmax = np.abs(mat).max() or 1.0
            im = ax.pcolormesh(mat, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
            fig.colorbar(im, ax=ax)
            out_name, in_name = name.split("__", 1)
            ax.set_xlabel(f"input level ({in_name})")
            ax.set_ylabel(f"output level ({out_name})")
            ax.set_title(name)
            sections["Input sensitivity (Jacobians)"].append(
                ImagePlot(fig, caption=name)
            )
            plt.close(fig)
    sections = {k: v for k, v in sections.items() if v}
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
    sens = input_sensitivity(model, batches[0]) if batches else {}
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(
            {k: float(np.asarray(v.data)) for k, v in diags.items()
             if v.ndim == 0},
            f,
            indent=2,
        )
    offline_report(diags, args.output_dir, sensitivities=sens)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
