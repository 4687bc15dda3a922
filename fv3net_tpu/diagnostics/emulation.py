"""Microphysics-emulation diagnostics.

Reference semantics: workflows/diagnostics/fv3net/diagnostics/
prognostic_run/emulation/{tendencies.py,single_run.py} — evaluate a
piggy-backed emulator run: per-stage tendency accessors
(``tendency_of_{field}_due_to_{zhao_carr,gscond}_{emulator,physics}``),
emulator-vs-physics skill metrics, and global-mean drift rates of the
prognostic fields over several time horizons.
"""
from __future__ import annotations

import argparse
import json
from typing import Mapping, Optional, Sequence

import numpy as np

from fv3net_tpu.core.dataset import Dataset

#: fields evaluated by the reference single-run report
FIELDS = ("air_temperature", "specific_humidity", "cloud_water")
DRIFT_VARIABLES = ("air_temperature", "specific_humidity")
DRIFT_HOURS = (3.0, 24.0, 120.0)


def gscond_tendency(data: Dataset, field: str, source: str):
    """Condensation-stage tendency (reference tendencies.py:4-9: the
    emulator's cloud-water gscond tendency is minus its humidity
    tendency — gscond conserves water between q and qc)."""
    if field == "cloud_water" and source == "emulator":
        return -np.asarray(
            data[f"tendency_of_specific_humidity_due_to_gscond_{source}"].data
        )
    return np.asarray(data[f"tendency_of_{field}_due_to_gscond_{source}"].data)


def total_tendency(data: Dataset, field: str, source: str):
    """Whole-microphysics tendency (reference tendencies.py:11-12)."""
    return np.asarray(data[f"tendency_of_{field}_due_to_zhao_carr_{source}"].data)


def precpd_tendency(data: Dataset, field: str, source: str):
    """Precipitation-stage tendency = total - gscond (reference
    tendencies.py:15-16)."""
    return total_tendency(data, field, source) - gscond_tendency(
        data, field, source
    )


def surface_precipitation(data: Dataset, source: str):
    """(reference tendencies.py:19-20)"""
    return np.asarray(data[f"surface_precipitation_due_to_zhao_carr_{source}"].data)


def emulation_skill(
    data: Dataset,
    fields: Sequence[str] = FIELDS,
    stage: str = "zhao_carr",
) -> Mapping[str, float]:
    """Per-field emulator-vs-physics skill over all available samples
    (reference single_run.py skill metrics): MSE, bias and the
    variance-normalized skill 1 - MSE/Var(physics)."""
    accessor = total_tendency if stage == "zhao_carr" else gscond_tendency
    out = {}
    for field in fields:
        try:
            emu = accessor(data, field, "emulator")
            phys = accessor(data, field, "physics")
        except KeyError:
            continue
        err = emu - phys
        var = float(np.var(phys))
        out[f"mse/{stage}/{field}"] = float(np.mean(err ** 2))
        out[f"bias/{stage}/{field}"] = float(np.mean(err))
        out[f"skill/{stage}/{field}"] = (
            1.0 - float(np.mean(err ** 2)) / var if var > 0 else float("nan")
        )
    if stage == "zhao_carr":
        try:
            p_e = surface_precipitation(data, "emulator")
            p_p = surface_precipitation(data, "physics")
            err = p_e - p_p
            var = float(np.var(p_p))
            out["mse/surface_precipitation"] = float(np.mean(err ** 2))
            out["skill/surface_precipitation"] = (
                1.0 - float(np.mean(err ** 2)) / var if var > 0 else float("nan")
            )
        except KeyError:
            pass
    return out


def compute_drift(
    data: Dataset,
    dt_seconds: float,
    variables: Sequence[str] = DRIFT_VARIABLES,
    horizons_hours: Sequence[float] = DRIFT_HOURS,
    area: Optional[np.ndarray] = None,
) -> Mapping[str, float]:
    """Global-mean drift per day of prognostic fields at several time
    horizons (reference single_run.py drift metrics): the mean change
    from the initial time to each horizon, per day."""
    out = {}
    for name in variables:
        if name not in data:
            continue
        arr = np.asarray(data[name].data)  # [time, ...]
        w = None
        if area is not None:
            w = np.broadcast_to(area, arr.shape[1:])

        def gmean(x):
            return float(np.average(x, weights=w))

        t0 = gmean(arr[0])
        for hours in horizons_hours:
            steps = int(round(hours * 3600.0 / dt_seconds))
            if steps < 1 or steps >= arr.shape[0]:
                continue
            days = steps * dt_seconds / 86400.0
            out[f"drift/{name}/{hours:g}h"] = (gmean(arr[steps]) - t0) / days
    return out


def main(argv: Optional[list] = None) -> int:
    """CLI: metrics JSON for a piggy-backed run's diagnostics zarr
    (reference: python -m fv3net.diagnostics.prognostic_run.emulation
    single_run surface)."""
    from fv3net_tpu.core.zarrio import open_zarr

    p = argparse.ArgumentParser("emulation-diags")
    p.add_argument("diags_zarr", help="zarr with piggy-backed tendencies")
    p.add_argument("--state-zarr", default=None, help="state zarr for drift")
    p.add_argument("--dt-seconds", type=float, default=900.0)
    p.add_argument("--output", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    data = open_zarr(args.diags_zarr)
    metrics = dict(emulation_skill(data))
    metrics.update(emulation_skill(data, stage="gscond"))
    if args.state_zarr:
        state = open_zarr(args.state_zarr)
        metrics.update(compute_drift(state, args.dt_seconds))
    payload = json.dumps(metrics)
    if args.output:
        with open(args.output, "w") as f:
            f.write(payload)
    print(payload)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
