"""Production-path throughput: a diagnostics-enabled C48 segment through
run_segment (the runfv3-append code path) with the fused chunked
TimeLoop — the VERDICT r1 #4 measurement.

Usage: python scripts/segment_bench.py [mode] [chunk] [pull_dtype]
- mode: gray | rrtmg | production (default gray).  "production" is the
  flagship use case (r2 verdict #1): real RRTMG radiation + slab ocean +
  sea ice + an in-config scikit_learn dense ML corrector, all fused.
- chunk default 12; pull_dtype e.g. bfloat16 enables half-width
  diagnostic pulls.
"""
import json
import shutil
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")


def _train_tiny_ml(npz: int, model_dir: str):
    """Train + dump a small dense dQ1/dQ2 corrector for the production
    config (the scikit_learn path through factories -> fit.load)."""
    import numpy as np
    import jax.numpy as jnp

    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.quantity import Quantity
    from fv3net_tpu.fit.dense import DenseHyperparameters, train_dense_model

    rng = np.random.RandomState(0)
    n = 256
    batch = Dataset(
        {
            "air_temperature": Quantity(
                jnp.asarray(260 + 30 * rng.rand(n, npz), jnp.float32),
                ("sample", "z"),
            ),
            "specific_humidity": Quantity(
                jnp.asarray(0.01 * rng.rand(n, npz), jnp.float32),
                ("sample", "z"),
            ),
            "dQ1": Quantity(
                jnp.asarray(1e-5 * rng.randn(n, npz), jnp.float32),
                ("sample", "z"),
            ),
            "dQ2": Quantity(
                jnp.asarray(1e-8 * rng.randn(n, npz), jnp.float32),
                ("sample", "z"),
            ),
        }
    )
    hp = DenseHyperparameters(
        input_variables=["air_temperature", "specific_humidity"],
        output_variables=["dQ1", "dQ2"],
        hidden_layers=2,
        width=128,
        epochs=1,
    )
    from fv3net_tpu import fit

    model = train_dense_model(hp, [batch])
    fit.dump(model, model_dir)  # registry dump: writes the 'name' tag


def _zarr_rows(out_dir):
    import os

    from fv3net_tpu.core import zarrio

    rows = {}
    for name in os.listdir(out_dir):
        if name.endswith(".zarr"):
            ds = zarrio.open_zarr(os.path.join(out_dir, name))
            rows[name] = {
                k: list(ds[k].shape) for k in list(ds)[:6]
            }
    return rows


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "gray"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    pull_dtype = sys.argv[3] if len(sys.argv) > 3 else None
    from fv3net_tpu.runtime.config import get_config
    from fv3net_tpu.runtime.segmented_run.api import run_segment

    production = mode == "production"
    radiation = "rrtmg" if production else mode
    # segment length (hours): default a 5-day segment; production runs
    # commonly append month-long segments
    hours = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    config_dict = {
        "namelist": {
            "npx": 48, "npz": 32, "dt_atmos": 900.0, "n_split": 2,
            "radiation": radiation,
        },
        "duration_seconds": hours * 3600.0,
        "fused_chunk_steps": chunk,
        "radiation_interval_steps": 4,
        "diagnostics": [
            {
                "name": "state_after_timestep.zarr",
                "variables": [
                    "air_temperature", "specific_humidity",
                    "surface_pressure", "eastward_wind",
                ],
                # 3-hourly instantaneous output — the reference's
                # standard prognostic-run cadence (its every-timestep
                # state output is reserved for training-data runs)
                "times": {"kind": "interval", "frequency": 10800},
                **({"pull_dtype": pull_dtype} if pull_dtype else {}),
            }
        ],
    }
    if production:
        model_dir = tempfile.mkdtemp(prefix="seg_bench_ml_")
        _train_tiny_ml(32, model_dir)
        config_dict["namelist"]["slab_ocean"] = True
        config_dict["namelist"]["sea_ice"] = True
        config_dict["scikit_learn"] = {"model": [model_dir]}
    cfg = get_config(config_dict)
    out = tempfile.mkdtemp(prefix="seg_bench_")
    # warm: run one short segment first so compiles don't count.  It must
    # be IDENTICAL to the timed config apart from duration — the
    # diagnostics set is part of the fused chunk's output signature, so a
    # diagnostics-free warmup compiles a DIFFERENT executable and the
    # timed run pays a ~100 s compile (observed: 9.8 vs 59 SYPD).
    import dataclasses

    warm_cfg = dataclasses.replace(
        cfg, duration_seconds=chunk * 900.0
    )
    run_segment(warm_cfg, out + "_warm")

    t0 = time.perf_counter()
    loop = run_segment(cfg, out)
    elapsed = time.perf_counter() - t0
    n_steps = int(cfg.duration_seconds // 900.0)
    sypd = (n_steps * 900.0 / elapsed) * 86400.0 / (365.0 * 86400.0)
    print(
        json.dumps(
            {
                "metric": f"c48_segment_throughput_{mode}",
                "value": round(sypd, 2),
                "unit": "SYPD",
                "fused": loop.fusable(),
                "steps": n_steps,
                "wall_s": round(elapsed, 1),
                "phases": getattr(loop, "phase_report", {}),
                "zarr_rows": _zarr_rows(out),
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + "_warm", ignore_errors=True)


if __name__ == "__main__":
    main()
