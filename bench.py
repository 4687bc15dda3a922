"""Headline benchmark: C48 hybrid prognostic step throughput in SYPD.

Target (BASELINE.md): >= 5 simulated years per day per TPU chip for the
C48 hybrid run (dycore + physics + ML corrective step, dt_atmos = 900 s,
reference workload definition at
workflows/prognostic_c48_run/tests/test_regression.py:40-46).  The
workload is reference-shaped: the REAL RRTMG band solvers run on an
hourly interval (radiation_interval=4 against dt=900), like the GFS.

Also reports model FLOP utilization (mfu): XLA cost-analysis FLOPs of
the fused chunk divided by wall time and the chip's bf16 peak
(methodology: docs/performance.md).

Prints exactly one JSON line:
{"metric", "value", "unit", "vs_baseline", "mfu", ...}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# per-chip peak FLOP/s (dense bf16 MXU) for MFU accounting
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e (Trillium)
}
# per-chip peak HBM bandwidth (bytes/s) — the BINDING resource for this
# workload (stencils + scans + band solvers are traffic-bound; MFU
# moves with the flop COUNT: the r4 NBASE shrink cut tflops 2.03->1.6
# and "MFU" 1.03%->0.81% while throughput improved, VERDICT r4 #2)
_PEAK_HBM = {
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5": 2765e9,  # v5p
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,  # v6e
}


def _peak_for(device, table=_PEAK_FLOPS, default=197e12) -> float:
    kind = getattr(device, "device_kind", "")
    for key, val in table.items():
        if kind.startswith(key):
            return val
    return default


def main():
    import jax

    # persistent compile cache: the tunnel-attached TPU pays a large
    # per-compile latency; cache XLA executables across bench runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from __graft_entry__ import _flagship

    dt_atmos = 900.0
    CHUNK = 8  # steps per XLA program; radiation every 4th step (hourly)

    # size overrides for CPU smoke validation only (the recorded
    # benchmark always uses the C48 nz=32 defaults)
    npx = int(os.environ.get("FV3NET_BENCH_NPX", "48"))
    npz = int(os.environ.get("FV3NET_BENCH_NPZ", "32"))

    multi_step, args = _flagship(
        npx=npx, npz=npz, chunk=CHUNK, radiation_interval=4
    )
    state, ml_params, sst, cosz = args

    import numpy as np

    def sync(st):
        # force a device->host read: through the tunnel-attached runtime,
        # block_until_ready can return before execution completes, but a
        # host read cannot (execution is in-order, so reading the last
        # output waits for the whole chain)
        return float(np.asarray(st.pt[0, 0, 0, 0]))

    # warmup/compile
    out = multi_step(state, ml_params, sst, cosz)
    sync(out)

    # XLA's own FLOP + HBM-traffic counts for the compiled chunk (for
    # MFU and hbm_frac)
    flops_per_chunk = None
    bytes_per_chunk = None
    try:
        cost = multi_step.lower(
            state, ml_params, sst, cosz
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_chunk = float(cost.get("flops", 0.0)) or None
        bytes_per_chunk = (
            float(cost.get("bytes accessed", 0.0)) or None
        )
    except Exception:
        pass

    n_calls = 4
    t0 = time.perf_counter()
    s = state
    for _ in range(n_calls):
        s = multi_step(s, ml_params, sst, cosz)
    sync(s)
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_calls * CHUNK / elapsed
    sim_seconds_per_wall_second = dt_atmos * steps_per_sec
    sypd = sim_seconds_per_wall_second * 86400.0 / (365.0 * 86400.0)

    result = {
        "metric": "c48_hybrid_prognostic_throughput",
        "value": round(sypd, 3),
        "unit": "SYPD",
        "vs_baseline": round(sypd / 5.0, 3),
    }
    if flops_per_chunk:
        achieved = flops_per_chunk * (n_calls / elapsed)
        peak = _peak_for(jax.devices()[0])
        result["mfu"] = round(achieved / peak, 4)
        result["tflops"] = round(achieved / 1e12, 2)
    if bytes_per_chunk:
        # achieved HBM bandwidth fraction: XLA cost-model traffic of the
        # compiled chunk (post-fusion: fusion parameters + outputs) per
        # measured wall second over the chip's peak.  This is the number
        # perf claims anchor on — see _PEAK_HBM note
        bw = bytes_per_chunk * (n_calls / elapsed)
        peak_bw = _peak_for(jax.devices()[0], _PEAK_HBM, 819e9)
        result["hbm_frac"] = round(bw / peak_bw, 3)
        result["hbm_gb_per_chunk"] = round(bytes_per_chunk / 1e9, 1)

    # PRODUCTION path (r3 verdict #1): the runfv3/run_segment code path —
    # ML-corrected run with prognostic surface, 3-hourly zarr
    # diagnostics, scalar statistics and restart writes — measured
    # end-to-end on a 5-day segment (chunk 24, bf16 pulls).  Through the
    # tunnel-attached chip the diagnostic pulls serialize with compute
    # (transfer RPCs share the stream; async writers measured slower),
    # so this number carries real IO, not just the fused chunk.
    # Skippable via FV3NET_BENCH_NO_PRODUCTION=1 if time-constrained.
    if os.environ.get("FV3NET_BENCH_NO_PRODUCTION", "0") != "1":
        try:
            sypd_prod, phases, n_steps = _production_sypd()
            result["production_sypd"] = round(sypd_prod, 2)
            # auditable decomposition of the fused-chunk -> production
            # gap (VERDICT r4 #1): wall ms/step spent pulling
            # diagnostics through the tunnel, and the bytes moved
            pull_s = sum(
                phases.get(k, {}).get("total_seconds", 0.0)
                for k in ("pull_transfer", "pull_concat_dispatch")
            )
            obs_s = phases.get("diag_observe", {}).get(
                "total_seconds", 0.0
            )
            result["pull_ms_per_step"] = round(1e3 * pull_s / n_steps, 2)
            result["observe_ms_per_step"] = round(
                1e3 * obs_s / n_steps, 2
            )
            result["pull_mb"] = round(
                phases.get("pull_bytes", 0.0) / 1e6, 1
            )
        except Exception as e:  # noqa: BLE001
            result["production_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


def _production_sypd(hours: float = 120.0, chunk: int = 24) -> float:
    """SYPD of run_segment on the production config (the
    scripts/segment_bench.py 'production' mode, inlined so the driver's
    single bench.py invocation records both numbers)."""
    import dataclasses
    import shutil
    import tempfile
    import time as _time

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scripts")
    )
    from segment_bench import _train_tiny_ml

    from fv3net_tpu.runtime.config import get_config
    from fv3net_tpu.runtime.segmented_run.api import run_segment

    model_dir = tempfile.mkdtemp(prefix="bench_ml_")
    _train_tiny_ml(32, model_dir)
    config_dict = {
        "namelist": {
            "npx": 48, "npz": 32, "dt_atmos": 900.0, "n_split": 2,
            "radiation": "rrtmg", "slab_ocean": True, "sea_ice": True,
        },
        "duration_seconds": hours * 3600.0,
        "fused_chunk_steps": chunk,
        "radiation_interval_steps": 4,
        "scikit_learn": {"model": [model_dir]},
        "diagnostics": [
            {
                "name": "state_after_timestep.zarr",
                "variables": [
                    "air_temperature", "specific_humidity",
                    "surface_pressure", "eastward_wind",
                ],
                "times": {"kind": "interval", "frequency": 10800},
                "pull_dtype": "bfloat16",
            }
        ],
    }
    cfg = get_config(config_dict)
    out = tempfile.mkdtemp(prefix="bench_seg_")
    warm_cfg = dataclasses.replace(cfg, duration_seconds=chunk * 900.0)
    run_segment(warm_cfg, out + "_warm")
    t0 = _time.perf_counter()
    loop = run_segment(cfg, out)
    elapsed = _time.perf_counter() - t0
    n_steps = int(cfg.duration_seconds // 900.0)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + "_warm", ignore_errors=True)
    shutil.rmtree(model_dir, ignore_errors=True)
    sypd = (n_steps * 900.0 / elapsed) * 86400.0 / (365.0 * 86400.0)
    return sypd, getattr(loop, "phase_report", {}), n_steps


if __name__ == "__main__":
    main()
