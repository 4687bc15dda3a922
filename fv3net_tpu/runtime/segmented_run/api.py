"""create/append segmented-run API.

reference: runtime/segmented_run/api.py + append.py:17-88 — a run URL
holds fv3config.yml + artifacts/<timestamp>/ per segment; ``append``
locates the last segment's RESTART and continues from it.
"""
from __future__ import annotations

import datetime
import logging
import os
from typing import Optional

import yaml

from fv3net_tpu.runtime import metrics
from fv3net_tpu.runtime.checkpoint import load_state, save_state
from fv3net_tpu.runtime.config import UserConfig, get_config
from fv3net_tpu.runtime.diagnostics import DiagnosticsManager
from fv3net_tpu.runtime.loop import TimeLoop

logger = logging.getLogger(__name__)

CONFIG_NAME = "fv3config.yml"


def create(url: str, config: dict) -> str:
    """Initialize a run directory with its config (reference api.create)."""
    os.makedirs(url, exist_ok=True)
    get_config({k: v for k, v in config.items()})  # validate
    with open(os.path.join(url, CONFIG_NAME), "w") as f:
        yaml.safe_dump(config, f)
    return url


def read_run_config(url: str) -> UserConfig:
    with open(os.path.join(url, CONFIG_NAME)) as f:
        return get_config(yaml.safe_load(f))


def read_last_segment(url: str) -> Optional[str]:
    """Last artifacts/<timestamp> dir containing a RESTART
    (reference append.py:17-29)."""
    artifacts = os.path.join(url, "artifacts")
    if not os.path.isdir(artifacts):
        return None
    segments = sorted(os.listdir(artifacts))
    for seg in reversed(segments):
        restart = os.path.join(artifacts, seg, "RESTART")
        if os.path.isdir(restart):
            return os.path.join(artifacts, seg)
    return None


def run_segment(
    config: UserConfig,
    output_dir: str,
    restart_from: Optional[str] = None,
    profile: bool = False,
) -> TimeLoop:
    """Run one segment, writing diagnostics + RESTART to output_dir
    (the run.py:50 run_segment analog, minus the MPI subprocess: the
    'ranks' are the devices of the JAX mesh).

    ``profile=True`` additionally captures a jax.profiler device trace of
    the whole segment to ``<output_dir>/profile`` with per-step
    annotations (SURVEY §5.1 tracing; open with TensorBoard/XProf).
    """
    import contextlib

    from fv3net_tpu.runtime import timing

    os.makedirs(output_dir, exist_ok=True)
    timing.reset_phases()
    loop = TimeLoop(config)
    if restart_from is not None:
        state, time = load_state(os.path.join(restart_from, "RESTART"))
        loop.state = state
        loop.time = time
        loop.reshard()  # restart arrays back onto the configured mesh
    diag_mgr = DiagnosticsManager(
        list(config.diagnostics) + list(config.fortran_diagnostics),
        loop.time,
        output_dir,
        # NOT async on this host: the TPU tunnel serializes transfer
        # RPCs with the compute stream, so a writer thread only adds
        # contention (measured 986 vs 711 ms/chunk).  On hosts with
        # PCIe-attached devices async_writes=True overlaps the pull +
        # zarr write with the next chunks' compute.
        async_writes=False,
    )
    area = loop.grid.area
    trace_ctx = (
        timing.profile_trace(os.path.join(output_dir, "profile"))
        if profile
        else contextlib.nullcontext()
    )
    failure: Optional[BaseException] = None
    # pull scheduling (docs/performance.md r5): observations are PACKED
    # into single device buffers the moment a chunk yields (the pack op
    # queues right behind its producing chunk — execution is in-order
    # through the TPU tunnel), and the pulls of FINISHED chunks' buffers
    # run while the freshly-dispatched chunk computes.  drain_ready/the
    # scalar-flush slice always keep the newest entry buffered so no
    # pull ever blocks on the in-flight chunk.
    diag_mgr.set_defer_drains(True)
    with trace_ctx:
        it = iter(loop)
        step = 0
        scalars = metrics.ScalarBatcher()
        done = False
        while not done:
            with (
                timing.step_annotation(step)
                if profile
                else contextlib.nullcontext()
            ):
                try:
                    with timing.phases.clock("loop_dispatch"):
                        nxt = next(it, None)
                    if nxt is None:
                        done = True
                    else:
                        time, diags = nxt
                        with timing.phases.clock("diag_observe"):
                            diag_mgr.observe(time, diags)
                        # global means ride along in-graph
                        # (__global_means__): batch the handles on
                        # device, pulled once ready (ScalarBatcher)
                        names_, vec = (
                            metrics.globally_average_2d_diagnostics_async(
                                diags, area
                            )
                        )
                        scalars.append(time, names_, vec)
                    with timing.phases.clock("diag_observe"):
                        diag_mgr.drain_ready()
                    with timing.phases.clock("scalar_flush"):
                        scalars.flush_ready()
                except Exception as e:  # noqa: BLE001
                    # segment-level coarse recovery (reference
                    # append.py:66-74: a nonzero model exit is a warning
                    # and the partial segment is still post-processed):
                    # keep the diagnostics written so far and the last
                    # completed state's RESTART
                    logger.warning(
                        "segment failed at step %d (%s); writing partial "
                        "segment", step, e,
                    )
                    failure = e
                    break
            step += 1
        with timing.phases.clock("scalar_flush"):
            scalars.close()
    with timing.phases.clock("diag_observe"):
        diag_mgr.close()
    if failure is not None and step == 0:
        # nothing completed: there is no meaningful partial segment
        raise failure
    restart_dir = os.path.join(output_dir, "RESTART")
    with timing.phases.clock("restart_write"):
        # ONE batched pull shared by both restart writers
        from fv3net_tpu.runtime.checkpoint import (
            pull_state,
            save_fortran_restarts,
        )

        host_state = pull_state(loop.state)
        save_state(host_state, loop.time, restart_dir)
        # also the reference's per-category/per-tile NetCDF layout, so
        # reference-side tooling can consume this run's restarts
        # directly
        save_fortran_restarts(host_state, loop.time, restart_dir,
                              loop.grid)
    loop.phase_report = timing.phase_report()
    return loop


def append_segment(url: str, profile: bool = False) -> str:
    """Run the next segment of the run at ``url``
    (reference append.py:38-88)."""
    config = read_run_config(url)
    last = read_last_segment(url)
    # segment label = its start time
    if last is not None:
        _, start_time = load_state(os.path.join(last, "RESTART"))
    else:
        start_time = datetime.datetime.fromisoformat(config.initial_time)
    label = start_time.strftime("%Y%m%d.%H%M%S")
    output_dir = os.path.join(url, "artifacts", label)
    run_segment(config, output_dir, restart_from=last, profile=profile)
    return output_dir
