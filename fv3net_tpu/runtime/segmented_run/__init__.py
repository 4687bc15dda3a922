"""Segmented runs: a run is a series of restartable segments.

reference: workflows/prognostic_c48_run/runtime/segmented_run/
(api.create/append, append.py:38-88, run.py:50) — coarse-grained failure
recovery: each ``append`` continues from the last segment's RESTART.
"""
from fv3net_tpu.runtime.segmented_run.api import (  # noqa: F401
    create,
    append_segment,
    run_segment,
)
