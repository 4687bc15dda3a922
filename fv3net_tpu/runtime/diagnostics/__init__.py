"""Diagnostics output: time selection + time-averaged zarr files.

reference: workflows/prognostic_c48_run/runtime/diagnostics/ —
DiagnosticFileConfig/DiagnosticFile (manager.py:26-178), TimeConfig
selectors (time.py:17-153).
"""
from fv3net_tpu.runtime.diagnostics.manager import (  # noqa: F401
    DiagnosticFile,
    DiagnosticsManager,
)
from fv3net_tpu.runtime.diagnostics.times import (  # noqa: F401
    All,
    IntervalTimes,
    IntervalAveragedTimes,
    SelectedTimes,
    time_container_from_config,
)
