"""Steppers: pluggable per-step updates (ML, nudging, prescriber).

reference: workflows/prognostic_c48_run/runtime/steppers/ — the Stepper
protocol (stepper.py:6-27) returns (tendencies, diagnostics,
state_updates) per call.
"""
from fv3net_tpu.runtime.steppers.machine_learning import (  # noqa: F401
    MultiModelAdapter,
    PureMLStepper,
)
from fv3net_tpu.runtime.steppers.nudging import PureNudger  # noqa: F401
from fv3net_tpu.runtime.steppers.prescriber import Prescriber  # noqa: F401
from fv3net_tpu.runtime.steppers.combine import (  # noqa: F401
    CombinedStepper,
    IntervalStepper,
)
