"""Prognostic runtime: the TimeLoop + steppers layer.

Replaces workflows/prognostic_c48_run/runtime of the reference
(reference: runtime/loop.py:106-664 TimeLoop, runtime/steppers/*,
runtime/derived_state.py:83-160), with the Fortran wrapper replaced by
the jitted dycore+physics step and the MPI communicator by JAX sharding.
"""
from fv3net_tpu.runtime.loop import TimeLoop  # noqa: F401
from fv3net_tpu.runtime.config import UserConfig, get_config  # noqa: F401
