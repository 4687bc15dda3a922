"""Stepper factories: build steppers from UserConfig.

reference: workflows/prognostic_c48_run/runtime/factories.py —
get_prephysics_stepper (prescribers, ML state predictors, :60-67) and
get_postphysics_stepper (PureMLStepper / PureNudger /
TendencyPrescriber with DatasetQuantileLimiter, :75-150).
"""
from __future__ import annotations

import datetime
from typing import List, Optional

from fv3net_tpu.runtime.config import UserConfig


def get_postphysics_stepper(config: UserConfig, timestep: float):
    """ML corrector or nudger from config (reference factories.py:75-120)."""
    if config.scikit_learn is not None and config.scikit_learn.model:
        from fv3net_tpu import fit
        from fv3net_tpu.runtime.steppers.machine_learning import (
            MultiModelAdapter,
            PureMLStepper,
        )

        models = [fit.load(path) for path in config.scikit_learn.model]
        return PureMLStepper(
            MultiModelAdapter(models),
            timestep,
            mse_conserving_limiter=(
                config.scikit_learn.use_mse_conserving_humidity_limiter
            ),
        )
    if config.nudging is not None and config.nudging.timescale_hours:
        from fv3net_tpu.loaders import ZarrMapper
        from fv3net_tpu.runtime.interpolate import (
            mapper_getter,
            time_interpolate_func,
        )
        from fv3net_tpu.runtime.steppers.nudging import PureNudger

        mapper = ZarrMapper(config.nudging.restarts_path)
        getter = mapper_getter(mapper)
        timescales = {
            var: hours * 3600.0
            for var, hours in config.nudging.timescale_hours.items()
        }
        return PureNudger(getter, timescales)
    return None


def get_prephysics_steppers(config: UserConfig, timestep: float) -> List:
    """Prescriber chain from config (reference factories.py:60-67)."""
    steppers: List = []
    for entry in config.prephysics or []:
        kind = entry.get("kind", "prescriber")
        if kind == "prescriber":
            from fv3net_tpu.loaders import ZarrMapper
            from fv3net_tpu.runtime.interpolate import mapper_getter
            from fv3net_tpu.runtime.steppers.prescriber import Prescriber

            mapper = ZarrMapper(entry["dataset"])
            steppers.append(
                Prescriber(
                    mapper_getter(mapper),
                    entry["variables"],
                    rename=entry.get("rename"),
                )
            )
        elif kind == "tendency_prescriber":
            from fv3net_tpu.loaders import ZarrMapper
            from fv3net_tpu.runtime.interpolate import mapper_getter
            from fv3net_tpu.runtime.steppers.tendency_prescriber import (
                TendencyPrescriber,
            )

            mapper = ZarrMapper(entry["dataset"])
            steppers.append(
                TendencyPrescriber(
                    mapper_getter(mapper),
                    entry["variables"],
                    limit_quantiles=entry.get("limit_quantiles"),
                )
            )
        else:
            raise ValueError(f"unknown prephysics stepper kind {kind!r}")
    return steppers


def get_radiation_stepper(config: UserConfig, timestep: float):
    """Python-radiation stepper from config (reference factories usage of
    RadiationStepperConfig; runtime/loop.py:390-397 runs it alongside the
    Fortran radiation)."""
    rs = config.radiation_scheme
    if rs is None:
        return None
    if rs.kind != "python":
        raise ValueError(f"unknown radiation stepper kind {rs.kind!r}")
    from fv3net_tpu.physics.radiation import Radiation, RadiationConfig
    from fv3net_tpu.runtime.steppers.radiation import RadiationStepper

    return RadiationStepper(
        Radiation(RadiationConfig(scheme=rs.scheme), timestep),
        apply_heating=rs.apply_heating,
    )
