"""Stepper factories: build steppers from UserConfig.

reference: workflows/prognostic_c48_run/runtime/factories.py —
get_prephysics_stepper (prescribers, ML state predictors, :60-67) and
get_postphysics_stepper (PureMLStepper / PureNudger /
TendencyPrescriber with DatasetQuantileLimiter, :75-150).
"""
from __future__ import annotations

import datetime
from typing import List

from fv3net_tpu.runtime.config import UserConfig


def _getter(mapper, config: UserConfig, timestep: float):
    """Dataset getter with an index-keyed fallback: mappers keyed by
    %Y%m%d.%H%M%S labels resolve by time; integer-keyed zarr stores
    resolve by step index from the run's initial_time."""
    from fv3net_tpu.runtime.interpolate import mapper_getter

    return mapper_getter(
        mapper,
        initial_time=datetime.datetime.fromisoformat(config.initial_time),
        frequency=datetime.timedelta(seconds=timestep),
    )


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
            hydrostatic=config.namelist.hydrostatic,
            mse_conserving_limiter=(
                config.scikit_learn.use_mse_conserving_humidity_limiter
            ),
            # reference machine_learning.py:61 diagnostic_ml (online:
            # false is this build's alias): record, don't apply
            diagnostic_only=(
                config.scikit_learn.diagnostic_ml
                or not config.scikit_learn.online
            ),
        )
    if config.nudging is not None and config.nudging.timescale_hours:
        from fv3net_tpu.loaders import ZarrMapper
        from fv3net_tpu.runtime.interpolate import mapper_getter
        from fv3net_tpu.runtime.steppers.nudging import PureNudger

        mapper = ZarrMapper(config.nudging.restarts_path)
        getter = _getter(mapper, config, timestep)
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
                    _getter(mapper, config, timestep),
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
                    _getter(mapper, config, timestep),
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
        Radiation(
            RadiationConfig(scheme=rs.scheme, lookup_dir=rs.lookup_dir),
            timestep,
        ),
        apply_heating=rs.apply_heating,
    )


def get_tendency_prescriber(config: UserConfig, timestep: float):
    """Top-level tendency_prescriber key (reference factories.py:75-82:
    TendencyPrescriber wrapping the physics step with a
    DatasetQuantileLimiter)."""
    tp = config.tendency_prescriber
    if tp is None:
        return None
    from fv3net_tpu.loaders import ZarrMapper
    from fv3net_tpu.runtime.steppers.tendency_prescriber import (
        TendencyPrescriber,
    )

    return TendencyPrescriber(
        _getter(ZarrMapper(tp.dataset), config, timestep),
        tp.variables,
        limit_quantiles=tp.limit_quantiles,
    )


def get_bias_correction(config: UserConfig, timestep: float):
    """bias_correction key (reference config.py:78: a prescriber of
    correction tendencies, optionally applied on an interval)."""
    bc = config.bias_correction
    if bc is None:
        return None
    from fv3net_tpu.loaders import ZarrMapper
    from fv3net_tpu.runtime.steppers.combine import IntervalStepper
    from fv3net_tpu.runtime.steppers.tendency_prescriber import (
        TendencyPrescriber,
    )

    stepper = TendencyPrescriber(
        _getter(ZarrMapper(bc.dataset), config, timestep),
        bc.variables,
        limit_quantiles=bc.limit_quantiles,
    )
    stepper.label = "bias_correction"
    if bc.apply_interval_seconds:
        stepper = IntervalStepper(bc.apply_interval_seconds, stepper)
    return stepper


def get_reservoir_steppers(config: UserConfig, timestep: float):
    """reservoir_corrector key -> (incrementer, predictor) pair
    (reference factories get_reservoir_steppers; loop.py:577-626)."""
    rc = config.reservoir_corrector
    if rc is None:
        return None, None
    from fv3net_tpu import fit
    from fv3net_tpu.runtime.steppers.reservoir import (
        ReservoirConfig,
        ReservoirIncrementOnlyStepper,
        ReservoirPredictStepper,
    )

    model = fit.load(rc.model_path)
    cfg = ReservoirConfig(
        model_path=rc.model_path,
        synchronize_steps=rc.synchronize_steps,
        reservoir_timestep_seconds=rc.reservoir_timestep_seconds,
        rename_mapping=dict(rc.rename_mapping),
        diagnostic_only=rc.diagnostic_only,
        warm_start=rc.warm_start,
    )
    return (
        ReservoirIncrementOnlyStepper(model, cfg),
        ReservoirPredictStepper(model, cfg),
    )


def get_microphysics_emulator(config: UserConfig):
    """online_emulator key (reference runtime/transformers/fv3fit.py
    Config): a saved model applied inside the physics step via the
    emulation hook slot."""
    oe = config.online_emulator
    if oe is None or not oe.enabled or not oe.url:
        return None, "microphysics", False
    from fv3net_tpu import fit
    from fv3net_tpu.emulation import MicrophysicsEmulator

    return MicrophysicsEmulator(fit.load(oe.url)), oe.target, oe.piggy_back
