"""Per-stepper column diagnostics + diagnostic-only ML mode.

reference: workflows/prognostic_c48_run/runtime/diagnostics/compute.py
(compute_diagnostics:183, compute_ml_momentum_diagnostics:247,
compute_baseline_diagnostics:292, rename_diagnostics:273,
enforce_heating_and_moistening_tendency_constraints:21) and
runtime/steppers/machine_learning.py:61 (diagnostic_ml).
"""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fv3net_tpu.core.quantity import Quantity  # noqa: E402
from fv3net_tpu.fit.testing import ConstantOutputPredictor  # noqa: E402
from fv3net_tpu.ops import thermo  # noqa: E402
from fv3net_tpu.runtime import TimeLoop, names  # noqa: E402
from fv3net_tpu.runtime.config import get_config  # noqa: E402
from fv3net_tpu.runtime.diagnostics.compute import (  # noqa: E402
    compute_diagnostics,
    compute_ml_momentum_diagnostics,
    limit_sphum_tendency,
    rename_diagnostics,
)
from fv3net_tpu.runtime.steppers.machine_learning import (  # noqa: E402
    PureMLStepper,
)

DIMS_3D = ("tile", "z", "y", "x")


def small_config(**kwargs):
    return get_config(
        {
            "namelist": {"npx": 6, "npz": 8},
            "duration_seconds": kwargs.pop("duration_seconds", 900.0),
            **kwargs,
        }
    )


def _ml_stepper(nz, diagnostic_only=False, with_winds=False):
    outputs = ["dQ1", "dQ2"] + (["dQu", "dQv"] if with_winds else [])
    model = ConstantOutputPredictor(
        input_variables=[names.TEMP, names.SPHUM],
        output_variables=outputs,
    )
    vals = dict(dQ1=np.full(nz, 1e-5), dQ2=np.full(nz, -1e-8))
    if with_winds:
        vals.update(dQu=np.full(nz, 2e-5), dQv=np.full(nz, -1e-5))
    model.set_outputs(**vals)
    return PureMLStepper(
        model, timestep=900.0, diagnostic_only=diagnostic_only
    )


def test_column_diagnostics_functions():
    """compute_diagnostics / momentum diagnostics match hand-computed
    mass integrals."""
    rng = np.random.RandomState(0)
    delp = jnp.asarray(rng.uniform(50.0, 100.0, (6, 8, 4, 4)))
    dq1 = jnp.asarray(rng.normal(0, 1e-5, delp.shape))
    dq2 = jnp.asarray(rng.normal(0, 1e-8, delp.shape))
    tend = {
        "dQ1": Quantity(dq1, DIMS_3D),
        "dQ2": Quantity(dq2, DIMS_3D),
        "dQu": Quantity(dq1, DIMS_3D),
        "dQp": Quantity(dq2, DIMS_3D),
    }
    diags = compute_diagnostics(delp, tend, "machine_learning", False)
    np.testing.assert_allclose(
        np.asarray(diags["net_moistening_due_to_machine_learning"].data),
        np.asarray(thermo.mass_integrate(dq2, delp, axis=1)),
    )
    np.testing.assert_allclose(
        np.asarray(diags["column_heating_due_to_machine_learning"].data),
        np.asarray(
            thermo.column_integrated_heating_from_isochoric_transition(
                dq1, delp, axis=1
            )
        ),
    )
    assert "net_mass_tendency_due_to_machine_learning" in diags
    # hydrostatic switches to the isobaric (cp) form: strictly larger
    hydro = compute_diagnostics(delp, tend, "machine_learning", True)
    assert np.all(
        np.abs(
            np.asarray(hydro["column_heating_due_to_machine_learning"].data)
        )
        >= np.abs(
            np.asarray(diags["column_heating_due_to_machine_learning"].data)
        )
    )
    mom = compute_ml_momentum_diagnostics(delp, tend)
    assert set(mom) == {"column_integrated_dQu_stress"}
    np.testing.assert_allclose(
        np.asarray(mom["column_integrated_dQu_stress"].data),
        np.asarray(thermo.mass_integrate(dq1, delp, axis=1)),
    )


def test_limit_sphum_tendency_variants():
    """Both limiter variants prevent negative humidity and report the
    column-integrated change they induced."""
    sphum = jnp.full((6, 4, 2, 2), 1e-3)
    delp = jnp.full((6, 4, 2, 2), 100.0)
    dt = 900.0
    # drying that would drive q negative in one step
    dq2 = jnp.full(sphum.shape, -1e-5)
    dq1 = jnp.full(sphum.shape, 1e-5)
    tend = {
        "dQ1": Quantity(dq1, DIMS_3D),
        "dQ2": Quantity(dq2, DIMS_3D),
    }
    for mse in (True, False):
        out, diags = limit_sphum_tendency(
            sphum, tend, dt, mse_conserving=mse, delp=delp, hydrostatic=False
        )
        q_after = sphum + dt * out["dQ2"].data
        assert float(q_after.min()) >= -1e-15
        assert float(diags["specific_humidity_limiter_active"].data) == 1.0
        assert (
            "column_integrated_dQ2_change_non_neg_sphum_constraint" in diags
        )
        assert (
            "column_integrated_dQ1_change_non_neg_sphum_constraint" in diags
        )
        # the dQ2 change is a positive (anti-drying) column mass flux
        change = np.asarray(
            diags["column_integrated_dQ2_change_non_neg_sphum_constraint"].data
        )
        assert change.min() > 0
        if not mse:
            # plain variant scales dQ1 down by the same ratio as dQ2
            ratio = np.asarray(out["dQ2"].data / dq2)
            np.testing.assert_allclose(
                np.asarray(out["dQ1"].data), np.asarray(dq1) * ratio
            )


def test_rename_diagnostics_zeroes_originals():
    q = Quantity(jnp.ones((6, 2, 2)), ("tile", "y", "x"), "kg/m^2/s")
    diags = {"net_moistening_due_to_machine_learning": q, "other": q}
    rename_diagnostics(diags, "machine_learning")
    assert np.all(
        np.asarray(diags["net_moistening_due_to_machine_learning"].data) == 0
    )
    np.testing.assert_array_equal(
        np.asarray(
            diags["net_moistening_due_to_machine_learning_diagnostic"].data
        ),
        1.0,
    )
    # untouched keys stay
    assert np.all(np.asarray(diags["other"].data) == 1.0)


def test_timeloop_emits_column_and_baseline_diagnostics():
    cfg = small_config()
    stepper = _ml_stepper(cfg.namelist.npz, with_winds=True)
    loop = TimeLoop(cfg, postphysics_stepper=stepper, dtype=jnp.float64)
    diags = None
    for _t, diags in loop:
        pass
    for key in (
        "net_moistening_due_to_machine_learning",
        "column_heating_due_to_machine_learning",
        "column_integrated_dQu_stress",
        "column_integrated_dQv_stress",
        "water_vapor_path",
        "physics_precip",
    ):
        assert key in diags, key
        assert np.isfinite(np.asarray(diags[key].data)).all(), key
    # water vapor path is a plausible column integral (kg/m^2)
    wvp = np.asarray(diags["water_vapor_path"].data)
    assert 0.0 < wvp.mean() < 100.0
    # heating diag reflects the constant dQ1=1e-5 K/s prediction
    heat = np.asarray(
        diags["column_heating_due_to_machine_learning"].data
    )
    assert heat.min() > 0


def test_diagnostic_ml_records_but_does_not_apply():
    """diagnostic_ml: identical prognostic state to the baseline run,
    zeroed applied-diags, populated *_diagnostic copies (reference
    loop.py:152-156 + rename_diagnostics)."""
    cfg = small_config()
    nz = cfg.namelist.npz
    base = TimeLoop(cfg, dtype=jnp.float64)
    diag_loop = TimeLoop(
        cfg,
        postphysics_stepper=_ml_stepper(nz, diagnostic_only=True),
        dtype=jnp.float64,
    )
    d2 = None
    for (_t1, _d1), (_t2, d2) in zip(base, diag_loop):
        pass
    np.testing.assert_array_equal(
        np.asarray(base.state.dycore.pt), np.asarray(diag_loop.state.dycore.pt)
    )
    np.testing.assert_array_equal(
        np.asarray(base.state.dycore.tracers["sphum"]),
        np.asarray(diag_loop.state.dycore.tracers["sphum"]),
    )
    assert np.all(
        np.asarray(d2["net_moistening_due_to_machine_learning"].data) == 0
    )
    ml_diag = np.asarray(
        d2["net_moistening_due_to_machine_learning_diagnostic"].data
    )
    assert np.abs(ml_diag).max() > 0
    # tendencies still surfaced for offline inspection
    assert "dQ1_machine_learning" in d2


def test_diagnostic_ml_config_key():
    """The reference's scikit_learn.diagnostic_ml key parses and builds a
    diagnostic-only stepper; online: false is this build's alias."""
    cfg = get_config(
        {
            "namelist": {"npx": 6, "npz": 8},
            "scikit_learn": {"model": [], "diagnostic_ml": True},
        }
    )
    assert cfg.scikit_learn.diagnostic_ml is True
    cfg2 = get_config(
        {
            "namelist": {"npx": 6, "npz": 8},
            "scikit_learn": {"model": [], "online": False},
        }
    )
    assert cfg2.scikit_learn.online is False


def test_nan_tendencies_filled_with_frac_diagnostic():
    """NaN ML predictions are zero-filled before application and the
    per-column filled fraction is a diagnostic (reference
    runtime/tendency.py:77-119, loop.py:536-541)."""

    class NaNStepper:
        label = "machine_learning"

        def __call__(self, time, state):
            shape = state[names.DELP].data.shape
            dq1 = np.full(shape, 2e-5)
            dq1[:, : shape[1] // 2] = np.nan  # top half NaN
            return (
                {"dQ1": Quantity(jnp.asarray(dq1), DIMS_3D)},
                {},
                {},
            )

    cfg = small_config()
    loop = TimeLoop(cfg, postphysics_stepper=NaNStepper(), dtype=jnp.float64)
    diags = None
    for _t, diags in loop:
        pass
    assert np.isfinite(np.asarray(loop.state.dycore.pt)).all()
    frac = np.asarray(diags["dQ1_filled_frac"].data)
    np.testing.assert_allclose(frac, 0.5)
    # the applied (filled) tendency is also what is surfaced
    tend = np.asarray(diags["dQ1_machine_learning"].data)
    assert np.isfinite(tend).all()


def test_tendencies_from_state_updates_roundtrip():
    from fv3net_tpu.runtime.tendency import (
        state_updates_from_tendency,
        tendencies_from_state_updates,
    )

    a = {names.TEMP: Quantity(jnp.zeros((6, 2, 2, 2)), DIMS_3D)}
    b = {
        names.TEMP: Quantity(jnp.full((6, 2, 2, 2), 9.0), DIMS_3D),
        "not_a_state_var": Quantity(jnp.ones(()), ()),
    }
    tend = tendencies_from_state_updates(a, b, dt=3.0)
    assert set(tend) == {"dQ1"}
    np.testing.assert_allclose(np.asarray(tend["dQ1"].data), 3.0)
    renamed = state_updates_from_tendency({"x": b[names.TEMP]})
    assert set(renamed) == {"x_state_from_postphysics_tendency"}


def test_diagnostic_ml_through_model_artifact(tmp_path):
    """End to end through the config factory: a dumped model referenced
    by scikit_learn.model with diagnostic_ml runs without perturbing the
    prognostic state (reference loop.py:155-156)."""
    from fv3net_tpu import fit

    nz = 8
    model = ConstantOutputPredictor(
        input_variables=[names.TEMP, names.SPHUM],
        output_variables=["dQ1", "dQ2"],
    )
    model.set_outputs(dQ1=np.full(nz, 1e-5), dQ2=np.full(nz, -1e-8))
    fit.dump(model, str(tmp_path))

    base = TimeLoop(small_config(), dtype=jnp.float64)
    loop = TimeLoop(
        small_config(
            scikit_learn={"model": [str(tmp_path)], "diagnostic_ml": True}
        ),
        dtype=jnp.float64,
    )
    d2 = None
    for (_t1, _d1), (_t2, d2) in zip(base, loop):
        pass
    np.testing.assert_array_equal(
        np.asarray(base.state.dycore.pt), np.asarray(loop.state.dycore.pt)
    )
    assert np.all(
        np.asarray(d2["net_moistening_due_to_machine_learning"].data) == 0
    )
    assert (
        np.abs(
            np.asarray(
                d2["net_moistening_due_to_machine_learning_diagnostic"].data
            )
        ).max()
        > 0
    )
