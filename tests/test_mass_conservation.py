"""Mass/water closure at the ML boundary (VERDICT r1 #5).

reference: runtime/loop.py:536-554 (precipitation_sum -> TOTAL_PRECIP),
runtime/derived_state.py:123-145 + wrapper.set_state_mass_conserving
(delp adjusted when humidity is overwritten so dry air mass is exact).
"""
import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core.constants import GRAVITY
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.dycore import init_state
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.runtime import TimeLoop, names
from fv3net_tpu.runtime.config import get_config
from fv3net_tpu.runtime.derived_state import (
    DerivedState,
    DIMS_3D,
    ModelState,
)
from fv3net_tpu.dycore.core import GridArrays


def _water_mass_per_area(state: ModelState) -> np.ndarray:
    """Column water mass [kg/m^2]: sum over tracers' q*delp/g."""
    d = state.dycore
    total = np.zeros(d.delp.shape[:1] + d.delp.shape[2:])
    for q in d.tracers.values():
        total = total + np.asarray((q * d.delp).sum(axis=1)) / GRAVITY
    return total


def test_sphum_setter_conserves_dry_mass():
    grid = make_grid(6)
    dstate, *_ = init_state(grid, nz=8)
    g = GridArrays.from_grid(grid, dtype=jnp.float32)
    sst = jnp.full((6, 6, 6), 300.0)
    state = ModelState(dycore=dstate, surface={names.TSFC: sst})
    ds = DerivedState(state, g)
    q0 = np.asarray(dstate.tracers["sphum"])
    delp0 = np.asarray(dstate.delp)
    T0 = np.asarray(ds[names.TEMP].data)
    dry0 = delp0 * (1.0 - q0)

    q_new = jnp.asarray(q0) * 1.5 + 1e-4
    ds[names.SPHUM] = Quantity(q_new, DIMS_3D, "kg/kg")

    delp1 = np.asarray(state.dycore.delp)
    dry1 = delp1 * (1.0 - np.asarray(q_new))
    # dry air mass per layer is exact
    np.testing.assert_allclose(dry1, dry0, rtol=2e-6)
    # delp actually changed (water was added)
    assert np.abs(delp1 - delp0).max() > 0
    # temperature held fixed through the theta_v/pmid recompute
    T1 = np.asarray(ds[names.TEMP].data)
    np.testing.assert_allclose(T1, T0, rtol=2e-5)


class _MoisteningStepper:
    """Mock ML stepper with constant nonzero dQ2/dQ1 (the reference's
    machine_learning_mocks.py:31-60 role) that records the column water
    it sees at call time."""

    label = "machine_learning"

    def __init__(self, dq2: float):
        self.dq2 = dq2
        self.water_before = None
        self.phys_precip_m = None

    def __call__(self, time, state: DerivedState):
        self.water_before = _water_mass_per_area(state.state)
        self.phys_precip_m = np.asarray(
            state.state.surface[names.TOTAL_PRECIP]
        ).copy()
        shape = state[names.DELP].data.shape
        tend = {
            "dQ2": Quantity(jnp.full(shape, self.dq2), DIMS_3D, "kg/kg/s"),
            "dQ1": Quantity(jnp.full(shape, 1e-6), DIMS_3D, "K/s"),
        }
        return tend, {}, {}


def test_timeloop_water_budget_closes_under_ml_drying():
    """Full TimeLoop step with an actively-drying mock model: the water
    removed from the atmosphere shows up 1:1 in TOTAL_PRECIP."""
    stepper = _MoisteningStepper(dq2=-2e-8)  # drying -> extra precip
    cfg = get_config(
        {"namelist": {"npx": 6, "npz": 8}, "duration_seconds": 900.0}
    )
    loop = TimeLoop(cfg, postphysics_stepper=stepper)
    dt = loop.timestep
    diags = None
    for _t, diags in loop:
        pass

    water_after = _water_mass_per_area(loop.state)
    total_precip_m = np.asarray(loop.state.surface[names.TOTAL_PRECIP])
    ml_precip_mass = (total_precip_m - stepper.phys_precip_m) * 1000.0
    d_water = water_after - stepper.water_before
    # closure to f32 roundoff: water leaving the column == added precip.
    # scale tolerance by the column water mass itself (~20 kg/m^2)
    np.testing.assert_allclose(
        -d_water, ml_precip_mass,
        atol=3e-4 * np.abs(stepper.water_before).max(),
    )
    # the ML contribution is non-trivial (drying actually happened)
    assert ml_precip_mass.min() > 0
    # diagnostics surface the reference names
    assert names.TOTAL_PRECIP in diags
    assert names.TOTAL_PRECIP_RATE in diags
    assert "net_moistening_due_to_machine_learning" in diags


def test_timeloop_moistening_thresholds_precip_nonnegative():
    """Strong moistening cannot drive TOTAL_PRECIP negative (the
    reference thresholds at zero, diagnostics/compute.py:140-141)."""
    stepper = _MoisteningStepper(dq2=5e-7)  # strong moistening
    cfg = get_config(
        {"namelist": {"npx": 6, "npz": 8}, "duration_seconds": 900.0}
    )
    loop = TimeLoop(cfg, postphysics_stepper=stepper)
    for _t, _d in loop:
        pass
    total_precip_m = np.asarray(loop.state.surface[names.TOTAL_PRECIP])
    assert total_precip_m.min() >= 0.0
