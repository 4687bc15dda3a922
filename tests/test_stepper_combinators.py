"""IntervalStepper / CombinedStepper tests + log-viewer CLI."""
import datetime

import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime.steppers.combine import CombinedStepper, IntervalStepper

T0 = datetime.datetime(2016, 8, 1)


class CountingStepper:
    label = "counting"

    def __init__(self, tendency_name="dQ1"):
        self.calls = 0
        self.tendency_name = tendency_name

    def __call__(self, time, state):
        self.calls += 1
        return (
            {self.tendency_name: Quantity(jnp.ones(3), ("z",))},
            {f"{self.tendency_name}_diag": Quantity(jnp.zeros(()), ())},
            {},
        )


def test_interval_stepper_gates_calls():
    inner = CountingStepper()
    stepper = IntervalStepper(1800.0, inner)
    t = T0
    for i in range(4):
        stepper(t, None)
        t += datetime.timedelta(seconds=900)
    # called at 0 and 1800 s only
    assert inner.calls == 2
    assert stepper.label == "interval_counting"


def test_combined_stepper_merges_and_rejects_conflicts():
    a = CountingStepper("dQ1")
    b = CountingStepper("dQ2")
    combined = CombinedStepper([a, b])
    tend, diags, _ = combined(T0, None)
    assert set(tend) == {"dQ1", "dQ2"}
    assert "dQ1_diag" in diags and "dQ2_diag" in diags

    conflict = CombinedStepper([CountingStepper("dQ1"), CountingStepper("dQ1")])
    with pytest.raises(ValueError, match="multiple steppers"):
        conflict(T0, None)


def test_log_viewer_cli(tmp_path, capsys):
    from fv3net_tpu.diagnostics.cli import main

    log = tmp_path / "statistics.log"
    log.write_text(
        '{"time": "t1", "PRATEsfc": 1.0}\n{"time": "t2", "PRATEsfc": 3.0}\n'
    )
    assert main(["log-viewer", str(log)]) == 0
    out = capsys.readouterr().out
    assert "2 steps" in out
    assert "PRATEsfc" in out and "max=3" in out


def test_add_tendency_applies_nudging_keys_to_state_variables():
    """``{var}_tendency_due_to_nudging`` keys outside the dQ* conventions
    must update ``var`` directly (dropping them silently made surface
    nudging a no-op)."""
    from fv3net_tpu.runtime.steppers.machine_learning import add_tendency

    state = {
        "air_temperature": Quantity(jnp.full((2, 3), 250.0), ("y", "x")),
        "surface_temperature": Quantity(jnp.full((2, 3), 290.0), ("y", "x")),
    }
    tendencies = {
        # dQ1 maps to air_temperature through TENDENCY_TO_STATE_NAME
        "dQ1": Quantity(jnp.full((2, 3), 1e-3), ("y", "x")),
        # non-dQ nudging key: state name embedded in the key
        "surface_temperature_tendency_due_to_nudging": Quantity(
            jnp.full((2, 3), 2e-3), ("y", "x")
        ),
        # unknown key with no matching state variable: ignored
        "mystery_tendency_due_to_nudging": Quantity(
            jnp.full((2, 3), 5.0), ("y", "x")
        ),
    }
    add_tendency(state, tendencies, dt=100.0)
    np.testing.assert_allclose(
        np.asarray(state["air_temperature"].data), 250.0 + 0.1
    )
    np.testing.assert_allclose(
        np.asarray(state["surface_temperature"].data), 290.0 + 0.2
    )
