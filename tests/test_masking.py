"""runtime.masking — the reference's emulator-update veto masks
(workflows/prognostic_c48_run/runtime/masking.py:16-99)."""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.masking import get_mask, where_masked


def _pair(nz=32):
    old = Quantity(jnp.zeros((4, nz), jnp.float32), ("sample", "z"))
    new = Quantity(jnp.ones((4, nz), jnp.float32), ("sample", "z"))
    return old, new


def test_default_mask_vetoes_upper_humidity():
    old, new = _pair()
    out = where_masked(
        {names.SPHUM: old}, {names.SPHUM: new},
        get_mask("default", ignore_humidity_below=10),
    )
    a = np.asarray(out[names.SPHUM].data)
    assert (a[:, :10] == 0).all() and (a[:, 10:] == 1).all()


def test_default_mask_passes_other_fields():
    old, new = _pair()
    out = where_masked(
        {names.TEMP: old}, {names.TEMP: new}, get_mask("default")
    )
    assert (np.asarray(out[names.TEMP].data) == 1).all()


def test_no_cloud_vetoes_cloud_only():
    old, new = _pair()
    mask = get_mask("no_cloud")
    out = where_masked(
        {names.CLOUD: old, names.SPHUM: old},
        {names.CLOUD: new, names.SPHUM: new},
        mask,
    )
    assert (np.asarray(out[names.CLOUD].data) == 0).all()
    assert (np.asarray(out[names.SPHUM].data) == 1).all()


def test_2021_09_16_level_bands():
    old, new = _pair()
    out = where_masked(
        {names.SPHUM: old, names.EASTWARD_WIND_AFTER_PHYSICS: old},
        {names.SPHUM: new, names.EASTWARD_WIND_AFTER_PHYSICS: new},
        get_mask("2021_09_16"),
    )
    q = np.asarray(out[names.SPHUM].data)
    u = np.asarray(out[names.EASTWARD_WIND_AFTER_PHYSICS].data)
    assert (q[:, :20] == 0).all() and (q[:, 20:] == 1).all()
    assert (u[:, :6] == 0).all() and (u[:, 6:] == 1).all()


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        get_mask("not_a_kind")
