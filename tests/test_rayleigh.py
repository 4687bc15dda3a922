"""Upper-level Rayleigh sponge (dycore/core.py::_rayleigh_damp;
reference: fv3gfs-fortran Rayleigh_Super behind wrapper.step_dynamics,
namelist tau / rf_cutoff)."""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.core.constants import CP_AIR, KAPPA, REFERENCE_SURFACE_PRESSURE
from fv3net_tpu.dycore import init_state
from fv3net_tpu.dycore.core import DycoreConfig, _rayleigh_damp, dynamics_step
from fv3net_tpu.grid.geometry import make_grid


def _jet_state(nz=16, dtype=jnp.float64):
    from fv3net_tpu.dycore.core import GridArrays

    grid = make_grid(6)
    state, ak, bk = init_state(grid, nz=nz, dtype=dtype)
    g = GridArrays.from_grid(grid, dtype=dtype)
    east = np.stack(
        [-np.sin(grid.lon), np.cos(grid.lon), np.zeros_like(grid.lon)]
    )
    wind = jnp.asarray(
        20.0 * east[:, :, None] * np.ones((1, 1, nz, 1, 1)), dtype
    )
    return dc.replace(state, wind=wind), g, ak, bk


def test_rayleigh_damp_profile_and_energy():
    state, g, ak, bk = _jet_state()
    cfg = DycoreConfig(tau_rayleigh=1.0, rf_cutoff=5000.0)
    new = _rayleigh_damp(state, cfg, 900.0)
    sp0 = np.sqrt(np.asarray((state.wind ** 2).sum(axis=0)))
    sp1 = np.sqrt(np.asarray((new.wind ** 2).sum(axis=0)))
    pmid = np.asarray(
        cfg.ptop + jnp.cumsum(state.delp, axis=1) - 0.5 * state.delp
    )
    above = pmid < cfg.rf_cutoff
    below = pmid > 2.0 * cfg.rf_cutoff
    # damping only above the cutoff, strongest at the top
    assert (sp1[above] < sp0[above] - 1e-6).all()
    np.testing.assert_allclose(sp1[below], sp0[below], rtol=0, atol=1e-12)
    ratio = sp1 / sp0
    assert ratio[:, 0].max() < ratio[:, 1].min()  # monotone toward top
    # removed kinetic energy returned as heat, layer by layer
    exner = (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    dke = 0.5 * (sp0 ** 2 - sp1 ** 2)
    dheat = CP_AIR * exner * np.asarray(new.pt - state.pt)
    np.testing.assert_allclose(dheat, dke, rtol=1e-9, atol=1e-12)


def test_rayleigh_in_dynamics_step():
    state, g, ak, bk = _jet_state(nz=8)
    base = DycoreConfig(dt=900.0, n_split=1, rf_cutoff=5000.0)
    off = dynamics_step(state, g, ak, bk, base)
    on = dynamics_step(
        state, g, ak, bk, dc.replace(base, tau_rayleigh=0.5)
    )
    sp_off = np.sqrt(np.asarray((off.wind ** 2).sum(axis=0)))
    sp_on = np.sqrt(np.asarray((on.wind ** 2).sum(axis=0)))
    # the sponge slows the top level relative to the undamped run
    assert sp_on[:, 0].mean() < sp_off[:, 0].mean() - 1e-3
    # and leaves the lowest levels essentially untouched
    np.testing.assert_allclose(
        sp_on[:, -1], sp_off[:, -1], rtol=1e-4, atol=1e-6
    )
    assert np.isfinite(np.asarray(on.pt)).all()
