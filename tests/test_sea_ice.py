"""Zero-layer sea ice (physics/sea_ice.py): exact energy ledger,
freeze/melt behavior, albedo feedback, runtime wiring."""
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.physics.sea_ice import (
    SeaIceParams,
    ice_fraction,
    slab_ice_exchange,
    slab_ocean_seaice_update,
)


def test_ice_exchange_energy_ledger_exact():
    """C (T_new - T*) = rho_i L_f (h_new - h) in every regime."""
    p = SeaIceParams()
    C = 1025.0 * 3990.0 * 50.0  # slab heat capacity J/m^2/K
    t_star = jnp.asarray([270.0, 271.5, 272.5, 273.0])  # K
    h = jnp.asarray([0.0, 0.2, 0.05, 0.0])  # m
    t_new, h_new = slab_ice_exchange(t_star, h, C, p)
    t_new, h_new = np.asarray(t_new), np.asarray(h_new)
    le = p.rho_ice * p.latent_fusion
    np.testing.assert_allclose(
        C * (t_new - np.asarray(t_star)), le * (h_new - np.asarray(h)),
        rtol=1e-4, atol=1e-2,  # f32
    )
    # cooling below freezing grew ice and pinned T at freezing
    assert h_new[0] > 0 and t_new[0] == pytest.approx(p.t_freeze)
    # warming with plenty of ice melted some and stayed at freezing
    assert 0 < h_new[1] < 0.2
    assert t_new[1] == pytest.approx(p.t_freeze)
    # warming with little ice melted it all, leftover warmed the water
    assert h_new[2] == 0.0 and t_new[2] > p.t_freeze
    assert t_new[2] < 272.5  # but less warm than without the melt
    # no ice, above freezing: pass-through
    assert h_new[3] == 0.0 and t_new[3] == pytest.approx(273.0)


def test_ice_fraction_ramp():
    p = SeaIceParams(h_ref=0.3)
    f = np.asarray(ice_fraction(jnp.asarray([0.0, 0.15, 0.3, 1.0]), p))
    np.testing.assert_allclose(f, [0.0, 0.5, 1.0, 1.0])


def test_ice_albedo_raises_reflection():
    from fv3net_tpu.physics.radiation import optics

    cosz = jnp.full((4,), 0.5)
    land = jnp.zeros((4,))
    no_ice_dir, no_ice_dif = optics.surface_albedo(cosz, land)
    icy_dir, icy_dif = optics.surface_albedo(
        cosz, land, ice_frac=jnp.ones((4,))
    )
    assert float(np.asarray(icy_dir).mean()) > float(
        np.asarray(no_ice_dir).mean()
    )
    assert float(np.asarray(icy_dif).min()) > 0.3  # bare-ice broadband


def test_gray_albedo_override():
    from fv3net_tpu.physics.radiation_gray import gray_radiation

    shape = (6, 4, 4)
    nz = 8
    T = jnp.full(shape + (nz,), 260.0)
    delp = jnp.full(shape + (nz,), 1.0e4)
    tsfc = jnp.full(shape, 271.0)
    cosz = jnp.full(shape, 0.5)
    lat = jnp.full(shape, 1.2)
    _, d0 = gray_radiation(T, delp, tsfc, cosz, lat)
    _, d1 = gray_radiation(
        T, delp, tsfc, cosz, lat, albedo=jnp.full(shape, 0.60)
    )
    assert float(np.asarray(d1["USWRFtoa"]).mean()) > float(
        np.asarray(d0["USWRFtoa"]).mean()
    )


def test_sea_ice_requires_slab_ocean():
    from fv3net_tpu.runtime.config import NamelistConfig

    with pytest.raises(ValueError, match="slab_ocean"):
        NamelistConfig(sea_ice=True, slab_ocean=False)


def test_sea_ice_in_time_loop_polar_cooling():
    """A cold polar-night setup grows ice, pins the surface at freezing,
    and emits the ice diagnostics."""
    from fv3net_tpu.runtime import TimeLoop, names
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig

    cfg = UserConfig(
        namelist=NamelistConfig(
            npx=6, npz=10, dt_atmos=900.0, n_split=2,
            slab_ocean=True, sea_ice=True,
            mixed_layer_depth_m=5.0,  # thin slab: fast freeze
        ),
        duration_seconds=1800.0,
    )
    loop = TimeLoop(cfg)
    # polar night everywhere: SST at the freezing point, LW cooling
    tsfc = jnp.full_like(loop.state.surface[names.TSFC], 271.35)
    loop.state.surface[names.TSFC] = tsfc
    loop.state.surface[names.SST] = tsfc
    diag_list = [diags for _, diags in loop]
    d = diag_list[-1]
    assert "ice_thickness" in d and "ice_fraction" in d
    h = np.asarray(loop.state.surface["ice_thickness"])
    t = np.asarray(loop.state.surface[names.TSFC])
    assert np.isfinite(h).all() and (h >= 0).all()
    assert h.max() > 0  # ice formed somewhere under the cooling
    # wherever ice exists, the surface sits at the freezing point
    icy = h > 0
    np.testing.assert_allclose(t[icy], 271.35, atol=1e-3)
