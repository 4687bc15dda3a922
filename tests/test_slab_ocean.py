"""Mixed-layer slab ocean: energy bookkeeping and runtime wiring."""
import numpy as np
import jax.numpy as jnp

from fv3net_tpu.physics.slab_ocean import (
    SlabOceanParams,
    net_surface_flux,
    slab_ocean_update,
)


def test_slab_energy_bookkeeping():
    p = SlabOceanParams(mixed_layer_depth_m=50.0)
    ts = jnp.full((6, 4, 4), 290.0)
    diags = {
        "DSWRFsfc": jnp.full((6, 4, 4), 200.0),
        "USWRFsfc": jnp.full((6, 4, 4), 12.0),
        "DLWRFsfc": jnp.full((6, 4, 4), 350.0),
        "ULWRFsfc": jnp.full((6, 4, 4), 400.0),
        "SHTFLsfc": jnp.full((6, 4, 4), 20.0),
        "LHTFLsfc": jnp.full((6, 4, 4), 100.0),
    }
    f = np.asarray(net_surface_flux(diags))
    np.testing.assert_allclose(f, 18.0)  # 200-12+350-400-20-100
    new = slab_ocean_update(ts, diags, 900.0, p)
    # dT = F dt / (rho c h), exactly
    want = 290.0 + 18.0 * 900.0 / (1025.0 * 3990.0 * 50.0)
    np.testing.assert_allclose(np.asarray(new), want, rtol=1e-6)
    # land points warm faster (thin layer)
    mask = jnp.zeros((6, 4, 4)).at[0].set(1.0)
    new2 = slab_ocean_update(ts, diags, 900.0, p, land_mask=mask)
    assert float(new2[0, 0, 0]) > float(new2[1, 0, 0])
    # freezing floor
    cold = {k: (v * 0 - 500.0 if k.startswith("ULWRF") else v * 0)
            for k, v in diags.items()}
    frozen = slab_ocean_update(jnp.full((6, 4, 4), 271.4), cold, 1e9, p)
    assert float(frozen.min()) >= p.t_min


def test_freezing_floor_is_ocean_only():
    """The 271.35 K floor expresses seawater freezing — continental skin
    temperature may drop below it (ADVICE r1)."""
    from fv3net_tpu.physics.slab_ocean import (
        SlabOceanParams,
        slab_ocean_update,
    )

    p = SlabOceanParams(land_depth_m=0.5)
    cold = {
        "DSWRFsfc": jnp.zeros((6, 4, 4)),
        "USWRFsfc": jnp.zeros((6, 4, 4)),
        "DLWRFsfc": jnp.zeros((6, 4, 4)),
        "ULWRFsfc": jnp.full((6, 4, 4), 500.0),
        "SHTFLsfc": jnp.zeros((6, 4, 4)),
        "LHTFLsfc": jnp.zeros((6, 4, 4)),
    }
    mask = jnp.zeros((6, 4, 4)).at[0].set(1.0)
    ts = jnp.full((6, 4, 4), 272.0)
    new = slab_ocean_update(ts, cold, 1e7, p, land_mask=mask)
    assert float(new[0].max()) < p.t_min  # land cools past the floor
    assert float(new[1:].min()) >= p.t_min  # ocean is floored


def test_slab_ocean_in_time_loop():
    from fv3net_tpu.runtime import TimeLoop, names
    from fv3net_tpu.runtime.config import get_config

    cfg = get_config(
        {
            "namelist": {"npx": 6, "npz": 8, "slab_ocean": True,
                         "mixed_layer_depth_m": 10.0},
            "duration_seconds": 1800.0,
        }
    )
    loop = TimeLoop(cfg, dtype=jnp.float32)
    t0 = np.asarray(loop.state.surface[names.TSFC]).copy()
    for _t, _d in loop:
        pass
    t1 = np.asarray(loop.state.surface[names.TSFC])
    assert not np.allclose(t1, t0)  # the slab actually integrates
    assert np.isfinite(t1).all()
    assert t1.min() > 200.0 and t1.max() < 330.0
