"""Noah-style land surface contracts (physics/soil.py).

Reference: the GFS Noah LSM's prognostic surface fields
(stc/smc/sheleg/tg3) in the sfc_data restart category
(external/vcm/vcm/cubedsphere/coarsen_restarts.py:1020-1336).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import enable_x64

from fv3net_tpu.core.constants import LATENT_HEAT_FUSION
from fv3net_tpu.physics import soil


@pytest.fixture(autouse=True)
def _x64():
    """Budget closures are asserted to roundoff — run these in f64."""
    with enable_x64():
        yield

P = soil.SoilParams()
NL = len(P.dz)
DT = 900.0


def _state(n=8, theta=0.25, t=285.0, rng=None):
    rng = rng or np.random.RandomState(0)
    stc = jnp.asarray(t + rng.randn(NL, n))
    smc = jnp.asarray(np.full((NL, n), theta) + 0.02 * rng.rand(NL, n))
    swe = jnp.zeros(n)
    tg3 = jnp.full(n, 283.0)
    tskin = jnp.full(n, t)
    return stc, smc, swe, tg3, tskin


def test_hydraulics_monotone():
    th = np.linspace(0.05, 0.45, 30)
    K = np.asarray(soil.hydraulic_conductivity(th))
    D = np.asarray(soil.hydraulic_diffusivity(th))
    assert (np.diff(K) > 0).all() and (np.diff(D) > 0).all()
    assert K[-1] <= P.k_sat * 1.0001
    lam = np.asarray(soil.thermal_conductivity(th))
    assert (np.diff(lam) > 0).all()
    assert lam[0] >= P.k_dry and lam[-1] <= P.k_wet


def test_soil_thermal_relaxes_to_boundaries():
    """Uniform warm column over a cold deep temperature cools toward it;
    total heat change equals integrated boundary fluxes."""
    _, smc, _, tg3, _ = _state(t=290.0)
    stc = jnp.full((NL, 8), 290.0)  # uniform: monotone cooling per layer
    tg3 = jnp.full_like(tg3, 280.0)
    G = jnp.zeros(stc.shape[-1])
    heat0 = sum(
        float(P.dz[i])
        * np.asarray((P.c_soil + P.c_water * smc[i]) * stc[i])
        for i in range(NL)
    )
    out = stc
    for _ in range(50):
        out = soil.soil_thermal_step(out, tg3, G, smc, DT)
    out = np.asarray(out)
    assert (out < np.asarray(stc)).all()  # cooling toward tg3
    assert (out > 279.0).all()  # but never past the boundary


def test_soil_thermal_energy_conservation_zero_flux():
    """With zero top flux and tg3 == bottom layer T, heat content is
    exactly conserved by the implicit solve."""
    rng = np.random.RandomState(1)
    stc, smc, _, tg3, _ = _state(rng=rng)
    tg3 = stc[NL - 1]  # no bottom gradient initially... still evolves
    G = jnp.zeros(stc.shape[-1])
    cap = jnp.stack(
        [(P.c_soil + P.c_water * smc[i]) * float(P.dz[i]) for i in range(NL)]
    )
    h0 = np.asarray((cap * stc).sum(axis=0))
    stc1 = soil.soil_thermal_step(stc, tg3, G, smc, DT)
    # energy change equals the bottom flux to tg3 (the only open boundary)
    lam = soil.thermal_conductivity(smc, P)
    g_bot = lam[NL - 1] / (0.5 * float(P.dz[NL - 1]))
    bot_flux = np.asarray(g_bot * (tg3 - stc1[NL - 1]))  # into the column
    h1 = np.asarray((cap * stc1).sum(axis=0))
    np.testing.assert_allclose(h1 - h0, bot_flux * DT, rtol=1e-6, atol=1e-3)


def test_water_budget_closes():
    rng = np.random.RandomState(2)
    stc, smc, swe, tg3, tskin = _state(rng=rng)
    rain = jnp.asarray(2e-4 * rng.rand(8))  # heavy rain kg/m^2/s
    snow = jnp.asarray(1e-5 * rng.rand(8))
    evap = jnp.asarray(5e-5 * rng.rand(8))
    stc1, smc1, swe1, d = soil.noah_land_step(
        stc, smc, swe, tg3, tskin, rain, snow, evap, DT
    )
    dz = np.asarray([float(z) for z in P.dz])
    w0 = (np.asarray(smc).T * dz).sum(-1) + np.asarray(swe)
    w1 = (np.asarray(smc1).T * dz).sum(-1) + np.asarray(swe1)
    rhs = (
        np.asarray(rain + snow - evap) / soil.RHO_WATER
        - np.asarray(d["RUNOFFsfc"] + d["DRAINsfc"]) / soil.RHO_WATER
    ) * DT
    np.testing.assert_allclose(w1 - w0, rhs, rtol=1e-6, atol=1e-12)


def test_snow_accumulates_cold_melts_warm():
    stc, smc, swe, tg3, _ = _state()
    snow = jnp.full(8, 1e-4)
    zero = jnp.zeros(8)
    # cold skin: snow accumulates, no melt heat
    _, _, swe_c, dc = soil.noah_land_step(
        stc, smc, swe, tg3, jnp.full(8, 265.0), zero, snow, zero, DT
    )
    np.testing.assert_allclose(
        np.asarray(swe_c), 1e-4 * DT / soil.RHO_WATER, rtol=1e-9
    )
    assert float(np.asarray(dc["snow_melt_heat"]).max()) == 0.0
    # warm skin: an existing pack melts and consumes fusion heat
    swe0 = jnp.full(8, 0.02)
    _, _, swe_w, dw = soil.noah_land_step(
        stc, smc, swe0, tg3, jnp.full(8, 273.66), zero, zero, zero, DT
    )
    assert (np.asarray(swe_w) < 0.02).all()
    assert (np.asarray(swe_w) > 0.0).all()  # energy-limited, partial melt
    melt = (0.02 - np.asarray(swe_w)) / DT * soil.RHO_WATER
    np.testing.assert_allclose(
        np.asarray(dw["snow_melt_heat"]), melt * LATENT_HEAT_FUSION,
        rtol=1e-6,
    )
    assert (np.asarray(dw["snow_cover"]) > 0).all()


def test_saturated_soil_generates_runoff():
    stc, smc, swe, tg3, tskin = _state(theta=0.44)
    rain = jnp.full(8, 5e-3)  # extreme rain
    zero = jnp.zeros(8)
    _, smc1, _, d = soil.noah_land_step(
        stc, smc, swe, tg3, tskin, rain, zero, zero, DT
    )
    assert (np.asarray(d["RUNOFFsfc"]) > 0).all()
    assert float(np.asarray(smc1).max()) <= P.theta_sat + 1e-12


def test_beta_zero_at_wilting_one_at_field_capacity():
    smc_dry = jnp.full((NL, 4), P.theta_wilt)
    smc_wet = jnp.full((NL, 4), P.theta_fc)
    b_dry = np.asarray(soil.evaporation_efficiency(smc_dry))
    b_wet = np.asarray(soil.evaporation_efficiency(smc_wet))
    np.testing.assert_allclose(b_dry, 0.0, atol=1e-12)
    np.testing.assert_allclose(b_wet, 1.0, atol=1e-12)


def test_jit_and_shapes():
    stc, smc, swe, tg3, tskin = _state()
    f = jax.jit(lambda *a: soil.noah_land_step(*a, DT))
    zero = jnp.zeros(8)
    stc1, smc1, swe1, d = f(stc, smc, swe, tg3, tskin, zero, zero, zero)
    assert stc1.shape == (NL, 8) and smc1.shape == (NL, 8)
    for v in d.values():
        assert np.isfinite(np.asarray(v)).all()
