"""RRTMG-structured radiation driver (reference:
external/radiation/radiation/radiation_driver.py RadiationDriver —
radupdate:206 astronomy/gas updates and _GFS_radiation_driver:380 column
pre/post-processing around the LW+SW band solvers; output names follow
preprocessing.py RENAME_OUT:37-56).

One pure, jittable function of (state columns, time scalars) -> flux and
heating-rate dict; clear-sky and total-sky in the same graph. Columns are
flattened to [ncol, nz]; z index 0 = model top.
"""
from __future__ import annotations

import dataclasses
import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import GRAVITY
from fv3net_tpu.ops import thermo, zenith
from fv3net_tpu.physics.radiation import gases, lw, optics, spectra, sw
from fv3net_tpu.physics.radiation import params as P


@dataclasses.dataclass
class DriverConfig:
    """Namelist-style options (reference wrapper_api.py:40-78
    GFSPhysicsControl subset; iovr/isol/ico2/iaer keep their meanings)."""

    iovr: int = 1       # 1 = maximum-random overlap (McICA)
    isol: int = 0       # 0 = fixed solar constant, 1 = +eccentricity cycle
    ico2: int = 0       # 0 = climatological CO2, 1 = linear secular trend
    iaer: int = 1       # 0 = no aerosol, 1 = climatological aerosol
    icld: int = 1       # 0 = clear sky only
    year: int = 2016
    mcica_seed: int = 42


def _planck_gpt(coefs, expand, T):
    """Per-g-point Planck emissive power [W/m^2] at temperatures T[...].

    coefs: [deg+1, nbands] polynomial in (T/T_REF); expand: [ngpt, nbands]
    one-hot*gwt. Evaluated as two matmuls (MXU path)."""
    x = T[..., None] / spectra.T_REF
    powers = x ** jnp.arange(coefs.shape[0], dtype=T.dtype)
    e_band = powers @ coefs                # [..., nbands]
    return e_band @ expand.T               # [..., ngpt]


class RadiationDriver:
    """Builds the spectral data once; __call__ is pure and jit-friendly."""

    def __init__(self, config: DriverConfig = DriverConfig()):
        self.config = config
        self.go_lw = optics.build_gas_optics(spectra.lw_kdist(), P.NBANDS_LW)
        self.go_sw = optics.build_gas_optics(spectra.sw_kdist(), P.NBANDS_SW)
        self.planck_coefs = jnp.asarray(spectra.planck_band_coefs(), jnp.float32)
        ex_lw = np.zeros((P.NGPT_LW, P.NBANDS_LW), np.float32)
        ex_lw[np.arange(P.NGPT_LW), spectra.lw_kdist().band_of_gpt] = 1.0
        self.expand_lw_1 = jnp.asarray(ex_lw)  # band value -> gpt copy
        self.expand_lw = jnp.asarray(
            ex_lw * spectra.lw_kdist().gwt[:, None], jnp.float32
        )
        ex_sw = np.zeros((P.NGPT_SW, P.NBANDS_SW), np.float32)
        ex_sw[np.arange(P.NGPT_SW), spectra.sw_kdist().band_of_gpt] = 1.0
        self.expand_sw_1 = jnp.asarray(ex_sw)  # band value -> gpt copy
        solar_gpt = spectra.solar_band_fraction()[
            spectra.sw_kdist().band_of_gpt
        ] * spectra.sw_kdist().gwt
        self.solar_gpt = jnp.asarray(solar_gpt, jnp.float32)  # sums to 1

    def solar_constant(self, days) -> jnp.ndarray:
        """(reference radiation_astronomy.py solar cycle; isol gates the
        orbital eccentricity modulation)"""
        if self.config.isol == 0:
            return jnp.asarray(P.S0, jnp.float32)
        from fv3net_tpu.ops.zenith import solar_distance_factor

        return P.S0 * solar_distance_factor(days)

    def __call__(
        self,
        time: datetime.datetime,
        state: Dict[str, jnp.ndarray],
        cosz: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """state: z-last column arrays — air_temperature [..., nz],
        pressure_thickness_of_atmospheric_layer [..., nz],
        specific_humidity [..., nz] (optional), cloud_water_mixing_ratio
        [..., nz] (optional), surface_temperature, latitude, longitude
        (radians), land_sea_mask (optional, 1=land). Returns the
        RENAME_OUT-named fluxes/heating plus the combined temperature
        tendency."""
        cfg = self.config
        T = state["air_temperature"]
        dp = state["pressure_thickness_of_atmospheric_layer"]
        lead, nz = T.shape[:-1], T.shape[-1]
        ncol = int(np.prod(lead)) if lead else 1

        def cols(x, nd=1):
            x = jnp.asarray(x, jnp.float32)
            return x.reshape((ncol,) + x.shape[len(lead):])

        T = cols(T)
        dp = cols(dp)
        # defaults must be built at the FLAT column shape: zeros_like of
        # the already-flattened T re-reshaped with the original lead ndim
        # crashes for multi-dim leads
        q_raw = state.get("specific_humidity")
        q = (
            cols(q_raw) if q_raw is not None
            else jnp.full((ncol, nz), 1e-6, jnp.float32)
        )
        qc_raw = state.get("cloud_water_mixing_ratio")
        qc = (
            cols(qc_raw) if qc_raw is not None
            else jnp.zeros((ncol, nz), jnp.float32)
        )
        tsfc = cols(state["surface_temperature"])
        lat = cols(state["latitude"])
        lon = cols(state["longitude"])
        land = cols(state.get("land_sea_mask", jnp.zeros(lead)))
        land = jnp.clip(land, 0.0, 1.0)
        ice = cols(state.get("ice_fraction", jnp.zeros(lead)))
        ice = jnp.clip(ice, 0.0, 1.0)

        plev = thermo.pressure_at_interface(dp)
        play = 0.5 * (plev[..., :-1] + plev[..., 1:])
        tlev = jnp.concatenate(
            [
                (T[..., :1] - 0.25 * (T[..., 1:2] - T[..., :1])),
                0.5 * (T[..., :-1] + T[..., 1:]),
                (T[..., -1:] + 0.25 * (T[..., -1:] - T[..., -2:-1])),
            ],
            axis=-1,
        )

        # prognostic ozone (the o3mr tracer) takes precedence over the
        # analytic climatology when the caller provides it
        if "ozone_mixing_ratio" in state:
            o3 = jnp.maximum(cols(state["ozone_mixing_ratio"]), 0.0)
        else:
            o3 = gases.ozone_profile(play, lat)
        mmr = {"h2o": jnp.maximum(q, 1e-9), "o3": o3}
        mmr.update(gases.well_mixed(play, cfg.year, cfg.ico2))

        # astronomy (an externally supplied cos-zenith, e.g. from the
        # fused prognostic step, bypasses the internal computation)
        days = zenith.days_from_2000(time)
        if cosz is None:
            cosz = zenith.cos_zenith_angle(
                days, jnp.rad2deg(lon), jnp.rad2deg(lat)
            )
        cosz = cols(jnp.asarray(cosz))
        s0 = self.solar_constant(days)

        # clouds (reference radiation_clouds.py progcld: condensate ->
        # paths, effective radii, fraction)
        t_frac_ice = jnp.clip((268.0 - T) / 15.0, 0.0, 1.0)
        wpath = qc * dp * (1000.0 / GRAVITY)  # g/m^2 grid-mean
        cldfrac = jnp.where(qc > 1e-7, 1.0 - jnp.exp(-qc / 3.0e-5), 0.0)
        if cfg.icld == 0:
            cldfrac = jnp.zeros_like(cldfrac)
        incloud = wpath / jnp.maximum(cldfrac, 0.05)
        lwp = incloud * (1.0 - t_frac_ice)
        iwp = incloud * t_frac_ice
        re_liq = 10.0 * land + 14.0 * (1.0 - land)
        re_liq = jnp.broadcast_to(re_liq[:, None], lwp.shape)
        re_ice = jnp.clip(326.3 + 12.42 * (T - 273.15), 20.0, 130.0)
        co = optics.cloud_optics(lwp, iwp, re_liq, re_ice, cldfrac)

        # decorrelate the McICA draw across timesteps (the reference
        # threads fresh rand2d_data per call): fold the seed with a
        # state-derived integer so successive calls see different
        # subcolumn patterns without an API change
        # modulo in FLOAT before the integer cast: f32->s32 saturates at
        # 2^31 for realistic grids, which would freeze the fold
        state_fold = ((jnp.abs(T).sum() * 16.0) % 1000003.0).astype(
            jnp.int32
        )
        key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.mcica_seed), state_fold
        )
        mask_lw = optics.mcica_subcolumns(
            cldfrac, P.NGPT_LW, key, iovr=cfg.iovr
        )
        mask_sw = optics.mcica_subcolumns(
            cldfrac, P.NGPT_SW, jax.random.fold_in(key, 1), iovr=cfg.iovr
        )

        # ---------------- longwave
        tau_lw = optics.gas_optical_depth(self.go_lw, play, T, dp, mmr)
        e_lev = _planck_gpt(self.planck_coefs, self.expand_lw, tlev)
        e_lev = jnp.moveaxis(e_lev, -1, 1)  # [ncol, ngpt, nlev]
        e_sfc = _planck_gpt(self.planck_coefs, self.expand_lw, tsfc)
        emis = optics.surface_emissivity(land)
        clear_lw = lw.lw_transfer(tau_lw, e_lev, None, e_sfc, emis, dp)
        tau_cld_lw = jnp.einsum("lbz,gb->lgz", co.tau_lw, self.expand_lw_1)
        total_lw = lw.lw_transfer(
            tau_lw + mask_lw * tau_cld_lw, e_lev, None, e_sfc, emis, dp
        )

        # ---------------- shortwave
        tau_g = optics.gas_optical_depth(self.go_sw, play, T, dp, mmr)
        expand = self.expand_sw_1
        tau_r = jnp.einsum("lbz,gb->lgz", optics.rayleigh_tau(dp), expand)
        if cfg.iaer:
            ta, wa, ga = optics.aerosol_optics(play, dp, land)
            tau_a = jnp.einsum("lbz,gb->lgz", ta, expand)
            wa_g = jnp.einsum("lbz,gb->lgz", ta * wa, expand)
            ga_g = jnp.einsum("lbz,gb->lgz", ta * wa * ga, expand)
        else:
            tau_a = wa_g = ga_g = jnp.zeros_like(tau_r)

        def combine(extra_tau, extra_wtau, extra_gwtau):
            tau = tau_g + tau_r + tau_a + extra_tau
            wtau = tau_r + wa_g + extra_wtau
            gwtau = ga_g + extra_gwtau
            ssa = wtau / jnp.maximum(tau, 1e-12)
            g = gwtau / jnp.maximum(wtau, 1e-12)
            return tau, jnp.clip(ssa, 0.0, 1.0), jnp.clip(g, 0.0, 1.0)

        alb_dir_b, alb_dif_b = optics.surface_albedo(cosz, land, ice_frac=ice)
        alb_dir = alb_dir_b @ expand.T
        alb_dif = alb_dif_b @ expand.T
        src = s0 * self.solar_gpt[None, :] * jnp.ones((ncol, 1), jnp.float32)

        clear_sw = sw.sw_transfer(
            *combine(0.0, 0.0, 0.0), cosz, src, alb_dir, alb_dif, dp
        )
        tc = jnp.einsum("lbz,gb->lgz", co.tau_sw, expand) * mask_sw
        wc = jnp.einsum("lbz,gb->lgz", co.tau_sw * co.ssa_sw, expand) * mask_sw
        gc = jnp.einsum(
            "lbz,gb->lgz", co.tau_sw * co.ssa_sw * co.asy_sw, expand
        ) * mask_sw
        total_sw = sw.sw_transfer(
            *combine(tc, wc, gc), cosz, src, alb_dir, alb_dif, dp
        )

        def resh(x):
            return x.reshape(lead + x.shape[1:])

        out = {
            "total_sky_longwave_heating_rate_python": resh(total_lw.htr),
            "clear_sky_longwave_heating_rate_python": resh(clear_lw.htr),
            "total_sky_shortwave_heating_rate_python": resh(total_sw.htr),
            "clear_sky_shortwave_heating_rate_python": resh(clear_sw.htr),
            "total_sky_upward_longwave_flux_at_top_of_atmosphere_python": resh(total_lw.up[..., 0]),
            "clear_sky_upward_longwave_flux_at_top_of_atmosphere_python": resh(clear_lw.up[..., 0]),
            "total_sky_upward_shortwave_flux_at_top_of_atmosphere_python": resh(total_sw.up[..., 0]),
            "clear_sky_upward_shortwave_flux_at_top_of_atmosphere_python": resh(clear_sw.up[..., 0]),
            "total_sky_downward_shortwave_flux_at_top_of_atmosphere_python": resh(total_sw.dn[..., 0]),
            "total_sky_upward_longwave_flux_at_surface_python": resh(total_lw.up[..., -1]),
            "clear_sky_upward_longwave_flux_at_surface_python": resh(clear_lw.up[..., -1]),
            "total_sky_downward_longwave_flux_at_surface_python": resh(total_lw.dn[..., -1]),
            "clear_sky_downward_longwave_flux_at_surface_python": resh(clear_lw.dn[..., -1]),
            "total_sky_upward_shortwave_flux_at_surface_python": resh(total_sw.up[..., -1]),
            "clear_sky_upward_shortwave_flux_at_surface_python": resh(clear_sw.up[..., -1]),
            "total_sky_downward_shortwave_flux_at_surface_python": resh(total_sw.dn[..., -1]),
            "clear_sky_downward_shortwave_flux_at_surface_python": resh(clear_sw.dn[..., -1]),
            "cos_zenith_angle": resh(cosz),
            "tendency_of_air_temperature_due_to_radiation": resh(
                total_lw.htr + total_sw.htr
            ),
        }
        return out
